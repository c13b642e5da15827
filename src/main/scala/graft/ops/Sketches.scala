package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed sketches over document streams.
  *
  * KMV / bottom-k distinct counting (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002): keep the k smallest distinct
  * hash values; if the kth smallest (unsigned) is U, the distinct count is
  * ≈ (k−1)·2⁶⁴/U. The sketch state is O(k), merges associatively (so
  * Spark partial-aggregates it map-side — one shuffle of k longs per
  * group), and, unlike HyperLogLog, is EXACTLY reproducible by an
  * independent engine from the same hash function — the DuckDB oracle
  * recomputes the identical estimate. */
object Sketches {

  val TwoPow64: Double = 1.8446744073709552e19

  /** Per-group bottom-k sketches of the token-hash sets: (groupCol, bk). */
  def kmvSketches(docs: DataFrame, groupCol: String, k: Int = 64,
      textCol: String = "text"): DataFrame = {
    graft.functions.functions.register(docs.sparkSession)
    val toks = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(groupCol), graft.functions.functions.graft_fnv1a64(col("tok")).as("h"))
    toks.groupBy(col(groupCol))
      .agg(graft.functions.functions.graft_bottomk(col("h"), lit(k)).as("bk"))
  }

  /** Per-group distinct-token estimate: (groupCol, n_kept, distinct_est).
    * Exact (= the true distinct count) whenever the group has fewer than k
    * distinct tokens. */
  def kmvDistinctTokens(docs: DataFrame, groupCol: String, k: Int = 64,
      textCol: String = "text"): DataFrame = {
    kmvSketches(docs, groupCol, k, textCol)
      // kth smallest as an UNSIGNED double (2⁶⁴ is exactly representable)
      .withColumn("kth", get(col("bk"), lit(k - 1)))
      .withColumn("kth_u",
        when(col("kth") < 0, col("kth").cast("double") + lit(TwoPow64))
          .otherwise(col("kth").cast("double")))
      .select(col(groupCol),
        size(col("bk")).cast("long").as("n_kept"),
        round(
          when(size(col("bk")) < k, size(col("bk")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(TwoPow64) / col("kth_u")),
          2).as("distinct_est"))
  }

  /** Pairwise set-operation estimates between group sketches — the KMV
    * union/Jaccard construction (Beyer et al., SIGMOD 2007): the union
    * sketch is the bottom-k of the merged sketches, ρ = the fraction of
    * union-sketch members present in BOTH input sets estimates Jaccard,
    * and the union size comes from the union sketch's kth value. For any
    * x in the union's bottom-k, x ∈ bottom-k(A) ⟺ x ∈ A, so membership is
    * decidable from the sketches alone — no second pass over the data.
    * Output: (g_a, g_b, n_union_kept, union_est, jaccard_est). */
  def kmvOverlap(docs: DataFrame, groupCol: String, k: Int = 64,
      textCol: String = "text"): DataFrame = {
    val sk = kmvSketches(docs, groupCol, k, textCol)
    val a = sk.select(col(groupCol).as("g_a"), col("bk").as("bk_a"))
    val b = sk.select(col(groupCol).as("g_b"), col("bk").as("bk_b"))
    // unsigned sort of signed longs = signed sort of sign-flipped values
    def flip(c: org.apache.spark.sql.Column) =
      transform(c, x => x.bitwiseXOR(lit(Long.MinValue)))
    a.join(b, col("g_a") < col("g_b")) // tiny: one row per group pair
      .withColumn("union_k",
        transform(slice(array_sort(flip(array_union(col("bk_a"), col("bk_b")))), 1, k),
          x => x.bitwiseXOR(lit(Long.MinValue))))
      .withColumn("n_kept", size(col("union_k")))
      .withColumn("kth", get(col("union_k"), lit(k - 1)))
      .withColumn("kth_u",
        when(col("kth") < 0, col("kth").cast("double") + lit(TwoPow64))
          .otherwise(col("kth").cast("double")))
      .withColumn("n_both", size(
        array_intersect(array_intersect(col("union_k"), col("bk_a")), col("bk_b"))))
      .select(col("g_a"), col("g_b"),
        col("n_kept").cast("long").as("n_union_kept"),
        round(
          when(col("n_kept") < k, col("n_kept").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(TwoPow64) / col("kth_u")),
          2).as("union_est"),
        round(col("n_both").cast("double") / col("n_kept"), 4).as("jaccard_est"))
  }
}
