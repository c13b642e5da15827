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

  /** Per-group distinct-token estimate: (groupCol, n_kept, distinct_est).
    * Exact (= the true distinct count) whenever the group has fewer than k
    * distinct tokens. */
  def kmvDistinctTokens(docs: DataFrame, groupCol: String, k: Int = 64,
      textCol: String = "text"): DataFrame = {
    graft.functions.functions.register(docs.sparkSession)
    val toks = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(groupCol), graft.functions.functions.graft_fnv1a64(col("tok")).as("h"))
    toks.groupBy(col(groupCol))
      .agg(graft.functions.functions.graft_bottomk(col("h"), lit(k)).as("bk"))
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
}
