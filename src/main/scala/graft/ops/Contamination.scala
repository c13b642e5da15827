package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-gram shingles with an evaluation/benchmark set — the standard
  * pre-training contamination check (GPT-3 appendix C / PaLM style:
  * n-gram overlap against eval sets).
  *
  * Shape at 100 TB: the benchmark side is SMALL by construction (eval
  * suites are thousands of docs), so its distinct shingle-hash set
  * broadcasts; the corpus side is one narrow explode of 8-byte hashes, a
  * broadcast LEFT OUTER join that marks hits (distinct benchmark keys →
  * no row multiplication), and ONE partial-aggregating groupBy(doc_id)
  * counting totals and hits together — the only shuffle carries
  * (doc_id, counts) pairs, never text. The shingle construction is
  * [[Dedup.shingleHashes]] (fnv1a over word k-grams), already
  * bit-replicated by the DuckDB oracles.
  */
object Contamination {

  /** Per-doc overlap against the benchmark's shingle set:
    * (idCol, n_shingles, n_contaminated, contamination_frac). Every input
    * doc appears (zero-overlap docs included — the downstream filter
    * decides the threshold). */
  def overlap(docs: DataFrame, benchmark: DataFrame, k: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      benchTextCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    def shingled(df: DataFrame, id: String, text: String): DataFrame =
      df.select(col(id).cast("long").as("sid"), col(text).as("t"))
        .as[(Long, String)]
        .flatMap { case (i, t) =>
          Dedup.shingleHashes(if (t == null) "" else t, k).map(h => (i, h))
        }
        .toDF("sid", "sh")

    // distinct benchmark shingles: small side, broadcast by construction
    val benchSh = broadcast(
      shingled(benchmark, idCol, benchTextCol).select(col("sh")).distinct()
        .withColumn("hit", lit(1)))

    // ONE pass over the corpus shingles: broadcast left join marks hits,
    // a single partial-aggregating groupBy counts totals and hits together
    // (the two-aggregation form scanned and shingled the corpus twice —
    // review r4)
    val counts = shingled(docs, idCol, textCol)
      .join(benchSh, Seq("sh"), "left")
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_contaminated"))

    docs.select(col(idCol).cast("long").as("sid")).distinct()
      .join(counts, Seq("sid"), "left")
      .select(col("sid").as(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_shingles"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("contamination_frac"))
  }
}
