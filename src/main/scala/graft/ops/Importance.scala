package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection IMPORTANCE scoring (DSIR-style, Xie et al. 2023
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how target-like its token distribution
  * is, using the ratio of a target-corpus unigram model to the raw-pool
  * unigram model. Pipelines then resample/threshold the raw pool on the
  * score to tilt the mixture toward the target domain.
  *
  * Reproducibility contract (this repo's oracle discipline): the score
  * is deliberately log-free — per token, ONE exact IEEE division of
  * integer-valued doubles
  *
  *   r(w) = (T(w) + 1) / (R(w) + V)
  *
  * (T = target count, R = raw-pool count, V = corpus vocabulary — the
  * same Laplace shape as the LM fluency op), and the per-doc mean folds
  * positions in ascending order, so an independent engine reproduces
  * every double bit-for-bit. Log-ratio scoring would differ in final
  * ulps across libm implementations; the mean-ratio ordering is the
  * same monotone signal for a threshold/tier gate.
  *
  * Shape at 100 TB: classic distributed unigram counting — one shuffle
  * keyed by token per model side (map-side combined), then the token
  * stream equi-joins both models on the token key. Model frames are
  * corpus-sized and NEVER broadcast; the only broadcast is the one-row
  * vocabulary scalar (the LM vocab-attach shape). Per-doc state is the
  * doc's own position-ordered ratio list, bounded by doc length.
  */
object Importance {

  /** (idCol, n_tokens, imp_score): mean target/raw unigram ratio per
    * document, position-ordered fold, rounded to 4 decimals (0.0 for
    * empty docs). `isTarget` marks the target-domain rows; ALL rows are
    * scored (target rows too — their self-similarity is a useful
    * diagnostic and keeping them avoids a second pass). */
  def dsirScore(docs: DataFrame, isTarget: Column, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol).cast("long").as("sid"),
        isTarget.cast("boolean").as("tgt"),
        filter(split(coalesce(col(textCol), lit("")), "\\s+"),
          w => length(w) > 0).as("ws"))
      // one tokenization pass feeds both models and the scoring stream
      .transform(CheckpointScratch.ckpt)
    val stream = CheckpointScratch.ckpt(
      words.select(col("sid"), col("tgt"),
        posexplode(col("ws")).as(Seq("pos", "tok"))))
    val tgtCounts = stream.filter(col("tgt"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tc"))
    val rawCounts = stream.filter(!col("tgt"))
      .groupBy(col("tok")).agg(count(lit(1)).as("rc"))
    val vocabDf = stream.agg(count_distinct(col("tok")).as("vocab"))
    val scored = stream
      .join(tgtCounts, Seq("tok"), "left")
      .join(rawCounts, Seq("tok"), "left")
      .crossJoin(broadcast(vocabDf))
      .select(col("sid"), col("pos"),
        ((coalesce(col("tc"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("rc"), lit(0L)) + col("vocab")).cast("double")).as("r"))
    val perDoc = scored.groupBy(col("sid"))
      .agg(count(lit(1)).as("n_tokens"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("r")))),
            x => x.getField("r")),
          lit(0.0), (acc, x) => acc + x).as("rsum"))
    docs.select(col(idCol).cast("long").as("sid")).distinct()
      .join(perDoc, Seq("sid"), "left")
      .select(col("sid").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("rsum"), lit(0.0))
          / greatest(coalesce(col("n_tokens"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("imp_score"))
  }
}
