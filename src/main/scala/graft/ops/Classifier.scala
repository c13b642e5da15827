package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text-classifier INFERENCE — the fastText shape (Joulin et al.
  * 2016, "Bag of Tricks for Efficient Text Classification"): a document
  * scores as the bias plus the mean of its tokens' learned weights, and
  * the label is the score's sign. This is the quality-classifier gate of
  * CCNet/GPT-3-class pipelines (score against a "looks like the target
  * corpus" linear model, keep/route by label).
  *
  * The MODEL IS A TABLE, (tok, w) — real deployments load trained
  * weights; this repo's tests and driver queries synthesize weights
  * deterministically from token hashes (the multimodal-stub policy:
  * parameters are stand-ins, the Spark-side plumbing — tokenize, model
  * join, ordered fold, thresholds — is real and exactly verified).
  *
  * Reproducibility contract: the score is
  *
  *   score(doc) = round(bias + Σ_pos w(tok_pos) / max(n_tokens, 1), 4)
  *
  * where the weight sum folds token POSITIONS in ascending order from
  * 0.0 (missing-from-model tokens add exactly +0.0), so an independent
  * engine reproduces every double bit-for-bit — the [[Importance]] /
  * [[LmScore]] fold discipline. `positive` compares the ROUNDED score
  * against zero, so the flag never disagrees with the emitted score.
  *
  * Shape at 100 TB: one tokenize pass, one equi-join of the token
  * stream against the model on the token key — the model is a TABLE
  * joined on natural keys, never broadcast (a hashed-vocabulary model
  * can be millions of rows); per-doc state is the doc's own
  * position-ordered weight list, bounded by doc length.
  */
object Classifier {

  /** (idCol, n_tokens, n_hits, score, positive) for every input row.
    * `model` must have columns (tok, w: double); tokens absent from the
    * model contribute weight 0 and do not count as hits. */
  def linearScore(docs: DataFrame, model: DataFrame, bias: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val stream = docs.select(col(idCol).cast("long").as("sid"),
        posexplode(filter(split(coalesce(col(textCol), lit("")), "\\s+"),
          w => length(w) > 0)).as(Seq("pos", "tok")))
    val scored = stream
      .join(model.select(col("tok"), col("w").cast("double").as("w")),
        Seq("tok"), "left")
      .select(col("sid"), col("pos"),
        coalesce(col("w"), lit(0.0)).as("w"),
        col("w").isNotNull.as("hit"))
    val perDoc = scored.groupBy(col("sid"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")),
          lit(0.0), (acc, x) => acc + x).as("wsum"))
    // ids are unique by contract — a distinct() here would pay a full
    // corpus shuffle AND diverge from the oracle on (invalid) dup ids
    docs.select(col(idCol).cast("long").as("sid"))
      .join(perDoc, Seq("sid"), "left")
      .select(col("sid").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(lit(bias) + coalesce(col("wsum"), lit(0.0))
          / greatest(coalesce(col("n_tokens"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("score"))
      .withColumn("positive", col("score") >= 0.0)
  }

  /** Deterministic stand-in model over a corpus' own vocabulary: keep
    * ~60% of distinct tokens (hash mod 5 < 3) with weights uniform on
    * the BINARY-exact rationals k/1024, k ∈ [-1000, 1000] — pure integer
    * derivation plus ONE IEEE division, so both engines materialize
    * identical doubles. The divisor is a power of two ON PURPOSE:
    * decimal-rational weights (k/1000) make mean scores land on exact
    * decimal midpoints, where Spark's shortest-repr HALF_UP round and
    * DuckDB's binary round disagree in the last digit (observed at
    * sf0.001 before the switch). Real deployments replace this table
    * with trained weights. */
  def hashModel(docs: DataFrame, textCol: String = "text"): DataFrame = {
    graft.functions.functions.register(docs.sparkSession)
    import graft.functions.functions.{graft_fnv1a64, graft_mix64}
    val toks = docs.select(explode(
      filter(split(coalesce(col(textCol), lit("")), "\\s+"),
        w => length(w) > 0)).as("tok")).distinct()
    val u = graft_mix64(graft_fnv1a64(col("tok")))
    toks.select(col("tok"), u.as("u"))
      .filter(pmod(col("u"), lit(5L)) < 3L)
      .select(col("tok"),
        ((pmod(col("u"), lit(2001L)) - 1000L).cast("double") / lit(1024.0)).as("w"))
  }
}
