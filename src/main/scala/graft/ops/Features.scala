package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature hashing — the "hashing trick" (Weinberger, Dasgupta, Langford,
  * Smola, Attenberg, ICML 2009): project an unbounded token vocabulary
  * into a FIXED D-dimensional sparse vector with dim = h & (D−1) and a
  * ±1 sign drawn from an independent hash bit, so colliding tokens
  * cancel in expectation (the unbiased variant, §3). The classic
  * vocabulary-free featurizer for web-scale classifier training: no
  * dictionary build, no dictionary broadcast, a fixed model width
  * regardless of corpus growth — the property that matters when the
  * corpus is 10^12 documents and a token dictionary would itself be a
  * distributed table ([[Classifier]] keeps the dictionary as a table;
  * this is the other standard deployment).
  *
  * Scale shape: one narrow tokenize → hash pass, then one
  * (id, dim)-keyed partial-aggregating groupBy — per-doc output is
  * bounded by min(doc tokens, D) rows, shuffle keys are fine-grained,
  * and nothing is collected or broadcast. Determinism: dim and sign come
  * from mix64∘fnv1a bits (bit 62 for the sign, disjoint from the dim
  * bits for D ≤ 2^32), so any engine reproduces the exact integer
  * weights from the shared hash.
  */
object Features {

  /** Sparse signed-term-frequency vectors: (idCol, dim, weight) with
    * weight = Σ_occurrences sign(tok) — integer, exact, reproducible.
    * `dims` must be a power of two (the mask-equals-mod trick keeps the
    * signed/unsigned hash domains in agreement). */
  def hashFeatures(docs: DataFrame, dims: Int = 1024, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dims >= 2 && (dims & (dims - 1)) == 0,
      s"dims must be a power of two >= 2, got $dims")
    graft.functions.functions.register(docs.sparkSession)
    import graft.functions.functions.{graft_fnv1a64, graft_mix64}
    docs
      .select(col(idCol), explode(
        filter(split(col(textCol), " "), w => length(w) > 0)).as("tok"))
      .select(col(idCol), graft_mix64(graft_fnv1a64(col("tok"))).as("h"))
      .select(col(idCol), expr(s"h & ${dims - 1}").as("dim"),
        (expr("shiftrightunsigned(h, 62) & 1") * 2L - 1L).as("sg"))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("sg")).as("weight"))
  }

  /** Drop exact-cancellation rows (weight 0) — optional, callers that
    * feed a dot product can keep them harmlessly. */
  def nonZero(features: DataFrame): DataFrame =
    features.filter(col("weight") =!= 0L)
}
