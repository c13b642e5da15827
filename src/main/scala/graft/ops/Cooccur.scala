package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed skip-gram CO-OCCURRENCE statistics — the corpus pair-count
  * table embedding training consumes (word2vec/GloVe preprocessing:
  * Mikolov 2013 §2, Pennington 2014's X_ij matrix) and the collocation
  * readout (PMI, Church & Hanks 1990) data cards report.
  *
  * Pairs are DIRECTIONAL: (a, b) counts occurrences of b within `window`
  * positions AFTER a, inside one document — positions come from the one
  * shared tokenizer ([[Index.termStream]]), so gaps from empty tokens
  * behave identically in both engines.
  *
  * PMI is reported LOG-FREE as the ratio p(a,b)/(p(a)p(b)) =
  * n_pair·D / (n_left·n_right) — the repo's discipline: counts stay
  * exact BIGINTs; the ratio is ONE fixed-shape float expression
  * (two casts-then-multiplies and one divide, mirrored token-for-token
  * in the oracle), computed in DOUBLE because the BIGINT cross-product
  * n_pair·D overflows 2^63 at real corpus scale (D ~ 10^13 pairs at
  * 100 TB). Monotone in PMI, so ranking/thresholding is unaffected.
  *
  * Shape at 100 TB: the right side is a bounded ×window explode of the
  * term stream; the pair build is ONE equi-join on the composite
  * (doc, pos) key — O(n·window) rows, never a per-doc window or a
  * text rescan. Marginals and the total derive from the GROUPED pair
  * frame (vocabulary² upper bound, reality far sparser), which is
  * checkpointed once and feeds all three aggregates. */
object Cooccur {

  /** (a, b, n_pair, n_left, n_right, pmi_ratio) for directional pairs
    * with n_pair ≥ minCount. Marginals and the pair total are computed
    * over ALL pairs (pre-threshold) — thresholding only prunes the
    * REPORTED rows, not the probability model. */
  def pairCounts(docs: DataFrame, window: Int = 2, minCount: Long = 1L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && window <= 16, s"window must be 1..16, got $window")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val stream = Index.termStream(docs, idCol, textCol)
    val lefts = stream.select(col("doc_id"), col("pos"), col("term").as("a"))
    val rights = stream.select(col("doc_id"),
      explode(array((1 to window).map(j => col("pos") - j.toLong): _*)).as("pos"),
      col("term").as("b"))
    val pairs = CheckpointScratch.ckpt(
      lefts.join(rights, Seq("doc_id", "pos"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_pair")))
    val la = pairs.groupBy(col("a")).agg(sum(col("n_pair")).as("n_left"))
    val rb = pairs.groupBy(col("b")).agg(sum(col("n_pair")).as("n_right"))
    val d = pairs.agg(sum(col("n_pair")).as("d"))
    pairs.join(la, Seq("a")).join(rb, Seq("b"))
      .crossJoin(broadcast(d))
      .filter(col("n_pair") >= minCount)
      .select(col("a"), col("b"), col("n_pair"), col("n_left"), col("n_right"),
        round(col("n_pair").cast("double") * col("d").cast("double")
          / (col("n_left").cast("double") * col("n_right").cast("double")), 4)
          .as("pmi_ratio"))
  }
}
