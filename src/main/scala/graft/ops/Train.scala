package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality-classifier TRAINING — the in-engine counterpart of
  * [[Classifier.linearScore]]: full-batch gradient descent on squared
  * loss over bag-of-words features, the standard way web pipelines
  * distill expensive quality judgments (human labels, LLM judges, or —
  * here — the handcrafted Gopher/C4-style rule score) into a linear
  * model cheap enough to gate 100 TB (the CCNet / GPT-3 quality-filter
  * recipe: train linear, score everything).
  *
  * Model: pred(d) = b + Σ_tok w(tok) · x(d,tok), with features
  * x(d,tok) = count(tok in d) / n_tokens(d) — EXACTLY the feature map
  * [[Classifier.linearScore]] evaluates (its mean-of-position-weights
  * score equals Σ w·cnt/n), so a model trained here deploys on the
  * existing inference path unchanged.
  *
  * Updates (squared loss, fixed `iters`, w≡0, b=0 init — results are a
  * pure function of the input, the fixed-iteration discipline of
  * [[Graph.pageRank]] / the k-means fold):
  *
  *   err(d)  = pred(d) − y(d)
  *   w(tok) −= lr · foldΣ_d err(d)·x(d,tok) / n
  *   b      −= lr · foldΣ_d err(d)          / n
  *
  * Bit-exactness discipline (the repo's oracle contract — every double
  * reproducible by an independent engine): x is ONE IEEE division of
  * exact integers; the per-doc prediction folds w·x in ascending TOKEN
  * order from 0.0; each gradient folds err·x in the two-level
  * (pmod(doc_id, gradBuckets) → doc_id) tree of [[Graph.orderedFold]] —
  * which is also HUB SAFETY: a stopword appearing in every document
  * folds in `gradBuckets` bounded tasks, never one giant ordered list;
  * the bias gradient is the same tree over all docs. lr and labels
  * should be exact dyadic rationals so update arithmetic stays
  * platform-independent.
  *
  * Shape at 100 TB: the (doc, tok, x) frame is built in ONE NARROW pass
  * — bag-of-words counts are per-document-local, so the per-doc count
  * map and token total come from a single projection with no shuffle
  * (the r9 rework: the earlier explode → groupBy(did, tok) → join(nd)
  * form paid a corpus-scale shuffle plus a doc-keyed join for numbers a
  * map task already had) — and checkpointed once. Each iteration is one
  * equi-join of that frame against the token-keyed weight frame
  * (vocab-scale, NEVER broadcast — the [[Classifier]] model-as-a-table
  * discipline), one per-doc fold, one per-token two-level fold. The doc
  * count n and the running bias are driver SCALARS (one exact long and
  * one double — the bounded-collect class of the k-means centroids):
  * carrying them as one-row broadcast frames cost two broadcast builds
  * per iteration and a one-row checkpoint, pure scheduler overhead at
  * any scale. Per-iteration checkpoints keep plans flat.
  */
object Train {

  /** Per-doc (token → count) bag — one narrow pass, the map a combining
    * shuffle would build anyway, computed where the doc already is. */
  private val tokenBag = udf((text: String) => {
    val m = new scala.collection.mutable.HashMap[String, Long]()
    val words = (if (text == null) "" else text).split("\\s+")
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) m.update(w, m.getOrElse(w, 0L) + 1L)
      i += 1
    }
    m.toMap
  })

  /** Train `iters` full-batch GD steps. `docs` must carry idCol, textCol
    * and a numeric `labelCol` (the regression target; use exact values
    * like 0.0/1.0). Returns the trained model: (tok, w) rows plus ONE
    * bias row with tok = NULL — split it with `tok IS NULL` or feed the
    * token rows straight to [[Classifier.linearScore]] with the bias. */
  def linearFit(docs: DataFrame, labelCol: String, iters: Int, lr: Double,
      idCol: String = "doc_id", textCol: String = "text",
      gradBuckets: Int = 16): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(gradBuckets >= 1, s"gradBuckets must be >= 1, got $gradBuckets")
    val base = CheckpointScratch.ckpt(
      docs.select(col(idCol).cast("long").as("did"),
        col(labelCol).cast("double").as("y"),
        col(textCol).as("__text")))
    // x = count(tok)/n_tokens per doc: both operands of the one IEEE
    // division come from the same narrow projection (the token total is
    // the sum of the bag's counts — computed by the engine's own split
    // so the tokenizer definition is shared with the fold contract)
    val x = base.select(col("did"),
        size(filter(split(coalesce(col("__text"), lit("")), "\\s+"),
          w => length(w) > 0)).cast("long").as("nt"),
        explode(tokenBag(col("__text"))).as(Seq("tok", "c")))
      .select(col("did"), col("tok"),
        (col("c").cast("double") / col("nt").cast("double")).as("x"))
    val labels = base.select(col("did"), col("y"))
    linearFitOn(x, labels, iters, lr, gradBuckets)
  }

  /** Train on a PREPARED feature frame — the entry the hashing-trick
    * deployment uses ([[Features.hashFeatures]] → normalize → fit), and
    * the seam any other featurizer plugs into. `x` must carry
    * (did: long, tok, x: double) where `tok` is the feature key of ANY
    * orderable type (string tokens, hashed BIGINT dims — the fold
    * ordering contract only needs a total order shared with the
    * verifying engine); `labels` is (did, y) over ALL docs (docs absent
    * from `x` regress against the bias alone). Returns (tok, w) rows
    * plus one bias row with tok = NULL, typed like `x`'s tok. */
  def linearFitOn(x0: DataFrame, labels0: DataFrame, iters: Int, lr: Double,
      gradBuckets: Int = 16): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(gradBuckets >= 1, s"gradBuckets must be >= 1, got $gradBuckets")
    val x = CheckpointScratch.ckpt(x0.select(col("did"), col("tok"), col("x")))
    val labels = CheckpointScratch.ckpt(
      labels0.select(col("did"), col("y").cast("double").as("y")))
    // doc count: ONE exact long to the driver (bounded scalar state —
    // the k-means-centroid precedent); folded back as a literal instead
    // of a one-row broadcast frame rebuilt twice per iteration
    val n = labels.count()
    val tokType = x.schema("tok").dataType

    var w = CheckpointScratch.ckpt(
      x.select(col("tok")).distinct().select(col("tok"), lit(0.0).as("w")))
    var b = 0.0
    // NOT wrapped in CheckpointScratch.withStaticLoopPlan (unlike the
    // pagerank/pointer-jump loops): the GD iteration carries real task
    // CPU whose stage sizes differ ~10x between the wx join and the
    // gradient folds, and AQE's per-exchange coalescing measurably beats
    // any single static partition count here (r9 session-2 A/B: static
    // p=1 serialized the folds, parallelism-first p was a wash — while
    // the latency-bound loops won outright).
    for (it <- 1 to iters) {
      // iteration 1 runs with w ≡ 0, b = 0: every per-doc prediction fold
      // is a left fold of exact 0.0 terms (= 0.0), so pred(d) = b for all
      // docs — `wIsZero` lets step skip the wx join + per-doc fold while
      // producing the bit-identical error frame
      val (wN, bN) = step(x, labels, n, w, b, lr, gradBuckets, wIsZero = it == 1)
      w = CheckpointScratch.ckpt(wN)
      b = bN
    }
    w.select(col("tok"), col("w"))
      .union(labels.sparkSession.range(1)
        .select(lit(null).cast(tokType).as("tok"), lit(b).as("w")))
  }

  /** One un-checkpointed GD update — exposed (like [[Graph.step]]) so
    * the plan gates can pin its shape: equi-joins on did/tok keys, keyed
    * two-level folds, scalars as literals, no Window, no cartesian.
    * Returns (new weight frame, new bias). The error frame is
    * checkpointed internally — it feeds BOTH gradients and would
    * otherwise recompute the prediction fold; the bias gradient is a
    * one-row collect off that materialized frame (same fold tree, same
    * IEEE order — bit-identical to the former one-row-frame plumbing). */
  private[graft] def step(x: DataFrame, labels: DataFrame, n: Long,
      w: DataFrame, b: Double, lr: Double,
      gradBuckets: Int, wIsZero: Boolean = false): (DataFrame, Double) = {
    val nD = n.toDouble
    // pred(d) = b + fold_{tok asc}(w·x) ; docs with no tokens get b.
    // When the caller KNOWS w ≡ 0 (the first GD iteration), the fold is a
    // left fold of exact 0.0 terms — identically +0.0 for every doc (and
    // coalesce(NULL, 0.0) for token-free docs), so pred = b + 0.0 = b
    // with b = 0.0: the error frame below is bit-identical to the joined
    // form, without the vocab join and per-doc fold.
    val err = CheckpointScratch.ckpt(
      if (wIsZero)
        labels.select(col("did"),
          (lit(b) + lit(0.0) - col("y")).as("e"))
      else {
        val wx = x.join(w, Seq("tok"))
          .select(col("did"), col("tok"), (col("w") * col("x")).as("wx"))
        val predSum = wx.groupBy(col("did"))
          .agg(Graph.orderedFold(col("tok"), col("wx")).as("ps"))
        labels.join(predSum, Seq("did"), "left")
          .select(col("did"),
            (lit(b) + coalesce(col("ps"), lit(0.0)) - col("y")).as("e"))
      })
    // per-token gradient: two-level (doc-bucket → doc) ordered fold
    val ex = x.join(err, Seq("did"))
      .select(col("tok"), col("did"), (col("e") * col("x")).as("ex"))
    val grad = Graph.foldLevel1(ex, Seq(col("tok")), col("did"), col("ex"),
        gradBuckets)
      .groupBy(col("tok"))
      .agg(Graph.orderedFold(col("__bk"), col("__s")).as("g"))
    val wN = w.join(grad, Seq("tok"), "left")
      .select(col("tok"),
        (col("w") - lit(lr) * (coalesce(col("g"), lit(0.0)) / lit(nD))).as("w"))
    val gb = Graph.foldLevel1(err, Nil, col("did"), col("e"), gradBuckets)
      .agg(Graph.orderedFold(col("__bk"), col("__s")).as("gb"))
      .head().getDouble(0)
    (wN, b - lr * (gb / nD))
  }
}
