package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model fluency scoring — the quality signal the
  * CCNet / Gopher / RedPajama pipelines compute with a KenLM perplexity
  * filter: score every document by how predictable its token stream is
  * under a model trained on the corpus itself, then gate or bucket on the
  * score. The model is a Laplace-smoothed order-`n` LM over the corpus:
  *
  *   P(w_i | ctx) = (C_n(ctx, w_i) + 1) / (C_{n-1}(ctx) + V)
  *
  * with C_n = corpus n-gram count, C_{n-1} = corpus count of the
  * (n−1)-token context (over ALL its positions), V = token vocabulary
  * size. The emitted score is the document's MEAN conditional probability
  * (plus a repeated-n-gram hit rate): deliberately log-free — every P is
  * ONE exact IEEE division of integer-valued operands, and the per-doc
  * mean folds the positions in ascending order, so an independent engine
  * reproduces the doubles BIT-FOR-BIT (log/exp differ across libm
  * implementations in final ulps and would break the oracle hash; the
  * mean-probability ordering of documents is monotone enough for a
  * percentile-style quality gate, which is how perplexity filters are
  * actually applied).
  *
  * Shape at 100 TB: the model build is the classic distributed n-gram
  * count — one shuffle keyed by context for C_{n-1} (map-side combined),
  * one by (ctx, cur) for C_n. Scoring explodes each doc's n-gram stream
  * once and shuffle-joins it against C_n and C_{n-1} on their natural
  * keys; the model side is corpus-sized and must NEVER broadcast. V joins
  * in as a one-row frame (broadcast nested loop of a single row), keeping
  * the builder fully lazy. Per-doc state is its own position-ordered
  * probability list (bounded by document length), folded by a single
  * ordered `aggregate`.
  */
object LmScore {

  /** (idCol, n_ngrams, hit_rate, avg_p) for order-`n` (n >= 2):
    *  - n_ngrams: n-token windows in the doc (0 for < n tokens);
    *  - hit_rate: fraction of the doc's n-grams with corpus count >= 2
    *    (repeated ANYWHERE — including twice within this same doc) — an
    *    integer ratio;
    *  - avg_p: mean smoothed conditional probability, position-ordered
    *    fold, rounded to 4 decimals (0.0 for docs with no n-grams).
    *
    * Contexts are the (n−1)-token windows joined with a single space —
    * tokenization splits on whitespace, so the join is collision-free.
    * The denominator counts the context over ALL its corpus positions
    * (including windows with no following token), which at n = 2 is
    * exactly the unigram count — [[bigramFluency]] is the n = 2 case. */
  def ngramFluency(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"ngramFluency needs order n >= 2, got $n")
    val words = docs.select(col(idCol).cast("long").as("sid"),
        filter(split(coalesce(col(textCol), lit("")), "\\s+"),
          w => length(w) > 0).as("ws"))
      // consumed by the context model, the n-gram model AND the scoring
      // stream — one tokenization pass, not three
      .transform(CheckpointScratch.ckpt)
    // vocabulary size as a ONE-ROW frame (not an eager .count() action):
    // the builder stays lazy, and V is consistent with the same input
    // snapshot the models fold (ADVICE r6). The attach is a broadcast
    // nested-loop over a ONE-ROW build side — Spark's scalar-subquery
    // shape, constant work per stream row (a literal join key would just
    // constant-fold back to this plan); the PlanSpec gate pins exactly
    // this shape and still forbids all-pairs joins.
    val vocabDf = words.select(explode(col("ws")).as("tok"))
      .agg(count_distinct(col("tok")).as("vocab"))
    // context stream: every (n-1)-token window at every position
    val ctxStream = words.filter(size(col("ws")) >= n - 1).select(
      explode(transform(sequence(lit(0), size(col("ws")) - (n - 1)),
        i => concat_ws(" ", slice(col("ws"), i + 1, lit(n - 1))))).as("ctx"))
    val ctxCounts = ctxStream.groupBy(col("ctx")).agg(count(lit(1)).as("u"))
    // n-gram stream: (sid, pos, ctx, cur), one row per n-token window
    val grams = words.filter(size(col("ws")) >= n).select(col("sid"),
        explode(transform(sequence(lit(0), size(col("ws")) - n),
          i => struct(i.as("pos"),
            concat_ws(" ", slice(col("ws"), i + 1, lit(n - 1))).as("ctx"),
            element_at(col("ws"), (i + n).cast("int")).as("cur")))).as("g"))
      .select(col("sid"), col("g.pos").as("pos"), col("g.ctx").as("ctx"),
        col("g.cur").as("cur"))
      .transform(CheckpointScratch.ckpt)
    val gramCounts = grams.groupBy(col("ctx"), col("cur")).agg(count(lit(1)).as("b"))
    // P per position: one division of exact integer-valued doubles
    val scored = grams
      .join(gramCounts, Seq("ctx", "cur"))
      .join(ctxCounts, Seq("ctx"))
      .crossJoin(broadcast(vocabDf))
      .select(col("sid"), col("pos"),
        ((col("b") + lit(1)).cast("double") /
          (col("u") + col("vocab")).cast("double")).as("p"),
        (col("b") >= 2).cast("long").as("hit"))
    // per-doc ordered fold: sort by position, then a left fold — the
    // addition ORDER is part of the contract (an unordered double sum is
    // not reproducible across engines, or even across Spark partitionings)
    val perDoc = scored.groupBy(col("sid"))
      .agg(count(lit(1)).as("n_ngrams"), sum(col("hit")).as("hits"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("p")))),
            x => x.getField("p")),
          lit(0.0), (acc, x) => acc + x).as("psum"))
    docs.select(col(idCol).cast("long").as("sid")).distinct()
      .join(perDoc, Seq("sid"), "left")
      .select(col("sid").as(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        round(coalesce(col("hits"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_ngrams"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("hit_rate"),
        round(coalesce(col("psum"), lit(0.0))
          / greatest(coalesce(col("n_ngrams"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("avg_p"))
  }

  /** The order-2 case, with the column names the q_lm_fluency contract
    * fixed before the op generalized: (idCol, n_bigrams, hit_rate, avg_p).
    * At n = 2 the context stream IS the token stream, so C_{n-1} is the
    * unigram count and P = (B + 1) / (U + V) — bit-identical to the
    * original bigram-only implementation. */
  def bigramFluency(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    ngramFluency(docs, 2, idCol, textCol)
      .withColumnRenamed("n_ngrams", "n_bigrams")
}
