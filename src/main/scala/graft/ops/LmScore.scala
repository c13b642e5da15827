package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model fluency scoring — the quality signal the
  * CCNet / Gopher / RedPajama pipelines compute with a KenLM perplexity
  * filter: score every document by how predictable its token stream is
  * under a model trained on the corpus itself, then gate or bucket on the
  * score. Here the model is a Laplace-smoothed bigram LM over the corpus:
  *
  *   P(w_i | w_{i-1}) = (B(w_{i-1}, w_i) + 1) / (U(w_{i-1}) + V)
  *
  * with B = corpus bigram count, U = corpus unigram count, V = vocabulary
  * size. The emitted score is the document's MEAN conditional probability
  * (plus a repeated-bigram hit rate): deliberately log-free — every P is
  * ONE exact IEEE division of integer-valued operands, and the per-doc
  * mean folds the positions in ascending order, so an independent engine
  * reproduces the doubles BIT-FOR-BIT (log/exp differ across libm
  * implementations in final ulps and would break the oracle hash; the
  * mean-probability ordering of documents is monotone enough for a
  * percentile-style quality gate, which is how perplexity filters are
  * actually applied).
  *
  * Shape at 100 TB: the model build is the classic distributed n-gram
  * count — one shuffle keyed by token for U (map-side combined), one by
  * (prev, cur) for B. Scoring explodes each doc's bigram stream once and
  * shuffle-joins it against B and U on their natural keys; the model side
  * is corpus-sized and must NEVER broadcast. Per-doc state is its own
  * position-ordered probability list (bounded by document length), folded
  * by a single ordered `aggregate`.
  */
object LmScore {

  /** (idCol, n_bigrams, hit_rate, avg_p):
    *  - n_bigrams: adjacent token pairs in the doc (0 for < 2 tokens);
    *  - hit_rate: fraction of the doc's bigrams with corpus count >= 2
    *    (repeated ANYWHERE — including twice within this same doc) — an
    *    integer ratio;
    *  - avg_p: mean smoothed conditional probability, position-ordered
    *    fold, rounded to 4 decimals (0.0 for docs with no bigrams). */
  def bigramFluency(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol).cast("long").as("sid"),
        filter(split(coalesce(col(textCol), lit("")), "\\s+"),
          w => length(w) > 0).as("ws"))
      // consumed by the unigram model, the bigram model AND the scoring
      // stream — one tokenization pass, not three
      .transform(CheckpointScratch.ckpt)
    val toks = words.select(col("sid"), posexplode(col("ws")).as(Seq("pos", "tok")))
    // unigram counts + vocabulary size (both corpus-wide, map-side combined)
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("u"))
      .transform(CheckpointScratch.ckpt)
    val vocab = uni.count()
    // bigram stream: (sid, pos, prev, cur), one row per adjacent pair
    val bi = words.filter(size(col("ws")) >= 2).select(col("sid"),
        posexplode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => struct(a.as("prev"), b.as("cur")))).as(Seq("pos", "pc")))
      .select(col("sid"), col("pos"), col("pc.prev").as("prev"), col("pc.cur").as("cur"))
      .transform(CheckpointScratch.ckpt)
    val big = bi.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("b"))
    // P per position: one division of exact integer-valued doubles
    val scored = bi
      .join(big, Seq("prev", "cur"))
      .join(uni.withColumnRenamed("tok", "prev"), Seq("prev"))
      .select(col("sid"), col("pos"),
        ((col("b") + lit(1)).cast("double") /
          (col("u") + lit(vocab)).cast("double")).as("p"),
        (col("b") >= 2).cast("long").as("hit"))
    // per-doc ordered fold: sort by position, then a left fold — the
    // addition ORDER is part of the contract (an unordered double sum is
    // not reproducible across engines, or even across Spark partitionings)
    val perDoc = scored.groupBy(col("sid"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("hit")).as("hits"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("p")))),
            x => x.getField("p")),
          lit(0.0), (acc, x) => acc + x).as("psum"))
    docs.select(col(idCol).cast("long").as("sid")).distinct()
      .join(perDoc, Seq("sid"), "left")
      .select(col("sid").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("hits"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("hit_rate"),
        round(coalesce(col("psum"), lit(0.0))
          / greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("avg_p"))
  }
}
