package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a fixed term set — the
  * data-curation use: score training documents against a quality/topic
  * probe query and keep the tail or head (quality-classifier-lite, the
  * relational half of a DSIR-style selection).
  *
  * Exactness design: the classic BM25 idf is ln((N-df+0.5)/(df+0.5)+1);
  * `ln` is a LIBRARY function whose last ulp differs across engines, so
  * cross-engine verification would wobble. This implementation uses the
  * RATIONAL idf' = (N - df + 0.5)/(df + 0.5) + 1 WITHOUT the log —
  * monotone in the same direction, every operation a single IEEE
  * divide/multiply/add in a FIXED order, so an independent SQL engine
  * reproduces the score bit-for-bit. (Rank order per term is identical
  * to log-BM25; the aggregate differs only in term weighting.)
  *
  * Shape at 100 TB: term frequencies come from one narrow pass
  * (conditional aggregation over the split array — no explode shuffle);
  * corpus stats (N, avgdl, df per term) are one tiny aggregate collected
  * to the driver (≤ |terms|+1 values, the bounded-collect pattern) and
  * folded back as literals, keeping the scoring pass itself shuffle-free.
  */
object Ranking {

  val K1 = 1.2
  val B = 0.75
  /** K1 + 1 as a PLAIN decimal literal, not computed: 1.2 + 1.0 in IEEE
    * rounds differently than parsing "2.2", and the SQL verifier embeds
    * the parsed literal. (0.25 = 1 - B and 0.75 are exact binary.) */
  val K1Plus1 = 2.2
  val OneMinusB = 0.25

  /** (idCol, dl, score) — rational-idf BM25 of each doc against `terms`.
    * Fixed-order sum over terms; deterministic across engines. */
  def bm25(docs: DataFrame, terms: Seq[String], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, "terms must be 1..32")
    // duplicate probe terms would silently score differently (the
    // first-occurrence-wins term map gives the second copy tf = 0, and the
    // per-term df aliases collide in the stats row) — reject them
    require(terms.distinct.size == terms.size, "probe terms must be distinct")
    graft.functions.functions.register(docs.sparkSession)
    val toks = split(coalesce(col(textCol), lit("")), " ") // null-safe
    val dl = size(toks).cast("double")

    // one tiny corpus-stats aggregate: N, sum(dl), df per term — built
    // from the SAME `toks` expression as the scoring pass (one tokenizer
    // definition; a desynced copy here would break the bit-exact claim).
    // dl summed as LONG (exact, order-independent); avgdl is then a single
    // IEEE division — bit-identical on any engine.
    val aggCols = Seq(
      count(lit(1)).as("n"),
      sum(size(toks).cast("long")).as("sumdl")) ++
      terms.map(t => sum(when(array_contains(toks, t), 1L)
        .otherwise(0L)).as(s"df_$t"))
    val statsRow = docs.agg(aggCols.head, aggCols.tail: _*).head()
    val n = statsRow.getAs[Long]("n").toDouble
    val avgdl = statsRow.getAs[Long]("sumdl").toDouble / n
    val idf = terms.map { t =>
      val df = statsRow.getAs[Long](s"df_$t").toDouble
      (n - df + 0.5) / (df + 0.5) + 1.0
    }

    // ALL term frequencies in one codegen'd pass (native TermCounts:
    // term→index HashMap probe per token) — the old per-term
    // size(filter(toks, _ === term)) ran up to 32 interpreted lambdas per
    // row, the exact HOF-breaks-codegen defect the r2 bench measured at
    // 3.5× (VERDICT r4 #3). `tc` is projected ONCE; CollapseProject keeps
    // the multi-referenced alias in its own projection, so codegen
    // evaluates the pass a single time per row.
    val withCounts = docs.withColumn("_tc", graft.functions.functions
        .graft_term_counts(toks, array(terms.map(lit): _*)))
    def tf(i: Int): Column = element_at(col("_tc"), i + 1).cast("double")

    // fixed-order: score = s(t1) + s(t2) + ... (never a set-ordered sum);
    // integer tf → double is exact, so the score arithmetic is unchanged
    // from the HOF form bit for bit.
    val perTerm = terms.indices.zip(idf).map { case (i, w) =>
      val f = tf(i)
      lit(w) * (f * lit(K1Plus1)) /
        (f + lit(K1) * (lit(OneMinusB) + lit(B) * dl / lit(avgdl)))
    }
    val score = perTerm.reduceLeft(_ + _)
    withCounts.select(col(idCol), dl.cast("long").as("dl"),
      round(score, 4).as("bm25"))
  }
}
