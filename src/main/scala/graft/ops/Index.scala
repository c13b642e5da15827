package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index construction and search over the corpus — the
  * retrieval half of a training-data pipeline (dedup forensics: "which
  * documents contain this leaked string"; curation: conjunctive topic
  * probes; eval: membership checks against benchmark phrases). The
  * index IS relational state: a postings TABLE keyed by term and a
  * dictionary of per-term corpus statistics — the layout every search
  * engine compacts into segment files, kept here as frames so Spark's
  * own clustering sinks ([[graft.spark.Exports]]' range/sort write path)
  * give term-local files with min/max pruning.
  *
  * Shape at 100 TB: [[termStream]] is one narrow pass (posexplode — no
  * shuffle); [[postings]]/[[dictionary]] are single hash aggregations
  * keyed by (term, doc) / term — the one unavoidable index-build
  * shuffle, partitioned by the term key so a later term-probe join
  * co-locates. Searches NEVER rescan text: [[conjunctiveSearch]] pushes
  * an `IsIn(terms)` filter into the postings scan and aggregates
  * doc-keyed; [[phraseSearch]] chains |phrase|−1 equi-joins on the
  * composite (doc, pos+i) key — each join side is one term's postings,
  * pruned at the scan. A skewed stopword probe stays a hash-agg (no
  * per-doc window anywhere).
  */
object Index {

  /** (doc_id, pos, term): the 1-based positional token stream — the raw
    * material of both the index build and phrase matching. Whitespace
    * tokenization, empty tokens dropped WITHOUT closing position gaps
    * (positions index the split, so both engines agree on hostile
    * double-space input). */
  def termStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\\s+"))
          .as(Seq("p0", "term")))
      .filter(length(col("term")) > 0)
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("term"))

  /** The postings table: (term, doc_id, tf, first_pos, last_pos) — one
    * row per (term, document) pair. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    termStream(docs, idCol, textCol)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"))

  /** The dictionary: (term, df, cf) — document frequency and collection
    * frequency per term, one hash agg over the postings. */
  def dictionary(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    postings(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))

  /** Conjunctive (AND) search: documents containing EVERY probe term,
    * with score = total tf over the probe terms and the earliest probe
    * hit position. The probe filter pushes into the postings scan;
    * the match test is a doc-keyed hash agg (distinct-term count =
    * |terms|), never a per-doc window. */
  def conjunctiveSearch(docs: DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    conjunctiveSearchOn(postings(docs, idCol, textCol), terms)

  /** [[conjunctiveSearch]] over an ALREADY-BUILT postings frame — the
    * query path shared by the recompute path and [[IndexStore]]'s
    * stored postings. */
  def conjunctiveSearchOn(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "probe terms must be non-empty")
    require(terms.distinct.size == terms.size, "probe terms must be distinct")
    postings
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nt"), sum(col("tf")).as("score"),
        min(col("first_pos")).as("first_hit"))
      .filter(col("nt") === terms.size.toLong)
      .select(col("doc_id"), col("score"), col("first_hit"))
  }

  /** Exact phrase search: (doc_id, n_matches, first_pos) for documents
    * containing the terms CONSECUTIVELY. |phrase|−1 equi-joins on
    * (doc_id, pos + i) — pure positional index arithmetic, text never
    * rescanned. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrase.size >= 2, "phrase must have at least 2 terms")
    val stream = termStream(docs, idCol, textCol)
    var m = stream.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos").as("start"))
    for (i <- 1 until phrase.size) {
      val nxt = stream.filter(col("term") === phrase(i))
        .select(col("doc_id"), (col("pos") - i.toLong).as("start"))
      m = m.join(nxt, Seq("doc_id", "start"))
    }
    m.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_pos"))
  }

  /** Disjunctive (OR) BM25-ranked retrieval THROUGH the index — the
    * top-k query path over [[postings]], where [[graft.ops.Ranking.bm25]]
    * rescans text narrowly. Same RATIONAL idf' = (N−df+0.5)/(df+0.5)+1
    * (log-free, every float op a single IEEE divide/multiply/add in a
    * FIXED order — an independent SQL engine reproduces scores
    * bit-for-bit).
    *
    * Shape at 100 TB: the probe `IsIn` filter lands on the term stream
    * BEFORE the (term, doc) index shuffle, so only candidate postings
    * shuffle; df comes from a ≤|terms|-row agg of those postings
    * (broadcast); N and Σdl are a one-row scalar attach (the repo's
    * scalar-subquery shape); doc lengths come from the SAME stream
    * definition (one tokenizer — a desynced copy would break the
    * bit-exact claim). The per-doc score folds in LITERAL term order:
    * each per-term conditional agg folds exactly ONE row ((term, doc)
    * is unique in postings), so the only float additions are the fixed
    * t0 + t1 + … chain — never a set-ordered sum. Top-k is a
    * TakeOrderedAndProject on (score DESC, doc_id), never a global sort
    * materialization. */
  def rankedSearch(docs: DataFrame, terms: Seq[String], k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val stream = termStream(docs, idCol, textCol)
    val dls = stream.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // corpus stats: N over ALL docs (zero-token docs count toward N and
    // avgdl even though they can never match) — one-row frame, exact longs
    val doclens = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(dls, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("dl"), lit(0L)).as("dl"))
    rankedSearchOn(postings(docs, idCol, textCol), doclens, terms, k)
  }

  /** [[rankedSearch]] over ALREADY-BUILT (postings, doclens) frames —
    * the query path shared by the recompute path and [[IndexStore]].
    * `doclens` must cover EVERY indexed doc (dl = 0 for empty ones):
    * corpus N and avgdl are derived from it. */
  def rankedSearchOn(postings: DataFrame, doclens: DataFrame,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, "probe terms must be 1..32")
    require(terms.distinct.size == terms.size, "probe terms must be distinct")
    require(k >= 1, s"k must be >= 1, got $k")
    val dls = doclens.select(col("doc_id").cast("long").as("doc_id"),
      col("dl").cast("long").as("dl"))
    val stats = dls.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val p = postings.filter(col("term").isin(terms: _*))
    val dfs = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nD = col("n").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    // avgdl = ONE IEEE division of exact longs; idf', tf-saturation and
    // their product/quotient in the exact order the oracle SQL spells
    val avgdl = col("sumdl").cast("double") / nD
    val idf = (nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0)
    val c = idf * (tfD * lit(Ranking.K1Plus1)) /
      (tfD + lit(Ranking.K1) * (lit(Ranking.OneMinusB) + lit(Ranking.B) * (dlD / avgdl)))
    val scored = p.join(dls, Seq("doc_id"))
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), c.as("c"))
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("c"))).as(s"c_$i") }
    val aggd = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("matched"), perTerm: _*)
    val score = terms.indices
      .map(i => coalesce(col(s"c_$i"), lit(0.0)))
      .reduce(_ + _)
    aggd.select(col("doc_id"), col("matched"), round(score, 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }
}
