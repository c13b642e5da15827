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
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "probe terms must be non-empty")
    require(terms.distinct.size == terms.size, "probe terms must be distinct")
    postings(docs, idCol, textCol)
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
}
