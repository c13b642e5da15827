package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-scoped boilerplate line removal — the extraction-tier cleanup the
  * corpus-wide CCNet cut ([[Dedup.cutDuplicateLines]]) cannot express:
  * navigation bars, cookie banners, and footers repeat on MOST PAGES OF
  * ONE HOST but are globally rare (a small site's footer never reaches a
  * corpus-wide `minCount` that is safe against cutting real prose). The
  * trafilatura/jusText deduplication stage keys exactly this way: a line
  * is template boilerplate iff it appears on at least `num/den` of the
  * host's pages and the host has at least `minDocs` pages (small hosts
  * give no statistical signal — a 2-page site's shared line is as likely
  * quotation as template).
  *
  * Counting is per-DOCUMENT (a line repeated ten times inside one page is
  * repetition, not template evidence — [[TextAnalysis]] scores that), and
  * the dedup key is the normalized line (trim + lowercase, the CCNet
  * convention) while the ORIGINAL line text is what gets cut or kept.
  * Blank lines are KEPT — this op removes templates, not whitespace
  * (contrast [[Dedup.cutDuplicateLines]], which drops blanks: the two
  * run at different pipeline stages).
  *
  * Shape at 100 TB (the [[Dedup.cutDuplicateLines]] discipline): line
  * TEXT never crosses a shuffle — the explode emits (doc, host, pos,
  * 8-byte key hash); per-(host, hash) document counts partial-aggregate
  * map-side after an in-doc distinct; host page counts are a host-scale
  * frame joined on the host key; the boilerplate set joins back on
  * (host, hash) — never broadcast, template sets are host-count-sized;
  * and only sorted CUT POSITIONS return to the doc row, where one scalar
  * pass rebuilds the text. xxhash64 of the normalized key stands in for
  * the key itself (collisions ~2⁻⁶⁴). `idCol` must be unique (the
  * doc-keyed-op contract shared with [[Dedup.cutDuplicatedSpans]]). */
object Boilerplate {

  /** Cut every line that is host-template boilerplate: appears in
    * ≥ num/den of the host's docs (distinct-doc count, integer
    * cross-multiplied — no float compare) on a host with ≥ minDocs docs.
    * Output: (idCol, clean_text, n_lines, n_cut_lines) — one row per
    * input row, text rebuilt in original line order. */
  def cutHostBoilerplate(docs: DataFrame, hostCol: String = "source",
      minDocs: Int = 3, num: Int = 1, den: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    require(num >= 1 && den >= 1 && num <= den,
      s"need a fraction 0 < num/den <= 1, got $num/$den")
    // null-host rows must still dedup against each other, but an equi-join
    // never matches null keys — coalesce to a sentinel no real host uses
    val hostKey = coalesce(col(hostCol).cast("string"), lit("\u0000"))
    val hashed = docs.select(col(idCol).cast("long").as("sid"),
        hostKey.as("host"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("pos", "line")))
      .select(col("sid"), col("host"), col("pos"),
        lower(trim(col("line"))).as("key"))
      // blank key → null hash: never template evidence, never cut
      .select(col("sid"), col("host"), col("pos"),
        when(col("key") === "", lit(null).cast("long"))
          .otherwise(xxhash64(col("key"))).as("kh"))
      // consumed twice (per-host doc counts + boilerplate-position join)
      .transform(CheckpointScratch.ckpt)
    // host page counts: one row per host (null hosts form their own group
    // deliberately — a hostless slice still deduplicates against itself)
    val hostDocs = docs.groupBy(hostKey.as("host"))
      .agg(count(lit(1)).as("n_docs"))
    // distinct-doc evidence: one vote per (doc, host, key)
    val boiler = hashed.filter(col("kh").isNotNull)
      .select(col("sid"), col("host"), col("kh")).distinct()
      .groupBy(col("host"), col("kh")).agg(count(lit(1)).as("c"))
      .join(hostDocs, Seq("host"))
      .filter(col("n_docs") >= minDocs.toLong &&
        col("c") * lit(den.toLong) >= lit(num.toLong) * col("n_docs"))
      .select(col("host"), col("kh"))
    val cuts = hashed.join(boiler, Seq("host", "kh"))
      .groupBy(col("sid"))
      .agg(sort_array(collect_list(col("pos"))).as("cuts"))
    val rebuild = udf((t: String, cuts: Seq[Int]) =>
      Dedup.rebuildWithoutLines(t, if (cuts == null) Seq.empty else cuts))
    docs.select(col(idCol).cast("long").as("sid"), col(textCol).as("t"))
      .join(cuts, Seq("sid"), "left")
      .withColumn("res", rebuild(col("t"), col("cuts")))
      .select(col("sid").as(idCol), col("res._1").as("clean_text"),
        col("res._2").as("n_lines"), col("res._3").as("n_cut_lines"))
  }
}
