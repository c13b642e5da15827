package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics over the crawl — host-level PageRank (Page et
  * al. 1999), the standard crawl-frontier / quality prior every
  * web-corpus pipeline computes over its host graph (Common Crawl
  * publishes exactly this as its host-level ranking).
  *
  * Bit-exactness discipline: the oracle contract of this repo demands
  * doubles that an independent engine reproduces EXACTLY, so every
  * floating-point reduction is a deterministic ordered fold, never a
  * partition-order `sum()`:
  *
  *  - each contribution pr(u)/outdeg(u) is ONE IEEE division;
  *  - the per-node in-sum folds contributions in a fixed TWO-LEVEL tree:
  *    contributions grouped by src % dmBuckets, folded in ascending src
  *    order within the bucket, bucket partials folded in ascending
  *    bucket order. The two-level tree is also the HUB-SAFETY shape: a
  *    mega-in-degree node (every page links to the top host) folds in
  *    `dmBuckets` bounded tasks instead of one giant ordered list —
  *    the same salted-sub-shard discipline as the packing fold;
  *  - the dangling mass (rank held by nodes with no out-links) is the
  *    same two-level tree over node id, so the global scalar is exact
  *    and independent of partitioning;
  *  - the update pr'(v) = (1−d)/n + d·(inSum(v) + dm/n) is written as
  *    one fixed expression tree on both engines.
  *
  * Shape at 100 TB: per iteration, one equi-join of edges against the
  * rank frame on src (edges and outdeg co-partition on src), one
  * shuffle keyed (dst, src-bucket), one keyed dst, one left join back
  * to the node set. Rank and degree frames are node-keyed and NEVER
  * broadcast; the only broadcasts are one-row scalars (node count,
  * dangling mass — the LM vocab-attach shape). Each iteration is
  * checkpointed so plans stay flat and convergence is O(iters) jobs.
  */
object Graph {

  /** Host-level link edges extracted from raw HTML — the edge list a
    * crawl pipeline's [[pageRank]] actually consumes. Hrefs come from the
    * streaming tokenizer's attribute channel (full quote/entity handling,
    * NOT a regex over markup); only absolute http(s) targets produce
    * edges — relative links are same-host navigation, not host-graph
    * signal. Purely narrow flatMap over pages (hostile HTML yields fewer
    * hrefs, never a throw); host canonicalization and the per-pair
    * distinct are relational. Output: (src_host, dst_host) distinct. */
  def hostLinkEdges(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val hrefs = pages
      .select(col(urlCol).cast("string"), col(htmlCol).cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (u, html) =>
        if (u == null || html == null) Iterator.empty
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          val sink = new graft.core.HtmlTokenizer.Sink {
            override def wantsAttrs: Boolean = true
            override def attr(tag: String, name: String, value: String): Unit =
              if (tag == "a" && name == "href" && value.nonEmpty) out += value
            def startTag(n: String, sc: Boolean): Unit = ()
            def endTag(n: String): Unit = ()
            def textChunk(s: String, a: Int, b: Int): Unit = ()
            def textStr(s: String): Unit = ()
          }
          try graft.core.HtmlTokenizer.tokenize(html, sink)
          catch { case _: Exception => } // hostile markup: keep what parsed
          out.iterator.map(h => (u, h))
        }
      }.toDF("u", "href")
    hrefs.filter(col("href").rlike("^[Hh][Tt][Tt][Pp][Ss]?://"))
      .select(UrlOps.host(col("u")).as("src_host"),
        UrlOps.host(col("href")).as("dst_host"))
      .filter(col("src_host").isNotNull && col("dst_host").isNotNull &&
        col("src_host") =!= lit("") && col("dst_host") =!= lit(""))
      .distinct()
  }

  /** Anchor-text extraction — (src_host, dst_host, anchor) for every
    * absolute http(s) link with non-empty link text. Anchor text is the
    * classic off-page signal of web corpora (it describes the TARGET —
    * Craswell et al. 2001, "Effective site finding using link anchor
    * information"); crawl pipelines aggregate it per target host as a
    * quality/topic prior.
    *
    * Capture is pure SINK STATE over the streaming tokenizer — href
    * from the attribute channel (fires before startTag), text chunks +
    * decoded entities accumulate while an <a> is open, inner markup
    * (<b>…</b>) is transparent, a new <a> auto-closes the open one
    * (the HTML parsing rule), an unclosed trailing anchor is dropped,
    * and the buffer is budget-capped so a hostile giant anchor cannot
    * balloon a task. Whitespace-normalization and host derivation stay
    * relational. Narrow flatMap — zero shuffle. */
  def anchorTexts(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html", maxAnchorChars: Int = 4096): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val raw = pages
      .select(col(urlCol).cast("string"), col(htmlCol).cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (u, html) =>
        if (u == null || html == null) Iterator.empty
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          val sink = new graft.core.HtmlTokenizer.Sink {
            private var href: String = null      // open anchor's target
            private var pending: String = null   // seen on attr, not yet started
            private val buf = new java.lang.StringBuilder
            private def emit(): Unit = {
              if (href != null) out += ((href, buf.toString))
              href = null; buf.setLength(0)
            }
            override def wantsAttrs: Boolean = true
            override def attr(tag: String, name: String, value: String): Unit =
              if (tag == "a" && name == "href") pending = value
            def startTag(n: String, sc: Boolean): Unit = {
              if (n == "a") {
                emit() // a new <a> auto-closes an open one
                if (!sc && pending != null && pending.nonEmpty) href = pending
              }
              pending = null
            }
            def endTag(n: String): Unit = if (n == "a") emit()
            private def room: Int =
              if (href == null) 0 else maxAnchorChars - buf.length
            def textChunk(s: String, a: Int, b: Int): Unit = {
              val r = room
              if (r > 0) buf.append(s, a, math.min(b, a + r))
            }
            def textStr(s: String): Unit = if (room >= s.length) buf.append(s)
          }
          try graft.core.HtmlTokenizer.tokenize(html, sink)
          catch { case _: Exception => } // hostile markup: keep what parsed
          out.iterator.map { case (h, t) => (u, h, t) }
        }
      }.toDF("u", "href", "raw")
    raw.filter(col("href").rlike("^[Hh][Tt][Tt][Pp][Ss]?://"))
      .select(UrlOps.host(col("u")).as("src_host"),
        UrlOps.host(col("href")).as("dst_host"),
        regexp_replace(trim(col("raw")), "\\s+", " ").as("anchor"))
      .filter(col("src_host").isNotNull && col("dst_host").isNotNull &&
        col("src_host") =!= lit("") && col("dst_host") =!= lit("") &&
        col("anchor") =!= lit(""))
  }

  /** Per-target-host anchor profile: (dst_host, n_links, n_anchors,
    * top_anchor) with top = most frequent text, ties to the
    * lexicographically smallest — a declarative min(struct(-count,
    * anchor)) argmax over two hash aggregations, no Window. */
  def anchorSummary(anchors: DataFrame): DataFrame = {
    val counts = anchors.groupBy(col("dst_host"), col("anchor"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("dst_host"))
      .agg(sum(col("c")).as("n_links"),
        count(lit(1)).as("n_anchors"),
        min(struct((-col("c")).as("nc"), col("anchor").as("a"))).as("top"))
      .select(col("dst_host"), col("n_links"), col("n_anchors"),
        col("top").getField("a").as("top_anchor"))
  }

  /** Two-level ordered fold tree: (groupCols…) → exact double sum of
    * `valC` folded by `keyC` within `pmod(keyC, buckets)` sub-folds.
    * Returns the level-1 frame (groupCols, __bk, __s). Shared with the
    * gradient folds in [[Train]]. */
  private[ops] def foldLevel1(df: DataFrame, groupCols: Seq[Column], keyC: Column,
      valC: Column, buckets: Int): DataFrame =
    df.groupBy(groupCols :+ pmod(keyC, lit(buckets.toLong)).as("__bk"): _*)
      .agg(orderedFold(keyC, valC).as("__s"))

  /** Exact ordered double fold: sort (k, v) pairs by k, left-fold v from
    * 0.0 — addition order is part of the contract. Shared with the other
    * bit-exact float reductions in this package (k-means centroid sums). */
  private[ops] def orderedFold(keyC: Column, valC: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(keyC.as("k"), valC.as("v")))),
        x => x.getField("v")),
      lit(0.0), (acc, x) => acc + x)

  /** PageRank over an edge list with damping `d` for a FIXED number of
    * iterations (fixed-iteration form so results are a pure function of
    * the input — the auditable variant; convergence-threshold stopping
    * would make results depend on float comparisons mid-stream).
    * Multi-edges are collapsed (DISTINCT) so each (src, dst) link
    * contributes once; self-loops are legal edges and contribute to
    * their own node. Nodes = src ∪ dst; dangling nodes (no out-edges)
    * redistribute their mass uniformly each iteration.
    *
    * Output: (node, pr) with pr the exact unrounded double after
    * `iters` updates. `dmBuckets` sizes the fold tree's fan-in: both
    * sub-fold width (|in-degree|/dmBuckets per task) and top-fold width
    * (dmBuckets entries in one array) — at web scale size it so both
    * stay in-memory (e.g. 1024 for 1e9-host graphs). */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      dmBuckets: Int = 16): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    require(dmBuckets >= 1, s"dmBuckets must be >= 1, got $dmBuckets")
    val e = CheckpointScratch.ckpt(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct())
    val nodes = CheckpointScratch.ckpt(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val outdeg = CheckpointScratch.ckpt(
      e.groupBy(col("src")).agg(count(lit(1)).as("od")))
    // loop-invariant hoist: every iteration joined edges against outdeg
    // to divide contributions — attach od to the edge list ONCE so each
    // step pays a single pr join instead of two
    val eOd = CheckpointScratch.ckpt(e.join(outdeg, Seq("src")))
    // node count: ONE exact long to the driver (bounded scalar — the
    // k-means-centroid precedent), folded back as a literal. The former
    // one-row nF frame was crossJoin-broadcast twice per iteration plus
    // once at init — five broadcast builds of a single long per 4-iter
    // run, pure scheduler overhead at any scale.
    val n = nodes.count()
    val d = damping

    var pr = CheckpointScratch.ckpt(
      nodes.select(col("node"), (lit(1.0) / lit(n.toDouble)).as("pr")))
    // static plan scope for the fixed-shape iteration loop: the per-round
    // plan is identical every round and its inputs (eOd, pr) are already
    // materialized, so the shuffle layout is derived ONCE from the
    // edge-with-degree frame's exact byte size instead of AQE re-planning
    // (and re-scheduling a job per exchange) every round — the loop body
    // collapses to one job per iteration. Folds are keyed two-level trees,
    // partition-independent by contract.
    val loopBytes = CheckpointScratch.materializedBytes(eOd)
    CheckpointScratch.withStaticLoopPlan(edges.sparkSession, loopBytes) {
      for (_ <- 1 to iters)
        pr = CheckpointScratch.ckpt(step(eOd, nodes, outdeg, n, pr, d, dmBuckets))
    }
    pr
  }

  /** One un-checkpointed power-iteration update — the plan the per-round
    * ckpt hides from `explain`, exposed so the plan gates can pin its
    * shape (equi-joins + keyed folds only; one-row scalar broadcasts). */
  private[graft] def step(eOd: DataFrame, nodes: DataFrame, outdeg: DataFrame,
      n: Long, pr: DataFrame, d: Double, dmBuckets: Int): DataFrame = {
    val nD = lit(n.toDouble)
    // eOd = edges with the source's out-degree pre-attached (loop
    // invariant — joined once in pageRank, not once per iteration)
    val contribs = eOd
      .join(pr.withColumnRenamed("node", "src"), Seq("src"))
      .select(col("dst"), col("src"),
        (col("pr") / col("od").cast("double")).as("c"))
    val inSum = foldLevel1(contribs, Seq(col("dst")), col("src"), col("c"),
        dmBuckets)
      .groupBy(col("dst"))
      .agg(orderedFold(col("__bk"), col("__s")).as("insum"))
    val dangling = pr.join(outdeg.withColumnRenamed("src", "node"),
      Seq("node"), "left_anti")
    val dmF = foldLevel1(dangling, Nil, col("node"), col("pr"), dmBuckets)
      .agg(orderedFold(col("__bk"), col("__s")).as("dm"))
    nodes.join(inSum.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .crossJoin(broadcast(dmF))
      .select(col("node"),
        ((lit(1.0) - lit(d)) / nD +
          lit(d) * (coalesce(col("insum"), lit(0.0)) + col("dm") / nD))
          .as("pr"))
  }
}
