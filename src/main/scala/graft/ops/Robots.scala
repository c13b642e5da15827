package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt PARSING + GATE — the crawl-politeness filter every
  * Common-Crawl-style pipeline applies before keeping a fetched page
  * (RFC 9309 subset for the `*` user-agent).
  *
  * Semantics (RFC 9309): rules come from the group(s) whose User-agent
  * line set includes `*`; per URL the LONGEST matching path prefix wins
  * and Allow beats Disallow on a length tie; an URL matching no rule —
  * or a host with no robots rules at all — is allowed. Empty patterns
  * match nothing (§2.2.2) and are dropped at parse.
  *
  * Parser discipline = the WARC/Xlsx source class: a JDK-only line
  * scanner in a typed flatMap, comments (#…) stripped, CRLF/CR/LF all
  * tolerated, keys case-insensitive, unknown directives skipped,
  * stacked User-agent lines form one group and a User-agent line AFTER
  * rules starts a NEW group. Hostile input yields fewer rules, never a
  * throw.
  *
  * Scale shape: the rules table is robots-scale (one row per host ×
  * rule — crawl-HOST cardinality, not corpus cardinality); the gate is
  * one equi-join of pages against rules on the host key plus a
  * two-phase hash-agg argmax (max of a (length, allow) struct — the
  * clusterRepresentatives declarative-argmax shape, no Window). A page
  * on a rule-less host crosses the join unmatched and defaults to
  * allowed.
  */
object Robots {

  /** (isAllow, prefix) rules for user-agent `*` from one robots.txt
    * body. Never throws. */
  def parseBody(body: String): Seq[(Boolean, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var agentsSawStar = false
    var inRules = false // a rule line closed the current user-agent stanza
    body.split("\r\n|\n|\r", -1).foreach { raw =>
      val noComment = {
        val i = raw.indexOf('#')
        if (i >= 0) raw.substring(0, i) else raw
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val key = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(ci + 1).trim
          key match {
            case "user-agent" =>
              if (inRules) { agentsSawStar = false; inRules = false }
              if (value == "*") agentsSawStar = true
            case "disallow" | "allow" =>
              inRules = true
              if (agentsSawStar && value.nonEmpty)
                out += ((key == "allow", value))
            case _ => () // crawl-delay, sitemap, … — ignored, stanza intact
          }
        }
      }
    }
    out.toSeq
  }

  /** Parse per-host robots bodies into the rules table
    * (hostCol, is_allow, prefix). Null host/body rows yield no rules. */
  def parseRobots(robots: DataFrame, hostCol: String = "host",
      bodyCol: String = "body"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"), col(bodyCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (host, body) =>
        if (host == null || body == null) Iterator.empty
        else parseBody(body).iterator.map { case (a, p) => (host, a, p) }
      }.toDF(hostCol, "is_allow", "prefix")
  }

  /** Gate pages through the rules: the input's columns plus `allowed`.
    * `rules` must be (host, is_allow, prefix) — [[parseRobots]] output. */
  def robotsGate(pages: DataFrame, rules: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val path0 = regexp_extract(col(urlCol), UrlOps.PathRe, 1)
    val p = pages.withColumn("__host", UrlOps.host(col(urlCol)))
      .withColumn("__path", when(path0 === "", lit("/")).otherwise(path0))
    val r = rules.select(col("host").as("__host"),
      col("is_allow").cast("boolean").as("__a"), col("prefix").as("__p"))
    // per-URL winner: longest prefix, allow beats disallow on the tie —
    // a declarative two-phase argmax, never a Window over the host group
    val hits = p.select(col(urlCol).as("__url"), col("__host"), col("__path"))
      .join(r, Seq("__host"))
      .filter(col("__path").startsWith(col("__p")))
      .groupBy(col("__url"))
      .agg(max(struct(length(col("__p")).as("l"),
        col("__a").cast("int").as("a"))).as("__win"))
      .select(col("__url"), (col("__win").getField("a") === 1).as("__wa"))
    p.join(hits, p(urlCol) === hits("__url"), "left")
      .select(pages.columns.map(col) :+
        coalesce(col("__wa"), lit(true)).as("allowed"): _*)
  }
}
