package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl processing — the per-url identity the
  * north rule keys on ("byte-identical extracted text per url") is only
  * stable if equivalent URL spellings collapse to one key first:
  * `HTTP://Host.EXAMPLE.com:80/a//b#frag` and `http://host.example.com/a//b`
  * are the same fetch.
  *
  * Canonical form (deliberately small, deterministic, engine-replicable):
  *  - scheme and host lowercased;
  *  - default ports dropped (`:80` for http, `:443` for https);
  *  - fragment dropped;
  *  - empty path → `/`;
  *  - path and query otherwise preserved byte-for-byte (no percent
  *    re-normalization — that would need a full RFC 3986 table and can
  *    CHANGE fetch semantics on broken servers).
  *
  * Pure Catalyst (regexp_extract + lower + concat — codegen, narrow,
  * zero shuffle), and every regex is RE2-safe so an independent SQL
  * engine canonicalizes identically.
  */
object UrlOps {

  /** scheme://authority[/path][?query][#fragment] splitter (RFC 3986
    * appendix-B shape, bounded alternation-free groups). */
  val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val AuthRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  val QueryRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*(\\?[^#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Raw authority (may include `userinfo@`). */
  private def authority(url: Column): Column = regexp_extract(url, AuthRe, 1)

  /** `userinfo` with CASE PRESERVED (credentials are case-sensitive —
    * lowercasing them would merge distinct fetch identities). */
  def userinfo(url: Column): Column =
    regexp_extract(authority(url), "^([^@]*)@", 1)

  /** host[:port] after the userinfo split, lowercased. */
  def hostPort(url: Column): Column =
    lower(regexp_replace(authority(url), "^[^@]*@", ""))

  def host(url: Column): Column =
    regexp_replace(hostPort(url), ":[0-9]*$", "")

  private def port(url: Column): Column =
    regexp_extract(hostPort(url), ":([0-9]+)$", 1)

  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val ui = userinfo(url)
    val h = host(url)
    val p = port(url)
    val keepPort = p =!= "" &&
      !(sch === "http" && p === "80") && !(sch === "https" && p === "443")
    val path = regexp_extract(url, PathRe, 1)
    val query = regexp_extract(url, QueryRe, 1)
    when(sch === "" || h === "", url) // not scheme://host shaped: pass through
      .otherwise(concat(
        sch, lit("://"),
        when(ui =!= "", concat(ui, lit("@"))).otherwise(lit("")),
        h,
        when(keepPort, concat(lit(":"), p)).otherwise(lit("")),
        when(path === "", lit("/")).otherwise(path),
        query))
  }
}
