package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect + redact emails, IPv4
  * addresses and (simple, deterministic) phone patterns before text ships
  * to a training mix — the standard pre-training hygiene pass (C4 and
  * most open-corpus pipelines run exactly this class of regex scrub).
  *
  * Pure Catalyst `regexp_replace` / `regexp_extract_all` — codegen'd,
  * narrow (zero shuffle), so the pass costs one scan at any corpus size.
  * The patterns are RE2-safe (no lookaround/backrefs) so an external SQL
  * engine can verify the scrub bit-for-bit.
  */
object Scrub {

  /** RFC-ish email — deliberately the pragmatic corpus-scrub form.
    * BOUNDED quantifiers: an unbounded `[...]+@` backtracks O(run²) on a
    * long local-part-shaped run with no '@' — a single adversarial 100 KB
    * doc cost ~10¹⁰ regex steps. The local bound is 256 (4× the RFC's 64)
    * so a scrubber that must OVER-approximate still swallows sloppy long
    * local parts whole instead of leaving a PII prefix beside <EMAIL>;
    * worst-case work stays ~256·n (linear-ish) and the bounds are
    * RE2-safe, so the SQL verifier keeps the identical pattern. */
  val EmailRe = "[A-Za-z0-9._%+-]{1,256}@[A-Za-z0-9.-]{1,255}\\.[A-Za-z]{2,24}"

  /** Dotted-quad IPv4 (syntactic; octet range not enforced — scrubbing
    * over-approximates on purpose). */
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** NANP-style phone: +1-XXX-XXX-XXXX / XXX-XXX-XXXX. */
  val PhoneRe = "(\\+1-)?[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Adds pii counts and a redacted text column:
    * (n_emails, n_ipv4, n_phones, clean_text). Redaction order is fixed
    * (emails, then IPs, then phones) so the output is deterministic.
    *
    * COUNT SEMANTICS: the counts are independent per-pattern DETECTIONS on
    * the ORIGINAL text, not redaction tallies — a phone- or IP-shaped
    * substring inside a matched email counts in n_phones/n_ipv4 even though
    * the sequential redaction swallows it into <EMAIL>. This is the
    * detection-audit contract a corpus-hygiene report wants ("how much
    * PII-shaped material did the corpus carry per class"), and the DuckDB
    * oracle states the identical semantics; counting on the progressively
    * redacted text would make each class's count depend on redaction order. */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit("")) // null-safe: counts 0, not null
    docs
      .withColumn("n_emails", size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_ipv4", size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }
}
