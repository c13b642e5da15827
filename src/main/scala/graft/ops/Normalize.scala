package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text normalization for training corpora — the hygiene pass every
  * C4/trafilatura-style pipeline runs before tokenization: strip control
  * characters, collapse whitespace runs, trim, plus line/sentence counts
  * for downstream quality gates.
  *
  * Pure Catalyst `regexp_replace`/`regexp_count`-style expressions —
  * codegen'd, narrow (zero shuffle), one scan at any corpus size. All
  * patterns are RE2-safe (no lookaround/backrefs, bounded semantics) so
  * an external SQL engine verifies the pass bit-for-bit.
  */
object Normalize {

  /** C0 control characters except \t\n\r (which whitespace handling owns). */
  val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

  /** Any whitespace run (space, tab, CR, LF) → one space. */
  val WsRunRe = "[ \\t\\r\\n]+"

  /** Leading/trailing spaces after collapsing. */
  val EdgeWsRe = "(^ )|( $)"

  /** Sentence-ish terminator: ./!/? followed by whitespace or end. The
    * deliberately simple corpus-stat form (no abbreviation model) — both
    * engines state the identical regex. */
  val SentenceEndRe = "[.!?]( |$)"

  /** One match per line that carries at least one non-whitespace char:
    * (start-or-newline) optional inline ws, one content char. Lambda-free
    * (a filter-HOF over split lines would interpret per element) and
    * RE2-safe; ^ is string-start in both engines (no multiline flag), the
    * alternation handles interior lines explicitly. */
  val ContentLineRe = "(^|\\n)[ \\t\\r]*[^ \\t\\n\\r]"

  /** Adds (clean_text, n_lines, n_sentences):
    *  - clean_text: control chars stripped, whitespace runs collapsed to
    *    one space, edges trimmed (empty/null → empty string);
    *  - n_lines: newline-separated non-empty segments of the ORIGINAL
    *    text (the pre-collapse layout signal);
    *  - n_sentences: sentence-terminator count over clean_text. */
  def normalize(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val cleaned =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, ControlRe, ""),
          WsRunRe, " "),
        EdgeWsRe, "")
    docs
      .withColumn("clean_text", cleaned)
      .withColumn("n_lines",
        size(regexp_extract_all(t, lit(ContentLineRe), lit(0))).cast("long"))
      .withColumn("n_sentences",
        size(regexp_extract_all(col("clean_text"), lit(SentenceEndRe), lit(0)))
          .cast("long"))
  }
}
