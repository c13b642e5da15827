package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. All pure
  * Catalyst where possible (codegen); the fingerprint is a typed function
  * (rolling hash has no built-in).
  */
object TextAnalysis {

  /** Whitespace tokens (the WET convention). */
  def tokensCol(text: Column): Column = split(text, " ")

  /** BPE-ish subword count estimate: alpha runs, digit runs, and symbol
    * clusters each count as one token (a cheap deterministic proxy for
    * tokenizer load; match-based so it stays RE2-expressible). */
  val SubtokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"

  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_words", size(tokensCol(col(textCol))).cast("long"))
      .withColumn("n_subtokens",
        size(regexp_extract_all(col(textCol), lit(SubtokenPattern), lit(0))).cast("long"))

  private val stopwords = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "para", "en", "que"))

  /** Quality features + a composite score in [0,1]: length band, mean word
    * length band, stopword presence, alpha ratio (Gopher/C4-style rules). */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val nTok = size(toks).cast("double")
    val meanLen = length(col(textCol)).cast("double") / nTok
    val stopRatio = size(filter(toks, t => t.isin(stopwords("en"): _*))).cast("double") / nTok
    val alphaRatio =
      (length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double") /
        greatest(length(col(textCol)).cast("double"), lit(1.0)))
    docs
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("mean_word_len", round(meanLen, 4))
      .withColumn("stopword_ratio", round(stopRatio, 4))
      .withColumn("alpha_ratio", round(alphaRatio, 4))
      .withColumn("quality_score", round(
        (when(nTok.between(5, 100000), 0.25).otherwise(0.0)) +
        (when(meanLen.between(2.0, 12.0), 0.25).otherwise(0.0)) +
        (when(stopRatio > 0.0, 0.25).otherwise(0.0)) +
        (when(alphaRatio > 0.5, 0.25).otherwise(0.0)), 2))
  }

  /** The Gopher document-quality rule set (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * Appendix A1.1) — THE published repetition-free quality gate most
    * crawl pipelines start from:
    *
    *   - word count in [minWords, maxWords] (paper: 50..100,000);
    *   - mean word length in [3, 10] characters;
    *   - symbol-to-word ratio ('#' or '...') ≤ 0.1;
    *   - ≤ 90% of lines start with a bullet ('-', '*', '•');
    *   - ≤ 30% of lines end with an ellipsis;
    *   - ≥ 80% of words contain at least one alphabetic character;
    *   - at least 2 of the 8 Gopher stop words present
    *     (the, be, to, of, and, that, have, with).
    *
    * Reproducibility: every threshold is evaluated in CROSS-MULTIPLIED
    * BIGINT form (e.g. ratio ≤ 0.1 as 10·symbols ≤ words; mean length in
    * [3,10] as 3·words ≤ chars ∧ chars ≤ 10·words), so the gate is pure
    * integer arithmetic — no float ratio can diverge between engines.
    * Purely narrow (codegen HOFs over the token/line arrays); zero
    * shuffle at any corpus size.
    *
    * Output: docs + the BIGINT signals (n_words, n_word_chars, n_lines,
    * n_symbols, n_bullet_lines, n_ellipsis_lines, n_alpha_words,
    * n_stopwords) + the boolean `keep`. */
  def gopherRules(docs: DataFrame, textCol: String = "text",
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val ws = filter(split(txt, "\\s+"), w => length(w) > 0)
    val lines = filter(transform(split(txt, "\n", -1), l => trim(l)),
      l => length(l) > 0)
    val gopherStops = array(Seq("the", "be", "to", "of", "and", "that",
      "have", "with").map(lit): _*)
    val nW = col("n_words"); val nC = col("n_word_chars"); val nL = col("n_lines")
    docs
      .withColumn("n_words", size(ws).cast("long"))
      .withColumn("n_word_chars",
        aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long")))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_symbols",
        (size(split(txt, "#", -1)) - 1 + size(split(txt, "\\.\\.\\.", -1)) - 1)
          .cast("long"))
      .withColumn("n_bullet_lines",
        size(filter(lines, l => l.rlike("^[-*•]"))).cast("long"))
      .withColumn("n_ellipsis_lines",
        size(filter(lines, l => l.rlike("\\.\\.\\.$"))).cast("long"))
      .withColumn("n_alpha_words",
        size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_stopwords",
        size(filter(gopherStops, s => array_contains(ws, s))).cast("long"))
      .withColumn("keep",
        nW.between(minWords, maxWords) &&
          lit(3L) * nW <= nC && nC <= lit(10L) * nW &&
          lit(10L) * col("n_symbols") <= nW &&
          lit(10L) * col("n_bullet_lines") <= lit(9L) * nL &&
          lit(10L) * col("n_ellipsis_lines") <= lit(3L) * nL &&
          lit(5L) * col("n_alpha_words") >= lit(4L) * nW &&
          col("n_stopwords") >= 2L)
  }

  /** N-gram-profile language ID: score = stopword-set overlap per language,
    * argmax with deterministic tie-break on language code. Pure Catalyst,
    * LAMBDA-FREE: per-language hit counts are codegen'd `array_intersect`
    * projections computed ONCE each, and the argmax is greatest() + a
    * when-chain in language order (ties → alphabetically first, matching
    * the oracle's cascaded CASE). The previous array_sort(comparator)
    * form was an interpreted HOF whose struct-array input was re-evaluated
    * per output column — 4.2 s for 2500 docs at sf0.1 once the noop-sink
    * bench stopped letting count() prune it (r5 finding; same class as
    * the r2 ANN HOF defect). */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val langs = stopwords.keys.toSeq.sorted
    val toksDf = docs.withColumn("_toks",
      array_distinct(tokensCol(lower(col(textCol)))))
    // one projection per concern: _toks is multi-referenced, so
    // CollapseProject keeps it materialized once per row; the hit counts
    // are then cheap column refs for the argmax
    val withHits = langs.foldLeft(toksDf) { (df, lang) =>
      df.withColumn(s"_h_$lang",
        size(array_intersect(col("_toks"), typedLit(stopwords(lang)))))
    }
    // NULL text propagates to m = NULL (size(null) is null in Spark 4):
    // must land in 'und' like zero hits — without the isNull arm the
    // when-chain's otherwise() would claim the row for the LAST language
    val m = greatest(langs.map(l => col(s"_h_$l")): _*)
    val pred = langs.init.foldRight(lit(langs.last): Column) { (l, rest) =>
      when(col(s"_h_$l") === m, lit(l)).otherwise(rest)
    }
    withHits
      .withColumn("pred_lang", when(m.isNull || m === 0, lit("und")).otherwise(pred))
      .withColumn("lang_hits", coalesce(m, lit(0)).cast("long"))
      .drop("_toks" +: langs.map(l => s"_h_$l"): _*)
  }

  /** Rolling polynomial fingerprint over word tokens (Karp-Rabin family):
    * order-sensitive, whitespace-normalized — unlike a raw content hash it
    * is stable under re-serialization of the same token stream. */
  def fingerprint64(text: String): Long = {
    var h = 0L
    val words = (if (text == null) "" else text).split("\\s+")
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) h = h * 0x100000001b3L + Dedup.fnv1a(words(i))
      i += 1
    }
    h
  }

  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame = {
    graft.functions.functions.register(docs.sparkSession)
    docs.withColumn("fingerprint",
      graft.functions.functions.graft_fingerprint64(col(textCol)))
  }

  /** Gopher-style repetition statistics (Rae et al. 2021 §A1.1: fraction
    * of duplicated words / most-common-ngram mass): per doc —
    * n_words, n_distinct_words, dup_word_frac, top_word_frac,
    * top_bigram_frac, and a `repetitive` flag. Relational shape: two
    * explode→groupBy passes whose shuffles carry (doc_id, token-hash)
    * pairs; at corpus scale this is the same cost class as tokenized
    * dedup, and partial aggregation collapses the per-doc counts
    * map-side. */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("rid"), tokensCol(col(textCol)).as("ws"))
    // tokens/bigrams cross the shuffle as xxhash64 LONGS, not strings (the
    // jaccard precedent: 8 bytes/key, collisions ~2⁻⁶⁴ — far below any
    // emitted 4-decimal fraction; counts are hash-insensitive otherwise)
    val words = base.select(col("rid"), explode(col("ws")).as("w"))
      .select(col("rid"), xxhash64(col("w")).as("w"))
      .groupBy(col("rid"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("rid"))
      .agg(sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct_words"),
        max(col("c")).as("top_w"))
    val bigrams = base.select(col("rid"),
        explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("b"))
      .select(col("rid"), xxhash64(col("b")).as("b"))
      .groupBy(col("rid"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("rid"))
      .agg(max(col("c")).as("top_b"), sum(col("c")).as("n_bi"))
    words.join(bigrams, Seq("rid"), "left")
      .select(col("rid").as(idCol),
        col("n_words"), col("n_distinct_words"),
        round(lit(1.0) - col("n_distinct_words").cast("double")
          / col("n_words").cast("double"), 4).as("dup_word_frac"),
        round(col("top_w").cast("double") / col("n_words").cast("double"), 4)
          .as("top_word_frac"),
        round(coalesce(col("top_b"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_bi"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("top_bigram_frac"))
      .withColumn("repetitive",
        col("dup_word_frac") > 0.7 || col("top_bigram_frac") > 0.18)
  }
}
