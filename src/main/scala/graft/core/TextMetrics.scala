package graft.core

/** Text-quality metrics used by the metrics stage (SURVEY §2.4 A7, §2.8).
  *
  * WER/CER reimplement the semantics of jiwer's defaults used by the
  * reference (/root/reference/src/error_rate_detection.py:77-80): edit
  * distance over words / characters divided by reference length. The
  * similarity ratio reimplements difflib.SequenceMatcher.ratio()
  * (Ratcliff-Obershelp) used by the XBRL label matcher
  * (/root/reference/src/xbrl_validate.py:100-101). Pure functions — safe
  * inside typed Dataset ops.
  */
object TextMetrics {

  /** Levenshtein distance over any indexed sequence (two-row DP).
    * Common prefix/suffix are trimmed first: they never change the
    * distance, and the dominant metric-stage case — regression-checking an
    * extractor whose output matches its golden — drops from O(n²) to O(n)
    * (identical inputs reduce to two empty sequences). */
  def editDistance[T](a0: IndexedSeq[T], b0: IndexedSeq[T]): Int = {
    var lo = 0
    val maxLo = math.min(a0.length, b0.length)
    while (lo < maxLo && a0(lo) == b0(lo)) lo += 1
    var aHi = a0.length
    var bHi = b0.length
    while (aHi > lo && bHi > lo && a0(aHi - 1) == b0(bHi - 1)) { aHi -= 1; bHi -= 1 }
    val a = a0.slice(lo, aHi)
    val b = b0.slice(lo, bHi)
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  private def tokens(s: String): IndexedSeq[String] =
    s.split("\\s+").filter(_.nonEmpty).toIndexedSeq

  /** Word error rate: edit distance over whitespace tokens / |ref words|.
    * NaN when the reference is empty and hypothesis is not (jiwer raises;
    * we follow the reference's skip-empty convention upstream). */
  def wer(ref: String, hyp: String): Double = {
    val r = tokens(ref); val h = tokens(hyp)
    if (r.isEmpty) { if (h.isEmpty) 0.0 else Double.NaN }
    else editDistance(r, h).toDouble / r.length
  }

  /** Character error rate: edit distance over chars / |ref chars|. */
  def cer(ref: String, hyp: String): Double = {
    if (ref.isEmpty) { if (hyp.isEmpty) 0.0 else Double.NaN }
    else editDistance(ref, hyp).toDouble / ref.length
  }

  /** difflib.SequenceMatcher.ratio() — Ratcliff-Obershelp: 2·M / (|a|+|b|)
    * where M = total length of matched blocks found by recursive longest
    * common substring. Returns in [0, 1]. */
  def similarityRatio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val m = matchedLength(a, 0, a.length, b, 0, b.length)
    2.0 * m / (a.length + b.length)
  }

  private def matchedLength(a: String, a0: Int, a1: Int, b: String, b0: Int, b1: Int): Int = {
    if (a0 >= a1 || b0 >= b1) return 0
    // longest common substring between a[a0,a1) and b[b0,b1)
    var bestLen = 0
    var bestA = a0
    var bestB = b0
    // DP over suffix match lengths, rolling row
    var prev = new Array[Int](b1 - b0 + 1)
    var cur = new Array[Int](b1 - b0 + 1)
    var i = a0
    while (i < a1) {
      var j = b0
      while (j < b1) {
        val v = if (a.charAt(i) == b.charAt(j)) prev(j - b0) + 1 else 0
        cur(j - b0 + 1) = v
        if (v > bestLen) { bestLen = v; bestA = i - v + 1; bestB = j - v + 1 }
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    if (bestLen == 0) 0
    else bestLen +
      matchedLength(a, a0, bestA, b, b0, bestB) +
      matchedLength(a, bestA + bestLen, a1, b, bestB + bestLen, b1)
  }

  /** Paren-negative numeric parse (P7; xbrl_validate.py:84-97):
    * "(1,234.5)" → -1234.5; "$1,234" → 1234.0; None for non-numeric. */
  def parseNumeric(cell: String): Option[Double] = {
    if (cell == null) return None
    var s = cell.trim
    if (s.isEmpty) return None
    var neg = false
    if (s.startsWith("(") && s.endsWith(")")) { neg = true; s = s.substring(1, s.length - 1) }
    s = s.replace(",", "").replace("$", "").trim
    if (s.isEmpty || !s.matches("-?\\d+(\\.\\d+)?")) None
    else {
      val v = s.toDouble
      Some(if (neg) -v else v)
    }
  }
}
