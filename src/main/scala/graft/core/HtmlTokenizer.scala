package graft.core

import java.nio.charset.{Charset, StandardCharsets}

/** Streaming HTML tokenizer over raw bytes.
  *
  * Brand-new implementation (no reference analogue — the reference parses
  * PDFs only; the HTML payload family is our Common-Crawl-shaped input per
  * BASELINE.json input_hint). Single pass, no regex, allocation-light:
  * plain text is emitted as (string, start, end) chunks into the sink's own
  * buffer — no intermediate Strings on the hot path — and attributes are
  * scanned (for correct tag-end detection) but never materialized, since no
  * downstream consumer reads them. Handles charset sniffing (BOM + <meta
  * charset>), comments, doctype, CDATA, raw-text elements
  * (script/style/noscript/textarea), attribute quoting, and HTML
  * named/numeric entities.
  */
object HtmlTokenizer {

  trait Sink {
    def startTag(name: String, selfClosing: Boolean): Unit
    def endTag(name: String): Unit
    /** Raw text chunk [start, end) of `s` — no entities inside. */
    def textChunk(s: String, start: Int, end: Int): Unit
    /** Decoded entity replacement (1-2 chars). */
    def textStr(s: String): Unit
    /** Opt-in attribute materialization: when true, [[attr]] fires with
      * each (tag, lower-cased name, entity-decoded value) BEFORE that
      * tag's startTag. False (default) keeps the zero-allocation
      * attribute scan — the text-extraction hot path is unchanged. */
    def wantsAttrs: Boolean = false
    def attr(tag: String, name: String, value: String): Unit = ()
  }

  private val rawTextTags = Set("script", "style", "noscript", "textarea")

  /** BOM + meta-charset sniff (UTF-8 default — the Common Crawl majority). */
  def sniffCharset(bytes: Array[Byte]): (Charset, Int) = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return (StandardCharsets.UTF_8, 3)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return (StandardCharsets.UTF_16LE, 2)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return (StandardCharsets.UTF_16BE, 2)
    // ASCII scan of the prologue for charset=...
    val n = math.min(bytes.length, 2048)
    var i = 0
    while (i + 8 < n) {
      if ((bytes(i) | 0x20) == 'c' && regionEqLower(bytes, i, "charset=")) {
        var j = i + 8
        while (j < n && (bytes(j) == '"' || bytes(j) == '\'' || bytes(j) == ' ')) j += 1
        val k0 = j
        while (j < n && (isAlnum(bytes(j)) || bytes(j) == '-' || bytes(j) == '_')) j += 1
        val name = new String(bytes, k0, j - k0, StandardCharsets.US_ASCII).toLowerCase
        val cs = name match {
          case "utf-8" | "utf8"                    => StandardCharsets.UTF_8
          case "iso-8859-1" | "latin-1" | "latin1" => StandardCharsets.ISO_8859_1
          case "windows-1252" | "cp1252"           => Charset.forName("windows-1252")
          case "us-ascii" | "ascii"                => StandardCharsets.US_ASCII
          case _                                   => StandardCharsets.UTF_8
        }
        return (cs, 0)
      }
      i += 1
    }
    (StandardCharsets.UTF_8, 0)
  }

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  private def regionEqLower(b: Array[Byte], off: Int, pat: String): Boolean = {
    if (off + pat.length > b.length) return false
    var i = 0
    while (i < pat.length) {
      val c = b(off + i)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c.toChar
      if (lc != pat.charAt(i)) return false
      i += 1
    }
    true
  }

  def tokenize(bytes: Array[Byte], sink: Sink): Unit = {
    val (cs, off) = sniffCharset(bytes)
    tokenize(new String(bytes, off, bytes.length - off, cs), sink)
  }

  def tokenize(html: String, sink: Sink): Unit = {
    val s = html
    val n = s.length
    var i = 0
    var runStart = 0
    // memoized position of the next '&' at/after the scan point: entities
    // are rare, so an uncached indexOf('&') from every text run would
    // re-scan far past the next tag each time (measured regression)
    var ampNext = -1

    @inline def flushRun(end: Int): Unit =
      if (end > runStart) sink.textChunk(s, runStart, end)

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          flushRun(i)
          if (s.startsWith("<!--", i)) {
            val e = s.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else if (s.regionMatches(true, i, "<![CDATA[", 0, 9)) {
            val e = s.indexOf("]]>", i + 9)
            val end = if (e < 0) n else e
            sink.textChunk(s, i + 9, end)
            i = if (e < 0) n else e + 3
          } else { // doctype or bogus declaration
            val e = s.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          }
          runStart = i
        } else if (c1 == '?') { // processing instruction
          flushRun(i)
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
          runStart = i
        } else if (c1 == '/') {
          flushRun(i)
          var j = i + 2
          val k0 = j
          while (j < n && s.charAt(j) != '>' && !isSpace(s.charAt(j))) j += 1
          val name = lowerName(s, k0, j)
          while (j < n && s.charAt(j) != '>') j += 1
          if (name.nonEmpty) sink.endTag(name)
          i = if (j < n) j + 1 else n
          runStart = i
        } else if (isNameStart(c1)) {
          flushRun(i)
          i = parseStartTag(s, i, sink)
          runStart = i
        } else {
          i += 1 // lone '<' — stays in the run
        }
      } else if (c == '&') {
        flushRun(i)
        val (decoded, adv) = decodeEntity(s, i)
        sink.textStr(decoded)
        i += adv
        runStart = i
      } else {
        // bulk-skip the plain-text run to the next markup char: the JDK's
        // single-char indexOf is SIMD-intrinsified, so this replaces the
        // dominant per-char branch loop over document text. Scan from i+1:
        // the CURRENT char may itself be a lone trailing '<' (the `i+1<n`
        // guard above rejected it) and indexOf(i) would return i forever.
        var lt = s.indexOf('<', i + 1)
        if (lt < 0) lt = n
        if (ampNext <= i) {
          ampNext = s.indexOf('&', i + 1)
          if (ampNext < 0) ampNext = n
        }
        i = math.min(lt, ampNext)
      }
    }
    flushRun(n)
  }

  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
  @inline private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Common tags, bucketed by length: a region match returns the canonical
    * constant with ZERO allocation — tag names were one substring per
    * open/close tag (~600 tiny Strings per document) in profiles. */
  private val knownByLen: Array[Array[String]] = {
    val tags = Array("a", "b", "i", "p", "q", "s", "u",
      "br", "em", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "td", "tr", "th", "dl", "dd", "dt", "hr",
      "div", "img", "nav", "pre", "sub", "sup", "var", "kbd", "del", "ins",
      "span", "code", "body", "html", "head", "meta", "link", "form", "main", "abbr",
      "table", "aside", "tbody", "thead", "tfoot", "style", "small", "label", "input",
      "strong", "script", "header", "footer", "button", "select", "option", "iframe",
      "section", "article", "caption", "figure",
      "textarea", "noscript", "blockquote", "figcaption")
    val m = Array.fill(16)(Array.empty[String])
    tags.groupBy(_.length).foreach { case (l, ts) => m(l) = ts }
    m
  }

  /** Lowercase tag name without a full toLowerCase allocation when already
    * lowercase (the common case in real HTML). */
  private def lowerName(s: String, from: Int, to: Int): String = {
    val len = to - from
    if (len > 0 && len < 16) {
      val cands = knownByLen(len)
      var ci = 0
      while (ci < cands.length) {
        val t = cands(ci)
        if (t.charAt(0) == s.charAt(from) && s.regionMatches(from, t, 0, len))
          return t
        ci += 1
      }
    }
    var i = from
    var needs = false
    while (i < to && !needs) { val c = s.charAt(i); if (c >= 'A' && c <= 'Z') needs = true; i += 1 }
    if (!needs) s.substring(from, to)
    else {
      val sb = new java.lang.StringBuilder(to - from)
      var j = from
      while (j < to) {
        val c = s.charAt(j)
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        j += 1
      }
      sb.toString
    }
  }

  /** Parse a start tag at s(i)=='<'; returns index after '>'. Attributes
    * are scanned for correct boundaries but not materialized. */
  private def parseStartTag(s: String, start: Int, sink: Sink): Int = {
    val n = s.length
    var j = start + 1
    val k0 = j
    while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '-' || s.charAt(j) == ':')) j += 1
    val name = lowerName(s, k0, j)
    var selfClosing = false
    var done = false
    while (!done && j < n) {
      while (j < n && isSpace(s.charAt(j))) j += 1
      if (j >= n) done = true
      else s.charAt(j) match {
        case '>' => j += 1; done = true
        case '/' =>
          if (j + 1 < n && s.charAt(j + 1) == '>') { selfClosing = true; j += 2; done = true }
          else j += 1
        case _ =>
          // attr name
          val a0 = j
          while (j < n && s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/' && !isSpace(s.charAt(j))) j += 1
          val a1 = j
          var k = j
          while (k < n && isSpace(s.charAt(k))) k += 1
          if (k < n && s.charAt(k) == '=') {
            k += 1
            while (k < n && isSpace(s.charAt(k))) k += 1
            var v0 = k; var v1 = k
            if (k < n && (s.charAt(k) == '"' || s.charAt(k) == '\'')) {
              val q = s.charAt(k); k += 1; v0 = k
              while (k < n && s.charAt(k) != q) k += 1
              v1 = k
              if (k < n) k += 1
            } else {
              v0 = k
              while (k < n && s.charAt(k) != '>' && !isSpace(s.charAt(k))) k += 1
              v1 = k
            }
            if (sink.wantsAttrs && a1 > a0)
              sink.attr(name, lowerName(s, a0, a1), decodeValue(s, v0, v1))
            j = k
          } else if (sink.wantsAttrs && a1 > a0)
            sink.attr(name, lowerName(s, a0, a1), "") // valueless attribute
      }
    }
    sink.startTag(name, selfClosing)
    if (!selfClosing && rawTextTags.contains(name)) {
      // consume raw content up to the matching close tag (case-insensitive)
      val close = "</" + name
      var e = j
      var done2 = false
      while (!done2 && e < n) {
        if (s.charAt(e) == '<' && s.regionMatches(true, e, close, 0, close.length)) {
          var p = e + close.length
          while (p < n && isSpace(s.charAt(p))) p += 1
          if (p < n && s.charAt(p) == '>') { e = p + 1; done2 = true }
          else e += 1
        } else {
          // raw content never tokenizes — jump straight to the next '<'
          val nx = s.indexOf('<', e + 1)
          e = if (nx < 0) n else nx
        }
      }
      sink.endTag(name)
      return e
    }
    j
  }

  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "shy" -> "­",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "bull" -> "•", "middot" -> "·",
    "copy" -> "©", "reg" -> "®", "trade" -> "™", "sect" -> "§",
    "para" -> "¶", "deg" -> "°", "plusmn" -> "±", "times" -> "×",
    "divide" -> "÷", "frac12" -> "½", "frac14" -> "¼",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥", "cent" -> "¢",
    "agrave" -> "à", "eacute" -> "é", "egrave" -> "è",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß",
    "ccedil" -> "ç", "ntilde" -> "ñ")

  /** Entity-decode an attribute value span [from, to). Allocation-free
    * when the span carries no '&'; an entity that would consume past `to`
    * (value truncated mid-entity) stays literal. */
  private def decodeValue(s: String, from: Int, to: Int): String = {
    val amp = s.indexOf('&', from)
    if (amp < 0 || amp >= to) return s.substring(from, to)
    val sb = new java.lang.StringBuilder(to - from)
    var p = from
    while (p < to) {
      val c = s.charAt(p)
      if (c == '&') {
        val (rep, used) = decodeEntity(s, p)
        if (p + used <= to) { sb.append(rep); p += used }
        else { sb.append(c); p += 1 }
      } else { sb.append(c); p += 1 }
    }
    sb.toString
  }

  /** Decode one entity at s(i)=='&'; returns (replacement, chars consumed). */
  def decodeEntity(s: String, i: Int): (String, Int) = {
    val n = s.length
    if (i + 1 >= n) return ("&", 1)
    if (s.charAt(i + 1) == '#') {
      var j = i + 2
      var hex = false
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
      val d0 = j
      while (j < n && j - d0 < 8 &&
        (s.charAt(j).isDigit || (hex && "abcdefABCDEF".indexOf(s.charAt(j)) >= 0))) j += 1
      if (j > d0 && j < n && s.charAt(j) == ';') {
        val cp = try Integer.parseInt(s.substring(d0, j), if (hex) 16 else 10)
                 catch { case _: NumberFormatException => -1 }
        if (cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
          return (new String(Character.toChars(cp)), j + 1 - i)
      }
      ("&", 1)
    } else {
      var j = i + 1
      val d0 = j
      while (j < n && j - d0 < 10 && s.charAt(j).isLetterOrDigit) j += 1
      if (j < n && s.charAt(j) == ';') {
        named.get(s.substring(d0, j)) match {
          case Some(r) => (r, j + 1 - i)
          case None    => ("&", 1)
        }
      } else ("&", 1)
    }
  }
}
