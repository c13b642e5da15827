package graft.core

import java.nio.charset.{Charset, StandardCharsets}

/** Streaming HTML tokenizer over raw bytes.
  *
  * Brand-new implementation (no reference analogue — the reference parses
  * PDFs only; the HTML payload family is our Common-Crawl-shaped input per
  * BASELINE.json input_hint). Single pass, no regex, no DOM allocation:
  * emits start-tag / end-tag / text events to a sink. Handles charset
  * sniffing (BOM + <meta charset>), comments, doctype, CDATA, raw-text
  * elements (script/style/noscript/textarea), attribute quoting, and the
  * HTML named/numeric entities that occur in web text.
  */
object HtmlTokenizer {

  trait Sink {
    def startTag(name: String, attrs: collection.Map[String, String], selfClosing: Boolean): Unit
    def endTag(name: String): Unit
    /** Decoded text (entities resolved), raw whitespace preserved. */
    def text(s: String): Unit
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
    val head = new String(bytes, 0, n, StandardCharsets.ISO_8859_1).toLowerCase
    val i = head.indexOf("charset=")
    if (i >= 0) {
      var j = i + 8
      while (j < head.length && (head(j) == '"' || head(j) == '\'' || head(j) == ' ')) j += 1
      val k0 = j
      while (j < head.length && (head(j).isLetterOrDigit || head(j) == '-' || head(j) == '_')) j += 1
      val name = head.substring(k0, j)
      val cs = name match {
        case "utf-8" | "utf8"                      => StandardCharsets.UTF_8
        case "iso-8859-1" | "latin-1" | "latin1"   => StandardCharsets.ISO_8859_1
        case "windows-1252" | "cp1252"             => Charset.forName("windows-1252")
        case "us-ascii" | "ascii"                  => StandardCharsets.US_ASCII
        case _                                     => StandardCharsets.UTF_8
      }
      return (cs, 0)
    }
    (StandardCharsets.UTF_8, 0)
  }

  def tokenize(bytes: Array[Byte], sink: Sink): Unit = {
    val (cs, off) = sniffCharset(bytes)
    tokenize(new String(bytes, off, bytes.length - off, cs), sink)
  }

  def tokenize(html: String, sink: Sink): Unit = {
    val s = html
    val n = s.length
    var i = 0
    val textBuf = new java.lang.StringBuilder(256)

    def flushText(): Unit =
      if (textBuf.length() > 0) { sink.text(textBuf.toString); textBuf.setLength(0) }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (s.startsWith("<!--", i)) {
            val e = s.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else if (s.regionMatches(true, i, "<![CDATA[", 0, 9)) {
            val e = s.indexOf("]]>", i + 9)
            val end = if (e < 0) n else e
            textBuf.append(s, i + 9, end)
            i = if (e < 0) n else e + 3
          } else { // doctype or bogus declaration
            val e = s.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '?') { // processing instruction
          flushText()
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (c1 == '/') {
          flushText()
          var j = i + 2
          val k0 = j
          while (j < n && s.charAt(j) != '>' && !isSpace(s.charAt(j))) j += 1
          val name = s.substring(k0, j).toLowerCase
          while (j < n && s.charAt(j) != '>') j += 1
          if (name.nonEmpty) sink.endTag(name)
          i = if (j < n) j + 1 else n
        } else if (isNameStart(c1)) {
          flushText()
          i = parseStartTag(s, i, sink)
        } else {
          textBuf.append(c); i += 1 // lone '<' — literal
        }
      } else if (c == '&') {
        val (decoded, adv) = decodeEntity(s, i)
        textBuf.append(decoded)
        i += adv
      } else {
        textBuf.append(c); i += 1
      }
    }
    flushText()
  }

  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
  @inline private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Parse a start tag at s(i)=='<'; returns index after '>'. Emits the
    * start-tag event and, for raw-text elements, the raw content + end tag. */
  private def parseStartTag(s: String, start: Int, sink: Sink): Int = {
    val n = s.length
    var j = start + 1
    val k0 = j
    while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '-' || s.charAt(j) == ':')) j += 1
    val name = s.substring(k0, j).toLowerCase
    var attrs: collection.mutable.Map[String, String] = null
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
          val a0 = j
          while (j < n && s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/' && !isSpace(s.charAt(j))) j += 1
          val aname = s.substring(a0, j).toLowerCase
          var avalue = ""
          // optional = value
          var k = j
          while (k < n && isSpace(s.charAt(k))) k += 1
          if (k < n && s.charAt(k) == '=') {
            k += 1
            while (k < n && isSpace(s.charAt(k))) k += 1
            if (k < n && (s.charAt(k) == '"' || s.charAt(k) == '\'')) {
              val q = s.charAt(k); k += 1
              val v0 = k
              while (k < n && s.charAt(k) != q) k += 1
              avalue = s.substring(v0, k)
              if (k < n) k += 1
            } else {
              val v0 = k
              while (k < n && s.charAt(k) != '>' && !isSpace(s.charAt(k))) k += 1
              avalue = s.substring(v0, k)
            }
            j = k
          }
          if (aname.nonEmpty) {
            if (attrs == null) attrs = collection.mutable.Map.empty
            attrs.put(aname, decodeEntities(avalue))
          }
      }
    }
    sink.startTag(name, if (attrs == null) Map.empty[String, String] else attrs, selfClosing)
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
        } else e += 1
      }
      sink.endTag(name)
      return e
    }
    j
  }

  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "shy" -> "­",
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

  /** Decode all entities in a string (used for attribute values). */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val (d, adv) = decodeEntity(s, i); sb.append(d); i += adv
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
