package graft.gen

import graft.core._
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** Deterministic synthetic `pages` fixtures + golden extracted text.
  *
  * No randomness sources — every choice derives from splitmix64(seed, i),
  * so the same index always yields the same page and the same golden, on
  * any JVM, in any task (repartition-invariance is a tested property).
  *
  * Families (FIXTURES.md):
  *  - HTML: nav/header chrome, h1 title, h2 sections, main paragraphs
  *    (with entities, multi-byte UTF-8, inline links under the density
  *    threshold), link-farm + aside + footer boilerplate, an optional
  *    financial table ($, thousands commas, paren-negatives — shapes from
  *    /root/reference/data/ground_truth/tables/page_050.csv), optional BOM.
  *  - PDF: single- and two-column pages, header/footer bands, mixed-size
  *    title/heading blocks (the 1.5×/1.2× rules), a ruling-grid table, an
  *    empty-text page that must route to the provided-text fallback
  *    (reference OCR analogue, text_extractor_all.py:181-186).
  *
  * Host distribution is deliberately skewed: ~30% of urls live on one
  * mega-host (the Common-Crawl reality) to exercise salting (SURVEY §4.3).
  */
object FixtureGen {

  /** Generator version — BUMP THIS whenever fixture GENERATION changes in
    * any observable way. It is baked into every on-disk fixture marker
    * (SparkEntry.pagesFixture, Bench.ensurePages): without it a warm
    * /tmp fixture from an older build silently serves the OLD corpus and
    * every downstream green proves nothing about the new generator. */
  val Version = 6 // v6: asset fixture's video third became real MJPEG/AVI streams

  val Seed = 0x5EED5EED5EEDL
  val Epoch = 1704067200000L // 2024-01-01T00:00:00Z, fixed

  /** splitmix64 — deterministic per-index entropy. */
  def mix(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def pick(h: Long, mod: Int): Int = (((h % mod) + mod) % mod).toInt

  private val words = Vector(
    "data", "spark", "query", "table", "join", "filter", "scan", "merge",
    "window", "batch", "stream", "vector", "column", "row", "key", "value",
    "order", "group", "hash", "sort", "fast", "slow", "big", "small",
    "résumé", "naïve", "über", "café", "日本", "数据")

  private def sentence(h: Long, n: Int): String =
    (0 until n).map(k => words(pick(mix(h, k), words.length))).mkString(" ")

  /** PDF content streams are Latin-1; chars above 255 render as '?' in both
    * the payload and the golden (the lossy mapping is part of the fixture
    * contract — see PdfParser PDFDocEncoding note). */
  private def pdfLossy(s: String): String =
    s.map(ch => if (ch.toInt > 255) '?' else ch)

  // ----- public API ---------------------------------------------------------

  final case class Fixture(row: PageRow, golden: String)

  /** The mixed corpus: html 60%, pdf 25%, provided-text-only 10%, empty 5%.
    * `sizeBoost` multiplies HTML section counts (Common-Crawl pages average
    * tens of KB; the default small docs stress per-doc overhead instead of
    * parse throughput — Bench uses a boosted corpus, tests use default). */
  def fixture(i: Long): Fixture = fixture(i, 1)

  def fixture(i: Long, sizeBoost: Int): Fixture = {
    val h = mix(Seed, i)
    val host =
      if (pick(h, 100) < 30) "mega.example"
      else s"host-${pick(mix(h, 7), 50)}.example"
    val fam = pick(mix(h, 1), 20)
    val (ext, kind) =
      if (fam < 12) ("html", "html")
      else if (fam < 17) ("pdf", "pdf")
      else if (fam < 19) ("html", "textonly")
      else ("html", "empty")
    val url = s"https://$host/docs/${i}/page-${i}.$ext"
    val ts = new Timestamp(Epoch + i * 1000L)
    val lang = Vector("en", "en", "en", "de", "fr")(pick(mix(h, 2), 5))
    kind match {
      case "html" =>
        val (bytes, golden) = htmlDoc(h, sizeBoost)
        Fixture(PageRow(url, ts, bytes, "", lang), golden)
      case "pdf" =>
        val (bytes, golden) = pdfDoc(h)
        Fixture(PageRow(url, ts, bytes, "", lang), golden)
      case "textonly" =>
        // no payload worth parsing: empty-text PDF page + WET text fallback
        val provided = (0 until 3 + pick(mix(h, 3), 3))
          .map(k => sentence(mix(h, 100 + k), 8 + pick(mix(h, 200 + k), 8)))
          .mkString("\n")
        Fixture(PageRow(url, ts, emptyPdf(), provided, lang), provided)
      case _ =>
        Fixture(PageRow(url, ts, Array.emptyByteArray, "", lang), "")
    }
  }

  def fixtures(n: Int): Vector[Fixture] = (0L until n.toLong).map(fixture).toVector

  // ----- HTML family ---------------------------------------------------------

  def htmlDoc(h: Long): (Array[Byte], String) = htmlDoc(h, 1)

  def htmlDoc(h: Long, sizeBoost: Int): (Array[Byte], String) = {
    val golden = Vector.newBuilder[String]
    val sb = new StringBuilder(4096)
    val title = sentence(mix(h, 10), 4 + pick(mix(h, 11), 3))
    sb ++= "<!DOCTYPE html>\n<html>\n<head>\n"
    sb ++= s"<meta charset=\"utf-8\">\n<title>site — ${xmlEsc(title)}</title>\n"
    sb ++= "<style>body{margin:0}</style>\n<script>var x = '<p>not text</p>';</script>\n"
    sb ++= "</head>\n<body>\n"
    // chrome: header + nav (dropped)
    sb ++= "<header><div>BigCorp Portal</div></header>\n"
    sb ++= "<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/news\">News</a></li>"
    sb ++= "<li><a href=\"/about\">About</a></li></ul></nav>\n"
    // title (kept)
    sb ++= s"<h1>${xmlEsc(title)}</h1>\n"
    golden += title
    // sections
    val nSections = (2 + pick(mix(h, 12), 3)) * sizeBoost
    for (s <- 0 until nSections) {
      val hs = mix(h, 20 + s)
      val heading = sentence(mix(hs, 1), 3 + pick(mix(hs, 2), 3))
      sb ++= s"<h2>${xmlEsc(heading)}</h2>\n"
      golden += heading
      val nParas = 1 + pick(mix(hs, 3), 3)
      for (p <- 0 until nParas) {
        val hp = mix(hs, 40 + p)
        val raw = sentence(mix(hp, 1), 12 + pick(mix(hp, 2), 20))
        // entity + inline-link decoration on some paragraphs
        val deco = pick(mix(hp, 3), 6)
        val (markup, text) = deco match {
          case 0 =>
            val extra = "AT&T says 3 < 5 & “quotes”"
            (s"${xmlEsc(raw)} AT&amp;T says 3 &lt; 5 &amp; &ldquo;quotes&rdquo;", s"$raw $extra")
          case 1 =>
            val linkWord = words(pick(mix(hp, 4), words.length))
            (s"${xmlEsc(raw)} see <a href=\"/ref\">$linkWord</a> for details",
              s"$raw see $linkWord for details")
          case 2 =>
            // messy whitespace collapses to single spaces
            (xmlEsc(raw).replace(" ", "\n  "), raw)
          case 3 =>
            // inline formatting tags flow through block text
            (s"${xmlEsc(raw)} with <b>bold</b>, <i>italic</i> and <span class=\"x\">span</span> runs",
              s"$raw with bold, italic and span runs")
          case _ => (xmlEsc(raw), raw)
        }
        sb ++= s"<p>$markup</p>\n"
        golden += text
      }
      // some sections carry a content list: one block (golden line) per item
      if (pick(mix(hs, 5), 3) == 0) {
        sb ++= "<ul>\n"
        for (li <- 0 until 2 + pick(mix(hs, 6), 3)) {
          val item = sentence(mix(hs, 70 + li), 6 + pick(mix(hs, 80 + li), 6))
          sb ++= s"<li>${xmlEsc(item)}</li>\n"
          golden += item
        }
        sb ++= "</ul>\n"
      }
    }
    // optional financial table (block kind "table", not in the text surface)
    if (pick(mix(h, 13), 3) == 0) {
      sb ++= "<table>\n<tr><th>Item</th><th>FY2024</th><th>FY2023</th></tr>\n"
      for (r <- 0 until 4) {
        val hr = mix(h, 60 + r)
        val a = 1000 + pick(hr, 900000)
        val b = 1000 + pick(mix(hr, 1), 900000)
        val bCell = if (pick(mix(hr, 2), 4) == 0) s"(${fmt(b)})" else s"$$${fmt(b)}"
        sb ++= s"<tr><td>${words(pick(mix(hr, 3), words.length))}</td><td>$$${fmt(a)}</td><td>$bCell</td></tr>\n"
      }
      sb ++= "</table>\n"
    }
    // boilerplate: link farm + aside + footer (all dropped)
    sb ++= "<div><a href=\"/a\">related</a> <a href=\"/b\">links</a> <a href=\"/c\">here</a></div>\n"
    sb ++= "<aside>Subscribe to our newsletter for updates and offers.</aside>\n"
    sb ++= "<footer><p>© 2024 BigCorp. All rights reserved. <a href=\"/tos\">Terms</a></p></footer>\n"
    sb ++= "</body>\n</html>\n"
    val bodyBytes = sb.toString.getBytes(StandardCharsets.UTF_8)
    val bytes =
      if (pick(mix(h, 14), 5) == 0)
        Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ bodyBytes // BOM case
      else bodyBytes
    (bytes, golden.result().mkString("\n"))
  }

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def fmt(n: Int): String = f"$n%,d"

  // ----- PDF family ----------------------------------------------------------

  /** Build a small spec-valid PDF — 1 to 3 pages (multi-page exercises
    * page ordinals, per-page header/footer bands, and cross-page text
    * assembly). Geometry contract: glyph advance = 0.5·size per char
    * (PdfParser.CharWidthFactor); page 612×792. */
  def pdfDoc(h: Long): (Array[Byte], String) = {
    val nPages = 1 + pick(mix(h, 35), 3)
    val parts = (0 until nPages).map(p => pdfPage(mix(h, 400 + p)))
    // every third pdf doc embeds an image XObject on its first page (S7);
    // half of those are DeviceCMYK to exercise the CMYK→RGB convert path
    val imagePages: Set[Int] = if (pick(mix(h, 36), 3) == 0) Set(0) else Set.empty
    val cmykPages: Set[Int] =
      if (imagePages.nonEmpty && pick(mix(h, 37), 2) == 0) Set(0) else Set.empty
    (buildPdf(parts.map(_._1).toVector, compress = pick(mix(h, 34), 2) == 0,
        imagePages, cmykPages),
      parts.map(_._2).filter(_.nonEmpty).mkString("\n"))
  }

  /** One page of content-stream ops + its golden text. Golden discipline
    * is PER LINE (text_extractor_all.py:353-362): each layout line of a
    * content block is its own golden line — a 4-line paragraph contributes
    * 4 lines. Pages also exercise the span-style surface: colored titles
    * (rg), a superscript run (Ts), bold headings (/F2) and italic-serif
    * paragraphs (/F3). */
  private def pdfPage(h: Long): (String, String) = {
    val golden = Vector.newBuilder[String]
    val c = new StringBuilder(2048)
    // header band (dropped): y1(top-left) must be < 79.2 → baseline near top
    c ++= "BT /F1 9 Tf 50 742 Td (BigCorp Annual Report) Tj ET\n"
    // title block: mixed sizes so max >= 1.5*avg; colored fill + a
    // superscript footnote marker (rise 2 <= 0.3*size keeps it in-line)
    val title = pdfLossy(sentence(mix(h, 30), 3))
    golden += s"$title tm k 2"
    val tr = pick(mix(h, 37), 256); val tg = pick(mix(h, 38), 256); val tb = pick(mix(h, 39), 256)
    c ++= s"${tr / 255.0} ${tg / 255.0} ${tb / 255.0} rg\n"
    c ++= s"BT /F1 24 Tf 50 680 Td (${pdfEsc(title)}) Tj /F1 8 Tf (tm) Tj ( k) Tj 2 Ts (2) Tj 0 Ts ET\n"
    c ++= "0 g\n"
    val twoCol = pick(mix(h, 31), 2) == 0
    val paraFont = if (pick(mix(h, 41), 2) == 0) "/F3" else "/F1"
    if (twoCol) {
      // two columns; each column: bold heading(mixed 14/9) + paragraph lines
      val colTexts = for (col <- 0 until 2) yield {
        val hc = mix(h, 32 + col)
        val x = if (col == 0) 50 else 330
        val heading = pdfLossy(sentence(mix(hc, 1), 2))
        c ++= s"BT /F2 14 Tf $x 620 Td (${pdfEsc(heading)}) Tj /F1 9 Tf ( s${col + 1}) Tj ET\n"
        val lines = (0 until 4).map(k => pdfLossy(sentence(mix(hc, 10 + k), 4)))
        c ++= s"BT $paraFont 12 Tf $x 580 Td 14 TL\n"
        lines.zipWithIndex.foreach { case (ln, k) =>
          if (k > 0) c ++= "T* "
          c ++= s"(${pdfEsc(ln)}) Tj\n"
        }
        c ++= "ET\n"
        (s"$heading s${col + 1}", lines.mkString("\n"))
      }
      // reading order: XY-cut splits title row first, then left col, right col
      colTexts.foreach { case (hd, para) => golden += hd; golden += para }
    } else {
      // single column paragraphs + a ruling-grid table
      val heading = pdfLossy(sentence(mix(h, 33), 3))
      golden += s"$heading s0"
      c ++= s"BT /F2 14 Tf 50 620 Td (${pdfEsc(heading)}) Tj /F1 9 Tf ( s0) Tj ET\n"
      val lines = (0 until 3).map(k => pdfLossy(sentence(mix(h, 40 + k), 6)))
      c ++= s"BT $paraFont 12 Tf 50 580 Td 14 TL\n"
      lines.zipWithIndex.foreach { case (ln, k) =>
        if (k > 0) c ++= "T* "
        c ++= s"(${pdfEsc(ln)}) Tj\n"
      }
      c ++= "ET\n"
      golden += lines.mkString("\n")
      // table: 4 rows × 3 cols on a grid (each cell its own run); separated
      // from the paragraph block by a > BlockGapFactor gap
      for (r <- 0 until 4) {
        val y = 480 - r * 16
        val hr = mix(h, 50 + r)
        val v1 = 100 + pick(hr, 900)
        val v2 = 100 + pick(mix(hr, 1), 900)
        val w0 = words(pick(mix(hr, 2), 24)) // ASCII-safe subset
        c ++= s"BT /F1 10 Tf 50 $y Td (${pdfEsc(w0)}) Tj ET\n"
        c ++= s"BT /F1 10 Tf 250 $y Td ($v1) Tj ET\n"
        c ++= s"BT /F1 10 Tf 400 $y Td ($v2) Tj ET\n"
      }
    }
    // footer band (dropped): y0(top-left) > 712.8 → baseline below 72
    c ++= "BT /F1 9 Tf 50 40 Td (Page 1 of 1 - BigCorp Confidential) Tj ET\n"
    (c.toString, golden.result().mkString("\n"))
  }

  /** A PDF whose single page has no text operators at all. */
  def emptyPdf(): Array[Byte] = buildPdf(Vector("% no text\n"), compress = false)

  private def pdfEsc(s: String): String =
    // content-stream strings are Latin-1; strip non-encodable chars to '?'
    s.flatMap { ch =>
      if (ch == '(' || ch == ')' || ch == '\\') s"\\$ch"
      else if (ch.toInt > 255) "?"
      else ch.toString
    }

  /** Assemble a minimal PDF with one page per content string; pages whose
    * index is in `imagePages` get a 4×4 gray image XObject in /Resources
    * (the reference's S7 extraction source, text_extractor_all.py:235-243). */
  def buildPdf(contents: Vector[String], compress: Boolean,
      imagePages: Set[Int] = Set.empty,
      cmykPages: Set[Int] = Set.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    val nPages = contents.length
    // object numbering: 1 catalog, 2 pages, 3-5 fonts, then per page:
    // page obj, content obj[, image obj]
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val objOf = new Array[Int](nPages)
    var next = 6
    for (i <- 0 until nPages) {
      objOf(i) = next
      next += (if (imagePages.contains(i)) 3 else 2)
    }
    val kidRefs = (0 until nPages).map(i => s"${objOf(i)} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [ $kidRefs ] /Count $nPages >> endobj\n")
    w("3 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    w("4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >> endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Times-Italic >> endobj\n")
    contents.zipWithIndex.foreach { case (content, i) =>
      val pageObj = objOf(i)
      val contObj = pageObj + 1
      val withImg = imagePages.contains(i)
      val xobj = if (withImg) s" /XObject << /Im1 ${pageObj + 2} 0 R >>" else ""
      w(s"$pageObj 0 obj << /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R /F2 4 0 R /F3 5 0 R >>$xobj >> /Contents $contObj 0 R >> endobj\n")
      val raw = (content + (if (withImg) "\nq 32 0 0 32 500 100 cm /Im1 Do Q\n" else ""))
        .getBytes(StandardCharsets.ISO_8859_1)
      val (body, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      w(s"$contObj 0 obj << /Length ${body.length}$filter >> stream\n")
      out.write(body)
      w("\nendstream endobj\n")
      if (withImg) {
        val cmyk = cmykPages.contains(i)
        val (cs, pixels) =
          if (cmyk) ("DeviceCMYK", Array.tabulate[Byte](64)(p => (p * 4).toByte))
          else ("DeviceGray", Array.tabulate[Byte](16)(p => (p * 16).toByte))
        w(s"${pageObj + 2} 0 obj << /Type /XObject /Subtype /Image /Width 4 /Height 4 " +
          s"/ColorSpace /$cs /BitsPerComponent 8 /Length ${pixels.length} >> stream\n")
        out.write(pixels)
        w("\nendstream endobj\n")
      }
    }
    w(s"trailer << /Root 1 0 R /Size $next >>\n%%EOF\n")
    out.toByteArray
  }

  /** Assemble a minimal spec-valid .xlsx (ZIP + OOXML): numeric-looking
    * cells inline as `<v>`, everything else through the shared-string
    * table — the two cell encodings a real writer produces. Fixture for
    * the P10 Excel read path (xbrl_validate.py:70-75). */
  def buildXlsx(rows: Vector[Vector[String]]): Array[Byte] = {
    def xmlEsc(s: String): String = s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case c => c.toString
    }
    val shared = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def colName(c: Int): String = {
      var n = c + 1; var s = ""
      while (n > 0) { val r = (n - 1) % 26; s = ('A' + r).toChar + s; n = (n - 1) / 26 }
      s
    }
    val isNum = (v: String) => v.nonEmpty && v.matches("-?[0-9]+(\\.[0-9]+)?")
    val sheetRows = rows.zipWithIndex.map { case (row, r) =>
      val cells = row.zipWithIndex.collect { case (v, c) if v.nonEmpty =>
        val ref = s"${colName(c)}${r + 1}"
        if (isNum(v)) s"""<c r="$ref"><v>$v</v></c>"""
        else {
          val idx = shared.getOrElseUpdate(v, shared.size)
          s"""<c r="$ref" t="s"><v>$idx</v></c>"""
        }
      }
      s"""<row r="${r + 1}">${cells.mkString}</row>"""
    }
    val sheetXml = "<?xml version=\"1.0\"?><worksheet><sheetData>" +
      sheetRows.mkString + "</sheetData></worksheet>"
    val ssXml = "<?xml version=\"1.0\"?><sst>" +
      shared.keys.map(v => s"<si><t>${xmlEsc(v)}</t></si>").mkString + "</sst>"
    val ctXml = "<?xml version=\"1.0\"?><Types></Types>"
    val wbXml = "<?xml version=\"1.0\"?><workbook><sheets>" +
      "<sheet name=\"Sheet1\" sheetId=\"1\"/></sheets></workbook>"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    entry("[Content_Types].xml", ctXml)
    entry("xl/workbook.xml", wbXml)
    entry("xl/sharedStrings.xml", ssXml)
    entry("xl/worksheets/sheet1.xml", sheetXml)
    z.close()
    bos.toByteArray
  }

  /** Deterministic XBRL-style instance document (xbrl_validate.py:40-56
    * source): namespaced numeric facts with thousands separators and
    * signs, plus the reference parser's faithful quirks — date strings do
    * NOT match the numeric regex, a bare year DOES. */
  def buildXbrl(h: Long, nFacts: Int = 20): String = {
    def grouped(v: Long): String = {
      val s = math.abs(v).toString
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < s.length) {
        if (i > 0 && (s.length - i) % 3 == 0) sb.append(',')
        sb.append(s.charAt(i)); i += 1
      }
      (if (v < 0) "-" else "") + sb.toString
    }
    val sb = new java.lang.StringBuilder()
    sb.append("<?xml version=\"1.0\"?>\n")
    sb.append("<xbrl xmlns:us-gaap=\"http://fasb.org/us-gaap/2024\">\n")
    sb.append("<context id=\"c1\"><period><startDate>2024-01-29</startDate>")
    sb.append("<endDate>2025-01-26</endDate></period></context>\n")
    var i = 0
    while (i < nFacts) {
      val mag = 1L << (10 + pick(mix(h, 600 + i), 30))
      val v0 = (mix(h, 650 + i) & (mag - 1)) + mag
      val v = if (i % 5 == 0) -v0 else v0
      val name = s"Fact${i % 7}Metric"
      sb.append(s"""<us-gaap:$name contextRef="c1" decimals="0">${grouped(v)}</us-gaap:$name>\n""")
      i += 1
    }
    sb.append("<note>not a number</note>\n<year>2024</year>\n</xbrl>\n")
    sb.toString
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
