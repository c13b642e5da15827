package graft.core

/** Top-level per-row extraction: payload sniff → parser → fallback chain.
  *
  * Mirrors the reference's extraction decision tree
  * (/root/reference/src/text_extractor_all.py:173-188): native extraction
  * first; when it yields no text and a secondary source exists, fall back —
  * the reference's OCR (pytesseract) becomes our `text` column (the
  * Common-Crawl WET-style pre-extracted text), since real OCR is out of
  * scope per SURVEY §2.1 S4. Every branch records which extractor ran
  * (`extractor` + `usedFallback`) — the reference's ocr_log analogue
  * (text_extractor_all.py:262-267).
  *
  * This is a pure function Row → ExtractedDoc, designed to run inside a
  * typed `Dataset.map` on executors: no shared state, no I/O, allocation
  * kept proportional to the document.
  */
object Extractor {

  def extract(row: PageRow): ExtractedDoc = extract(row, decodeImages = true)

  /** `decodeImages = false` is the TEXT-ONLY fast path: image XObjects are
    * still placed (bbox, intrinsic dims, count — the ExtractedText surface
    * is identical) but their payload streams are never inflated or
    * CMYK-converted. At 100 TB, inflating pixels a query never reads is
    * pure waste; only the tree consumers that export payload bytes
    * (x_images / exports) pass true. */
  def extract(row: PageRow, decodeImages: Boolean): ExtractedDoc = {
    val bytes = if (row.html == null) Array.emptyByteArray else row.html
    if (PdfParser.isPdf(bytes)) extractPdf(row, bytes, decodeImages)
    else if (bytes.nonEmpty) extractHtml(row, bytes)
    else if (row.text != null && row.text.nonEmpty) providedText(row, usedFallback = false)
    else ExtractedDoc(row.url, "", 0, "empty", usedFallback = false, Nil, Nil, Nil)
  }

  /** S3 word-box surface: per-word geometry from the PDF text runs — the
    * reference logs pdfplumber's extract_words() per page
    * (text_extractor_all.py:177, 187-188). Within a run the per-char
    * advance is uniform (w / len — the monospaced-geometry contract), so
    * word splits are exact under the fixture geometry contract (Tc=Tw=0,
    * Tz=100); with nonzero Tc/Tw the run-level width still holds but the
    * per-word split becomes the uniform approximation. PDF only: HTML has
    * no glyph geometry without a renderer. Pure Row → Seq, safe inside a
    * typed flatMap. Image payloads are NOT decoded on this path. */
  def wordBoxes(row: PageRow): Seq[WordBox] = {
    val bytes = if (row.html == null) Array.emptyByteArray else row.html
    if (!PdfParser.isPdf(bytes)) return Nil
    val pages =
      try PdfParser.parse(bytes, decodeImages = false)
      catch { case _: Exception => Vector.empty }
    val out = Vector.newBuilder[WordBox]
    pages.foreach { p =>
      p.runs.foreach { r =>
        val t = r.text
        val n = t.length
        val cw = if (n == 0) 0.0 else r.w / n
        var i = 0
        while (i < n) {
          while (i < n && t.charAt(i) == ' ') i += 1
          val s0 = i
          while (i < n && t.charAt(i) != ' ') i += 1
          if (i > s0) out += WordBox(p.num, t.substring(s0, i),
            r.x + s0 * cw, r.x + i * cw, r.y, r.y + r.h)
        }
      }
    }
    out.result()
  }

  private def extractHtml(row: PageRow, bytes: Array[Byte]): ExtractedDoc = {
    val r = HtmlExtractor.extract(bytes)
    val text = TextAssembly.assemble(r.blocks)
    if (text.isEmpty && row.text != null && row.text.nonEmpty)
      providedText(row, usedFallback = true)
    else
      ExtractedDoc(row.url, text, 1, "html", usedFallback = false, r.blocks, r.tables, r.images)
  }

  private def extractPdf(row: PageRow, bytes: Array[Byte],
      decodeImages: Boolean = true): ExtractedDoc = {
    val pages =
      try PdfParser.parse(bytes, decodeImages)
      catch { case _: Exception => Vector.empty }
    val r = PdfLayout.layout(pages)
    val text = TextAssembly.assemble(r.blocks)
    if (text.isEmpty && row.text != null && row.text.nonEmpty) {
      val d = providedText(row, usedFallback = true)
      d.copy(nPages = math.max(pages.length, 1), extractor = "pdf+fallback")
    } else
      ExtractedDoc(row.url, text, pages.length, "pdf", usedFallback = false,
        r.blocks, r.tables, r.images)
  }

  /** Secondary decoder: the row's pre-extracted `text` column. Each
    * non-empty line becomes one paragraph block (normalized), so the
    * reassembled surface is stable under re-extraction. */
  private def providedText(row: PageRow, usedFallback: Boolean): ExtractedDoc = {
    val blocks = row.text.split('\n').iterator
      .map(HtmlExtractor.normText)
      .filter(_.nonEmpty)
      .zipWithIndex
      .map { case (t, i) =>
        Block(1, i, BlockKind.Paragraph, t, 0.0, i.toDouble, 1.0, i + 1.0,
          0.0, 0.0, t.length, 0, t.split(' ').count(_.nonEmpty),
          Vector(Line(t, Vector(Span(t, "", 0.0, 0, 0, 0,
            superscript = false, italic = false, serif = false,
            monospace = false, bold = false)))))
      }
      .toVector
    ExtractedDoc(row.url, TextAssembly.assemble(blocks), 1, "provided_text",
      usedFallback, blocks, Nil, Nil)
  }
}

/** The byte-identity surface (reference P8/O4): content blocks
  * ({title, heading, paragraph}; text_extractor_all.py:353-362) in document
  * order, joined with a single '\n'. Block text is already the per-line
  * '\n' join of its Line tier, so the assembled surface emits ONE output
  * line per layout line — exactly the reference's
  * `"\n".join(line["text"] for page... for block... for line...)`.
  * Golden fixtures assert UTF-8 byte equality of this string per url. */
object TextAssembly {
  def assemble(blocks: Seq[Block]): String = {
    // presize from the exact content length — the doubling-regrowth copies
    // of an undersized builder were visible in allocation profiles
    var total = 0
    blocks.foreach { b =>
      if (BlockKind.ContentKinds.contains(b.kind)) total += b.text.length + 1
    }
    if (total == 0) return ""
    val sb = new java.lang.StringBuilder(total)
    var first = true
    blocks.foreach { b =>
      if (BlockKind.ContentKinds.contains(b.kind)) {
        if (!first) sb.append('\n')
        sb.append(b.text)
        first = false
      }
    }
    sb.toString
  }
}
