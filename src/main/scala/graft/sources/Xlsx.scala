package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal-but-real `.xlsx` reader — the reference loads extracted tables
  * from CSV or Excel via pandas (`/root/reference/src/xbrl_validate.py:
  * 70-75`); this covers the Excel branch offline: an xlsx is a ZIP (JDK
  * `ZipInputStream`) holding `xl/worksheets/sheet1.xml` (cells) and
  * `xl/sharedStrings.xml` (the string table). The fixed OOXML cell schema
  * (`<c r="B3" t="s"><v>12</v></c>`) needs only a tiny pull scanner, not
  * an XML library.
  *
  * Semantics match the repo's table contract: every cell a string, ragged
  * rows filled with "", first sheet only (the reference reads the default
  * sheet). Unknown cell types fall back to their raw `<v>` text.
  */
object Xlsx {

  def isXlsx(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4

  /** Max uncompressed bytes accepted for any one zip entry: a small
    * hostile deflate bomb can expand to GBs — overflow is treated like
    * any other malformed-file skip instead of OOMing the executor
    * (ADVICE r3). 256 MB is far above any real worksheet XML. */
  val MaxEntryBytes: Int = 256 << 20

  /** readAllBytes with a hard cap; null when the entry inflates past it. */
  private def readBounded(in: java.io.InputStream, cap: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(64 << 10)
    val chunk = new Array[Byte](64 << 10)
    var n = in.read(chunk)
    while (n >= 0) {
      if (bos.size.toLong + n > cap) return null
      bos.write(chunk, 0, n)
      n = in.read(chunk)
    }
    bos.toByteArray
  }

  /** Sort key for `xl/worksheets/sheetN.xml`: the numeric suffix when it
    * parses (so sheet2 < sheet10 — raw string order picks sheet10 when
    * sheet1 was deleted, ADVICE r3), lexicographic fallback otherwise. */
  private def sheetOrder(name: String): (Long, String) = {
    val m = "^xl/worksheets/sheet(\\d+)\\.xml$".r.findFirstMatchIn(name)
    // toLongOption: a hostile >19-digit suffix must not throw out of the
    // never-throw scanner contract
    m.flatMap(g => g.group(1).toLongOption).map((_, name))
      .getOrElse((Long.MaxValue, name))
  }

  /** Parse one xlsx byte array into a row-major string matrix. */
  def parse(bytes: Array[Byte]): Vector[Vector[String]] = {
    var sharedXml: String = null
    var sheetXml: String = null
    var sheetName: String = null
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml") {
          val b = readBounded(zin, MaxEntryBytes)
          if (b == null) return Vector.empty // deflate bomb → malformed skip
          sharedXml = new String(b, StandardCharsets.UTF_8)
        } else if (name.startsWith("xl/worksheets/sheet") && name.endsWith(".xml") &&
          (sheetName == null ||
            implicitly[Ordering[(Long, String)]].lt(sheetOrder(name), sheetOrder(sheetName)))) {
          // lowest-numbered sheet wins (workbook default sheet)
          val b = readBounded(zin, MaxEntryBytes)
          if (b == null) return Vector.empty
          sheetName = name
          sheetXml = new String(b, StandardCharsets.UTF_8)
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    if (sheetXml == null) return Vector.empty
    val shared = if (sharedXml == null) Vector.empty[String] else sharedStrings(sharedXml)
    sheetCells(sheetXml, shared)
  }

  /** `<si><t>text</t></si>` entries, in order. Rich-text runs
    * (`<si><r><t>a</t></r><r><t>b</t></r></si>`) concatenate their runs. */
  private def sharedStrings(xml: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while ({ i = xml.indexOf("<si>", i); i >= 0 }) {
      val end = xml.indexOf("</si>", i)
      val body = if (end >= 0) xml.substring(i, end) else xml.substring(i)
      val sb = new java.lang.StringBuilder()
      var j = 0
      var more = true
      while (more) {
        val (txt, next) = nextTag(body, "t", j)
        if (txt == null) more = false
        else { sb.append(txt); j = next }
      }
      out += xmlDecode(sb.toString)
      i = if (end >= 0) end + 5 else xml.length
    }
    out.result()
  }

  /** Find the next `<tag ...>content</tag>` at/after `from`; returns
    * (content|null, posAfter). Self-closing `<tag/>` yields "". */
  private def nextTag(xml: String, tag: String, from: Int): (String, Int) = {
    var i = from
    while (true) {
      i = xml.indexOf("<" + tag, i)
      if (i < 0) return (null, xml.length)
      val after = i + 1 + tag.length
      if (after < xml.length && (xml.charAt(after) == '>' || xml.charAt(after) == ' ' ||
        xml.charAt(after) == '/')) {
        val gt = xml.indexOf('>', i)
        if (gt < 0) return (null, xml.length)
        if (xml.charAt(gt - 1) == '/') return ("", gt + 1) // <t/>
        val close = xml.indexOf("</" + tag + ">", gt)
        if (close < 0) return (null, xml.length)
        return (xml.substring(gt + 1, close), close + tag.length + 3)
      }
      i = after // matched a longer tag name, keep scanning
    }
    (null, xml.length)
  }

  /** Cells of one worksheet: `<c r="B3" t="s|n|str|inlineStr"><v>…</v></c>`.
    * Column letters → 0-based index; shared-string and inline types resolve
    * to text; anything else keeps the raw `<v>` body. */
  private def sheetCells(xml: String, shared: Vector[String]): Vector[Vector[String]] = {
    val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var maxR = -1
    var maxC = -1
    var i = 0
    while ({ i = xml.indexOf("<c ", i); i >= 0 }) {
      val gt = xml.indexOf('>', i)
      if (gt < 0) { i = xml.length }
      else {
        val head = xml.substring(i, gt)
        val selfClosing = head.endsWith("/")
        val refM = attr(head, "r")
        val typ = attr(head, "t")
        val bodyEnd = if (selfClosing) gt + 1 else {
          val e = xml.indexOf("</c>", gt)
          if (e < 0) xml.length else e
        }
        if (refM != null && !selfClosing) {
          val body = xml.substring(gt + 1, bodyEnd)
          val raw =
            if (typ == "inlineStr") { val (t, _) = nextTag(body, "t", 0); if (t == null) "" else t }
            else { val (v, _) = nextTag(body, "v", 0); if (v == null) "" else v }
          val v = typ match {
            case "s" => // shared-string index
              val idx = raw.trim.toIntOption.getOrElse(-1)
              if (idx >= 0 && idx < shared.length) shared(idx) else ""
            case _ => xmlDecode(raw)
          }
          val (r, c) = cellRef(refM)
          // Excel's own sheet limits (1,048,576 rows × 16,384 cols) bound
          // hostile refs; a bogus "ZZZZZ99999999" must not size the grid
          if (r >= 0 && c >= 0 && r < 1048576 && c < 16384) {
            cells += ((r, c, v))
            if (r > maxR) maxR = r
            if (c > maxC) maxC = c
          }
        }
        i = if (selfClosing) gt + 1 else bodyEnd + 4
      }
    }
    if (maxR < 0) return Vector.empty
    // dense grid only within budget; a sparse adversarial sheet (few cells
    // at huge refs) compacts to the DISTINCT row/col ranks instead of
    // allocating (maxR+1)×(maxC+1) empties. 16M cells keeps every
    // realistic table dense (the compaction rewrites coordinates, so it
    // must only ever fire on hostile refs).
    if ((maxR + 1).toLong * (maxC + 1).toLong > 16000000L) {
      val rRank = cells.map(_._1).distinct.sorted.zipWithIndex.toMap
      val cRank = cells.map(_._2).distinct.sorted.zipWithIndex.toMap
      val grid = Array.fill(rRank.size, cRank.size)("")
      cells.foreach { case (r, c, v) => grid(rRank(r))(cRank(c)) = v }
      grid.map(_.toVector).toVector
    } else {
      val grid = Array.fill(maxR + 1, maxC + 1)("")
      cells.foreach { case (r, c, v) => grid(r)(c) = v }
      grid.map(_.toVector).toVector
    }
  }

  /** "B3" → (row 2, col 1), 0-based. */
  private def cellRef(ref: String): (Int, Int) = {
    var c = 0
    var i = 0
    while (i < ref.length && ref.charAt(i) >= 'A' && ref.charAt(i) <= 'Z') {
      c = c * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    val digits = ref.substring(i)
    if (c == 0 || digits.isEmpty) return (-1, -1)
    digits.toIntOption match {
      case Some(r) if r >= 1 => (r - 1, c - 1)
      case _                 => (-1, -1)
    }
  }

  private def attr(tagHead: String, name: String): String = {
    val k = name + "=\""
    val i = tagHead.indexOf(k)
    if (i < 0) return null
    val s = i + k.length
    val e = tagHead.indexOf('"', s)
    if (e < 0) null else tagHead.substring(s, e)
  }

  /** The five XML entities + numeric character references. */
  def xmlDecode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '&') {
        val semi = s.indexOf(';', i)
        val ent = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else null
        ent match {
          case "amp"  => sb.append('&'); i = semi + 1
          case "lt"   => sb.append('<'); i = semi + 1
          case "gt"   => sb.append('>'); i = semi + 1
          case "quot" => sb.append('"'); i = semi + 1
          case "apos" => sb.append('\''); i = semi + 1
          case e if e != null && e.startsWith("#") =>
            val code = (if (e.startsWith("#x") || e.startsWith("#X"))
              scala.util.Try(Integer.parseInt(e.substring(2), 16))
            else scala.util.Try(e.substring(1).toInt)).getOrElse(-1)
            // appendCodePoint throws above U+10FFFF and on surrogates —
            // hostile refs must not fail the Spark task
            if (code >= 0 && code <= 0x10FFFF && !(code >= 0xD800 && code <= 0xDFFF)) {
              sb.appendCodePoint(code); i = semi + 1
            } else { sb.append(ch); i += 1 }
          case _ => sb.append(ch); i += 1
        }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  /** Long form (file, r, c, v) over a path/glob of xlsx files — the shape
    * the alignment join (J4) consumes; binaryFile scan → per-file parse,
    * no shuffle. */
  def readCells(spark: SparkSession, path: String): DataFrame =
    readCellsMulti(spark, Seq(path))

  def readCellsMulti(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        // per-file failure tolerance (the reference's try/skip per file,
        // xbrl_validate.py:68-81): one malformed workbook must not fail
        // the whole job — it contributes zero cells
        val rows = try parse(bytes) catch { case _: Exception => Vector.empty }
        for {
          (row, r) <- rows.zipWithIndex
          (v, c) <- row.zipWithIndex
        } yield (p, r, c, v)
      }
      .toDF("file", "r", "c", "v")
  }
}

/** Extension dispatch over a tables directory — the reference's suffix
  * switch with per-file failure tolerance (xbrl_validate.py:68-81):
  * `.csv` → RobustCsv, `.xlsx` → Xlsx, anything else skipped. Legacy
  * `.xls` (OLE2 binary, not a ZIP) is explicitly SKIPPED, not silently
  * parsed to nothing — no OLE2 codec exists offline (declared limit). */
object TableSource {
  def readCells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fs = new java.io.File(dir).listFiles()
    val names = if (fs == null) Array.empty[String] else fs.map(_.getPath).sorted
    val csvs = names.filter(_.toLowerCase.endsWith(".csv"))
    val xlsxs = names.filter(_.toLowerCase.endsWith(".xlsx"))
    val parts = Seq.newBuilder[DataFrame]
    csvs.foreach { p =>
      parts += RobustCsv.readCells(spark, p)
        .select(lit(p).as("file"), (col("r")).cast("int").as("r"),
          col("c").cast("int").as("c"), col("v"))
    }
    if (xlsxs.nonEmpty)
      parts += Xlsx.readCellsMulti(spark, xlsxs.toSeq)
        .select(col("file"), col("r").cast("int").as("r"),
          col("c").cast("int").as("c"), col("v"))
    val all = parts.result()
    if (all.isEmpty)
      Seq.empty[(String, Int, Int, String)].toDF("file", "r", "c", "v")
    else all.reduce(_ unionByName _)
  }
}
