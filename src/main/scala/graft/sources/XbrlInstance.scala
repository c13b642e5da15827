package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** XBRL instance-document fact source — the reference's
  * `parse_xbrl_instance` (`/root/reference/src/xbrl_validate.py:40-56`):
  * walk every element, and when its immediate text (the text BEFORE any
  * child element — ElementTree `.text` semantics) is numeric after
  * comma-stripping, emit a fact `(concept = tag local name, value)`.
  * Duplicates are kept, exactly like the reference's list append.
  *
  * The scanner is the same no-XML-library style as [[Xlsx]]: one pass over
  * the raw text, since only start tags and their immediate text runs
  * matter. Comments and CDATA sections are skipped.
  */
object XbrlInstance {

  /** One numeric fact from an instance document. */
  final case class Fact(concept: String, value: Double)

  private val NumericRe = "^-?\\d+(\\.\\d+)?$".r

  def parseFacts(xml: String): Vector[Fact] = {
    val out = Vector.newBuilder[Fact]
    val n = xml.length
    var i = 0
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (xml.startsWith("<!--", lt)) {
        val e = xml.indexOf("-->", lt + 4)
        i = if (e < 0) n else e + 3
      } else if (xml.startsWith("<![CDATA[", lt)) {
        val e = xml.indexOf("]]>", lt + 9)
        i = if (e < 0) n else e + 3
      } else if (lt + 1 < n && (xml.charAt(lt + 1) == '?' || xml.charAt(lt + 1) == '!')) {
        val e = xml.indexOf('>', lt + 1)
        i = if (e < 0) n else e + 1
      } else if (lt + 1 < n && xml.charAt(lt + 1) == '/') { // closing tag
        val e = xml.indexOf('>', lt + 1)
        i = if (e < 0) n else e + 1
      } else { // start tag
        val gt = tagEnd(xml, lt + 1) // respects '>' inside quoted attrs
        if (gt < 0) { i = n }
        else {
          val selfClosing = xml.charAt(gt - 1) == '/'
          // tag name: up to whitespace or '>' (or the '/' of a self-close)
          var te = lt + 1
          while (te < gt && !Character.isWhitespace(xml.charAt(te)) && xml.charAt(te) != '/') te += 1
          val tag = xml.substring(lt + 1, te)
          if (!selfClosing && tag.nonEmpty) {
            // elem.text with ElementTree parser semantics: comments are
            // stripped (text around them merges), CDATA content inlines,
            // entities decode — all BEFORE the first real child/close tag
            val text = immediateText(xml, gt + 1)
            val txt = text.replace(",", "").trim
            if (txt.nonEmpty && NumericRe.matches(txt)) {
              val local = tag.substring(tag.indexOf(':') + 1) // localname
              try out += Fact(local, txt.toDouble)
              catch { case _: NumberFormatException => }
            }
          }
          i = gt + 1
        }
      }
    }
    out.result()
  }

  /** Position of the '>' ending the tag that starts at `from`, skipping
    * '>' characters inside quoted attribute values (legal XML:
    * title="a > b"). Returns -1 when the tag never closes. */
  private[sources] def tagEnd(xml: String, from: Int): Int = {
    var i = from
    val n = xml.length
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '"' || c == '\'') {
        val e = xml.indexOf(c, i + 1)
        i = if (e < 0) n else e + 1
      } else if (c == '>') return i
      else i += 1
    }
    -1
  }

  /** The element's immediate text starting at `from` (just past the start
    * tag's '>'), merged across comments and CDATA like ElementTree's
    * parser does, with entities decoded; stops at the first real child or
    * closing tag. */
  private[sources] def immediateText(xml: String, from: Int): String = {
    val n = xml.length
    val sb = new java.lang.StringBuilder()
    var i = from
    var done = false
    while (!done && i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { sb.append(xml, i, n); done = true }
      else {
        sb.append(xml, i, lt)
        if (xml.startsWith("<!--", lt)) {
          val e = xml.indexOf("-->", lt + 4)
          i = if (e < 0) n else e + 3 // comment stripped; text merges
        } else if (xml.startsWith("<![CDATA[", lt)) {
          val e = xml.indexOf("]]>", lt + 9)
          sb.append(xml, lt + 9, if (e < 0) n else e) // content inlines
          i = if (e < 0) n else e + 3
        } else done = true // real child or closing tag
      }
    }
    Xlsx.xmlDecode(sb.toString)
  }

  /** Distributed form over a path/glob of instance documents:
    * (file, concept, value) — feeds [[graft.spark.ValidateJob.matches]]
    * directly after aliasing file → url. Per-file failure tolerance. */
  def readFacts(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val facts =
          try parseFacts(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          catch { case _: Exception => Vector.empty }
        facts.map(f => (p, f.concept, f.value))
      }
      .toDF("file", "concept", "value")
  }
}
