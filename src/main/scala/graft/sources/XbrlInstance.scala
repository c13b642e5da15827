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
        val gt = xml.indexOf('>', lt + 1)
        if (gt < 0) { i = n }
        else {
          val selfClosing = xml.charAt(gt - 1) == '/'
          // tag name: up to whitespace or '>' (or the '/' of a self-close)
          var te = lt + 1
          while (te < gt && !Character.isWhitespace(xml.charAt(te)) && xml.charAt(te) != '/') te += 1
          val tag = xml.substring(lt + 1, te)
          if (!selfClosing && tag.nonEmpty) {
            // elem.text = the run up to the NEXT tag (child or close)
            val next = xml.indexOf('<', gt + 1)
            val text = xml.substring(gt + 1, if (next < 0) n else next)
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
