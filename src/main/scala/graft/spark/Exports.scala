package graft.spark

import graft.core.{Block, BlockKind, ExtractedDoc, TableCand}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Export projections — the reference's 11 file sinks collapse to
  * deterministic string folds over the extracted tree (SURVEY S12/R12;
  * /root/reference/src/text_extractor_all.py:251-273, 282-362):
  *  - `.txt`  = TextAssembly (the byte-identity surface)
  *  - `.md`   = per-page headings + blocks + tables as pipe tables
  *  - `.json` = to_json of the typed tree (compact — byte identity is
  *              defined on the txt surface, NOT pretty JSON; SURVEY §5)
  *  - csv     = best-table cells (ExtractJob.bestTables)
  * All pure column expressions / pure functions: a sink is a projection
  * plus a write, never bespoke I/O code.
  */
object Exports {

  /** Deterministic markdown fold of one document (pure function — runs
    * map-side; mirrors the reference's per-page MD + global MD export). */
  def toMarkdown(doc: ExtractedDoc): String = {
    val sb = new StringBuilder(doc.text.length + 256)
    sb ++= s"# ${doc.url}\n"
    var page = 0
    doc.blocks.foreach { b =>
      if (b.page != page) { page = b.page; sb ++= s"\n## Page $page\n" }
      b.kind match {
        // md headers are single-line: a multi-line heading block folds to
        // one line here (the txt surface keeps the line structure)
        case BlockKind.Title     => sb ++= s"\n# ${b.text.replace('\n', ' ')}\n"
        case BlockKind.Heading   => sb ++= s"\n## ${b.text.replace('\n', ' ')}\n"
        case BlockKind.Paragraph => sb ++= s"\n${b.text}\n"
        case BlockKind.Table     => // emitted from the scored candidates below
        case _                   => // chrome dropped, like the txt surface
      }
    }
    bestPerPage(doc.tables).foreach { t =>
      sb ++= s"\n### Table p${t.page} (${t.method}, score ${f"${t.score}%.3f"})\n"
      val rows = t.cells.groupBy(_.r).toSeq.sortBy(_._1)
      rows.headOption.foreach { case (_, hdr) =>
        val cols = hdr.sortBy(_.c).map(_.v)
        sb ++= cols.mkString("| ", " | ", " |\n")
        sb ++= cols.map(_ => "---").mkString("| ", " | ", " |\n")
      }
      rows.drop(1).foreach { case (_, cells) =>
        sb ++= cells.sortBy(_.c).map(_.v).mkString("| ", " | ", " |\n")
      }
    }
    sb.toString
  }

  /** Python-max-parity argmax per page (same rule as ExtractJob.bestTables,
    * scalar form). */
  def bestPerPage(tables: Seq[TableCand]): Seq[TableCand] =
    tables.filter(_.score > 0).groupBy(_.page).toSeq.sortBy(_._1)
      .map { case (_, cands) => cands.minBy(c => (-c.score, c.methodRank, c.cand)) }

  /** Deterministic JSON fold of one document — the layout.json surface
    * (text_extractor_all.py:258-260): nPages + extractor + the full block
    * tree including the Line/Span tier. Pure function, runs map-side in
    * the SAME pass as the txt/md folds (a second to_json evaluation of the
    * upstream extraction plus a self-join would double the most expensive
    * stage of the whole pipeline at scale). */
  def toJson(doc: ExtractedDoc): String = {
    val sb = new java.lang.StringBuilder(doc.text.length * 2 + 256)
    def str(s: String): Unit = {
      sb.append('"')
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        c match {
          case '"'  => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case _ =>
            if (c < 0x20) sb.append(f"\\u$c%04x") else sb.append(c)
        }
        i += 1
      }
      sb.append('"')
    }
    sb.append("{\"nPages\":").append(doc.nPages)
    sb.append(",\"extractor\":"); str(doc.extractor)
    sb.append(",\"blocks\":[")
    var bi = 0
    doc.blocks.foreach { b =>
      if (bi > 0) sb.append(',')
      bi += 1
      sb.append("{\"page\":").append(b.page)
        .append(",\"idx\":").append(b.idx)
        .append(",\"kind\":"); str(b.kind)
      sb.append(",\"bbox\":[").append(b.x0).append(',').append(b.y0)
        .append(',').append(b.x1).append(',').append(b.y1).append(']')
      sb.append(",\"lines\":[")
      var li = 0
      b.lines.foreach { l =>
        if (li > 0) sb.append(',')
        li += 1
        sb.append("{\"text\":"); str(l.text)
        sb.append(",\"spans\":[")
        var si = 0
        l.spans.foreach { s =>
          if (si > 0) sb.append(',')
          si += 1
          sb.append("{\"text\":"); str(s.text)
          sb.append(",\"font\":"); str(s.font)
          sb.append(",\"size\":").append(s.size)
          sb.append(",\"color\":[").append(s.colorR).append(',')
            .append(s.colorG).append(',').append(s.colorB).append(']')
          sb.append(",\"style\":{\"superscript\":").append(s.superscript)
            .append(",\"italic\":").append(s.italic)
            .append(",\"serif\":").append(s.serif)
            .append(",\"monospace\":").append(s.monospace)
            .append(",\"bold\":").append(s.bold).append("}}")
        }
        sb.append("]}")
      }
      sb.append("]}")
    }
    sb.append("]}")
    sb.toString
  }

  /** All export surfaces as one DataFrame: url, txt, md, json — ONE typed
    * map over one extraction pass, zero shuffle (the previous shape
    * evaluated the extraction twice and re-joined itself on url). */
  def exportAll(docs: Dataset[ExtractedDoc]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.map(d => (d.url, d.text, toMarkdown(d), toJson(d)))
      .toDF("url", "txt", "md", "json")
  }
}
