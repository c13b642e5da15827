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
        case BlockKind.Title     => sb ++= s"\n# ${b.text}\n"
        case BlockKind.Heading   => sb ++= s"\n## ${b.text}\n"
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

  /** All export surfaces as one DataFrame: url, txt, md, json. */
  def exportAll(docs: Dataset[ExtractedDoc]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.map(d => (d.url, d.text, toMarkdown(d)))
      .toDF("url", "txt", "md")
      .join(
        docs.select(col("url"),
          to_json(struct(col("nPages"), col("extractor"), col("blocks"))).as("json")),
        "url")
  }
}
