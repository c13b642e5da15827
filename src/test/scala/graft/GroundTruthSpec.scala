package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.core.{HtmlExtractor, PageRow}
import graft.spark.{ExtractJob, MetricsJob}

/** The reference's OWN ground truth as the compatibility surface: the 10
  * golden text pages and 7 golden table CSVs shipped in
  * /root/reference/data/ground_truth (wired into the reference's metric
  * suite at error_rate_detection.py:9-10), run through THIS engine and
  * held to the reference's pytest gate thresholds
  * (/root/reference/tests/error_test.py:12,17,22,27):
  * WER < 0.5, CER < 0.3, table precision >= 0.3, table recall > 0.3.
  *
  * Text: each golden page is fed as a `text`-column input (the WET-style
  * secondary source), extracted, and measured against the raw golden.
  * Tables: each golden CSV is rendered to an HTML table, extracted by the
  * real HTML pipeline (tokenizer -> table accumulator -> dual candidates ->
  * best-table argmax), and the cells are aligned against the CSV parsed
  * with the reference's QUOTE_NONE dialect (RobustCsv semantics).
  */
class GroundTruthSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-groundtruth")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val gtRoot = Paths.get("/root/reference/data/ground_truth")

  private def listFiles(dir: Path, ext: String): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(ext)).sortBy(_.getFileName.toString)
      finally s.close()
    }

  test("reference text ground truth passes the WER/CER gates (error_test.py:12,17)") {
    import spark.implicits._
    val files = listFiles(gtRoot.resolve("text"), ".txt")
    assume(files.nonEmpty, "reference ground truth not present")
    assert(files.length == 10)
    val rows = files.map { p =>
      val golden = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      (p.getFileName.toString, golden)
    }
    val pages = rows.map { case (url, golden) =>
      PageRow(url, new java.sql.Timestamp(0L), Array.emptyByteArray, golden, "en")
    }.toDS().toDF()
    val pred = ExtractJob.extractTexts(spark, pages).select($"url", $"text")
    val golden = rows.toDF("url", "text")
    val m = MetricsJob.textMetrics(spark, golden, pred)
      .select($"url", $"wer", $"cer").as[(String, Double, Double)].collect()
    assert(m.length == 10)
    m.foreach { case (url, wer, cer) =>
      assert(wer < 0.5, s"$url: WER $wer too high")
      assert(cer < 0.3, s"$url: CER $cer too high")
    }
  }

  test("reference table ground truth passes the precision/recall gates (error_test.py:22,27)") {
    import spark.implicits._
    val files = listFiles(gtRoot.resolve("tables"), ".csv")
    assume(files.nonEmpty, "reference ground truth not present")
    assert(files.length == 7)
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    // QUOTE_NONE dialect (error_rate_detection.py:27-55 / RobustCsv):
    // raw comma split, quotes are ordinary characters, blank lines dropped
    def cellsOf(p: Path): Seq[(Int, Int, String)] =
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .split("\n", -1).toSeq.map(_.stripSuffix("\r")).filter(_.nonEmpty)
        .zipWithIndex.flatMap { case (line, r) =>
          line.split(",", -1).toSeq.zipWithIndex.map { case (v, c) =>
            (r, c, HtmlExtractor.normText(v))
          }
        }
    val goldenCells = files.flatMap { p =>
      cellsOf(p).map { case (r, c, v) => (p.getFileName.toString, 1, r, c, v) }
    }.toDF("url", "page", "r", "c", "v")
    // render each CSV as an HTML table and run the REAL extraction path
    val pages = files.map { p =>
      val rows = cellsOf(p).groupBy(_._1).toSeq.sortBy(_._1)
      val html = rows.map { case (_, cs) =>
        cs.sortBy(_._2).map(c => s"<td>${esc(c._3)}</td>").mkString("<tr>", "", "</tr>")
      }.mkString("<html><body><table>", "\n", "</table></body></html>")
      PageRow(p.getFileName.toString, new java.sql.Timestamp(0L),
        html.getBytes(StandardCharsets.UTF_8), "", "en")
    }.toDS().toDF()
    val best = ExtractJob.bestTables(ExtractJob.extractDocs(spark, pages))
    val predCells = best.select($"url", explode($"cells").as("cell"))
      .select($"url", lit(1).as("page"), $"cell.r".as("r"), $"cell.c".as("c"), $"cell.v".as("v"))
    val m = MetricsJob.tableMetrics(goldenCells, predCells)
      .select($"url", $"precision", $"recall").as[(String, Double, Double)].collect()
    assert(m.length == 7, s"got ${m.map(_._1).toSeq}")
    m.foreach { case (url, precision, recall) =>
      assert(precision >= 0.3, s"$url: table precision $precision too low")
      assert(recall > 0.3, s"$url: table recall $recall too low")
    }
  }
}
