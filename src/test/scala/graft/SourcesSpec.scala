package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files
import java.nio.charset.StandardCharsets

import graft.sources.RobustCsv

/** S9 robust CSV source: reference read semantics
  * (error_rate_detection.py:27-55) — header=None, dtype=str, utf-8-sig,
  * QUOTE_NONE, ragged rows filled with "". */
class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("BOM stripped, quotes literal, ragged rows padded") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("t.csv")
    val content = "﻿Item,\"FY24\",FY23\nrev,\"1,234\"\ncost,(56),78,extra\n"
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    val df = RobustCsv.read(spark, f.toString)
    assert(df.columns.toSeq == Seq("c0", "c1", "c2", "c3"))
    val rows = df.collect().map(_.toSeq.map(_.toString))
    // QUOTE_NONE: "1,234" splits into two cells "\"1" and "234\""
    assert(rows.contains(Seq("Item", "\"FY24\"", "FY23", "")))
    assert(rows.contains(Seq("rev", "\"1", "234\"", "")))
    assert(rows.contains(Seq("cost", "(56)", "78", "extra")))
    // BOM must not leak into the first cell
    assert(rows.forall(r => !r.head.startsWith("﻿")))
    // long form for the alignment join
    val cells = RobustCsv.readCells(spark, f.toString).collect()
    assert(cells.exists(r => r.getInt(0) == 2 && r.getInt(1) == 3 && r.getString(2) == "extra"))
  }
}
