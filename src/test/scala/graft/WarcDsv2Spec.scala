package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.Warc

/** The DataSource V2 packaging of the WARC scanner: format("warc") must
  * return exactly what Warc.readRecords returns, prune columns into the
  * reader, and keep the never-throw first-mile contract. */
class WarcDsv2Spec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rec(i: Int): Warc.Record =
    Warc.responseRecord(s"https://h${i % 3}.example.com/p$i",
      f"2024-01-0${i % 9 + 1}T00:00:00Z",
      s"<html><body>page $i</body></html>".getBytes("UTF-8"))

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-warc-dsv2")
    Files.write(d.resolve("a.warc.gz"), Warc.writeWarcGz((0 until 7).map(rec)))
    Files.write(d.resolve("b.warc.gz"),
      Warc.writeWarcGz((7 until 12).map(rec), perRecordMembers = false))
    Files.write(d.resolve("junk.warc.gz"),
      "this is not a warc nor gzip".getBytes("UTF-8"))
    d
  }

  test("format(\"warc\") rows = Warc.readRecords rows, byte-for-byte") {
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(regexp_extract(col("file"), "([ab])\\.warc\\.gz", 1).as("f"),
        col("rec_idx"), col("warc_type"), col("url"), col("warc_date"),
        col("n_bytes"), xxhash64(col("payload")).as("ph"))
      .collect().map(_.toSeq).toSet
    val v2 = key(spark.read.format("warc").load(dir.toString))
    val fn = key(Warc.readRecords(spark, dir.toString))
    assert(v2.nonEmpty && v2 === fn)
  }

  test("column pruning reaches the reader: scan output drops payload") {
    val df = spark.read.format("warc").load(dir.toString)
      .select(col("url"), col("n_bytes"))
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .find(_.nodeName.contains("BatchScan"))
      .getOrElse(fail(df.queryExecution.executedPlan.toString))
    assert(scan.output.map(_.name).toSet === Set("url", "n_bytes"),
      scan.output.mkString(","))
    // n_bytes survives pruning with the right values (length known
    // without carrying the bytes)
    val n = df.collect().map(_.getLong(1)).sum
    val full = spark.read.format("warc").load(dir.toString)
      .agg(sum(length(col("payload")))).head().getLong(0)
    assert(n === full)
  }

  test("unreadable and hostile files contribute zero rows, not errors") {
    val d = Files.createTempDirectory("graft-warc-dsv2-junk")
    Files.write(d.resolve("x.warc.gz"), Array[Byte](1, 2, 3))
    assert(spark.read.format("warc").load(d.toString).count() === 0L)
  }

  test("reported statistics shrink when payload is pruned") {
    def sizeOf(cols: Seq[String]): Long = {
      val b = new graft.sources.WarcScanBuilder(dir.toString)
      b.pruneColumns(org.apache.spark.sql.types.StructType(
        graft.sources.WarcDataSource.Schema.filter(f => cols.contains(f.name))))
      b.build().asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics().sizeInBytes().getAsLong
    }
    val full = sizeOf(Seq("url", "payload"))
    val pruned = sizeOf(Seq("url", "n_bytes"))
    assert(pruned < full, s"pruned=$pruned full=$full")
    assert(full > 0 && pruned > 0)
  }

  test("count() without touching payload returns the record count") {
    val c = spark.read.format("warc").load(dir.toString).count()
    assert(c === 12L)
  }

  test("readStream.format(\"warc\"): new files per batch, exactly once, checkpoint resume") {
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("graft-warc-stream")
    val base = Files.createTempDirectory("graft-warc-stream-out")
    val ckpt = s"$base/ckpt"; val out = s"$base/out"
    Files.write(d.resolve("a.warc.gz"), Warc.writeWarcGz((0 until 4).map(rec)))
    def run(): Unit = {
      val q = spark.readStream.format("warc").load(d.toString)
        .select(col("url"), col("rec_idx"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() === 4L)
    // second file lands; a fresh run from the SAME checkpoint appends
    // ONLY the new file's records (file-granular exactly-once resume)
    Files.write(d.resolve("b.warc.gz"), Warc.writeWarcGz((4 until 9).map(rec)))
    run()
    val got = spark.read.parquet(out).collect().map(_.getString(0))
    assert(got.length === 9 && got.toSet ===
      (0 until 9).map(i => s"https://h${i % 3}.example.com/p$i").toSet,
      got.mkString(","))
    // third batch: THIS restart deserializes a committed MULTI-file offset
    // (a + b) from the line-based OffsetSeqLog — the newline-joined offset
    // serialization corrupted exactly this step (ADVICE r8 high): the
    // checkpoint line count no longer matched the source count on resume
    Files.write(d.resolve("c.warc.gz"), Warc.writeWarcGz((9 until 11).map(rec)))
    run()
    val got3 = spark.read.parquet(out).collect().map(_.getString(0))
    assert(got3.length === 11 && got3.toSet ===
      (0 until 11).map(i => s"https://h${i % 3}.example.com/p$i").toSet,
      got3.mkString(","))
  }

  test("WarcFilesOffset json is single-line and round-trips multi-file sets") {
    val off = graft.sources.WarcFilesOffset(
      Set("/x/a.warc.gz", "/x/b\"quoted\".warc.gz", "/y/c.wet.gz"))
    val j = off.json()
    assert(!j.contains("\n"), s"offset json must be one line: $j")
    assert(graft.sources.WarcFilesOffset.fromJson(j) === off)
    // legacy (pre-r9) newline-joined checkpoints still deserialize
    assert(graft.sources.WarcFilesOffset.fromJson("/x/a\n/x/b") ===
      graft.sources.WarcFilesOffset(Set("/x/a", "/x/b")))
    assert(graft.sources.WarcFilesOffset.fromJson("") ===
      graft.sources.WarcFilesOffset(Set.empty))
  }
}
