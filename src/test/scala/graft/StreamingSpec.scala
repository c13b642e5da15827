package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.PageRow
import graft.gen.FixtureGen
import graft.streaming.StreamingExtract

/** Structured Streaming path: byte-identity through micro-batches and
  * exactly-once file-source resume via checkpoint. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("memory-stream extraction matches goldens across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[PageRow]
    val q = StreamingExtract.extractStream(spark, stream.toDS())
      .writeStream.format("memory").queryName("extracted_mem").outputMode("append").start()
    val fixtures = FixtureGen.fixtures(60)
    stream.addData(fixtures.take(30).map(_.row))
    q.processAllAvailable()
    stream.addData(fixtures.drop(30).map(_.row))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("extracted_mem")
      .select($"url", $"text").as[(String, String)].collect().toMap
    assert(got.size == 60)
    fixtures.foreach(f => assert(got(f.row.url) == f.golden, f.row.url))
  }

  test("streaming exact dedup drops in-horizon duplicates, first-seen wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[PageRow]
    val q = StreamingExtract.dedupStream(spark, stream.toDS())
      .writeStream.format("memory").queryName("dedup_mem").outputMode("append").start()
    // nonempty payloads only: "empty" fixtures are genuine byte-duplicates
    // of each other and would (correctly) collapse
    val pool = FixtureGen.fixtures(30)
      .filter(x => x.row.html.nonEmpty || x.row.text.nonEmpty)
    val f = pool.take(10)
    // base well above epoch 0: Spark's initial watermark is 0, and rows at
    // event time 0 would be classed late and dropped by the stateful op
    def at(row: PageRow, sec: Long): PageRow =
      row.copy(warc_ts = new java.sql.Timestamp(FixtureGen.Epoch + sec * 1000L))
    // batch 1: originals
    stream.addData(f.map(r => at(r.row, 0)))
    q.processAllAvailable()
    // batch 2: byte-identical duplicates under different urls, in horizon —
    // all dropped; plus one genuinely new page — kept
    val dups = f.take(5).map(x =>
      at(x.row.copy(url = x.row.url + "#dup"), 60))
    val fresh = at(pool.last.row, 60)
    stream.addData(dups :+ fresh)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_mem").select($"url").as[String].collect().toSet
    assert(got.size == 11)
    assert(got.contains(fresh.url))
    assert(!got.exists(_.endsWith("#dup")), got.filter(_.endsWith("#dup")))
  }

  test("file-source streaming job appends exactly-once and resumes") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val fixtures = FixtureGen.fixtures(40)
    // batch 1 lands
    spark.createDataset(fixtures.take(20).map(_.row)).toDF()
      .write.mode("append").parquet(src)
    StreamingExtract.run(spark, src, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == 20)
    // batch 2 lands; restart from checkpoint — batch 1 must not reprocess
    spark.createDataset(fixtures.drop(20).map(_.row)).toDF()
      .write.mode("append").parquet(src)
    StreamingExtract.run(spark, src, out, ckpt).awaitTermination()
    val outDf = spark.read.parquet(out)
    assert(outDf.count() == 40)
    assert(outDf.select($"url").distinct().count() == 40)
  }

  test("stateful sessionization closes sessions on gap and on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SessionizeStream
    import graft.streaming.SessionizeStream.{Event, Session}
    def ev(u: Long, sec: Long, v: Double) =
      Event(u, new java.sql.Timestamp(1700000000000L + sec * 1000), v)
    val stream = MemoryStream[Event]
    val q = SessionizeStream.sessions(spark, stream.toDS(), gapSeconds = 60,
      watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions_mem").outputMode("append").start()
    // burst 1: two sessions for user 1 separated by >60s inside one batch
    stream.addData(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(1, 200, 5.0))
    q.processAllAvailable()
    // burst 2: far-future event advances the watermark past user1's timeout
    stream.addData(ev(2, 10000, 1.0))
    q.processAllAvailable()
    stream.addData(ev(2, 20000, 1.0)) // one more trigger so timeouts fire
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_mem").as[Session].collect()
      .map(s => (s.userId, s.startMs, s.endMs, s.nEvents, s.sumValue)).toSet
    val t0 = 1700000000000L
    // gap-closed session (0-10s) and timeout-closed session (200s)
    assert(got.contains((1L, t0, t0 + 10000, 2L, 3.0)), got.toString)
    assert(got.contains((1L, t0 + 200000, t0 + 200000, 1L, 5.0)), got.toString)
  }

  test("watermarked windowed rate metrics emit closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[PageRow]
    val metrics = StreamingExtract.rateMetrics(
      StreamingExtract.extractStream(spark, stream.toDS()))
    val q = metrics.writeStream.format("memory").queryName("rates_mem")
      .outputMode("append").start()
    // fixtures 0..119 span 2 minutes of warc_ts (1s apart); push a late
    // marker 10 minutes ahead to close the first windows past watermark
    val fx = FixtureGen.fixtures(120)
    stream.addData(fx.map(_.row))
    q.processAllAvailable()
    stream.addData(FixtureGen.fixture(720).row) // ts = epoch + 720s
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rates_mem").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("docs")).sum
    assert(total == 120, s"expected the first two closed windows to hold 120 docs, got $total")
  }

  test("stream-stream temporal join: cross-batch pairing, window bounds, late-drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    def ts(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000)
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = graft.streaming.StreamTemporalJoin.pairsWithin(
      purchases.toDS().toDF("user_id", "pts", "pid"), "pts",
      clicks.toDS().toDF("user_id", "cts", "cid"), "cts",
      "user_id", toleranceSeconds = 60)
    val q = joined.writeStream.format("memory").queryName("sj_mem")
      .outputMode("append").start()
    try {
      // batch 1: user 1 clicks at 0s and 100s; purchase at 50s pairs with
      // the 0s click only (100s is after the purchase)
      clicks.addData((1L, ts(0), 900L), (1L, ts(100), 901L))
      purchases.addData((1L, ts(50), 800L))
      q.processAllAvailable()
      // batch 2: the purchase at 120s arrives AFTER its matching clicks'
      // batch — stream-stream state must still hold the 100s click
      // (in-window) but not pair the 0s click (120-0 > 60)
      purchases.addData((1L, ts(120), 801L))
      q.processAllAvailable()
      // cross-key isolation: user 2's purchase sees no user-1 clicks
      purchases.addData((2L, ts(110), 802L))
      q.processAllAvailable()
      val got = spark.table("sj_mem")
        .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((800L, 900L), (801L, 901L)), got.toString)

      // late-drop: push both watermarks far ahead (the user-9 rows pair
      // with each other — that lands before `before` is read), then
      // inject an old click + purchase that WOULD pair — both below
      // watermark, so no new output may appear
      clicks.addData((9L, ts(100000), 990L))
      purchases.addData((9L, ts(100000), 890L))
      q.processAllAvailable()
      q.processAllAvailable() // one extra trigger so the watermark commits
      val before = spark.table("sj_mem").count()
      clicks.addData((3L, ts(10), 903L))
      purchases.addData((3L, ts(20), 803L))
      q.processAllAvailable()
      val after = spark.table("sj_mem").count()
      assert(after == before,
        s"late rows below watermark must be dropped: $before -> $after")
      assert(!spark.table("sj_mem").select("pid").as[Long].collect().contains(803L))
    } finally q.stop()
  }

  test("KMV sketch aggregates incrementally across micro-batches (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.functions.register(spark)
    val stream = MemoryStream[(String, String)]
    val sketched = stream.toDS().toDF("src", "text")
      .select($"src", org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("tok"))
      .filter(org.apache.spark.sql.functions.length($"tok") > 0)
      .select($"src", graft.functions.functions.graft_fnv1a64($"tok").as("h"))
      .groupBy($"src")
      .agg(graft.functions.functions.graft_bottomk($"h",
        org.apache.spark.sql.functions.lit(8)).as("bk"))
    val q = sketched.writeStream.format("memory").queryName("kmv_mem")
      .outputMode("complete").start()
    stream.addData(("a", "w1 w2 w3"), ("b", "x1 x2"))
    q.processAllAvailable()
    stream.addData(("a", "w4 w5"), ("b", "x1 x1"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("kmv_mem").as[(String, Seq[Long])].collect().toMap
    // the streaming state merged both batches: a has 5 distinct tokens,
    // b has 3 (x1 deduped), each sketch equals the batch-computed one
    def want(ws: Seq[String]) = ws.map(graft.ops.Dedup.fnv1a)
      .distinct.sortBy(_ ^ Long.MinValue).take(8)
    assert(got("a") == want(Seq("w1", "w2", "w3", "w4", "w5")), got("a"))
    assert(got("b") == want(Seq("x1", "x2")), got("b"))
  }

  test("curation ops compose in a stream: scrub → quality gate → split, stateless per row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // the same narrow operators used in batch apply verbatim to a stream:
    // normalize, PII scrub, quality features, deterministic split — no
    // state, no watermark needed (stateless row transforms)
    val curated = graft.ops.Splits.hashSplit(
      graft.ops.TextAnalysis.qualityScore(
        graft.ops.Scrub.scrub(
          graft.ops.Normalize.normalize(stream.toDS().toDF("doc_id", "text"))
            .drop("text").withColumnRenamed("clean_text", "text")),
        textCol = "clean_text"))
      .select($"doc_id", $"n_emails", $"quality_score", $"split", $"n_sentences")
    val q = curated.writeStream.format("memory").queryName("curate_mem")
      .outputMode("append").start()
    stream.addData(
      (1L, "  the data of value mail me\tat a@b.io please. and more of the words here  "),
      (2L, "x"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("curate_mem")
      .as[(Long, Long, Double, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 1L) // email detected through the normalized text
    assert(got(1L)._3 > got(2L)._3) // quality gate separates the docs
    assert(got(1L)._5 == 1L && got(2L)._5 == 0L) // sentence stat flows through
    // split matches the batch assignment for the same ids (determinism)
    val batch = graft.ops.Splits.hashSplit(
      Seq((1L, "t"), (2L, "t")).toDF("doc_id", "text"))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(got(1L)._4 == batch(1L) && got(2L)._4 == batch(2L))
  }

  test("mixture gate and chunking apply verbatim to a stream (stateless row ops)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    // data-mixing gate (native map-probe filter) then sliding-window
    // chunking — both narrow, so they stream with no state/watermark
    val gated = graft.ops.Splits.mixtureSample(
      stream.toDS().toDF("doc_id", "source", "text"),
      Map("keep" -> 1.0, "half" -> 0.5))
    val chunks = graft.ops.Packing.chunkDocs(gated, maxLen = 4, stride = 3)
    val q = chunks.writeStream.format("memory").queryName("mixchunk_mem")
      .outputMode("append").start()
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    stream.addData(
      (1L, "keep", words(10)),     // 10 tokens → 1 + ceil(6/3) = 3 chunks
      (2L, "absent_src", words(9)), // source outside the mixture → dropped
      (3L, "keep", words(2)))      // short doc → one chunk
    q.processAllAvailable()
    stream.addData((4L, "keep", words(5))) // second micro-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mixchunk_mem")
      .select($"doc_id", $"chunk_idx", $"chunk_len").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    assert(got(1L).map(x => (x._2, x._3)).sortBy(_._1).toSeq ==
      Seq((0L, 4L), (1L, 4L), (2L, 4L)))
    assert(!got.contains(2L), "source outside the mixture must drop in-stream")
    assert(got(3L).toSeq == Seq((3L, 0L, 2L)))
    assert(got(4L).map(x => (x._2, x._3)).sortBy(_._1).toSeq ==
      Seq((0L, 4L), (1L, 2L)))
  }

  test("incremental crawl dedup streams via foreachBatch: bloom vs history, history appends exactly-once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min}
    implicit val sqlCtx = spark.sqlContext
    // The deployment shape of Dedup.incrementalNew: a stream of crawl
    // batches dedups against an accumulating HISTORY store — per
    // micro-batch, in-batch exact dedup (first-seen wins), then the
    // bloom-prefiltered vs-history check, then append the survivors to
    // the history. foreachBatch is the right tool (the op needs two
    // batch-side actions: the bloom collect and the anti-join).
    val root = java.nio.file.Files.createTempDirectory("graft_inc_stream").toString
    val seenDir = s"$root/seen"
    // seed an empty history so every micro-batch (incl. the first, which
    // exercises incrementalNew's empty-seen = everything-new path) reads
    // the store uniformly
    Seq.empty[(Long, String)].toDF("doc_id", "text").write.parquet(seenDir)
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val inBatch = batch
          .withColumn("keep", min(col("doc_id"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy(col("text"))))
          .filter(col("doc_id") === col("keep")).drop("keep")
        val seen = spark.read.parquet(seenDir)
        val fresh = graft.ops.Dedup
          .incrementalNew(seen, inBatch, expectedItems = 1024)
          .localCheckpoint(true) // materialize BEFORE appending to the dir we read
        fresh.write.mode("append").parquet(seenDir)
        ()
      }
      .start()
    stream.addData((1L, "alpha text"), (2L, "beta text"), (3L, "alpha text"))
    q.processAllAvailable()
    stream.addData((4L, "alpha text"), (5L, "gamma text")) // 4 dups history
    q.processAllAvailable()
    stream.addData((6L, "gamma text"), (7L, "beta text"))  // all dup history
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(seenDir)
      .as[(Long, String)].collect().sortBy(_._1)
    // exactly-once, first-seen-wins across THREE micro-batches: in-batch
    // dup 3 drops, history dups 4/6/7 drop, each text survives once
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 5L), got.mkString(", "))
    assert(got.map(_._2).toSet == Set("alpha text", "beta text", "gamma text"))
  }

  test("index maintenance streams via foreachBatch: one store increment per micro-batch, search = recompute") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the deployment shape of IndexStore: a stream of crawl batches, each
    // micro-batch committed as one increment (append is idempotent, so a
    // retried batch overwrites rather than duplicates); queries run over
    // the committed union at any point
    val root = java.nio.file.Files.createTempDirectory("graft_idx_stream").toString
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.IndexStore.append(root, batch)
        ()
      }
      .start()
    stream.addData((1L, "data model training"), (2L, "data only here"))
    q.processAllAvailable()
    stream.addData((3L, "model data pair"), (4L, "nothing relevant"))
    q.processAllAvailable()
    q.stop()
    val all = Seq((1L, "data model training"), (2L, "data only here"),
      (3L, "model data pair"), (4L, "nothing relevant")).toDF("doc_id", "text")
    val viaStore = graft.ops.IndexStore
      .rankedSearch(spark, root, Seq("data", "model"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val recompute = graft.ops.Index.rankedSearch(all, Seq("data", "model"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaStore == recompute && viaStore.map(_._1).toSet == Set(1L, 2L, 3L),
      s"$viaStore vs $recompute")
  }

  test("incremental NEAR-dup dedup streams via foreachBatch against an accumulating history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same deployment shape as the exact-dedup stream above, with
    // Dedup.incrementalNearDup as the vs-history check: re-crawls with
    // boilerplate drift are dropped, genuinely new pages accumulate
    val root = java.nio.file.Files.createTempDirectory("graft_incnd_stream").toString
    val seenDir = s"$root/seen"
    Seq((100L, "shared corpus page about alpha topics with filler words"))
      .toDF("doc_id", "text").write.parquet(seenDir)
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val seen = spark.read.parquet(seenDir)
        val fresh = graft.ops.Dedup
          .incrementalNearDup(seen, batch, threshold = 0.5)
          .localCheckpoint(true) // materialize BEFORE appending to the dir we read
        fresh.write.mode("append").parquet(seenDir)
        ()
      }
      .start()
    stream.addData(
      (1L, "shared corpus page about alpha topics with filler words extra"), // near-dup of 100
      (2L, "completely different beta content qq ww ee rr tt yy uu"))        // new
    q.processAllAvailable()
    stream.addData(
      (3L, "completely different beta content qq ww ee rr tt yy uu tail"),   // near-dup of 2
      (4L, "third page gamma unrelated body aa bb cc dd ee ff gg"))          // new
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(seenDir).as[(Long, String)]
      .collect().map(_._1).sorted.toSeq
    assert(got == Seq(2L, 4L, 100L), got.mkString(", "))
  }

  test("bottom-k SAMPLE sketch merges streaming state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit, col}
    implicit val sqlCtx = spark.sqlContext
    graft.functions.functions.register(spark)
    val stream = MemoryStream[(String, Long, Double)]
    val h = graft.functions.functions.graft_mix64(
      graft.functions.functions.graft_fnv1a64(
        concat(lit("qsample:"), col("id").cast("string"))))
    val sketched = stream.toDS().toDF("src", "id", "v")
      .groupBy($"src")
      .agg(graft.functions.functions.graft_bottomk_sample(h, $"v", lit(4)).as("smp"))
    val q = sketched.writeStream.format("memory").queryName("bks_mem")
      .outputMode("complete").start()
    stream.addData(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0))
    q.processAllAvailable()
    stream.addData(("a", 4L, 40.0), ("a", 5L, 50.0), ("a", 6L, 60.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bks_mem").as[(String, Seq[Double])].collect().toMap
    def hu(i: Long) = graft.ops.Dedup.mix64(graft.ops.Dedup.fnv1a(s"qsample:$i")) ^ Long.MinValue
    val want = (1L to 6L).sortBy(hu).take(4).map(_ * 10.0)
    assert(got("a") == want, s"got ${got("a")} want $want")
  }

  test("classifier gate streams via foreachBatch: static model table, positives append exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the quality-gate deployment shape: score each crawl micro-batch
    // against a FIXED model table, keep positives. foreachBatch because
    // the per-doc fold is an aggregation over the batch's token stream.
    val model = Seq(("good", 0.5), ("bad", -0.25)).toDF("tok", "w")
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val scored = graft.ops.Classifier.linearScore(batch, model, bias = -0.1)
        kept.synchronized {
          kept ++= scored.filter(org.apache.spark.sql.functions.col("positive"))
            .select($"doc_id", $"score").as[(Long, Double)].collect()
        }
        ()
      }
      .start()
    stream.addData((1L, "good good"), (2L, "bad good meh"))
    q.processAllAvailable()
    stream.addData((3L, "good"), (4L, "meh"))
    q.processAllAvailable()
    q.stop()
    // doc1: 1.0/2-0.1=0.4; doc2: 0.25/3-0.1<0; doc3: 0.5-0.1=0.4; doc4: -0.1
    assert(kept.sortBy(_._1).toSeq == Seq((1L, 0.4), (3L, 0.4)),
      kept.mkString(", "))
  }
}
