package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.{Files, Paths}

import graft.ops.{Index, IndexStore}

/** The persisted incremental inverted index: store-vs-recompute parity
  * (conjunctive AND ranked paths), multi-increment composition,
  * crash/resume exactly-once, tokenizer-pin fail-fast. */
class IndexStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      val extra = if (i % 3 == 0) " data model" else if (i % 3 == 1) " data" else ""
      (i.toLong, s"common words body token$i$extra" + (" pad" * (i % 5)))
    }.toDF("doc_id", "text")
  }

  test("two increments compose to exactly the full-corpus search results") {
    val docs = corpus(0 until 80)
    val root = Files.createTempDirectory("graft-idx-parity").toString
    assert(IndexStore.append(root, docs.filter(col("doc_id") < 40)) == 1L)
    assert(IndexStore.append(root, docs.filter(col("doc_id") >= 40)) == 2L)
    // ranked: scores must be BIT-identical, not just the same doc set
    val viaStore = IndexStore.rankedSearch(spark, root, Seq("data", "model"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val recompute = Index.rankedSearch(docs, Seq("data", "model"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaStore == recompute, s"$viaStore vs $recompute")
    assert(viaStore.nonEmpty)
    // conjunctive parity
    val cStore = IndexStore.conjunctiveSearch(spark, root, Seq("data", "model"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val cRe = Index.conjunctiveSearch(docs, Seq("data", "model"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(cStore == cRe && cStore.nonEmpty)
    // dictionary over the union counts every (term, doc) once
    val df = IndexStore.dictionary(spark, root)
      .filter(col("term") === "data").head()
    assert(df.getLong(1) == (0 until 80).count(i => i % 3 != 2).toLong)
  }

  test("doc lengths cover token-free docs, so corpus N and avgdl match the recompute path") {
    import spark.implicits._
    val docs = Seq((1L, "data data model"), (2L, ""), (3L, "data x")).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft-idx-empty").toString
    IndexStore.append(root, docs)
    assert(IndexStore.storedDocLens(spark, root).count() == 3L)
    val viaStore = IndexStore.rankedSearch(spark, root, Seq("data"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val recompute = Index.rankedSearch(docs, Seq("data"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(viaStore == recompute && viaStore.size == 2)
  }

  test("compact: one increment replaces many, search results unchanged, appends continue") {
    val docs = corpus(0 until 60)
    val root = Files.createTempDirectory("graft-idx-compact").toString
    IndexStore.append(root, docs.filter(col("doc_id") < 20))
    IndexStore.append(root, docs.filter(col("doc_id") >= 20 && col("doc_id") < 40))
    IndexStore.append(root, docs.filter(col("doc_id") >= 40))
    val before = IndexStore.rankedSearch(spark, root, Seq("data", "model"), 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(IndexStore.compact(spark, root) == 4L)
    val after = IndexStore.rankedSearch(spark, root, Seq("data", "model"), 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before && after.nonEmpty)
    // old dirs gone, exactly one increment on disk
    val incDirs = Files.list(Paths.get(root)).iterator()
    val incs = scala.jdk.CollectionConverters.IteratorHasAsScala(incDirs).asScala
      .map(_.getFileName.toString).filter(_.matches("inc-\\d+")).toSeq
    assert(incs == Seq("inc-4"), incs)
    // life goes on: a post-compaction crawl appends as increment 5
    assert(IndexStore.append(root, corpus(100 until 110)) == 5L)
    assert(IndexStore.storedDocLens(spark, root).count() == 70L)
  }

  test("delete: tombstoned docs vanish from search AND corpus stats; compact scrubs bytes") {
    val docs = corpus(0 until 80)
    val root = Files.createTempDirectory("graft-idx-del").toString
    IndexStore.append(root, docs.filter(col("doc_id") < 40))
    IndexStore.append(root, docs.filter(col("doc_id") >= 40))
    val dead = docs.filter(col("doc_id") % 7 === 2).select("doc_id")
    assert(IndexStore.delete(root, dead) == 3L)
    // parity: search through the store == recompute over the SURVIVORS
    // (scores shift for every doc — N and avgdl exclude the deleted)
    val survivors = docs.filter(col("doc_id") % 7 =!= 2)
    val viaStore = IndexStore.rankedSearch(spark, root, Seq("data", "model"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val recompute = Index.rankedSearch(survivors, Seq("data", "model"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaStore == recompute && viaStore.nonEmpty)
    assert(IndexStore.storedDocLens(spark, root).count() == 68L)
    // a crashed delete retries idempotently (del dir there, manifest not)
    Files.delete(Paths.get(root, "manifest-3.tsv"))
    assert(IndexStore.delete(root, dead) == 3L)
    assert(IndexStore.storedDocLens(spark, root).count() == 68L)
    // compact = the physical removal point: the new increment's parquet
    // holds NO tombstoned rows and the del dirs are gone
    assert(IndexStore.compact(spark, root) == 4L)
    val raw = spark.read.parquet(s"$root/inc-4/doclen")
    assert(raw.count() == 68L)
    assert(raw.filter(col("doc_id") % 7 === 2).count() == 0L)
    val delDirs = scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(Paths.get(root)).iterator()).asScala
      .map(_.getFileName.toString).filter(_.startsWith("del-")).toSeq
    assert(delDirs.isEmpty, delDirs)
    // post-compact search is unchanged
    val after = IndexStore.rankedSearch(spark, root, Seq("data", "model"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(after == viaStore)
  }

  test("crash states resume exactly-once: stale tmp, committed-but-unlisted increment") {
    val docs = corpus(0 until 30)
    val root = Files.createTempDirectory("graft-idx-crash").toString
    // crash A: leftover tmp dir from a killed first append
    Files.createDirectories(Paths.get(root, "inc-1.tmp", "postings"))
    Files.write(Paths.get(root, "inc-1.tmp", "postings", "garbage"), Array[Byte](1))
    IndexStore.append(root, docs)
    // crash B: data renamed but manifest never flipped — the retry must
    // recompute the SAME increment id and overwrite, not duplicate
    Files.delete(Paths.get(root, "manifest-1.tsv"))
    IndexStore.append(root, docs)
    val p = IndexStore.storedPostings(spark, root)
    assert(p.groupBy("term", "doc_id").count().filter(col("count") > 1).count() == 0L,
      "postings duplicated across retried increments")
    assert(IndexStore.storedDocLens(spark, root).count() == 30L)
  }

  test("tokenizer pin fails fast on mismatch") {
    val root = Files.createTempDirectory("graft-idx-params").toString
    IndexStore.append(root, corpus(0 until 5))
    // simulate a store built under a different tokenizer
    Files.write(Paths.get(root, "params.tsv"),
      "tokenizer\tbpe-v9\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      IndexStore.append(root, corpus(5 until 10))
    }
    assert(e.getMessage.contains("refusing"), e.getMessage)
  }
}
