package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Opt-in scale probes (flip `ignore` → `test` to run): the curation ops
  * at millions of rows on local[32], far above the driver's sf0.1, to
  * back the "holds at 100×" plan-shape claims with measured throughput.
  * Synthetic corpora are generated ON EXECUTORS from the row index
  * (spark.range → expr), so generation never bottlenecks the probe. */
class ScaleProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
    .appName("graft-scale-probe")
    .config("spark.sql.shuffle.partitions", Runtime.getRuntime.availableProcessors())
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** n docs with ~40-word texts from a 4096-word vocab, 1000 sources. */
  private def corpus(n: Long) = {
    graft.functions.functions.register(spark)
    spark.range(0L, n, 1L, Runtime.getRuntime.availableProcessors() * 4)
      .select(col("id").as("doc_id"),
        concat(lit("s"), pmod(col("id"), lit(1000))).as("source"),
        array_join(transform(sequence(lit(0), lit(39)),
          i => concat(lit("w"), pmod(graft.functions.functions.graft_mix64(
            col("id") * 64 + i.cast("long")), lit(4096)))), " ").as("text"))
  }

  private def timed(name: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    val s = (System.nanoTime() - t0) / 1e9
    println(f"SCALE $name: $n rows in $s%.1f s (${n / s / 1000}%.0f krows/s)")
  }

  ignore("curation ops at 2M docs (opt-in probe)") {
    val docs = corpus(2000000L).localCheckpoint(true)
    // force evaluation of the derived columns — a bare count() lets
    // Catalyst prune the split/scrub expressions entirely
    timed("hashSplit 2M")(
      graft.ops.Splits.hashSplit(docs).groupBy("split").count()
        .agg(sum("count")).head().getLong(0))
    timed("hashSample 2M")(graft.ops.Splits.hashSample(docs, 0.25).count())
    timed("scrub 2M")(
      graft.ops.Scrub.scrub(docs)
        .agg(sum(length(col("clean_text"))) + sum(col("n_emails"))).head().getLong(0))
    timed("packGreedy 2M x 1000 groups")(
      graft.ops.Packing.packGreedy(docs, budget = 512).count())
    timed("repetitionStats 2M cold")(
      graft.ops.TextAnalysis.repetitionStats(docs).count())
    timed("repetitionStats 2M warm")(
      graft.ops.TextAnalysis.repetitionStats(docs).count())
    timed("sampleQuantiles 2M x 1000 groups")(
      graft.ops.Sketches.sampleQuantiles(
        docs.withColumn("score", col("doc_id").cast("double")), "source", "score").count())
    timed("contamination 2M vs 2k benchmark")(
      graft.ops.Contamination.overlap(docs,
        docs.filter(col("doc_id") % 1000 === 0)).count())
    timed("heavyTokens 2M x 1000 groups (m=256)")(
      graft.ops.Sketches.heavyTokens(docs, "source", k = 5, m = 256).count())
    timed("incrementalNew 1.9M batch vs 100k seen")(
      graft.ops.Dedup.incrementalNew(
        docs.filter(col("doc_id") % 20 === 0),
        docs.filter(col("doc_id") % 20 =!= 0)).count())
    timed("urlCanonical 2M")(
      docs.select(graft.ops.UrlOps.canonicalize(
          concat(lit("HTTP://Host-"), col("doc_id") % 1000,
            lit(".Example.COM:80/p/"), col("doc_id"), lit("#f"))).as("c"))
        .agg(sum(length(col("c")))).head().getLong(0))
  }
}
