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

  ignore("round-5 reshaped ops at scale: skewed stratum, zipf heavy hitters, hashed LSH verify (opt-in probe)") {
    val mix = graft.functions.functions.graft_mix64 _
    val docs = corpus(2000000L).localCheckpoint(true)

    // mega-stratum: ONE group holds 50% of 2M docs — the shape that made
    // the single-window form a one-task sort (VERDICT r4 #1). The balanced
    // run is the control: skewed wall must stay within ~2x of it because
    // phase 1 spreads the mega group over the salt fan-out.
    val skewed = docs.withColumn("source",
      when(col("doc_id") % 2 === 0, lit("mega")).otherwise(col("source")))
    timed("stratifiedSample 2M balanced 1000 groups (k=100)")(
      graft.ops.Splits.stratifiedSample(docs, "source", k = 100).count())
    timed("stratifiedSample 2M with 50% mega-stratum (k=100)")(
      graft.ops.Splits.stratifiedSample(skewed, "source", k = 100).count())

    // Zipf-skewed token stream: 8 heavy tokens carry ~90% of 80M tokens,
    // the tail spreads over ~8k rare tokens (vocab >> m=256, so the
    // SpaceSaving buffers evict constantly under real skew)
    val h = (i: org.apache.spark.sql.Column) => mix(col("id") * 64 + i.cast("long"))
    val zipf = spark.range(0L, 2000000L, 1L,
        Runtime.getRuntime.availableProcessors() * 4)
      .select(col("id").as("doc_id"),
        concat(lit("s"), pmod(col("id"), lit(100))).as("source"),
        array_join(transform(sequence(lit(0), lit(39)), i => {
          // P(idx >= k) = 1/k — a Zipf(1)-ish head: idx <= 8 carries ~89%
          val idx = floor(lit(4096).cast("double") / (pmod(h(i), lit(4096)) + 1))
          when(idx <= 8, concat(lit("h"), idx.cast("long")))
            .otherwise(concat(lit("t"), pmod(mix(h(i)), lit(8192))))
        }), " ").as("text"))
    timed("heavyTokens 2M zipf-skewed (k=5, m=256)")(
      graft.ops.Sketches.heavyTokens(zipf, "source", k = 5, m = 256).count())

    // minhashLsh with the r5 hashed-shingle verify: 220k docs incl. 10%
    // planted near-dups — the verify stage now ships Array[Long] shingle
    // hashes instead of raw text per candidate pair (VERDICT r4 #2)
    val lshBase = docs.filter(col("doc_id") < 200000)
    val lshDocs = lshBase.unionByName(lshBase.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("source"),
        concat(col("text"), lit(" xtra")).as("text")))
    timed("minhashLsh 220k (10% planted near-dups, hashed verify)")(
      graft.ops.Dedup.minhashLsh(
        lshDocs.select(col("doc_id"), col("text")), threshold = 0.5).count())

    // exact-substring spans: 2M docs × ~33 positional 8-spans = ~66M
    // (sid, hash) pairs through the shuffle; boilerplate planted on a
    // third of the corpus so the dup-hash set is genuinely large
    val boiler = docs.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" all rights reserved terms of service apply contact the site administrator today")))
        .otherwise(col("text")))
    timed("duplicatedSpans 2M (k=8, 1/3 boilerplate)")(
      graft.ops.Dedup.duplicatedSpans(boiler, k = 8).count())

    timed("normalize 2M")(
      graft.ops.Normalize.normalize(docs)
        .agg(sum(length(col("clean_text"))) + sum(col("n_sentences")))
        .head().getLong(0))
    timed("mixtureSample 2M (4 of 1000 sources)")(
      graft.ops.Splits.mixtureSample(docs,
        Map("s1" -> 1.0, "s2" -> 0.5, "s3" -> 0.25, "s4" -> 0.1)).count())
  }

  ignore("round-6 reshaped ops at scale: mega-source packing (opt-in probe)") {
    // mega-source: ONE source holds 50% of 2M docs — the shape where the
    // whole-group fold packed its entire token stream in ONE task
    // (VERDICT r5 #1). The skew-bounding evidence is the MAX TASK
    // duration of the fold stage, not total wall (at probe scale the
    // per-row fold is so cheap that shuffle + host noise dominate wall;
    // at 100 TB the one-task fold is days while the sharded one is
    // minutes): shards=32 must cap the longest task far below the
    // shards=1 mega task that folds+sorts 1M rows alone.
    val docs = corpus(2000000L).localCheckpoint(true)
    val skewed = docs.withColumn("source",
      when(col("doc_id") % 2 === 0, lit("mega")).otherwise(col("source")))
      .localCheckpoint(true)
    // FOLD-stage tasks only (the ones reading the (g, shard) exchange):
    // scan/shuffle-write tasks and cold-JIT noise would otherwise swamp
    // the signal — the skew claim is about the post-exchange fold
    def maxFoldTaskMs(body: => Long): Long = {
      val durs = scala.collection.mutable.ArrayBuffer[Long]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null &&
            t.taskMetrics.shuffleReadMetrics.recordsRead > 0)
            durs.synchronized { durs += t.taskInfo.duration }
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(1500) /* listener bus drain */ }
      finally spark.sparkContext.removeSparkListener(l)
      durs.synchronized { durs.max }
    }
    // warm both shapes once (codegen + JIT) before measuring
    graft.ops.Packing.packGreedy(skewed, budget = 512, shards = 32).count()
    graft.ops.Packing.packGreedy(skewed, budget = 512, shards = 1).count()
    val m32 = maxFoldTaskMs(
      graft.ops.Packing.packGreedy(skewed, budget = 512, shards = 32).count())
    val m1 = maxFoldTaskMs(
      graft.ops.Packing.packGreedy(skewed, budget = 512, shards = 1).count())
    println(s"SCALE packGreedy mega-source max fold task: shards=32 -> $m32 ms, " +
      s"shards=1 -> $m1 ms")
    assert(m32.toDouble < m1.toDouble / 2.0,
      s"sharding must bound the longest fold task: $m32 vs $m1 ms")
    timed("packGreedy 2M balanced 1000 sources, shards=16 (default)")(
      graft.ops.Packing.packGreedy(docs, budget = 512).count())
  }

  ignore("round-6 new ops at scale: span cut, bigram fluency, line dedup (opt-in probe)") {
    val docs = corpus(2000000L).localCheckpoint(true)
    // 1/3 boilerplate suffix (the q_cut_spans planting at 4000x the rows)
    val boiler = docs.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" all rights reserved terms of service apply contact the site administrator today")))
        .otherwise(col("text"))).localCheckpoint(true)
    timed("cutDuplicatedSpans 2M (k=8, minRun=12, 1/3 boilerplate)")(
      graft.ops.Dedup.cutDuplicatedSpans(boiler, k = 8, minRun = 12)
        .agg(sum(length(col("clean_text"))) + sum(col("n_cut"))).head().getLong(0))
    timed("bigramFluency 2M (80M-token model + score)")(
      graft.ops.LmScore.bigramFluency(docs)
        .agg(sum(col("n_bigrams"))).head().getLong(0))
    val lined = docs.withColumn("text",
      concat(col("text"), lit("\nall rights reserved\nvisit "),
        col("doc_id") % 7, lit(" today"))).localCheckpoint(true)
    timed("cutDuplicateLines 2M (planted boilerplate lines)")(
      graft.ops.Dedup.cutDuplicateLines(lined)
        .agg(sum(col("n_cut_lines"))).head().getLong(0))
  }

  ignore("round-7: dedupClusters pointer-jump rounds on adversarial-diameter graphs at 2M (opt-in probe)") {
    // worst case for label propagation: ONE chain through the whole edge
    // set. Plain min-propagation would need ~2M rounds (hundreds of full
    // edge-set shuffles even for diameter-100 template chains); pointer
    // jumping converges in O(log d) — this RECORDS the round count at 2M.
    val n = 2000000L
    val docs = spark.range(n).select(col("id").as("doc_id")).toDF
    val chain = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b")).toDF
    timed(s"dedupClusters 2M chain (diameter ${n - 1})")(
      graft.ops.Dedup.dedupClusters(docs, chain, maxIter = 40)
        .filter(col("cluster_id") === 0L).count())
    println(s"SCALE dedupClusters 2M chain rounds: ${graft.ops.Dedup.lastClusterRounds.get()}")
    // realistic shape: 200k separate 10-node chains (shallow clusters)
    val shallow = spark.range(n - 1).filter(pmod(col("id") + 1L, lit(10L)) =!= 0L)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b")).toDF
    timed("dedupClusters 2M x 10-node chains")(
      graft.ops.Dedup.dedupClusters(docs, shallow, maxIter = 40).count())
    println(s"SCALE dedupClusters 10-node-chain rounds: ${graft.ops.Dedup.lastClusterRounds.get()}")
  }

  ignore("round-7 endgame ops at scale: mega-host cap, cross-corpus near-dup, gopher gate (opt-in probe)") {
    val docs = corpus(2000000L).localCheckpoint(true)
    // 50% of all rows land on ONE host — the skew capPerGroup's two-level
    // fold exists for; the rest spread over 100k hosts
    val hosted = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(2L)) === 0L, lit("mega.example.com"))
        .otherwise(concat(lit("h"), pmod(col("doc_id"), lit(100000L)))).as("host"),
      length(col("text")).cast("long").as("q"))
    timed("capPerGroup 2M, 50% mega-host, k=5")(
      graft.ops.Selection.capPerGroup(hosted, "host", 5, "q", "doc_id").count())
    timed("gopherRules 2M")(
      graft.ops.TextAnalysis.gopherRules(docs, minWords = 20)
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).head().getLong(0))
    // cross-corpus near-dup: 105k-batch (5k drifted re-crawls OF SEEN
    // docs + 100k fresh) against a 1.9M seen corpus — expect exactly the
    // 100k fresh to survive
    val seen = docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L)
    val drift = docs.filter(pmod(col("doc_id"), lit(400L)) === 1L) // in seen
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" drift tail")).as("text"))
    val fresh = docs.filter(pmod(col("doc_id"), lit(20L)) === 0L) // NOT in seen
      .select((col("doc_id") + 20000000L).as("doc_id"),
        concat(lit("fresh "), col("text"), lit(" "), col("doc_id")).as("text"))
    timed("incrementalNearDup 105k batch (5k drift) vs 1.9M seen")(
      graft.ops.Dedup.incrementalNearDup(seen, drift.union(fresh), 0.5).count())
  }

  ignore("round-7 session-3 ops at scale: context windows, k-means, anchors, robots gate (opt-in probe)") {
    graft.functions.functions.register(spark)
    val parts = Runtime.getRuntime.availableProcessors() * 4
    // 2M docs → ~80M tokens through the distributed prefix sum + explode
    val docs = corpus(2000000L).localCheckpoint(true)
    timed("contextWindows 2M docs (~80M tokens, L=2048)")(
      graft.ops.Packing.contextWindows(docs, winLen = 2048).count())
    // 500k 64-d vectors: 2 Lloyd steps = 2 × 32M-row (cell, d, bucket)
    // ordered-fold shuffles + the final assignment pass
    val embs = spark.range(0L, 500000L, 1L, parts)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(graft.functions.functions.graft_mix64(
            col("id") * 64 + d.cast("long")), lit(2001L)) - 1000L)
            .cast("double") / lit(1024.0)).cast("float")).as("embedding"))
      .localCheckpoint(true)
    timed("kmeansAssign 500k × 64d, k=8, iters=2, foldBuckets=64")(
      graft.ops.Similarity.kmeansAssign(embs, k = 8, iters = 2, dim = 64,
        foldBuckets = 64).count())
    // 1M pages through the tokenizer's anchor capture (narrow flatMap)
    val pages = spark.range(0L, 1000000L, 1L, parts)
      .select(concat(lit("http://s"), pmod(col("id"), lit(100000L)),
          lit(".example.com/p/"), col("id")).as("url"),
        concat(lit("<html><body><p>pre</p><a href=\"http://h"),
          pmod(col("id"), lit(50000L)),
          lit(".example.com/x\">go <b>see</b> v"), pmod(col("id"), lit(3L)),
          lit("</a><a href=/rel>skip</a></body></html>"))
          .cast("binary").as("html"))
      .localCheckpoint(true)
    timed("anchorTexts 1M pages")(
      graft.ops.Graph.anchorTexts(pages).count())
    // robots gate: 2M urls over 100k hosts vs a 20k-rule table
    val urls = spark.range(0L, 2000000L, 1L, parts)
      .select(col("id").as("doc_id"),
        concat(lit("https://h"), pmod(col("id"), lit(100000L)),
          lit(".example.com/p"), pmod(col("id"), lit(10L)),
          lit("/page")).as("url"))
    val rules = spark.range(0L, 10000L)
      .select(concat(lit("h"), col("id"), lit(".example.com")).as("host"))
      .select(col("host"), explode(array(
        struct(lit(false).as("is_allow"), lit("/p1").as("prefix")),
        struct(lit(true).as("is_allow"), lit("/p1/ok").as("prefix")))).as("r"))
      .select(col("host"), col("r.is_allow").as("is_allow"), col("r.prefix").as("prefix"))
    timed("robotsGate 2M urls vs 20k rules")(
      graft.ops.Robots.robotsGate(urls, rules)
        .agg(sum(when(col("allowed"), 0L).otherwise(1L))).head().getLong(0))
  }

  ignore("round-7 session-3b: semDedup pair stage and CDC chunking at scale (opt-in probe)") {
    graft.functions.functions.register(spark)
    val parts = Runtime.getRuntime.availableProcessors() * 4
    // 50k 64-d vectors over k=64 cells (~780/cell → ~19M windowless
    // within-cell pairs through the native cosine filter)
    val embs = spark.range(0L, 50000L, 1L, parts)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(graft.functions.functions.graft_mix64(
            col("id") * 64 + d.cast("long")), lit(2001L)) - 1000L)
            .cast("double") / lit(1024.0)).cast("float")).as("embedding"))
      .localCheckpoint(true)
    timed("semDedup 50k × 64d, k=64 (~19M pairs)")(
      graft.ops.Similarity.semDedup(embs, eps = 0.99, k = 64, iters = 1,
        dim = 64, foldBuckets = 64).count())
    val docs = corpus(2000000L).localCheckpoint(true)
    timed("cdcChunks 2M docs (~80M tokens)")(
      graft.ops.Packing.cdcChunks(docs, mask = 7).count())
  }

  ignore("round-8: warm band-key store vs per-batch recompute; BPE apply at 2M docs (opt-in probe)") {
    import spark.implicits._
    graft.functions.functions.register(spark)
    // 2M-doc seen corpus, 100k-doc batch (5k drifted re-crawls + 95k fresh)
    val seen = corpus(2000000L).localCheckpoint(true)
    val batch = corpus(5000L)
      .select((col("doc_id") + 9000000L).as("doc_id"),
        concat(col("text"), lit(" drifted tail")).as("text"))
      .unionByName(spark.range(4000000L, 4095000L).select(col("id").as("doc_id"),
        concat(lit("fresh page "), col("id"), lit(" qq ww ee rr tt yy uu ii oo pp "
          + "aa ss dd ff gg hh jj kk ll zz xx cc vv bb nn mm q1 w2 e3 r4 t5 y6 u7 "
          + "i8 o9 p0 a1 s2 d3 f4 g5")).as("text")))
      .localCheckpoint(true)
    val root = java.nio.file.Files.createTempDirectory("graft-nds-2m").toString
    timed("NearDupStore.append 2M (one-time cold cost)") {
      graft.ops.NearDupStore.append(root, seen); 2000000L
    }
    // warm path: batch-side signatures only — the seen corpus is two
    // parquet scans of 8/16-byte keys, never re-shingled
    timed("incrementalNearDup 100k batch vs STORED 2M keys (warm)")(
      graft.ops.NearDupStore.incrementalNearDup(root, batch, 0.5).count())
    timed("incrementalNearDup 100k batch, seen recomputed per batch (cold)")(
      graft.ops.Dedup.incrementalNearDup(seen, batch, 0.5).count())
    // decomposed seen-side cost: the stored frames are a parquet scan
    // (warm) vs a full re-shingle+minhash+band pass (cold ≈ the append
    // minus its write). At probe scale the ~250 B synthetic docs make the
    // two END-TO-END walls similar (the band join dominates); on real
    // ~20 KB pages the cold path re-reads and re-tokenizes corpus TEXT
    // per batch while the warm path scans signature-scale columns only.
    timed("stored seen-side scan (keys + sigs) — the warm increment's seen cost")(
      graft.ops.NearDupStore.seenKeys(spark, root).count() +
        graft.ops.NearDupStore.seenSigs(spark, root)
          .agg(sum(size(col("shs")))).head().getLong(0))
    // BPE apply: two-level char merges over the wNNNN vocabulary ("w"+digit,
    // then "wD"+digit) — every word folds 2+ merges; the per-task memo
    // collapses the 4096-word vocab
    val merges = ((0 until 10).map(d => (d, "w", d.toString)) ++
      (for (i <- 0 until 10; j <- 0 until 10)
        yield (10 + i * 10 + j, s"w$i", j.toString)))
      .toDF("rank", "l", "r")
    timed("Bpe.tokenize 2M docs (~80M words)")(
      graft.ops.Bpe.tokenize(seen, merges).count())
  }

  ignore("round-8 session-4: quantile gate, revisit delta, cooccur at 2M docs (opt-in probe)") {
    val docs = corpus(2000000L)
      .withColumn("quality_score",
        pmod(col("doc_id"), lit(5L)).cast("double") / lit(4.0))
      .localCheckpoint(true)
    // 1000 sources -> 2k docs/group, plus one planted mega-source holding
    // half the corpus (the group-rank construction must not sort it in
    // one task)
    val skewed = docs.withColumn("source",
      when(col("doc_id") % 2 === 0, lit("mega")).otherwise(col("source")))
      .localCheckpoint(true)
    timed("quantileGate 2M, 50% mega-source, top quarter")(
      graft.ops.Selection.quantileGate(skewed, "source", 1L, 4L)
        .filter(col("kept")).count())
    // re-crawl: 25% of docs drift (token appended), the rest unchanged
    val recrawl = docs.select(col("doc_id"),
      when(col("doc_id") % 4 === 1, concat(col("text"), lit(" drift")))
        .otherwise(col("text")).as("text"))
    timed("revisitDelta 2M docs x ~80M tokens")(
      graft.ops.Revisit.delta(docs, recrawl, mask = 63)
        .groupBy(col("revisit")).count().agg(sum("count")).head().getLong(0))
    // 160M pair rows over a 4096² pair space (~10 avg per pair) — the
    // threshold keeps the surviving tail non-trivial. Measured (session 4,
    // local[32]): quantileGate 12.1 s, revisitDelta 84.8 s (two chunk
    // passes over ~80M tokens each), cooccur 171.9 s (~930k pairs/s
    // through the composite-key join + three aggregates).
    timed("cooccur 2M docs, window 2, minCount 20")(
      graft.ops.Cooccur.pairCounts(docs, window = 2, minCount = 20L).count())
  }

  ignore("round-8 session-2: BPE training, GD training, inverted index at 2M docs (opt-in probe)") {
    val docs = corpus(2000000L).localCheckpoint(true)
    // ONE corpus pass builds the (word, freq) vocab frame; each of the 4
    // levels re-folds only the 4096 distinct words + one argmax collect
    timed("Bpe.trainMerges 4 levels over 2M docs")(
      graft.ops.Bpe.trainMerges(docs, numMerges = 4).count())
    // 4096-token vocab over 2M docs: every token is a corpus-wide hub —
    // the per-token gradients MUST fold in the two-level tree, so this
    // probe is the hub-safety evidence for Train
    val labeled = docs.withColumn("y",
      pmod(col("doc_id"), lit(2L)).cast("double"))
    timed("Train.linearFit 2 GD iters, 2M docs x 4096-token vocab")(
      graft.ops.Train.linearFit(labeled, "y", iters = 2, lr = 0.5).count())
    timed("Index.dictionary 2M docs (~80M postings)")(
      graft.ops.Index.dictionary(docs).count())
    timed("Index.conjunctiveSearch 3 probes, 2M docs")(
      graft.ops.Index.conjunctiveSearch(docs, Seq("w1", "w2", "w3")).count())
    timed("Index.phraseSearch 2-term, 2M docs")(
      graft.ops.Index.phraseSearch(docs, Seq("w1", "w2")).count())
  }

  ignore("round-8 session-5: int8 quantization and quantized search at 2M vectors (opt-in probe)") {
    graft.functions.functions.register(spark)
    val parts = Runtime.getRuntime.availableProcessors() * 4
    val embs = spark.range(0L, 2000000L, 1L, parts)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(graft.functions.functions.graft_mix64(
            col("id") * 64 + d.cast("long")), lit(2001L)) - 1000L)
            .cast("double") / lit(1024.0)).cast("float")).as("embedding"))
      .localCheckpoint(true)
    // pure narrow map: 2M × 64-d floats → int8 codes + norms
    timed("Quantize.int8 2M × 64d") {
      graft.ops.Quantize.int8(embs).agg(sum(col("qnorm"))).head()
      2000000L
    }
    // brute-force quantized scan: 8 queries × 2M codes through the
    // BIGINT dot fold (the verify tier a bucketed generator would prune)
    timed("Quantize.quantizedTopK 8 queries × 2M codes")(
      graft.ops.Quantize.quantizedTopK(embs,
        embs.filter(col("vec_id") < 8), k = 5).count())
  }

  ignore("round-8 session-6: PQ encode/train/ADC and count-min sketch at 2M (opt-in probe)") {
    graft.functions.functions.register(spark)
    val parts = Runtime.getRuntime.availableProcessors() * 4
    val embs = spark.range(0L, 2000000L, 1L, parts)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(graft.functions.functions.graft_mix64(
            col("id") * 64 + d.cast("long")), lit(2001L)) - 1000L)
            .cast("double") / lit(1024.0)).cast("float")).as("embedding"))
      .localCheckpoint(true)
    val flat = graft.ops.Quantize.pqSeedCodebooks(embs, 64, 8, 16)
    // narrow native argmin pass: 2M × (8 subspaces × 16 codes × 8 dims)
    timed("Quantize.pqEncode 2M × 64d (m=8, k=16)") {
      graft.ops.Quantize.pqEncode(embs, flat, 8, 16)
        .agg(sum(element_at(col("codes"), 1))).head()
      2000000L
    }
    // one Lloyd iteration: encode + (s, c, d, bucket) fold + 1024-double collect
    timed("Quantize.pqTrainCodebooks 2M, one iteration") {
      graft.ops.Quantize.pqTrainCodebooks(embs, 64, 8, 16, iters = 1)
      2000000L
    }
    // asymmetric ADC scan: 8 queries × 2M reconstructions through the
    // native cosine (the verify tier a cell-pruned generator would bound)
    timed("Quantize.pqTopK 8 queries × 2M codes")(
      graft.ops.Quantize.pqTopK(embs, embs.filter(col("vec_id") < 8),
        k = 5, dim = 64, m = 8, kcb = 16).count())
    // count-min over 2M docs / 80M tokens: one explode + one (g, i, b) agg
    val docs = corpus(2000000L).localCheckpoint(true)
    timed("Sketches.countMinSketch 2M docs, d=4 w=1024, 1000 sources") {
      graft.ops.Sketches.countMinSketch(docs, "source", depth = 4, width = 1024)
        .agg(sum(col("cnt"))).head()
      2000000L
    }
  }

  ignore("round-8 session-7: mega-key temporal joins, HLL, feature hashing at 2M (opt-in probe)") {
    graft.functions.functions.register(spark)
    // 2M events, ONE user owning 50% of all rows (the mega-domain shape
    // the bin subdivision exists for) — a per-key-window as-of would put
    // 1M rows in one task; the (key, time-bin) shuffle key spreads them
    // over ~1400 bins of the 30-day span
    val ev = spark.range(0L, 2000000L, 1L,
        Runtime.getRuntime.availableProcessors() * 4)
      .select(col("id").as("event_id"),
        when(pmod(col("id"), lit(2L)) === 0L, 0L)
          .otherwise(pmod(graft.functions.functions.graft_mix64(col("id")), lit(100000L)))
          .as("user_id"),
        timestamp_micros(lit(1700000000000000L) +
          pmod(graft.functions.functions.graft_mix64(col("id") + 7L),
            lit(2592000000000L))).as("ts"),
        pmod(col("id"), lit(2L)).as("side"))
      .localCheckpoint(true)
    val left = ev.filter(col("side") === 0L).drop("side")
    val right = ev.filter(col("side") === 1L).drop("side")
    timed("TemporalJoin.asofJoin 1M×1M, mega-user @50%, tol=30min")(
      graft.ops.TemporalJoin.asofJoin(left, right, "user_id", "ts", "event_id",
        toleranceMicros = 1800000000L).count())
    val iv = left.select(col("user_id"), col("event_id").as("iv_id"),
      unix_micros(col("ts")).as("start_us"),
      (unix_micros(col("ts")) + 3600000000L).as("end_us"))
    val pt = right.select(col("user_id"), col("event_id").as("pt_id"),
      unix_micros(col("ts")).as("ts_us"))
    timed("TemporalJoin.intervalJoin 1M iv × 1M pt, mega-user, 1h/1h bins")(
      graft.ops.TemporalJoin.intervalJoin(iv, pt, binMicros = 3600000000L,
        keyCols = Seq("user_id")).count())
    // HLL + hashing trick over 2M docs / 80M tokens — both one narrow
    // pass + one partial-agg groupBy
    val docs = corpus(2000000L).localCheckpoint(true)
    timed("Sketches.hllRegisters+estimate 2M docs, 1000 sources") {
      graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllRegisters(docs, "source"), "source")
        .agg(sum(col("n_buckets"))).head()
      2000000L
    }
    timed("Features.hashFeatures 2M docs, D=1024")(
      graft.ops.Features.hashFeatures(docs, dims = 1024)
        .agg(count(lit(1)), sum(col("weight"))).head().getLong(0))
  }
}
