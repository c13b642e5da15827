package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Components:
  *  1. headline queries from SparkEntry at SPARK_GRAFT_SF_DIR — per-query
  *     wall seconds;
  *  2. the extraction pipeline (the BASELINE.json metric: documents
  *     extracted per second) over a pre-materialized parquet `pages` table
  *     of Common-Crawl-sized documents, run at TWO parallelism levels on
  *     identical input — local[N] and local[4N] — reporting throughput at
  *     both plus scaling efficiency (no real cluster in this sandbox; see
  *     BENCH/BASELINE.md).
  *
  * Methodology: each parallelism level runs in its OWN child JVM with GC
  * threads matched to its core count. A shared JVM would let the machine's
  * full GC thread pool subsidize the small configuration and would leak
  * JIT warmth from one level into the next — both bias the efficiency
  * number. Best-of-reps inside each child absorbs JIT warm-up.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Materialize the deterministic pages corpus once (excluded from the
    * timed runs — the metric is extraction, not generation). */
  private def ensurePages(dir: String, nDocs: Long, sizeBoost: Int): Unit =
    // version-tagged marker guard shared with SparkEntry.pagesFixture;
    // the by-name generate block keeps session creation lazy (no session
    // is built when the fixture is already fresh)
    graft.gen.FixtureStore.ensure(java.nio.file.Paths.get(dir),
      s"$nDocs-$sizeBoost-v${graft.gen.FixtureGen.Version}") {
      val spark = session(Runtime.getRuntime.availableProcessors())
      try graft.gen.PagesTable.pagesDF(spark, nDocs,
        Runtime.getRuntime.availableProcessors() * 4, sizeBoost)
        .write.mode("overwrite").parquet(dir)
      finally spark.stop()
    }

  /** Child-JVM phase: measure extraction throughput AND the pure-ALU
    * control with the same thread count in the same host time window —
    * the sandbox's CPU share drifts over minutes, so control and workload
    * must be sampled together to normalize fairly. */
  private def extractPhase(cores: Int, pagesDir: String, reps: Int): Unit = {
    val spark = session(cores)
    try {
      var best = 0.0
      var bestCtl = 0.0
      var r = 0
      while (r < reps) {
        val t0 = System.nanoTime()
        val n = graft.spark.ExtractJob
          .extractTexts(spark, spark.read.parquet(pagesDir))
          .count()
        val thr = n / ((System.nanoTime() - t0) / 1e9)
        if (thr > best) best = thr
        val ctl = cpuControl(cores)
        if (ctl > bestCtl) bestCtl = ctl
        r += 1
      }
      println(f"GRAFT_THR $best%.1f GRAFT_CTL $bestCtl%.3f GRAFT_RSS ${peakRssMb()}%.1f")
    } finally spark.stop()
  }

  /** Peak resident set of THIS process (VmHWM), MB — the A8 memory metric
    * (the reference reports per-filing peak RSS, benchmark_report.md:26-38).
    * Sampled after the timed reps so it covers the whole extraction run. */
  private def peakRssMb(): Double =
    try {
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/self/status"))
        .asScala.find(_.startsWith("VmHWM"))
        .map(_.replaceAll("[^0-9]", "").toDouble / 1024.0).getOrElse(-1.0)
    } catch { case _: Exception => -1.0 }

  /** Spawn a child JVM for one parallelism level; returns
    * (extraction docs/s, control Gop/s, peak RSS MB) sampled in the same
    * window. */
  private def spawnPhase(cores: Int, pagesDir: String, reps: Int): (Double, Double, Double) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("java.base/") ||
        a.startsWith("-Dspark.") || a.startsWith("--enable-native-access"))
    // G1 with a FIXED heap: ParallelGC's adaptive sizing grew the young gen
    // to ~8 GB under the 32-thread allocation rate and then paid 0.5-1.3 s
    // stop-world copies (measured r3: 4.3 s of pauses in a ~10 s phase —
    // the entire r2 "scaling collapse"). G1 in the same windows: 20.6k →
    // 51.7k docs/s at n32. GC threads stay proportional to the child's
    // cores so the small config is not subsidized by machine-wide GC.
    val cmd = Seq(javaBin) ++ inherited ++ Seq(
      "-Xms12g", "-Xmx12g",
      "-XX:+UseG1GC", s"-XX:ParallelGCThreads=${math.max(cores / 2, 2)}",
      "-cp", System.getProperty("java.class.path"),
      "graft.Bench", "--extract-phase", cores.toString, pagesDir, reps.toString)
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    proc.waitFor()
    out.linesIterator.collectFirst {
      case l if l.startsWith("GRAFT_THR ") =>
        val parts = l.split(" ")
        (parts(1).toDouble, parts(3).toDouble,
          if (parts.length > 5) parts(5).toDouble else -1.0)
    }.getOrElse((0.0, 0.0, -1.0))
  }

  /** Pure-ALU control: how well does THIS BOX scale threads at all?
    * Register-only splitmix64 loop — no memory traffic, no allocation, no
    * Spark. On a throttled/shared VM this caps the achievable efficiency
    * of any workload; the extraction number is judged against it. */
  private def cpuControl(threads: Int): Double = {
    val itersTotal = 6000000000L
    val per = itersTotal / threads
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { id =>
      val t = new Thread(() => {
        var z = id.toLong; var seed = 0L
        var i = 0L
        while (i < per) {
          z += 0x9E3779B97F4A7C15L
          var x = z
          x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
          x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
          seed ^= x ^ (x >>> 31)
          i += 1
        }
        if (seed == 42) println("") // defeat dead-code elimination
      })
      t.start(); t
    }
    ts.foreach(_.join())
    itersTotal / ((System.nanoTime() - t0) / 1e9) / 1e9 // Gop/s
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 4 && args(0) == "--extract-phase") {
      extractPhase(args(1).toInt, args(2), args(3).toInt)
      return
    }
    if (args.length >= 3 && args(0) == "--gen-pages") {
      ensurePages(args(1), args(2).toLong, if (args.length > 3) args(3).toInt else 8)
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // 400k docs ≈ 0.9 GB: sized so the n32 phase runs ~6 s of real work —
    // at 100k the fixed ~1.2 s/rep harness cost (read+plan+schedule) was
    // 40% of the n32 wall and read as a scaling defect (r3 measurement:
    // W/cores + C fits both levels almost exactly; 4× work → normalized
    // efficiency 1.03 in the same host windows)
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "400000").toLong
    val sizeBoost = sys.env.getOrElse("SPARK_GRAFT_BENCH_BOOST", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val pagesDir = sys.env.getOrElse("SPARK_GRAFT_PAGES_DIR", "/tmp/graft_bench_pages")
    val lowCores = math.max(cpus / 4, 2)

    // 1. headline queries
    val spark = session(cpus)
    // session warm-up: JVM JIT, codegen compiler, and parquet footer reads
    // otherwise land entirely on the alphabetically-first query (q1 read
    // 5-6 s of which ~4 s was first-query warmup, not q1)
    try {
      spark.range(1000000L).selectExpr("sum(id)").count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    } catch { case _: Throwable => }
    // fixture generation must never land inside a timed query — and its
    // failure must be LOUD: silently falling back to inline generation
    // would reproduce the exact timing bias this exists to remove
    try SparkEntry.ensureFixtures(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] fixture generation FAILED (timed queries will regenerate inline): $e")
    }
    val errors = Vector.newBuilder[String]
    val results = SparkEntry.queries.toVector.sortBy(_._1).map { case (name, fn) =>
      // a failed query must NOT masquerade as a fast one: record -1 and list
      // it in `errors` (a swallowed exception used to read as 0.00 s)
      def once(): Double = {
        // drop cross-query memos (shared docs / pair graph): every rep must
        // time the OPERATOR, not a warm localCheckpoint from a prior query
        // or rep — min-of-reps would otherwise hide a 10x regression in the
        // memoized stage (review r4)
        SparkEntry.resetSharedState()
        val t0 = System.nanoTime()
        // noop sink, NOT count(): under count() Catalyst prunes every
        // unreferenced projection, so narrow queries (pii scrub's regex
        // chain, url canonicalization, bm25's score) timed roughly the
        // parquet scan instead of the operator (ADVICE r4). The noop write
        // materializes every output column through the full plan.
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // best-of-2, plus a third rep for slow queries: r3's single-shot
      // values produced three phantom 6-9× "regressions" (one bad host
      // window each) that cost a full adjudication cycle
      val t = try {
        val t1 = once(); val t2 = once()
        val best2 = math.min(t1, t2)
        if (best2 > 2.0) math.min(best2, once()) else best2
      } catch { case _: Throwable => errors += name; -1.0 }
      name -> t
    }
    spark.stop()
    val errJson = errors.result().map("\"" + _ + "\"").mkString("[", ",", "]")

    // ≤1 KB machine-readable digest, printed AFTER the full line: the full
    // line outgrew the driver's tail window (all four rounds' BENCH
    // artifacts show "parsed": null; r4's 56-query map truncated away the
    // total) — the digest keeps total/slowest/scaling parseable regardless
    // of how many queries the map grows to.
    def summaryLine(extra: String): String = {
      val good = results.filter(_._2 > 0)
      val slow = good.sortBy(-_._2).take(5)
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
      s"""{"summary":1,"total":${f"${good.map(_._2).sum}%.2f"},""" +
        s""""n_queries":${results.length},"n_errors":${errors.result().length},""" +
        s""""slowest":$slow$extra}"""
    }

    // dev iteration: skip the (minutes-long) extraction scaling phase
    if (sys.env.get("SPARK_GRAFT_BENCH_QUERIES_ONLY").contains("1")) {
      val qs0 = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val total0 = results.map(_._2).filter(_ > 0).sum
      println(s"""{"metric":"total","value":$total0,"unit":"sec","queries":$qs0,""" +
        s""""sf":"$sfDir","query_errors":$errJson}""")
      println(summaryLine(""))
      return
    }

    // 2. extraction scaling: same parquet input, N vs 4N cores, one JVM
    // each, ALTERNATED (A/B/A/B) because the sandbox's host CPU share
    // drifts over minutes — each child also samples the pure-ALU control
    // in its own window for fair normalization.
    ensurePages(pagesDir, benchDocs, sizeBoost)
    // 5 rounds (was 3): r3's per-round raw efficiencies (0.912/0.817/0.559)
    // showed monotone host-share decay — a 5-round median is robust to one
    // bad tail window
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "5").toInt
    val lowSamples = Vector.newBuilder[(Double, Double, Double)]
    val highSamples = Vector.newBuilder[(Double, Double, Double)]
    var round = 0
    while (round < rounds) {
      lowSamples += spawnPhase(lowCores, pagesDir, reps)
      highSamples += spawnPhase(lowCores * 4, pagesDir, reps)
      round += 1
    }
    val lows = lowSamples.result(); val highs = highSamples.result()
    val thrLow = lows.map(_._1).max;  val ctlLow = lows.map(_._2).max
    val thrHigh = highs.map(_._1).max; val ctlHigh = highs.map(_._2).max
    val rssLow = lows.map(_._3).max;  val rssHigh = highs.map(_._3).max
    // Efficiency is computed PER ROUND (each round's N and 4N children run
    // back-to-back in the same host window) — taking best-of-N and
    // best-of-4N independently can pair a good window with a bad one and
    // report drift, not scaling. The headline round is the MEDIAN by
    // normalized value: max-of-noisy-ratios is biased upward (a round
    // whose control sample collapsed would win on a low denominator); all
    // per-round triples are emitted so nothing is hidden.
    val perRound = lows.zip(highs).map { case ((tl, cl, _), (th, ch, _)) =>
      val eff = if (tl > 0) th / tl / 4.0 else 0.0
      val ctl = if (cl > 0) ch / cl / 4.0 else 0.0
      (eff, ctl, if (ctl > 0) eff / ctl else 0.0)
    }
    val headline = perRound.sortBy(_._3).apply(perRound.length / 2)
    val efficiency = headline._1
    val ctlEff = headline._2
    val normalized = headline._3
    val roundsJson = perRound.map { case (e, c, n) =>
      f"""{"eff":$e%.3f,"ctl_eff":$c%.3f,"normalized":$n%.3f}"""
    }.mkString("[", ",", "]")
    def fmtSamples(xs: Vector[(Double, Double, Double)]): String =
      xs.map(x => f"${x._1}%.0f").mkString("[", ",", "]")

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""query_errors":$errJson,""" +
      s""""extract_docs_per_sec_n$lowCores":${f"$thrLow%.1f"},""" +
      s""""extract_docs_per_sec_n${lowCores * 4}":${f"$thrHigh%.1f"},""" +
      s""""extract_bench_docs":$benchDocs,"extract_size_boost":$sizeBoost,""" +
      s""""extract_thr_samples_n$lowCores":${fmtSamples(lows)},""" +
      s""""extract_thr_samples_n${lowCores * 4}":${fmtSamples(highs)},""" +
      s""""scaling_efficiency":${f"$efficiency%.3f"},""" +
      s""""extract_peak_rss_mb_n$lowCores":${f"$rssLow%.1f"},""" +
      s""""extract_peak_rss_mb_n${lowCores * 4}":${f"$rssHigh%.1f"},""" +
      s""""cpu_control_gops_n$lowCores":${f"$ctlLow%.2f"},""" +
      s""""cpu_control_gops_n${lowCores * 4}":${f"$ctlHigh%.2f"},""" +
      s""""cpu_control_efficiency":${f"$ctlEff%.3f"},""" +
      s""""scaling_rounds":$roundsJson,""" +
      s""""efficiency_vs_hw_control":${f"$normalized%.3f"}}""")
    val rawMedian = perRound.map(_._1).sorted.apply(perRound.length / 2)
    println(summaryLine(
      s""","scaling_raw_median":${f"$rawMedian%.3f"},""" +
      s""""scaling_eff":${f"$efficiency%.3f"},"ctl_eff":${f"$ctlEff%.3f"},""" +
      s""""normalized":${f"$normalized%.3f"},""" +
      s""""docs_per_sec_n$lowCores":${f"$thrLow%.0f"},""" +
      s""""docs_per_sec_n${lowCores * 4}":${f"$thrHigh%.0f"}"""))
  }
}
