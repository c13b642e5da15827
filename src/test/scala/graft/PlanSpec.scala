package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan quality gates (builder brief: ".explain the plan and
  * iterate until it's the plan you'd want"). These keep plan regressions
  * out: filters must reach the parquet scan, projections must prune the
  * read schema, small sides must broadcast, the extraction hot path must
  * stay shuffle-free, and the banded theta join must plan as a hash join —
  * never a cartesian/nested-loop.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame, mode: String = "formatted"): String =
    df.queryExecution.explainString(ExplainMode.fromString(mode))

  test("q1: filter pushed to parquet scan + read schema pruned + codegen") {
    val p = plan(SparkEntry.queries("q1_pricing_summary")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // only the 6 referenced columns are read, not all 11
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).get
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"), readSchema)
    // codegen visibility needs codegen mode (AQE hides it in formatted)
    val cg = plan(SparkEntry.queries("q1_pricing_summary")(spark, sf), "codegen")
    assert(cg.contains("WholeStageCodegen"), "aggregation should be codegen'd")
  }

  test("q3: dimension side broadcasts (no shuffle join on the small side)") {
    val p = plan(SparkEntry.queries("q3_top_revenue")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("theta-band join plans as hash join, never cartesian") {
    val p = plan(SparkEntry.queries("q_theta_band")(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("ANN plans contain no interpreted higher-order functions") {
    // HOFs (aggregate/zip_with/transform) have no doGenCode — the r2 bench
    // showed them interpreting the hot inner product. All ANN paths must
    // resolve cosine/bucket to the native graft expressions instead.
    for (q <- Seq("q_ann_topk", "q_ann_lsh", "q_ann_ivf", "q_cosine_neardup")) {
      val p = plan(SparkEntry.queries(q)(spark, sf), "extended").toLowerCase
      // no HOF dot product anywhere (the r2 hot-path defect)
      assert(!p.contains("zip_with") && !p.contains("aggregate(lambda"),
        s"$q plan still computes a vector product via HOFs")
      assert(p.contains("graft_cosine"), s"$q should use the native cosine")
      // bounded non-hot HOFs stay: IVF sorts nCells=16 centroid structs
      // per row; neardup PLANTS perturbed test vectors via transform. The
      // pure ANN paths must be completely lambda-free.
      if (q == "q_ann_topk" || q == "q_ann_lsh")
        assert(!p.contains("lambdafunction"),
          s"$q plan still contains a higher-order function")
    }
  }

  test("KMV sketch query partial-aggregates map-side (one k-long array per group crosses the shuffle)") {
    val p = plan(SparkEntry.queries("q_kmv_distinct")(spark, sf), "simple")
    assert(p.contains("partial_graft_bottomk"), p.take(1500))
  }

  test("extraction hot path has zero Exchange (narrow scan→parse)") {
    val pages = graft.gen.PagesTable.pagesDF(spark, 100)
    val p = plan(graft.spark.ExtractJob.extractTexts(spark, pages).toDF(), "simple")
    assert(!p.contains("Exchange"), p)
  }

  test("provenance has exactly one shuffle (the url window)") {
    val pages = graft.gen.PagesTable.pagesDF(spark, 50)
    val docs = graft.spark.ExtractJob.extractDocs(spark, pages)
    val p = plan(graft.spark.ExtractJob.provenance(docs), "simple")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges\n$p")
  }

  test("int8 quantization is a narrow lambda-functions-only map: zero Exchange, no ScalaUDF") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Quantize.int8(e), "simple")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("pq encode is a narrow native pass: zero Exchange, no ScalaUDF, codebook as a plan literal") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val flat = graft.ops.Quantize.pqSeedCodebooks(e, 64, 8, 16)
    val p = plan(graft.ops.Quantize.pqEncode(e, flat, 8, 16), "simple")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("graft_pq_encode"), p)
  }

  test("count-min sketch partial-aggregates map-side (the sketch IS the partial agg) — no window, no join") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Sketches.countMinSketch(d, "source"), "simple")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair around one exchange; nothing else shuffles
    assert(p.linesIterator.count(_.contains("Exchange")) == 1, p)
    assert(p.linesIterator.count(_.contains("HashAggregate")) == 2, p)
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("ann cosine is pure Catalyst (no ScalaUDF in the plan)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Similarity.bruteForceTopK(e, e.limit(2), 3), "simple")
    assert(!p.toLowerCase.contains("scalaudf"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("exportAll is one narrow pass — zero Exchange, no self-join") {
    val pages = graft.gen.PagesTable.pagesDF(spark, 40)
    val docs = graft.spark.ExtractJob.extractDocs(spark, pages)
    val p = plan(graft.spark.Exports.exportAll(docs), "simple")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("minhash signatures have no single-partition global window") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Dedup.minhashSignaturesSql(d), "simple")
    assert(!p.contains("Window"), p.take(2000))
  }

  test("jaccard prefix pairs never plan a cartesian product") {
    val p = plan(SparkEntry.queries("q_jaccard_pairs")(spark, sf), "simple")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("dup spans plan: equi-joins only, never cartesian; no lambda") {
    val p = plan(SparkEntry.queries("q_dup_spans")(spark, sf), "extended")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    assert(!p.toLowerCase.contains("lambdafunction"), "dup-spans plan contains a HOF")
  }

  test("chunking is narrow: zero Exchange in the plan") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Packing.chunkDocs(d, maxLen = 64, stride = 48), "simple")
    assert(!p.contains("Exchange"), p.take(1500))
  }

  test("lm fluency and line dedup plans: equi-joins only, never cartesian") {
    // q_line_dedup: strictly no non-equi join of any kind
    val pl = plan(SparkEntry.queries("q_line_dedup")(spark, sf), "simple")
    assert(!pl.contains("CartesianProduct") && !pl.contains("BroadcastNestedLoopJoin"),
      s"q_line_dedup: ${pl.take(1500)}")
    // q_lm_fluency / q_lm_trigram: model joins stay equi; the ONLY
    // permitted nested-loop is the vocab-scalar attach — ONE BNLJ whose
    // build side is a one-row global aggregate (IdentityBroadcastMode),
    // constant work per stream row. Anything else non-equi is a bug.
    for (q <- Seq("q_lm_fluency", "q_lm_trigram")) {
      val p = plan(SparkEntry.queries(q)(spark, sf), "simple")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
      val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      assert(bnlj == 1, s"$q: expected exactly the vocab-scalar BNLJ, got $bnlj")
      assert(p.contains("BroadcastExchange IdentityBroadcastMode") &&
        p.contains("HashAggregate(keys=[], functions=[count(distinct tok"),
        s"$q: BNLJ build side is not the one-row vocab aggregate:\n${p.take(2000)}")
    }
  }

  test("line dedup shuffles carry positions and 8-byte hashes, never line text") {
    val p = plan(SparkEntry.queries("q_line_dedup")(spark, sf), "formatted")
    val lines = p.linesIterator.toVector
    val inputs = lines.zipWithIndex
      .filter(_._1.matches("\\(\\d+\\) Exchange.*"))
      .flatMap { case (_, i) => lines.drop(i).find(_.trim.startsWith("Input")) }
    // non-vacuous: the op has several real exchanges (hash counts, dup
    // join, cut-position collect, rewrite join)
    assert(inputs.size >= 2, s"expected multiple Exchange inputs:\n${p.take(1200)}")
    // no exchange may carry the exploded line or normalized key columns…
    inputs.foreach(in =>
      assert(!in.contains("line#") && !in.contains("key#"), in))
    // …and at most ONE (the ×1 doc-level rewrite join) may carry doc text
    assert(inputs.count(_.contains("t#")) <= 1,
      s"text crossed more than the rewrite join:\n${inputs.mkString("\n")}")
  }

  test("cut spans plan: equi-joins only, never cartesian; dup-set join is hash-keyed") {
    val p = plan(SparkEntry.queries("q_cut_spans")(spark, sf), "simple")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    // the duplicated-hash set joins on the 8-byte hash key. At THIS scale
    // the planner broadcasts it (a few hundred longs — correct, and
    // size-gated: localCheckpoint preserves stats, so a crawl-scale dup
    // set blows the autoBroadcast threshold and plans sort-merge); the
    // unacceptable shapes are the non-equi ones asserted above.
    assert(p.linesIterator.exists(l => l.contains("Join") && l.contains("[sh#")),
      s"no hash-keyed dup-set join found:\n${p.take(1500)}")
  }

  test("splits, pii scrub and normalize are narrow: zero Exchange in the plan") {
    // split/sample/scrub/normalize must stay one codegen'd scan at 100 TB —
    // a shuffle here would mean hashing or regexp got planned as a wide op
    for (q <- Seq("q_train_split", "q_hash_sample", "q_mixture_sample",
        "q_pii_scrub", "q_normalize")) {
      val p = plan(SparkEntry.queries(q)(spark, sf), "simple")
      assert(!p.contains("Exchange"), s"$q: ${p.take(1500)}")
      assert(!p.contains("ScalaUDF"), s"$q plans an interpreted UDF: ${p.take(1500)}")
    }
  }

  test("contamination broadcasts the benchmark shingle side") {
    val p = plan(SparkEntry.queries("q_contamination")(spark, sf), "simple")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("bm25 scoring pass is shuffle-free (stats folded as literals)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Ranking.bm25(d, Seq("spark", "join")), "simple")
    assert(!p.contains("Exchange"), p.take(1500))
  }

  test("langid plan is lambda-free (codegen'd intersects + when-chain argmax)") {
    // the array_sort(comparator) argmax was an interpreted HOF re-evaluated
    // per output column — 4.2 s for 2500 docs once the bench stopped
    // letting count() prune it (r5)
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.TextAnalysis.langId(d), "extended").toLowerCase
    assert(!p.contains("lambdafunction"), "langid plan still contains a higher-order function")
    assert(!p.contains("array_sort"), "langid should not sort; argmax is greatest + when-chain")
  }

  test("bm25 tf path is lambda-free (native term_counts, no interpreted HOFs)") {
    // the per-term size(filter(toks, _ === term)) form ran up to 32
    // interpreted lambdas per row (VERDICT r4 #3 — the same
    // HOF-breaks-codegen class the ANN gate catches)
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Ranking.bm25(d,
      Seq("spark", "join", "window", "vector", "stream")), "extended").toLowerCase
    assert(!p.contains("lambdafunction"), "bm25 plan still contains a higher-order function")
    assert(p.contains("graft_term_counts"), "bm25 should use the native term-counts pass")
  }

  test("stratified sample plans two bounded windows, never one whole-group sort") {
    // two-phase shape: window 1 partitions by (group, salt-bucket), window 2
    // ranks the <= k*saltBuckets survivors — no single window over a raw
    // stratum anywhere (the 100-TB skew killer, VERDICT r4 #1)
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Splits.stratifiedSample(d, "source", k = 5), "formatted")
    val windows = p.linesIterator.filter(_.trim.matches("\\(\\d+\\) Window")).toVector
    assert(windows.size == 2, s"expected 2 Window nodes, got ${windows.size}\n${p.take(2000)}")
    // bonus from the rank-filter shape: Spark pushes a WindowGroupLimit
    // (map-side top-k) below EACH exchange — a mega-stratum is cut to k
    // per input partition before any data moves
    assert(p.contains("WindowGroupLimit"), "rank-limit pushdown missing")
    // the inner window's partition spec must include the salt bucket: its
    // pmod(hash, S) projection feeds a two-column windowspec while the
    // outer window partitions by the raw group alone
    assert(p.contains("pmod"), "no salt-bucket projection found in the plan")
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toVector
    assert(specs.exists(_.matches(".*windowspecdefinition\\(source#\\d+, _w\\d+#\\d+L.*")),
      s"no salted two-column partition spec found:\n${specs.mkString("\n")}")
  }

  test("sequence packing has exactly one Exchange, partitioned by (group, shard) — never whole-group") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Packing.packGreedy(d, budget = 200), "simple")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1, p.take(1500))
    // the salted sub-shard must be a partitioning key: a mega-group fans
    // out over `shards` folds instead of one sequential task (VERDICT r5)
    val ex = p.linesIterator.find(_.contains("Exchange hashpartitioning"))
      .getOrElse(fail(s"no hash Exchange in\n${p.take(1500)}"))
    assert(ex.matches(".*hashpartitioning\\(g#\\d+, shard#\\d+L?.*"), ex)
  }

  test("pagerank step plan: equi-joins + keyed folds, scalar attaches are one-row broadcasts") {
    import org.apache.spark.sql.functions._
    // range-backed edges: LocalRelation would constant-fold the plan away
    val e = spark.range(200).select((col("id") % 40).as("src"),
      ((col("id") * 13 + 7) % 40).as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val eOd = e.join(outdeg, Seq("src")) // loop-invariant attach (r9)
    // in pageRank the incoming rank frame is checkpointed, so only THIS
    // step's joins are in the plan — model that with a plain rank column
    val pr = nodes.select(col("node"), (lit(1.0) / lit(40.0)).as("pr"))
    val p = plan(graft.ops.Graph.step(eOd, nodes, outdeg, 40L, pr, 0.85, 16), "simple")
    // never an all-pairs join: the only nested loop is the one-row
    // dangling-mass attach (n is a literal since r9)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj == 1, s"expected 1 one-row scalar attach, got $bnlj:\n${p.take(2500)}")
    assert(p.contains("IdentityBroadcastMode"), p.take(2000))
    // rank propagation joins are hash equi-joins on src/dst/node keys
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p.take(2000))
  }

  test("cluster representative argmax is a two-phase hash aggregate, never a per-cluster window") {
    import org.apache.spark.sql.functions._
    // range-backed frames so nothing constant-folds to a LocalRelation
    val clusters = spark.range(1000)
      .select(col("id").as("doc_id"), (col("id") % 10).as("cluster_id"))
    val quality = spark.range(1000)
      .select(col("id").as("doc_id"), (col("id") % 97).as("quality"))
    val df = graft.ops.Dedup.clusterRepresentatives(clusters, quality)
    val p = plan(df, "simple")
    // a mega-cluster must reduce map-side: partial min/count before the
    // cluster_id shuffle, then a final aggregate — and no Window operator
    // (rank-per-cluster would sort whole clusters in single tasks)
    assert(p.contains("partial_min") || p.contains("functions=[partial"),
      p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("selection rank/prefix-sum plans range-partition, never a single-partition window") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val ranked = graft.ops.Selection.rankBy(d,
      Seq(col("n_chars").cast("double")), Seq(false), numPartitions = 4)
    // the rank frame is RDD-backed (ordinals already assigned) — the gate
    // is on HOW they were assigned: the sorted projection plans a range
    // exchange, not Exchange SinglePartition + Window
    val sorted = d.select(col("n_chars").cast("double").as("__k0"),
        col("doc_id").cast("long").as("__id"))
      .repartitionByRange(4, col("__k0").desc, col("__id").asc)
      .sortWithinPartitions(col("__k0").desc, col("__id").asc)
    val p = plan(sorted, "simple")
    assert(p.contains("Exchange rangepartitioning"), p.take(1200))
    assert(!p.contains("SinglePartition"), p.take(1200))
    assert(ranked.columns.toSeq == Seq("doc_id", "rank"))
  }

  test("capPerGroup plans two two-phase hash aggregates, never a window or whole-group sort") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 7).cast("string").as("host"), col("n_chars"))
    val p = plan(graft.ops.Selection.capPerGroup(d, "host", 5, "n_chars"), "simple")
    // both levels must be partial-then-final hash aggregates (a mega-host
    // reduces map-side); a Window or a per-group Sort would put the whole
    // host in one task
    assert(p.contains("partial_collect_list") || p.contains("functions=[partial"),
      p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("SinglePartition"), p.take(2000))
  }

  test("exact dedup shuffles only hash+length, not the text") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Dedup.exact(d), "formatted")
    // the shuffled row must be (text_hash, text_len, partials) — never text
    val inputLine = p.linesIterator.toVector
      .dropWhile(l => !l.matches("\\(\\d+\\) Exchange.*"))
      .find(_.trim.startsWith("Input"))
      .getOrElse(fail(s"no Exchange Input line in\n${p.take(1500)}"))
    // grouping keys surface as _groupingexpression; partials as min/count.
    // What matters: the raw text column never crosses the wire.
    assert(inputLine.contains("min#") && inputLine.contains("count#"), inputLine)
    assert(!inputLine.contains("text#"), inputLine)
  }

  test("robots gate: equi-join on the host key, struct-argmax as hash agg — no cartesian, no window") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), concat(lit("https://h"), col("doc_id") % 7,
        lit(".com/p"), col("doc_id") % 5).as("url"))
    import spark.implicits._
    val rules = Seq(("h1.com", false, "/p"), ("h1.com", true, "/p1"))
      .toDF("host", "is_allow", "prefix")
    val p = plan(graft.ops.Robots.robotsGate(d, rules), "simple")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("partial_max") || p.contains("functions=[partial"), p.take(2000))
  }

  test("semDedup candidate pairs join on the cell key — never a cartesian, never a per-cell window") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Similarity.semDedup(e, eps = 0.95, k = 4,
      iters = 1, dim = 64), "simple")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
    // precedence rides the join condition — a Window would put a
    // mega-cell's whole sort in one task
    assert(!p.contains("Window"), p.take(2000))
  }

  test("semDedup mega-cell path: the pair join keys on (cell, bucket), not cell alone") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Similarity.semDedup(e, eps = 0.95, k = 4,
      iters = 1, dim = 64, bucketBits = 6), "simple")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    // the candidate join must carry the hyperplane bucket in its key —
    // a degenerate mega-cell then splits into ~2^bits bounded buckets
    val joinLine = p.linesIterator.find(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("cell")).getOrElse("")
    assert(joinLine.contains("bucket"), s"pair join not keyed by bucket: $joinLine")
  }

  test("context windows: range exchange from the prefix sum, never SinglePartition") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Packing.contextWindows(d, winLen = 128), "simple")
    assert(!p.contains("SinglePartition"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("GD training step: keyed gradient folds, scalar literals, no window/cartesian/nested-loop") {
    import org.apache.spark.sql.functions._
    // range-backed feature/label frames (LocalRelation would fold away)
    val x = spark.range(300).select((col("id") % 50).as("did"),
      concat(lit("t"), col("id") % 7).as("tok"),
      (lit(1.0) / (col("id") % 5 + 1).cast("double")).as("x"))
    val labels = spark.range(50).select(col("id").as("did"),
      (col("id") % 2).cast("double").as("y"))
    val w = x.select(col("tok")).distinct().select(col("tok"), lit(0.0).as("w"))
    val (wN, _) = graft.ops.Train.step(x, labels, 50L, w, 0.0, 0.5, 16)
    val pw = plan(wN, "simple")
    // per-token gradients ride hash equi-joins + keyed aggregates; the
    // doc count and bias are literals now (r9), so NO nested loop at all
    assert(!pw.contains("Window") && !pw.contains("CartesianProduct"), pw.take(2500))
    assert(!pw.contains("BroadcastNestedLoopJoin"), pw.take(2500))
  }

  test("ranked search: probe filter below the index shuffle, one scalar attach, top-k never a global sort") {
    val p = plan(SparkEntry.queries("q_ranked_search")(spark, sf), "simple")
    // the probe IN-filter sits on the generated term stream, BEFORE the
    // (term, doc) aggregation shuffle
    val genIdx = p.indexOf("Generate posexplode")
    val filterIdx = p.indexOf("IN (")
    assert(filterIdx >= 0 && genIdx > filterIdx, p.take(2500))
    // the only nested loop is the one-row corpus-stats attach
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1,
      p.take(2500))
    // top-k plans as TakeOrderedAndProject, never a global Sort+Limit
    assert(p.contains("TakeOrderedAndProject"), p.take(2500))
    assert(!p.contains("Window"), p.take(2500))
  }

  test("cooccur: one composite-key equi-join, marginals as hash aggs — no window, one scalar attach") {
    val p = plan(SparkEntry.queries("q_cooccur")(spark, sf), "simple")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p.take(2500))
    // the only nested loop is the one-row pair-total attach
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1,
      p.take(2500))
  }

  test("quantile gate: group ranks without a per-group window; group stats are an agg, not a sort") {
    val p = plan(SparkEntry.queries("q_quantile_gate")(spark, sf), "simple")
    assert(!p.contains("Window"), p.take(2500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2500))
  }

  test("lang tier: langid + quantile gate compose window-free") {
    val p = plan(SparkEntry.queries("q_lang_tier")(spark, sf), "simple")
    assert(!p.contains("Window"), p.take(2500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2500))
  }

  test("revisit delta: only the per-doc chunk-assignment window; hash joins on 8-byte hashes") {
    val p = plan(SparkEntry.queries("q_revisit_delta")(spark, sf), "simple")
    // the ONLY windows are the two per-doc CDC running-anchor counts
    // (state bounded by doc length), one per snapshot side
    assert(p.linesIterator.count(_.contains("Window")) == 2, p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2500))
  }

  test("doc tiers: hash aggregates only — no window, no cartesian") {
    val p = plan(SparkEntry.queries("q_doc_tiers")(spark, sf), "simple")
    assert(!p.contains("Window"), p.take(2500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2500))
  }
}
