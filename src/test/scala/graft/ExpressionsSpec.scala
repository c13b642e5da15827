package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.TextMetrics
import graft.functions.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Native Catalyst expression tests: correctness vs the scalar evaluators,
  * SQL registration, null handling, and codegen participation (the whole
  * point of an Expression over a UDF). */
class ExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("expressions match their scalar evaluators (Column + SQL paths)") {
    import spark.implicits._
    register(spark)
    val df = Seq(("alpha beta gamma", "alpha beta delta"), ("x", "x"))
      .toDF("a", "b")
    val viaCol = df.select(
      graft_simhash64($"a"), graft_fingerprint64($"a"),
      graft_ratcliff_ratio($"a", $"b"), graft_wer($"a", $"b")).collect()
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql(
      """SELECT graft_simhash64(a), graft_fingerprint64(a),
        |graft_ratcliff_ratio(a, b), graft_wer(a, b) FROM t""".stripMargin).collect()
    assert(viaCol.toSeq == viaSql.toSeq)
    assert(viaCol(0).getLong(0) == Dedup.simhash("alpha beta gamma"))
    assert(viaCol(0).getLong(1) == TextAnalysis.fingerprint64("alpha beta gamma"))
    assert(viaCol(0).getDouble(2) ==
      TextMetrics.similarityRatio("alpha beta gamma", "alpha beta delta"))
    assert(viaCol(0).getDouble(3) == TextMetrics.wer("alpha beta gamma", "alpha beta delta"))
    assert(viaCol(1).getDouble(3) == 0.0)
  }

  test("graft_term_counts: one-pass tf matches the per-term filter counts (Column + SQL + codegen)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, coalesce, concat, lit, split}
    register(spark)
    val df = spark.range(6).select(
      concat(lit("spark join spark window "), $"id",
        lit(" spark  join")).as("text")) // double space → empty token
    val toks = split(coalesce($"text", lit("")), " ")
    val terms = Seq("spark", "join", "absent", "window")
    val r = df.select(graft_term_counts(toks, array(terms.map(lit): _*)).as("tc"))
      .collect()
    r.foreach { row =>
      val tc = row.getSeq[Int](0)
      assert(tc == Seq(3, 2, 0, 1), tc)
    }
    // SQL path + codegen participation (no ScalaUDF in the plan)
    df.createOrReplaceTempView("tc_t")
    val sq = spark.sql(
      "SELECT graft_term_counts(split(text, ' '), array('spark','join')) AS tc FROM tc_t")
    assert(sq.collect().forall(_.getSeq[Int](0) == Seq(3, 2)))
    val cg = sq.queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen") && !cg.toLowerCase.contains("scalaudf"))
    // null-element tokens and a null array are handled
    val nullArr = Seq((null.asInstanceOf[String])).toDF("text")
      .select(graft_term_counts(split($"text", " "), array(lit("x"))).as("tc"))
      .collect().head
    assert(nullArr.isNullAt(0)) // null input array → null (framework)
    // duplicate probe terms: first occurrence wins, second stays 0
    val dup = df.select(graft_term_counts(toks,
      array(lit("spark"), lit("spark"))).as("tc")).collect().head.getSeq[Int](0)
    assert(dup == Seq(3, 0), dup)
    // non-foldable terms argument fails analysis with a clear error
    val e = intercept[Exception] {
      df.select(graft_term_counts(toks, array(toks.getItem(0)))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }

  test("graft_mixture_keep: one-probe gate matches per-source thresholds (Column + SQL + codegen)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, element_at, lit, map_from_arrays}
    register(spark)
    // thresholds map: 'all' keeps unconditionally (NULL value), 'half'
    // keeps h < 0, 'none' absent → drop
    val thresholds = map_from_arrays(
      array(lit("all"), lit("half")),
      array(lit(null).cast("long"), lit(0L)))
    val df = spark.range(8).select(
      element_at(array(lit("all"), lit("half"), lit("none")),
        (($"id" % 3) + 1).cast("int")).as("src"),
      ($"id" * 1000000007L - 4L).as("h")) // mixed-sign hashes
    val r = df.select($"src", $"h",
        graft_mixture_keep($"src", $"h", thresholds).as("keep"))
      .as[(String, Long, Boolean)].collect()
    r.foreach { case (src, h, keep) =>
      val want = src match {
        case "all" => true
        case "half" => h < 0L
        case _ => false
      }
      assert(keep == want, s"($src, $h)")
    }
    // SQL path + codegen participation (no ScalaUDF, static evaluator call)
    df.createOrReplaceTempView("mix_t")
    val sq = spark.sql("SELECT graft_mixture_keep(src, h, " +
      "map_from_arrays(array('all','half'), array(CAST(NULL AS BIGINT), 0L))) AS k FROM mix_t")
    assert(sq.collect().length == 8)
    val cg = sq.queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen") && !cg.toLowerCase.contains("scalaudf"))
    assert(cg.contains("graft.functions.ExprEval.mixtureKeep"))
    // null source → null (framework), which a filter drops
    val nr = Seq((null.asInstanceOf[String], 1L)).toDF("src", "h")
      .select(graft_mixture_keep($"src", $"h", thresholds)).collect().head
    assert(nr.isNullAt(0))
    // non-foldable thresholds fail analysis with a clear error
    val e = intercept[Exception] {
      df.select(graft_mixture_keep($"src", $"h",
        map_from_arrays(array($"src"), array($"h")))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.toLowerCase.contains("literal"), e.getMessage)
    // NULL map literal rejected at analysis (would NPE at codegen fold)
    val e2 = intercept[Exception] {
      df.select(graft_mixture_keep($"src", $"h",
        lit(null).cast("map<string,bigint>"))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("non-null"), e2.getMessage)
  }

  test("null inputs yield null (framework null handling)") {
    import spark.implicits._
    register(spark)
    val df = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
    val r = df.select(graft_simhash64($"a"), graft_wer($"a", $"b")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("expressions run inside whole-stage codegen, not as ScalaUDF") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit}
    register(spark)
    // a LocalRelation would be constant-folded away — use a range scan
    val df = spark.range(4)
      .select(concat(lit("a b c "), $"id").as("a"), concat(lit("a b d "), $"id").as("b"))
      .select(graft_simhash64($"a").as("s"), graft_wer($"a", $"b").as("w"))
    val cg = df.queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen"))
    assert(cg.contains("graft.functions.ExprEval.simhash64"), "generated code must call the static evaluator")
    assert(!cg.toLowerCase.contains("scalaudf"))
  }

  test("graft_cosine matches the scalar formula and runs codegen'd (Column + SQL)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, lit}
    register(spark)
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val got = df.select(graft_cosine($"a", $"b")).head().getDouble(0)
    val want = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - want) < 1e-12, got)
    // mixed float/double sides (the IVF centroid-literal case)
    val mixed = df.select(graft_cosine($"a",
      array(lit(3.0), lit(2.0), lit(1.0)))).head().getDouble(0)
    assert(math.abs(mixed - want) < 1e-12, mixed)
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT graft_cosine(a, b) FROM vecs").head().getDouble(0)
    assert(viaSql == got)
    // null vector → null
    val n = Seq((null.asInstanceOf[Seq[Float]], Seq(1.0f)))
      .toDF("a", "b").select(graft_cosine($"a", $"b")).head()
    assert(n.isNullAt(0))
    // codegen participation
    val cg = spark.range(4)
      .select(array($"id".cast("double"), lit(1.0)).as("a"),
        array(lit(1.0), $"id".cast("double")).as("b"))
      .select(graft_cosine($"a", $"b"))
      .queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(cg.contains("graft.functions.ExprEval.cosineArr"), "must call the static evaluator")
    assert(!cg.toLowerCase.contains("scalaudf"))
  }

  test("graft_zvalue: hand-computed Morton interleave, SQL path, nulls, codegen, type check") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    register(spark)
    // x on even bits, y on odd: z(3,0)=0b0101, z(0,3)=0b1010, z(3,3)=0b1111
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L), (21L, 42L)).toDF("x", "y")
    val got = df.select(graft_zvalue($"x", $"y", lit(6))).as[Long].collect().toSeq
    // 21=0b010101, 42=0b101010 → interleave alternates → 0b100110011001
    assert(got == Seq(5L, 10L, 15L, 0x999L))
    // scalar evaluator agrees; adjacency: unit steps move z locally at low bits
    assert(graft.functions.ExprEval.zValue(21L, 42L, 6) == 0x999L)
    df.createOrReplaceTempView("zxy")
    assert(spark.sql("SELECT graft_zvalue(x, y, 6) FROM zxy WHERE x = 21")
      .head().getLong(0) == 0x999L)
    // null dimension → null
    val n = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(graft_zvalue($"x", $"y", lit(4))).head()
    assert(n.isNullAt(0))
    // codegen participation
    val cg = spark.range(8)
      .select(graft_zvalue($"id", $"id" + 1L, lit(8)))
      .queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(cg.contains("graft.functions.ExprEval.zValue"), "must call the static evaluator")
    assert(!cg.toLowerCase.contains("scalaudf"))
    // wrong types rejected at analysis
    val e = intercept[Exception] {
      Seq(("a", 1L)).toDF("x", "y").select(graft_zvalue($"x", $"y", lit(4))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }

  test("graft_pq_encode: argmin codes, tie to low code, codegen, analysis errors on bad codebook") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, typedLit}
    register(spark)
    // dsub=2, k=2, m=2; codebook [(s*k+j)*dsub+d]
    val cb = Seq(1.0, 0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0)
    val df = Seq(
      Tuple1(Seq(0.9f, 0.1f, 0.2f, 0.8f)),  // codes (0, 0)
      Tuple1(Seq(0.1f, 0.9f, 0.8f, 0.2f)),  // codes (1, 1)
      Tuple1(Seq(0.5f, 0.5f, 0.5f, 0.5f)))  // exact ties → (0, 0)
      .toDF("v")
    val got = df.select(graft_pq_encode($"v", typedLit(cb), lit(2), lit(2)))
      .as[Seq[Int]].collect().toSeq
    assert(got == Seq(Seq(0, 0), Seq(1, 1), Seq(0, 0)), got)
    // SQL path
    df.createOrReplaceTempView("pqv")
    assert(spark.sql(
      "SELECT graft_pq_encode(v, array(1.0D, 0.0D, 0.0D, 1.0D, 0.0D, 1.0D, 1.0D, 0.0D), 2, 2) FROM pqv")
      .collect().map(_.getSeq[Int](0).toSeq).toSeq == got)
    // codegen participation (static evaluator, never ScalaUDF) — a
    // LocalTableScan never codegens, so probe over range()
    val cg = spark.range(4)
      .select(org.apache.spark.sql.functions.array(
        (0 until 4).map(i => ($"id" + i).cast("float")): _*).as("v"))
      .select(graft_pq_encode($"v", typedLit(cb), lit(2), lit(2)))
      .queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(cg.contains("graft.functions.ExprEval.pqEncode"), cg.take(1500))
    assert(!cg.toLowerCase.contains("scalaudf"))
    // null vector → null
    assert(Seq(Tuple1(Option.empty[Seq[Float]])).toDF("v")
      .select(graft_pq_encode($"v", typedLit(cb), lit(2), lit(2))).head().isNullAt(0))
    // codebook length not a multiple of k*dsub → analysis failure
    val e1 = intercept[Exception] {
      df.select(graft_pq_encode($"v", typedLit(Seq(1.0, 2.0, 3.0)), lit(2), lit(2))).collect()
    }
    assert(e1.getMessage.contains("multiple"), e1.getMessage)
    // non-foldable codebook → analysis failure
    val e2 = intercept[Exception] {
      df.select(graft_pq_encode($"v",
        org.apache.spark.sql.functions.transform($"v", x => x.cast("double")),
        lit(2), lit(2))).collect()
    }
    assert(e2.getMessage.contains("foldable"), e2.getMessage)
    // wrong row dimension fails loudly at eval, not silently truncating
    val e3 = intercept[Exception] {
      Seq(Tuple1(Seq(1f, 2f))).toDF("v")
        .select(graft_pq_encode($"v", typedLit(cb), lit(2), lit(2))).collect()
    }
    assert(e3.getMessage.contains("dim") || e3.getCause != null, e3.getMessage)
  }

  test("graft_hyperplane_sig matches the per-plane sign buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    register(spark)
    val dim = 8; val bits = 5
    val v = Array.tabulate(dim)(i => (i - 3).toFloat / 2.0f)
    val sig = Seq(Tuple1(v.toSeq)).toDF("v")
      .select(graft_hyperplane_sig($"v", lit(dim), lit(bits))).head().getLong(0)
    var want = 0L
    for (p <- 0 until bits) {
      val plane = graft.ops.Similarity.hyperplane(p, dim)
      val dot = v.zip(plane).map { case (x, w) => x.toDouble * w }.sum
      if (dot >= 0) want |= (1L << p)
    }
    assert(sig == want)
  }

  test("graft_bottomk: unsigned bottom-k matches brute force across partitions; partial-aggregates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    register(spark)
    // values spanning both sides of 2^63 — unsigned order differs from signed
    val vals = (0 until 500).map(i => graft.ops.Dedup.mix64(i.toLong))
    val df = vals.toDF("h").repartition(7) // force a multi-partition merge
    val got = df.agg(graft_bottomk(col("h"), lit(16))).head()
      .getSeq[Long](0)
    val want = vals.distinct.sortBy(v => v ^ Long.MinValue).take(16) // unsigned sort
    assert(got == want, s"got=$got")
    // fewer distinct values than k → all of them, sorted
    val small = Seq(5L, -1L, 5L, 3L).toDF("h")
      .agg(graft_bottomk(col("h"), lit(16))).head().getSeq[Long](0)
    assert(small == Seq(3L, 5L, -1L)) // -1 is unsigned max
    // map-side partial aggregation (bounded state merges associatively)
    val plan = df.groupBy(col("h") % 2).agg(graft_bottomk(col("h"), lit(4)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_bottomk"), plan.take(800))
    // fnv1a expression matches the scalar evaluator
    val f = Seq("alpha").toDF("a").select(graft_fnv1a64($"a")).head().getLong(0)
    assert(f == graft.ops.Dedup.fnv1a("alpha"))
  }

  test("graft_bottomk_sample: carries values of the k hash-smallest rows; merges across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    register(spark)
    // (hash, value) rows; hashes span both sides of 2^63
    val rows = (0 until 300).map(i => (graft.ops.Dedup.mix64(i.toLong), i.toDouble * 2.5))
    val df = rows.toDF("h", "v").repartition(7)
    val got = df.agg(graft_bottomk_sample(col("h"), col("v"), lit(12)))
      .head().getSeq[Double](0)
    val want = rows.sortBy(r => r._1 ^ Long.MinValue).take(12).map(_._2)
    assert(got == want, s"got=$got")
    // hash tie: min value wins regardless of arrival/merge order
    val tied = Seq((5L, 9.0), (5L, 3.0), (5L, 7.0), (1L, 2.0)).toDF("h", "v").repartition(3)
    val t2 = tied.agg(graft_bottomk_sample(col("h"), col("v"), lit(1)))
      .head().getSeq[Double](0)
    assert(t2 == Seq(2.0)) // h=1 is the smallest hash; its value carried
    val t3 = tied.agg(graft_bottomk_sample(col("h"), col("v"), lit(2)))
      .head().getSeq[Double](0)
    assert(t3 == Seq(2.0, 3.0)) // tie on h=5 keeps min value 3.0
    // map-side partial aggregation in the plan
    val plan = df.groupBy(col("h") % 2).agg(graft_bottomk_sample(col("h"), col("v"), lit(4)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_bottomk_sample"), plan.take(800))
    // k <= 0 rejected at analysis
    val e = intercept[Exception] {
      df.agg(graft_bottomk_sample(col("h"), col("v"), lit(0))).collect()
    }
    assert(e.getMessage.contains("k must be in"), e.getMessage)
  }

  test("graft_spacesaving: candidate superset guarantee holds across partition merges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    register(spark)
    // Zipf-ish stream: token t_i appears ~N/(i+1) times, vocab 200 >> m=16
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      (0 until 200).flatMap(i => Seq.fill(2000 / (i + 1))(s"t$i")).toVector)
    val n = stream.length
    val df = stream.toDF("tok").repartition(9) // force multi-partition merge
    val cands = df.agg(graft_spacesaving(col("tok"), lit(16)))
      .head().getSeq[String](0).toSet
    assert(cands.size <= 16)
    // EVERY token with true count > N/m must be present (the guarantee the
    // exact-recount pass relies on)
    val counts = stream.groupBy(identity).view.mapValues(_.size)
    val mustHave = counts.filter(_._2 > n / 16).keys.toSet
    assert(mustHave.subsetOf(cands), s"missing ${mustHave -- cands}")
    // m <= 0 rejected at analysis
    val e = intercept[Exception] {
      df.agg(graft_spacesaving(col("tok"), lit(0))).collect()
    }
    assert(e.getMessage.contains("m must be in"), e.getMessage)
    // map-side partial aggregation (bounded state merges associatively)
    val plan = df.groupBy(col("tok") === "t0").agg(graft_spacesaving(col("tok"), lit(8)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_spacesaving"), plan.take(800))
  }

  test("graft_bottomk: k <= 0 fails at ANALYSIS, not with an empty-TreeSet crash (ADVICE r3)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(1L, 2L).toDF("h")
    val e = intercept[Exception] { df.agg(graft_bottomk(col("h"), lit(0))).collect() }
    assert(e.getMessage.contains("k must be in"), e.getMessage)
    val e2 = intercept[Exception] { df.agg(graft_bottomk(col("h"), lit(-3))).collect() }
    assert(e2.getMessage.contains("k must be in"), e2.getMessage)
  }

  test("type check rejects non-string input with a clear error") {
    import spark.implicits._
    register(spark)
    val e = intercept[Exception] {
      Seq(1, 2).toDF("n").select(graft_simhash64($"n")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
