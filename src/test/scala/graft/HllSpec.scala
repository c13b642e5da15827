package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Sketches

/** HLL register-table sketch: merge = whole-corpus parity, partition
  * invariance, and the error band the m = 256 estimator promises. */
class HllSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // deterministic corpus: doc i carries words w<i*37+j mod V> — per-group
  // true distinct counts are computable exactly
  private def corpus(n: Int, vocab: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val words = (0 until 40).map(j => s"w${(i * 37 + j) % vocab}")
      (i.toLong, s"g${i % 2}", words.mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  test("merge of shard sketches equals the whole-corpus sketch") {
    val docs = corpus(400, 5000)
    val a = Sketches.hllRegisters(docs.filter(col("doc_id") < 200), "source")
    val b = Sketches.hllRegisters(docs.filter(col("doc_id") >= 200), "source")
    val merged = Sketches.hllMerge("source", a, b)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val whole = Sketches.hllRegisters(docs, "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === whole)
  }

  test("registers are partition-invariant") {
    val docs = corpus(300, 4000)
    val one = Sketches.hllRegisters(docs.repartition(1), "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val many = Sketches.hllRegisters(docs.repartition(7), "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(one === many)
  }

  test("estimate lands within the 256-register error band") {
    import spark.implicits._
    val docs = corpus(500, 100000)
    val est = Sketches.hllEstimate(Sketches.hllRegisters(docs, "source"), "source")
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    val truth = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source").agg(countDistinct("w").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    truth.foreach { case (g, d) =>
      assert(d > 640, s"test corpus must exceed linear-counting range, got $d")
      val rel = math.abs(est(g) - d) / d.toDouble
      // σ = 1.04/√256 ≈ 6.5%; 4σ = 26% is a deterministic-corpus bound
      assert(rel < 0.26, s"$g: est ${est(g)} truth $d rel $rel")
    }
  }

  test("shingle=3 items are word trigrams (hand case)") {
    import spark.implicits._
    graft.functions.functions.register(spark)
    // doc 1 "a b c d" → {"a b c", "b c d"}; doc 2 "x  y" → 2 words
    // (empty token from the double space filtered) → no shingles at all
    val docs = Seq((1L, "g", "a b c d"), (2L, "g", "x  y")).toDF("doc_id", "source", "text")
    val reg = Sketches.hllRegisters(docs, "source", shingle = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // expected registers from hashing exactly the two trigram strings
    val expect = Seq("a b c", "b c d").toDF("tok")
      .select(graft.functions.functions.graft_mix64(
        graft.functions.functions.graft_fnv1a64(col("tok"))).as("h"))
      .select(expr("h & 255").as("bucket"),
        expr("57 - CASE WHEN shiftrightunsigned(h, 8) = 0 THEN 0" +
          " ELSE length(bin(shiftrightunsigned(h, 8))) END").cast("long").as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reg === expect)
  }

  test("p out of range rejected") {
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(corpus(10, 10), "source", p = 3)
    }
  }
}
