package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Index

/** Inverted-index tier: postings/dictionary statistics, conjunctive
  * AND semantics, and positional phrase matching including the
  * overlapping-occurrence and 3-term-chain cases. */
class IndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "a b a b a"),     // "a b" twice, "b a" twice, "a b a" twice
      (2L, "b b b"),         // "b b" OVERLAPS: two matches
      (3L, "a  c"),          // double space: \s+ split, no phantom token
      (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
  }

  test("postings and dictionary statistics") {
    val d = Index.dictionary(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d == Map("a" -> (2L, 4L), "b" -> (2L, 5L), "c" -> (1L, 1L)), d)
    val p = Index.postings(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(p(("a", 1L)) == ((3L, 1L, 5L)), p)   // tf 3, first 1, last 5
    assert(p(("b", 2L)) == ((3L, 1L, 3L)), p)
  }

  test("conjunctive search requires EVERY term; tf-sum score, first hit") {
    val r = Index.conjunctiveSearch(docs, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // only doc 1 has both; score = tf(a)+tf(b) = 5, first hit pos 1
    assert(r == Map(1L -> ((5L, 1L))), r)
    assert(Index.conjunctiveSearch(docs, Seq("a", "zz")).isEmpty)
  }

  test("phrase search: overlap counting and 3-term chains") {
    val ab = Index.phraseSearch(docs, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ab == Map(1L -> ((2L, 1L))), ab)
    // overlapping "b b" in "b b b": matches at start 1 and 2
    val bb = Index.phraseSearch(docs, Seq("b", "b")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bb == Map(2L -> ((2L, 1L))), bb)
    val aba = Index.phraseSearch(docs, Seq("a", "b", "a")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(aba == Map(1L -> ((2L, 1L))), aba)
    // "b b b" does NOT contain "b b a"
    assert(Index.phraseSearch(docs, Seq("b", "b", "a")).isEmpty)
  }

  test("ranked search: hand-computed rational-idf BM25, fixed term order, top-k") {
    // N = 5 docs (empty/null docs count toward N and avgdl), dl: 5,3,2,0,0
    // => sumdl = 10, avgdl = 2.0
    // df(a) = 2 (docs 1,3), df(c) = 1 (doc 3)
    // idf'(a) = (5-2+0.5)/(2+0.5)+1 = 2.4 ; idf'(c) = (5-1+0.5)/(1+0.5)+1 = 4.0
    // doc1: a tf=3, dl=5 -> 2.4*(3*2.2)/(3+1.2*(0.25+0.75*2.5)) = 15.84/5.55
    // doc3: a tf=1, dl=2 -> 2.4*2.2/2.2 = 2.4 ; c tf=1 -> 4.0*2.2/2.2 = 4.0
    val exp1 = BigDecimal(2.4 * (3.0 * 2.2) / (3.0 + 1.2 * (0.25 + 0.75 * (5.0 / 2.0))))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Index.rankedSearch(docs, Seq("a", "c"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r.toSeq == Seq((3L, 2L, 6.4), (1L, 1L, exp1)), r.toSeq)
    // k truncates after the (score DESC, doc_id) order
    val top1 = Index.rankedSearch(docs, Seq("a", "c"), k = 1).collect()
    assert(top1.map(_.getLong(0)).toSeq == Seq(3L), top1.toSeq)
    // no probe hit anywhere -> empty result, not an error
    assert(Index.rankedSearch(docs, Seq("zz"), k = 5).isEmpty)
  }

  test("plan: probe filter lands below the postings agg; search joins are equi-joins") {
    val tmp = java.nio.file.Files.createTempDirectory("idxspec").toString
    docs.write.mode("overwrite").parquet(tmp)
    val pq = spark.read.parquet(tmp)
    val pc = Index.conjunctiveSearch(pq, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    // the probe IN-filter must sit directly on the generated term stream
    // (pre-aggregation), so non-probe terms never enter the index shuffle
    val genIdx = pc.indexOf("Generate posexplode")
    val filterIdx = pc.indexOf("IN (a,b)")
    assert(filterIdx >= 0 && genIdx > filterIdx, pc.take(2500))
    val pp = Index.phraseSearch(pq, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("BroadcastNestedLoopJoin"), pp.take(2500))
  }
}
