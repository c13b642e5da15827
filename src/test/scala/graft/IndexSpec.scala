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
