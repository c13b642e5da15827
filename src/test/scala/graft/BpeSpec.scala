package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Bpe

/** VERDICT r7 #4: BPE apply — hand-computed merge folds, the rank-vs-
  * position priority contract, and the tokenize/tokenCounts frames. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // the SparkEntry merge table's semantics, in miniature
  private val ranks = Map(
    ("t", "a") -> 0, ("d", "a") -> 1, ("da", "ta") -> 2, ("l", "e") -> 3,
    ("b", "le") -> 4, ("ta", "ble") -> 5, ("e", "r") -> 8, ("o", "w") -> 9,
    ("i", "n") -> 11)

  test("applyWord: hand-computed folds, multi-level compounding") {
    assert(Bpe.applyWord("table", ranks) == Vector("table"))
    assert(Bpe.applyWord("data", ranks) == Vector("data"))
    assert(Bpe.applyWord("customer", ranks) ==
      Vector("c", "u", "s", "t", "o", "m", "er"))
    assert(Bpe.applyWord("spark", ranks) == Vector("s", "p", "a", "r", "k"))
    assert(Bpe.applyWord("", ranks) == Vector.empty)
    assert(Bpe.applyWord("x", ranks) == Vector("x"))
  }

  test("lowest RANK wins over leftmost POSITION; one leftmost occurrence per step") {
    // "window": (i,n) occurs first positionally but (o,w) has lower rank
    // — the fold must take (o,w) first; both end merged
    assert(Bpe.applyWord("window", ranks) == Vector("w", "in", "d", "ow"))
    // overlapping occurrences: 'ooo' + (o,o) merges leftmost pair only,
    // leaving ("oo", "o") — no (oo,o) rule exists
    assert(Bpe.applyWord("ooo", Map(("o", "o") -> 0)) == Vector("oo", "o"))
    // a merge can enable a LOWER-rank merge that then takes priority
    assert(Bpe.applyWord("tatable", ranks) == Vector("ta", "table"))
  }

  test("tokenize: positions, vocab ids, empty-word index gaps; tokenCounts includes zero docs") {
    import spark.implicits._
    val merges = Seq((0, "t", "a"), (1, "d", "a"), (2, "da", "ta"), (3, "l", "e"),
      (4, "b", "le"), (5, "ta", "ble"), (8, "e", "r"), (9, "o", "w"), (11, "i", "n"))
      .toDF("rank", "l", "r")
    val docs = Seq(
      (1L, "data  table"), // double space: widx 2 is the EMPTY word, skipped
      (2L, "window"),
      (3L, "")).toDF("doc_id", "text")
    val got = Bpe.tokenize(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, "data", 256L + 2),
      (1L, 3L, 1L, "table", 256L + 5),
      (2L, 1L, 1L, "w", 'w'.toLong),
      (2L, 1L, 2L, "in", 256L + 11),
      (2L, 1L, 3L, "d", 'd'.toLong),
      (2L, 1L, 4L, "ow", 256L + 9)), got.toSeq)
    val counts = Bpe.tokenCounts(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(counts.toSeq == Seq((1L, 2L), (2L, 4L), (3L, 0L)))
  }

  test("trainMerges: hand-computed Sennrich corpus — counts, ties, adopted ranks") {
    import spark.implicits._
    // freqs: low:3 lower:2 newest:4 widest:2.
    // L0 pair counts: (w,e)=6 (e,s)=6 (s,t)=6 (l,o)=5 (o,w)=5 ... —
    //   three-way tie at 6, lexicographic (l,r): (e,s) wins.
    // L1: es adopted → (es,t)=6 wins. L2: (l,o)=5 beats (o,w)=5 on l<o.
    // L3: lo adopted → (lo,w)=5.
    val docs = Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest newest newest widest widest")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, numMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0, "e", "s", 6L), (1, "es", "t", 6L),
      (2, "l", "o", 5L), (3, "lo", "w", 5L)), got.mkString(","))
    // minCount stops early: level 2's best count (5) is below 6
    val stopped = Bpe.trainMerges(docs, numMerges = 4, minCount = 6L).collect()
    assert(stopped.length == 2, stopped.mkString(","))
    // the learned table round-trips through the APPLY path
    val merges = Bpe.trainMerges(docs, numMerges = 4)
    assert(Bpe.applyWord("newest",
      merges.collect().map(r => ((r.getString(1), r.getString(2)), r.getInt(0))).toMap)
      == Vector("n", "e", "w", "est"))
  }

  test("duplicate merge pairs are rejected; duplicate SURFACE forms take the min rank id") {
    import spark.implicits._
    val dup = Seq((0, "a", "b"), (1, "a", "b")).toDF("rank", "l", "r")
    intercept[IllegalArgumentException] {
      Bpe.tokenize(Seq((1L, "ab")).toDF("doc_id", "text"), dup).collect()
    }
    // ("a","bc") and ("ab","c") both surface "abc": id must be 256 + min
    val amb = Seq((0, "b", "c"), (1, "a", "bc"), (2, "a", "b"), (3, "ab", "c"))
      .toDF("rank", "l", "r")
    val got = Bpe.tokenize(Seq((1L, "abc")).toDF("doc_id", "text"), amb).collect()
    assert(got.length == 1 && got(0).getString(3) == "abc" &&
      got(0).getLong(4) == 256L + 1, got.mkString(","))
  }
}
