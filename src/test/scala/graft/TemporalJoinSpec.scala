package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.TemporalJoin

/** Hand-computed cases for the tolerance-banded as-of join and the
  * bin-bucketed interval join — every edge the binning argument relies
  * on: exact-tolerance boundary, bin-boundary straddles, right-ts ties
  * (id tiebreak), matchless left rows, cross-key isolation, and
  * exactly-once for intervals spanning many bins. */
class TemporalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def evFrame(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), (col("event_id") * 10).cast("double").as("value"))
  }

  test("asofJoin: boundary, tie, matchless, cross-key, bin straddle") {
    // tolerance 100; left rows (id, user, ts)
    val left = evFrame(Seq(
      (1L, 7L, 1000L),  // matches r ts=1000 (equal ts allowed)
      (2L, 7L, 1150L),  // candidates ts=1050(two rows: ids 12,13) and 1100 → latest 1100
      (3L, 7L, 1201L),  // candidate 1100 is 101 late → NULL (just past tolerance)
      (4L, 8L, 1100L),  // user 8 has no right rows at all → NULL
      (5L, 7L, 250L),   // right ts=150 is exactly tol=100 back → match (boundary)
      (6L, 7L, 399L)))  // bin straddle: 399 div 100 = 3; right 300 in bin 3 matches
    val right = evFrame(Seq(
      (11L, 7L, 1000L),
      (12L, 7L, 1050L),
      (13L, 7L, 1050L), // tie with 12 on ts → id 13 wins when 1050 is latest
      (14L, 7L, 1100L),
      (15L, 7L, 150L),
      (16L, 7L, 300L)))
    val out = TemporalJoin.asofJoin(left, right, "user_id", "ts", "event_id",
      toleranceMicros = 100L, rightPayload = Seq("value"))
      .select("left_id", "right_id", "lag_us", "value")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out === Set(
      (1L, 11L, 0L), (2L, 14L, 50L), (3L, -1L, -1L),
      (4L, -1L, -1L), (5L, 15L, 100L), (6L, 16L, 99L)))
  }

  test("asofJoin: right-ts tie broken by greatest id") {
    val left = evFrame(Seq((1L, 7L, 1100L)))
    val right = evFrame(Seq((12L, 7L, 1050L), (13L, 7L, 1050L)))
    val out = TemporalJoin.asofJoin(left, right, "user_id", "ts", "event_id", 100L)
      .select("right_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(13L))
  }

  test("asofJoin forward: earliest at-or-after within tolerance, tie → smallest id") {
    val left = evFrame(Seq(
      (1L, 7L, 1000L),  // candidates at 1000 (equal, in) and 1050 → earliest 1000
      (2L, 7L, 980L),   // candidates 1000, 1050, 1080 → earliest 1000 (lag 20)
      (3L, 7L, 1081L),  // nothing in [1081, 1181] except... 1150 → match
      (4L, 7L, 1251L),  // nothing at-or-after within 100 → NULL
      (5L, 8L, 1000L))) // no right rows for user 8 → NULL
    val right = evFrame(Seq(
      (11L, 7L, 1000L),
      (12L, 7L, 1050L),
      (13L, 7L, 1050L),
      (14L, 7L, 1080L),
      (15L, 7L, 1150L)))
    val out = TemporalJoin.asofJoin(left, right, "user_id", "ts", "event_id",
      toleranceMicros = 100L, direction = "forward")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toSet
    assert(out === Set(
      (1L, 11L, 0L), (2L, 11L, 20L), (3L, 15L, 69L),
      (4L, -1L, -1L), (5L, -1L, -1L)))
    // forward tie at equal right ts picks the SMALLEST id (min-struct)
    val tie = TemporalJoin.asofJoin(evFrame(Seq((1L, 7L, 1040L))), right,
      "user_id", "ts", "event_id", 100L, direction = "forward")
      .collect().head
    assert(tie.getLong(3) === 12L)
  }

  test("asofJoin: exactly one output row per left row (no candidate dup)") {
    // 50 right rows all within tolerance of each left row — argmax must
    // collapse them to one output row per left id
    val left = evFrame((1L to 20L).map(i => (i, 7L, 10000L + i)))
    val right = evFrame((101L to 150L).map(i => (i, 7L, 9960L + (i % 40))))
    val out = TemporalJoin.asofJoin(left, right, "user_id", "ts", "event_id", 1000L)
    assert(out.count() === 20L)
    assert(out.select("left_id").distinct().count() === 20L)
  }

  test("intervalJoin: boundaries inclusive, multi-bin exactly-once, key isolation") {
    import spark.implicits._
    val iv = Seq(
      (100L, 7L, 1000L, 2000L),   // spans bins 10..20 with bin=100
      (101L, 7L, 500L, 599L),     // within one bin
      (102L, 9L, 1000L, 2000L))   // other key — must not take user 7's points
      .toDF("signup_id", "user_id", "start_us", "end_us")
    val pt = Seq(
      (201L, 7L, 1000L),  // start boundary → in 100
      (202L, 7L, 2000L),  // end boundary → in 100
      (203L, 7L, 1537L),  // interior, different bin from both boundaries
      (204L, 7L, 599L),   // end boundary of 101
      (205L, 7L, 499L),   // just before 101 → no match
      (206L, 7L, 2001L),  // just past 100 → no match
      (207L, 9L, 1500L))  // user 9 → only interval 102
      .toDF("purchase_id", "user_id", "ts_us")
    val out = TemporalJoin.intervalJoin(iv, pt, binMicros = 100L, keyCols = Seq("user_id"))
      .select("signup_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    // exactly-once: the multi-bin interval 100 must emit each matched
    // point a single time despite 11 bin replicas
    assert(out.sorted === List(
      (100L, 201L), (100L, 202L), (100L, 203L), (101L, 204L), (102L, 207L)))
  }

  test("intervalJoin: keyless (global) variant matches across keys") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 100L)).toDF("iv_id", "start_us", "end_us")
    val pt = Seq((10L, 50L), (11L, 150L)).toDF("pt_id", "ts_us")
    val out = TemporalJoin.intervalJoin(iv, pt, binMicros = 64L)
      .select("pt_id").collect().map(_.getLong(0)).toSeq
    assert(out === Seq(10L))
  }

  test("plans: banded joins are hash/sort-merge, never nested-loop or cartesian") {
    val left = evFrame((1L to 100L).map(i => (i, i % 5, 1000L * i)))
    val right = evFrame((201L to 300L).map(i => (i, i % 5, 900L * i)))
    val p1 = TemporalJoin.asofJoin(left, right, "user_id", "ts", "event_id", 5000L)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct") && !p1.contains("BroadcastNestedLoopJoin"),
      p1.take(2000))
    import spark.implicits._
    val iv = (1L to 50L).map(i => (i, i % 5, 100L * i, 100L * i + 500L))
      .toDF("iv_id", "user_id", "start_us", "end_us")
    val pt = (101L to 200L).map(i => (i, i % 5, 37L * i)).toDF("pt_id", "user_id", "ts_us")
    val p2 = TemporalJoin.intervalJoin(iv, pt, 250L, Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      p2.take(2000))
  }
}
