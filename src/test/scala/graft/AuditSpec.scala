package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Audit

/** Corpus-fingerprint reconciliation: XOR order/partition invariance,
  * every divergence class, and the even-count caveat the scaladoc
  * documents. */
class AuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def frame(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("fingerprint is partition- and order-invariant") {
    val rows = (0 until 500).map(i => (i.toLong, s"g${i % 3}", s"text $i"))
    val a = Audit.frameFingerprint(frame(rows).repartition(1), "source",
        Seq("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = Audit.frameFingerprint(frame(rows.reverse).repartition(7), "source",
        Seq("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("reconcile labels every divergence class") {
    val base = Seq(
      (1L, "ok", "a"), (2L, "ok", "b"),
      (3L, "cnt", "c"), (4L, "cnt", "d"),
      (5L, "mut", "e"),
      (6L, "gone", "f"))
    val other = Seq(
      (1L, "ok", "a"), (2L, "ok", "b"),
      (3L, "cnt", "c"),                 // row 4 dropped → count
      (5L, "mut", "E"),                 // text changed → content
      (7L, "new", "g"))                 // source only on the right
    def fp(rows: Seq[(Long, String, String)]) =
      Audit.frameFingerprint(frame(rows), "source", Seq("doc_id", "text"))
    val st = Audit.reconcile(fp(base), fp(other), "source")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(st === Map("ok" -> "ok", "cnt" -> "count", "mut" -> "content",
      "gone" -> "left_only", "new" -> "right_only"))
  }

  test("NULL canonicalizes as empty string (concat_ws trap pinned)") {
    import spark.implicits._
    val withNull = Seq((1L, "g", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val withEmpty = frame(Seq((1L, "g", "")))
    val h1 = Audit.frameFingerprint(withNull, "source", Seq("doc_id", "text"))
      .head().getLong(2)
    val h2 = Audit.frameFingerprint(withEmpty, "source", Seq("doc_id", "text"))
      .head().getLong(2)
    assert(h1 === h2)
  }

  test("even-count caveat: duplicate pair cancels fp but n_rows catches it") {
    val once = frame(Seq((1L, "g", "x"), (2L, "g", "y")))
    val dup = frame(Seq((1L, "g", "x"), (2L, "g", "y"),
      (2L, "g", "y"), (2L, "g", "y"))) // row 2 three times: fp differs? no —
    // XOR of an odd repeat equals one copy; rely on n_rows for the rest
    val f1 = Audit.frameFingerprint(once, "source", Seq("doc_id", "text")).head()
    val f2 = Audit.frameFingerprint(dup, "source", Seq("doc_id", "text")).head()
    assert(f1.getLong(2) === f2.getLong(2)) // odd multiplicity: same XOR
    assert(f1.getLong(1) !== f2.getLong(1)) // but the count diverges
    val st = Audit.reconcile(
      Audit.frameFingerprint(once, "source", Seq("doc_id", "text")),
      Audit.frameFingerprint(dup, "source", Seq("doc_id", "text")), "source")
      .head().getString(3)
    assert(st === "count")
  }
}
