package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Train

/** Hand-computed full-batch GD: two docs, three exact-rational steps —
  * the gradients, updates, and bias are worked fractions (29/108 etc.),
  * so an order-of-operations or fold-order change shows up as a bit
  * flip, not a tolerance miss. */
class TrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // d0: "a a b", y=1  → x(a)=2/3, x(b)=1/3 ; d1: "b", y=0 → x(b)=1 ; n=2
  private def docs = {
    import spark.implicits._
    Seq((0L, "a a b", 1.0), (1L, "b", 0.0)).toDF("doc_id", "text", "y")
  }

  private def modelMap(iters: Int): Map[Option[String], Double] =
    Train.linearFit(docs, "y", iters = iters, lr = 0.5).collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap

  test("one GD step: w = lr*y*x/n folds, bias = lr*mean(y)") {
    // err1 = -y; g(a) = -2/3, g(b) = -1/3, gb = -1
    // w(a) = 0.5*(2/3)/2 = 1/6 ; w(b) = 1/12 ; b = 0.25
    val m = modelMap(1)
    assert(m(Some("a")) == 1.0 / 6.0, m)
    assert(m(Some("b")) == 0.5 * (1.0 / 3.0 / 2.0), m)
    assert(m(None) == 0.25, m)
  }

  test("two GD steps: hand-worked fractions 29/108, 11/216, 23/72") {
    // pred2(d0) = 1/4 + 5/36 → err = -11/18 ; pred2(d1) = 1/3 → err = 1/3
    // g2(a) = -11/27 → w2(a) = 1/6 + 11/108 = 29/108
    // g2(b) = 7/54  → w2(b) = 1/12 - 7/216 = 11/216
    // gb2 = -5/18   → b2 = 1/4 + 5/72 = 23/72
    val m = modelMap(2)
    assert(math.abs(m(Some("a")) - 29.0 / 108.0) < 1e-15, m)
    assert(math.abs(m(Some("b")) - 11.0 / 216.0) < 1e-15, m)
    assert(math.abs(m(None) - 23.0 / 72.0) < 1e-15, m)
  }

  test("trained model deploys on Classifier.linearScore unchanged") {
    val model = Train.linearFit(docs, "y", iters = 2, lr = 0.5)
    val bias = model.filter(col("tok").isNull).head().getDouble(1)
    val scored = graft.ops.Classifier
      .linearScore(docs, model.filter(col("tok").isNotNull), bias)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // score(d0) = round(23/72 + (29/108 + 29/108 + 11/216)/3, 4)
    val w2a = 29.0 / 108.0; val w2b = 11.0 / 216.0
    val exp0 = BigDecimal(23.0 / 72.0 + (0.0 + w2a + w2a + w2b) / 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = BigDecimal(23.0 / 72.0 + w2b / 1.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored(0L) == exp0 && scored(1L) == exp1, scored)
  }

  test("empty docs and empty-text docs: bias-only regression, no NaN") {
    import spark.implicits._
    val d = Seq((0L, "", 1.0), (1L, null.asInstanceOf[String], 0.0))
      .toDF("doc_id", "text", "y")
    val m = Train.linearFit(d, "y", iters = 2, lr = 0.5).collect()
    assert(m.length == 1 && m(0).isNullAt(0), m.mkString(","))
    // err1 = -y → b1 = 1/4 ; err2 = (1/4 - 1, 1/4) → gb2 = -1/2 → b2 = 3/8
    assert(m(0).getDouble(1) == 0.375, m.mkString(","))
  }

  test("confusionSweep: hand-counted cells, guarded precision/recall") {
    import spark.implicits._
    val scored = Seq((0.9, 1.0), (0.8, 0.0), (0.5, 1.0), (0.2, 0.0),
      (0.1, 1.0)).toDF("score", "y")
    val r = graft.ops.Eval
      .confusionSweep(scored, "score", "y", Seq(0.0, 0.5, 1.0))
      .collect()
      .map(x => x.getDouble(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5), x.getDouble(6)))).toMap
    assert(r(0.0) == ((3L, 2L, 0L, 0L, 0.6, 1.0)), r)
    assert(r(0.5) == ((2L, 1L, 1L, 1L, 0.6667, 0.6667)), r)
    // no positives: precision divides by the /1 guard, not by zero
    assert(r(1.0) == ((0L, 0L, 3L, 2L, 0.0, 0.0)), r)
  }

  test("linearFitOn with an explicit x-frame reproduces linearFit bit-for-bit") {
    import spark.implicits._
    // the same (did, tok, x) frame linearFit builds internally for `docs`
    val x = Seq((0L, "a", 2.0 / 3.0), (0L, "b", 1.0 / 3.0), (1L, "b", 1.0))
      .toDF("did", "tok", "x")
    val labels = Seq((0L, 1.0), (1L, 0.0)).toDF("did", "y")
    val viaOn = Train.linearFitOn(x, labels, iters = 2, lr = 0.5).collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(viaOn === modelMap(2))
  }

  test("linearFitOn over BIGINT feature keys (hashed dims): hand-worked step") {
    import spark.implicits._
    // one feature dim 7: d0 x=1 y=1, d1 x=1/2 y=0; n=2
    // step1: err=-y ⇒ g(7) = (-1·1) + (0·1/2) = -1; w = 0 - 0.5·(-1/2) = 1/4
    //        gb = -1 ⇒ b = 1/4
    val x = Seq((0L, 7L, 1.0), (1L, 7L, 0.5)).toDF("did", "tok", "x")
    val labels = Seq((0L, 1.0), (1L, 0.0)).toDF("did", "y")
    val m = Train.linearFitOn(x, labels, iters = 1, lr = 0.5).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getDouble(1))
      .toMap
    assert(m(Some(7L)) == 0.25, m)
    assert(m(None) == 0.25, m)
  }
}
