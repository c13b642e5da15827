package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation — the confusion-matrix threshold sweep that
  * closes the train → score → CALIBRATE loop (pick the gate threshold
  * from precision/recall before culling 100 TB with it; the quality-
  * filter recipe's held-out validation table).
  *
  * Shape at 100 TB: ONE conditional-aggregation pass computes all
  * 4·|thresholds| running counts column-wise (zero row amplification —
  * the cross-join-then-group form would scan the corpus |thresholds|
  * times over the shuffle), then a single `stack` unpivots the one
  * result row into the per-threshold table. Everything until the final
  * two divisions is exact BIGINT counting, order-independent by
  * construction.
  */
object Eval {

  /** Per-threshold (tp, fp, fn, tn, precision, recall) over a scored,
    * labeled frame. Prediction = `scoreCol >= threshold`; positives are
    * `labelCol === 1.0`. Thresholds should be exact dyadic rationals so
    * the compare is platform-independent (the repo's lr/label
    * discipline). Precision/recall are single IEEE divisions of exact
    * longs (guarded to /1 on empty cells). */
  def confusionSweep(scored: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 64,
      "thresholds must be 1..64")
    require(thresholds.distinct.size == thresholds.size,
      "thresholds must be distinct")
    val one = col(labelCol) === lit(1.0)
    val aggs = thresholds.indices.flatMap { i =>
      def cnt(p: org.apache.spark.sql.Column) =
        sum(when(p, 1L).otherwise(0L))
      val thr = col(scoreCol) >= lit(thresholds(i))
      Seq(cnt(thr && one).as(s"tp_$i"), cnt(thr && !one).as(s"fp_$i"),
        cnt(!thr && one).as(s"fn_$i"), cnt(!thr && !one).as(s"tn_$i"))
    }
    val row = scored.agg(aggs.head, aggs.tail: _*)
    val stackArgs = thresholds.indices.map { i =>
      s"CAST(${thresholds(i)} AS DOUBLE), tp_$i, fp_$i, fn_$i, tn_$i"
    }.mkString(", ")
    row.selectExpr(
        s"stack(${thresholds.size}, $stackArgs) AS (threshold, tp, fp, fn, tn)")
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        round(col("tp").cast("double")
          / greatest(col("tp") + col("fp"), lit(1L)).cast("double"), 4)
          .as("precision"),
        round(col("tp").cast("double")
          / greatest(col("tp") + col("fn"), lit(1L)).cast("double"), 4)
          .as("recall"))
  }
}
