package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM temporal join — the streaming counterpart
  * of [[graft.ops.TemporalJoin]]: pair each left event with the right
  * events of the same key whose timestamp lies within
  * [left_ts − tolerance, left_ts], as both sides arrive, in append mode.
  *
  * This is the Spark-native shape (stream-stream inner equi-join with an
  * event-time RANGE condition): the range bound plus watermarks on both
  * inputs let the engine EXPIRE join state — a right row older than
  * (left watermark − tolerance) can never match a future left row, and
  * is evicted — so per-key state is bounded by rate × (tolerance +
  * watermark delay), not by stream history. Without the range condition
  * stream-stream join state grows forever; that is why this op REQUIRES
  * a tolerance, exactly like the batch as-of.
  *
  * Contract with the batch op: on static frames the same condition
  * reproduces [[graft.ops.TemporalJoin.asofJoin]]'s candidate set
  * (every in-window pair, BEFORE its argmax). The streaming op emits
  * ALL pairs — append mode cannot retract a "latest so far" winner when
  * an older-but-later-arriving right row lands — so pick-latest remains
  * a downstream batch fold over the emitted pairs (the same
  * emit-facts-then-fold split the foreachBatch dedup gates use).
  *
  * Column contract: `keyCol` must exist on both sides with the same
  * name; all other column names must be disjoint. The right key column
  * is dropped from the output (it equals the left's). */
object StreamTemporalJoin {

  def pairsWithin(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, keyCol: String,
      toleranceSeconds: Long,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    require(toleranceSeconds > 0,
      s"tolerance must be positive, got $toleranceSeconds")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col(s"r.$rightTs") <= col(s"l.$leftTs") &&
          col(s"r.$rightTs") >=
            col(s"l.$leftTs") - expr(s"INTERVAL $toleranceSeconds SECONDS"))
      .drop(col(s"r.$keyCol"))
  }
}
