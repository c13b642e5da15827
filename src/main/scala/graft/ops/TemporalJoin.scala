package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal joins — the two non-equi join shapes a web-crawl/event
  * pipeline needs that Spark has no native operator for, re-expressed as
  * BOUNDED equi-joins on derived time-bin keys so Catalyst plans an
  * ordinary shuffled hash/sort-merge join instead of the
  * BroadcastNestedLoop/Cartesian plan a raw inequality condition
  * produces:
  *
  *  - AS-OF join (pandas `merge_asof`, kdb `aj`): attach to each left
  *    row the LATEST right row of the same key at-or-before its
  *    timestamp, within a required tolerance.
  *  - INTERVAL join: match points to every enclosing [start, end]
  *    interval (session windows, validity ranges, crawl freshness
  *    windows).
  *
  * The binning argument: with bin width = tolerance, a right row
  * matching `0 <= l.ts - r.ts <= tol` satisfies
  * `r.bin ∈ {l.bin - 1, l.bin}` (integer floor division over the
  * non-negative epoch-micros domain), so replicating each RIGHT row to
  * bins (b, b+1) and equi-joining on (key, bin) yields every candidate
  * exactly once per replica — the residual predicate then filters, and a
  * declarative `max(struct(ts, id, …))` argmax picks the winner
  * deterministically (greatest ts, then greatest id — ties never depend
  * on partitioning). For intervals the interval side replicates to every
  * covered bin while each point keeps its single bin, so a matched
  * (interval, point) pair is produced exactly once and needs no dedup.
  *
  * 100-TB shape: shuffle keys are (join key, time bin) — a mega-key
  * (one user, one mega-host) is subdivided by time, so no single task
  * ever holds a whole key's history; candidate group size is bounded by
  * rows-per-(key, 2·tol) regardless of corpus size. Right-side
  * replication is a fixed 2× (as-of) or ceil(len/bin)+1× (intervals —
  * callers pick bin ≈ median interval length to keep it small). A
  * window-function formulation (`last_value IGNORE NULLS` over a
  * per-key unbounded frame — the textbook Spark as-of) is rejected here
  * for the same reason [[Selection]] avoids per-host windows: one
  * power-law key becomes one straggler task. No window, no cartesian —
  * plan-gated in PlanSpec.
  *
  * Determinism contract: all comparisons in BIGINT epoch micros;
  * argmax = max(struct(right_ts_us, right_id, payload…)), reproducible
  * by any engine ordering (ts DESC, id DESC).
  */
object TemporalJoin {

  /** As-of join with a required tolerance — backward (default: LATEST
    * right row at-or-before each left row) or forward (EARLIEST right
    * row at-or-after, pandas `direction='forward'`: next-event
    * attribution).
    *
    * Inputs expose `keyCol`, a timestamp `tsCol` and a numeric `idCol`
    * (the deterministic tiebreak; also the output row identity).
    * `rightPayload` columns ride along from the winning right row.
    *
    * Output: (keyCol, left_id, left_ts_us, right_id, right_ts_us,
    * lag_us, payload…) — right columns NULL where no right row of the
    * same key lies in the window; lag_us = |left_ts − right_ts| ≥ 0 in
    * both directions.
    *
    * Timestamps must be non-negative epoch instants (`div` truncates
    * toward zero, which equals floor only on the non-negative domain —
    * pre-1970 data would mis-bin).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, idCol: String, toleranceMicros: Long,
      rightPayload: Seq[String] = Nil,
      direction: String = "backward"): DataFrame = {
    require(toleranceMicros > 0, s"tolerance must be positive, got $toleranceMicros")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val fwd = direction == "forward"
    val tol = toleranceMicros
    // cast: parquet TIMESTAMP_NTZ → session-zone instant (the verify
    // and bench sessions pin spark.sql.session.timeZone=UTC, the same
    // naive-is-UTC reading DuckDB's epoch_us uses); a no-op on TIMESTAMP
    val l = left.select(col(keyCol), col(idCol).cast("long").as("left_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("left_ts_us"))
      .withColumn("__bin", expr(s"left_ts_us div $tol"))
    val payload = rightPayload.map(col)
    // backward: a right row in bin b can serve lefts in bins {b, b+1};
    // forward (window on the other side): lefts in bins {b−1, b}
    val rb = expr(s"right_ts_us div $tol")
    val r = right.select(col(keyCol) +: col(idCol).cast("long").as("right_id") +:
        unix_micros(col(tsCol).cast("timestamp")).as("right_ts_us") +: payload: _*)
      .withColumn("__bin", explode(array(rb, if (fwd) rb - 1 else rb + 1)))
    val cand = l.join(r, Seq(keyCol, "__bin"))
      .filter(
        if (fwd)
          col("right_ts_us") >= col("left_ts_us") &&
            col("right_ts_us") - col("left_ts_us") <= tol
        else
          col("right_ts_us") <= col("left_ts_us") &&
            col("left_ts_us") - col("right_ts_us") <= tol)
    // argmax latest (backward) / argmin earliest (forward); (ts, id) is
    // unique per right row, so the payload fields never decide the pick
    val pick = struct(col("right_ts_us") +: col("right_id") +: payload: _*)
    val best = cand.groupBy(col("left_id")).agg(
      (if (fwd) min(pick) else max(pick)).as("__m"))
    l.drop("__bin").join(best, Seq("left_id"), "left")
      .select(Seq(col(keyCol), col("left_id"), col("left_ts_us"),
        col("__m.right_id").as("right_id"),
        col("__m.right_ts_us").as("right_ts_us"),
        (if (fwd) col("__m.right_ts_us") - col("left_ts_us")
         else col("left_ts_us") - col("__m.right_ts_us")).as("lag_us")) ++
        rightPayload.map(p => col(s"__m.$p").as(p)): _*)
  }

  /** Interval × point join: every (interval, point) pair with
    * `start_us <= ts_us <= end_us` and equal `keyCols`, produced exactly
    * once — the interval replicates to every covered bin, the point
    * keeps its single bin, so a matched pair meets in exactly one bin
    * and needs no dedup.
    *
    * `intervals` must expose BIGINT `start_us`/`end_us`; `points` a
    * BIGINT `ts_us`; apart from `keyCols` the two sides' column names
    * must be disjoint (both pass through). `binMicros` trades
    * interval-side replication (ceil(len/bin)+1 copies) against
    * candidate-group density — pick ≈ the median interval length.
    * `keyCols` may be empty (pure time join), but a key should be used
    * whenever one exists: with keys the shuffle spreads over
    * (key, bin), without them a globally busy hour is one task.
    */
  def intervalJoin(intervals: DataFrame, points: DataFrame,
      binMicros: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(binMicros > 0, s"bin width must be positive, got $binMicros")
    val iv = intervals
      .withColumn("__bin", explode(sequence(
        expr(s"start_us div $binMicros"), expr(s"end_us div $binMicros"))))
    val pt = points.withColumn("__bin", expr(s"ts_us div $binMicros"))
    iv.join(pt, keyCols :+ "__bin")
      .filter(col("ts_us") >= col("start_us") && col("ts_us") <= col("end_us"))
      .drop("__bin")
  }
}
