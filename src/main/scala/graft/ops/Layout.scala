package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional DATA LAYOUT — Z-order (Morton) clustering, the
  * Iceberg `rewrite_data_files(strategy => 'sort', sort_order =>
  * zorder(...))` feature re-expressed as a Spark write layout.
  *
  * Why it matters at 100 TB: a crawl table is range-read along MORE
  * THAN ONE axis (by host for re-crawl/dedup joins, by warc_ts for
  * incremental windows). A single-key sort gives perfect file pruning
  * on that key and ZERO pruning on the other axis — every file spans
  * the full range of the second column. Sorting by the interleaved
  * z-value instead makes each data file cover a small RECTANGLE of
  * (x, y) space, so per-file min/max stats (parquet footers, the
  * SnapshotStore manifest, an Iceberg manifest) prune range reads on
  * EITHER dimension to ~√F of F files. The interleave is the native
  * codegen'd [[graft.functions.ZValue]].
  *
  * The clustering itself is declarative: repartitionByRange on the
  * z-value (sampled range exchange — skew in (x, y) density becomes
  * uneven rectangle sizes, never a hot partition) + an in-partition
  * sort, so the write needs no custom committer. */
object Layout {

  /** The z-value column for two non-negative dimension keys, low `bits`
    * bits each (callers bucket raw values into 0..2^bits-1 first —
    * e.g. pmod(xxhash64(host), 64) and a ts epoch-day). bits ≤ 31. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.functions.register)
    graft.functions.functions.graft_zvalue(
      x.cast("long"), y.cast("long"), lit(bits))
  }

  /** Cluster `df` for writing: range-partition + sort by the z-value of
    * (xC, yC). Every output partition (→ data file) then holds a
    * contiguous z-range = an O(1)-aspect rectangle family in (x, y). */
  def zCluster(df: DataFrame, xC: Column, yC: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    val withZ = df.withColumn("__zv", zValue(xC, yC, bits))
    withZ.repartitionByRange(numPartitions, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
  }
}
