package graft.spark

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for the engine (SURVEY §4.3).
  *
  * These are the knobs that matter at 100 TB and they are identical in
  * local mode, just smaller: AQE on (runtime coalescing + skew-join
  * splitting), shuffle partitions sized to the executor fleet (never the
  * 200 default), bounded file splits, UTC.
  */
object GraftSession {

  def builder(appName: String = "graft", shufflePartitions: Int = 0): SparkSession.Builder = {
    val parts =
      if (shufflePartitions > 0) shufflePartitions
      else Runtime.getRuntime.availableProcessors()
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // split sizing: a 100 TB scan should produce ~4 tasks per core wave
      // on typical fleets; 128m keeps per-task footprint bounded for
      // multi-KB rows with binary payloads
      .config("spark.sql.files.maxPartitionBytes", "128m")
  }

  /** Local session for tools/tests at a given core count. */
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = builder(appName, cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
