package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Registry for per-invocation EAGER localCheckpoints created inside
  * operators (tokenized bases, span-pair frames, iteration labels). The
  * blocks back a lazily-consumed result, so the op itself can never
  * unpersist them — but once a caller has fully materialized its result,
  * they are garbage that otherwise waits for GC + the asynchronous
  * ContextCleaner, whose reclaim lands inside subsequent timed bench reps
  * (the r4 memo-reset lesson, generalized in r5 after review found the
  * funnel's and duplicatedSpans' checkpoints leaking the same way).
  *
  * Contract: Bench calls [[unpersistAll]] (via SparkEntry.resetSharedState)
  * BEFORE each timed rep — the previous rep's result is already
  * materialized, so dropping its scratch blocks is safe; the rep then
  * rebuilds its own plan and checkpoints fresh.
  */
object CheckpointScratch {

  private val q = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Eagerly checkpoint and register for the next [[unpersistAll]]. */
  def ckpt(df: DataFrame): DataFrame = register(df.localCheckpoint(true))

  def register[T](ds: Dataset[T]): Dataset[T] = { q.add(ds); ds }

  /** Drop every registered checkpoint's blocks now (best-effort; a
    * stopped context or non-RDD plan is skipped silently). */
  def unpersistAll(): Unit = {
    var ds = q.poll()
    while (ds != null) {
      try ds.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      } catch { case _: Throwable => () }
      ds = q.poll()
    }
  }
}
