package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Registry for per-invocation EAGER localCheckpoints created inside
  * operators (tokenized bases, span-pair frames, iteration labels). The
  * blocks back a lazily-consumed result, so the op itself can never
  * unpersist them — but once a caller has fully materialized its result,
  * they are garbage whose asynchronous GC + ContextCleaner reclaim lands
  * inside subsequent timed bench reps (the r4 memo-reset lesson,
  * generalized in r5).
  *
  * Entries are WEAK references: in a long-lived session that never drains
  * (Verify's 59 sequential queries, the test suites), an unreferenced
  * checkpoint stays collectable exactly as before this registry existed —
  * a strong queue would pin every scratch frame for the JVM lifetime.
  * Bench calls [[unpersistAll]] (via SparkEntry.resetSharedState) BEFORE
  * each timed rep and force-drops whatever is still reachable; frames the
  * GC already collected are in the ContextCleaner's queue by then.
  */
object CheckpointScratch {

  private val q = new java.util.concurrent.ConcurrentLinkedQueue[
    java.lang.ref.WeakReference[Dataset[_]]]()

  /** Eagerly checkpoint and register for the next [[unpersistAll]]. */
  def ckpt(df: DataFrame): DataFrame = register(df.localCheckpoint(true))

  def register[T](ds: Dataset[T]): Dataset[T] = {
    q.add(new java.lang.ref.WeakReference[Dataset[_]](ds))
    ds
  }

  /** Drop one checkpoint-backed frame's blocks now (best-effort; a
    * stopped context or non-RDD plan is skipped silently). ONE definition
    * — SparkEntry's memo path uses the same helper. */
  def drop(ds: Dataset[_]): Unit =
    try ds.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case _: Throwable => () }

  /** Drop every still-reachable registered checkpoint's blocks now. */
  def unpersistAll(): Unit = {
    var ref = q.poll()
    while (ref != null) {
      val ds = ref.get()
      if (ds != null) drop(ds)
      ref = q.poll()
    }
  }
}
