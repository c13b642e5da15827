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

  /** Eagerly checkpoint, register for the next [[unpersistAll]], and trim
    * the partition count to the frame's MATERIALIZED size (guide §2:
    * derive partitioning from input size, never a constant). A scratch
    * frame inherits the session's shuffle-partition count from whatever
    * exchange fed it, so on small inputs every downstream job over it
    * runs dozens of near-empty tasks — the r9 listener measured the
    * cluster-family queries at ~900 tasks/query, ~90% of them reads of
    * KB-sized checkpoint blocks. After the eager materialization the
    * exact block sizes are known, so the coalesce is free (narrow, no
    * data movement) and self-deactivates at scale: a frame bigger than
    * partitions × advisoryPartitionSizeInBytes keeps its partitioning. */
  def ckpt(df: DataFrame): DataFrame = {
    // constraint propagation OFF for the checkpoint materialization only:
    // LogicalRDD.rewriteStatsAndConstraints walks the origin plan's
    // constraint set, and on self-referential union plans (label
    // propagation's `labels ∪ (edges ⋈ labels)`) Spark 4.1's Union
    // constraint rewrite throws `key not found: id#...`. Constraints are
    // optimizer hints, not semantics — and a scratch frame's consumers
    // re-derive their own over the LogicalRDD anyway. Restored in
    // `finally`, so downstream planning is untouched.
    val conf = df.sparkSession.sessionState.conf
    val key = org.apache.spark.sql.internal.SQLConf.CONSTRAINT_PROPAGATION_ENABLED
    val old = conf.getConf(key)
    if (old) conf.setConf(key, false)
    // register the COALESCED wrapper (the frame callers actually retain):
    // registering the raw checkpoint would leave only a weak ref to an
    // object nothing else holds, so GC could clear it before the next
    // unpersistAll — drop() tree-walks to the LogicalRDD either way
    try register(smartCoalesce(df.localCheckpoint(true)))
    finally if (old) conf.setConf(key, true)
  }

  def register[T](ds: Dataset[T]): Dataset[T] = {
    q.add(new java.lang.ref.WeakReference[Dataset[_]](ds))
    ds
  }

  /** Typed variant of [[smartCoalesce]] — same size-derived trim,
    * preserving the Dataset's element type (the sharedDocs memo path). */
  def smartCoalesceDs[T](cp: Dataset[T]): Dataset[T] =
    try cp.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val n = lr.rdd.getNumPartitions
        if (n <= 2) cp
        else {
          val want = targetPartitions(cp.sparkSession, lr.rdd, n)
          if (want < n) cp.coalesce(want) else cp
        }
      case _ => cp
    } catch { case _: Throwable => cp }

  private def targetPartitions(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[_], n: Int): Int = {
    val bytes = spark.sparkContext.getRDDStorageInfo.find(_.id == rdd.id)
      .map(i => i.memSize + i.diskSize).getOrElse(Long.MaxValue)
    val advisory = math.max(
      spark.sessionState.conf.getConf(
        org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES),
      1L)
    math.min(math.max(1L, (bytes + advisory - 1L) / advisory), n.toLong).toInt
  }

  /** Trim a just-materialized localCheckpoint's partition count to
    * ceil(bytes / advisoryPartitionSizeInBytes) (the same knob AQE sizes
    * shuffle reads with). No-op for non-RDD plans, ≤ 2 partitions, or
    * frames already at/below the target. */
  def smartCoalesce(cp: DataFrame): DataFrame = smartCoalesceDs(cp)

  /** Drop one checkpoint-backed frame's blocks now (best-effort; a
    * stopped context or non-RDD plan is skipped silently). ONE definition
    * — SparkEntry's memo path uses the same helper. Walks the whole
    * analyzed tree so a [[smartCoalesce]]-wrapped checkpoint (Repartition
    * over LogicalRDD) is found too. */
  def drop(ds: Dataset[_]): Unit =
    try ds.queryExecution.analyzed.foreach {
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
