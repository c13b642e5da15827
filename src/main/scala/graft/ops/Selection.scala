package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level SELECTION under a global order — the two curation steps
  * that need a deterministic TOTAL order over the corpus rather than a
  * per-row predicate:
  *
  *  - perplexity/quality BUCKETING (CCNet's head/middle/tail: rank every
  *    doc by a quality signal, split the ranking into equal-population
  *    tiers and keep/mix by tier), and
  *  - TOKEN-BUDGET selection (a training run has a token budget, not a
  *    doc-count budget: take documents best-first until the cumulative
  *    token count reaches the budget — the greedy step of budget-
  *    constrained data selection).
  *
  * Both reduce to "global rank / global prefix sum under (key, id)
  * order", which a naive implementation writes as a single-partition
  * window (`row_number() OVER (ORDER BY ...)`) — one task sorting the
  * whole corpus. The shape here is the [[Splits.epochOrder]] machinery
  * generalized to arbitrary sort keys: range-partition by the key (the
  * concatenation of sorted ranges is globally sorted), sort within
  * partitions, then assign contiguous ordinals / running sums with ONE
  * small per-partition statistics job (one long per partition crosses
  * the driver — the same bounded-collect class as the snapshot-manifest
  * stats). Results are independent of the partition count: range bounds
  * only move rows between partitions, never reorder the concatenation.
  *
  * Determinism contract: ranks are assigned under (keys, idCol) with the
  * id as the final tiebreak, so output is identical run-over-run, under
  * any partitioning, and recomputable by an independent engine — token
  * prefix sums are pure BIGINT arithmetic (no float-order ambiguity).
  */
object Selection {

  private def numParts(df: DataFrame, requested: Int): Int =
    if (requested > 0) requested
    else math.max(df.sparkSession.sparkContext.defaultParallelism, 1)

  /** Range-partition + in-partition sort of (__id, extra…) under
    * (keys, ascending) with the id tiebreak. Keys are materialized as
    * `__k*` columns so callers can pass arbitrary expressions. */
  private def sortedProjected(docs: DataFrame, keys: Seq[Column],
      ascending: Seq[Boolean], idCol: String, extra: Seq[Column],
      numPartitions: Int): DataFrame = {
    require(keys.nonEmpty && keys.length == ascending.length,
      s"need one ascending flag per key: ${keys.length} vs ${ascending.length}")
    val named = keys.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }
    val proj = docs.select(
      named ++ (col(idCol).cast("long").as("__id") +: extra): _*)
    val orders = keys.indices.map { i =>
      if (ascending(i)) col(s"__k$i").asc else col(s"__k$i").desc
    } :+ col("__id").asc
    proj.repartitionByRange(numParts(docs, numPartitions), orders: _*)
      .sortWithinPartitions(orders: _*)
  }

  /** Global 0-based rank of every row under (keys, ascending) order with
    * `idCol` as the deterministic tiebreak. Output: (idCol, rank).
    * Positions are independent of the partition count. NOTE: eager (the
    * ordinal-assignment pass runs a partition-count job at call time,
    * like [[Splits.epochOrder]]). */
  def rankBy(docs: DataFrame, keys: Seq[Column], ascending: Seq[Boolean],
      idCol: String = "doc_id", numPartitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    sortedProjected(docs, keys, ascending, idCol, Nil, numPartitions)
      .select(col("__id")).as[Long].rdd.zipWithIndex()
      .map { case (id, r) => (id, r) }.toDF(idCol, "rank")
  }

  /** Equal-population score tiers (CCNet head/middle/tail when
    * nBuckets = 3): rank every row by `scoreCol` DESCENDING (best
    * first, idCol tiebreak) and assign bucket = rank·nBuckets div n.
    * Output: (idCol, rank, bucket) — bucket 0 is the best tier. The
    * total count attaches as a one-row broadcast (the scalar-attach
    * shape the LM vocab join uses), not a driver-side action. */
  def scoreBuckets(docs: DataFrame, scoreCol: String, nBuckets: Int,
      idCol: String = "doc_id", numPartitions: Int = 0): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val ranks = CheckpointScratch.register(
      rankBy(docs, Seq(col(scoreCol)), Seq(false), idCol, numPartitions)
        .localCheckpoint(true))
    val nF = ranks.agg(count(lit(1)).as("__n"))
    ranks.crossJoin(broadcast(nF))
      .select(col(idCol), col("rank"),
        expr(s"rank * $nBuckets div __n").as("bucket"))
  }

  /** Greedy token-budget selection: order docs by `scoreCol` DESCENDING
    * (idCol tiebreak) and keep every doc whose INCLUSIVE running token
    * total stays within `budget`. Output: (idCol, tokensCol,
    * cum_tokens) for the kept docs.
    *
    * The running sum is a distributed prefix sum: after the range sort,
    * pass 1 collects ONE per-partition token total to the driver
    * (bounded by the partition count), pass 2 adds the exclusive
    * partition offsets back in a narrow map. All arithmetic is BIGINT —
    * the kept set is exact and engine-independent. The sorted frame is
    * localCheckpointed so the two passes read materialized partitions
    * instead of recomputing the sort. */
  def selectByTokenBudget(docs: DataFrame, budget: Long,
      scoreCol: String = "quality_score", tokensCol: String = "n_tokens",
      idCol: String = "doc_id", numPartitions: Int = 0): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = CheckpointScratch.register(
      sortedProjected(docs, Seq(col(scoreCol)), Seq(false), idCol,
          Seq(coalesce(col(tokensCol).cast("long"), lit(0L)).as("__w")),
          numPartitions)
        .select(col("__id"), col("__w")).as[(Long, Long)]
        .localCheckpoint(true))
    val rdd = sorted.rdd
    // pass 1: one (pid, sum) pair per partition — bounded driver state
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    // pass 2: narrow running sum seeded with the partition's offset
    rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets.value(i)
      it.map { case (id, w) => acc += w; (id, w, acc) }
    }.toDF(idCol, tokensCol, "cum_tokens")
      .filter(col("cum_tokens") <= budget)
  }
}
