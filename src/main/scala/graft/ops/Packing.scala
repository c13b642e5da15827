package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents to fixed-token-budget bins
  * (context windows) for training, the standard "pack examples into
  * sequences of length L" step (T5 / GPT data loaders). Docs are packed
  * in id order within each group; a doc that would overflow the current
  * bin closes it and opens the next. A doc larger than the budget gets
  * its own bin (never split here — truncation is a separate policy).
  *
  * Shape at 100 TB: packing is SEQUENTIAL per group by definition
  * (bin N+1 depends on bin N), so parallelism comes from the grouping —
  * groups are shards/sources, thousands of them in a real corpus. One
  * shuffle: repartition by group, sort within partitions by (group, id),
  * then a single O(1)-state pass per partition. Only (group, id, tokens)
  * cross the wire, never text.
  */
object Packing {

  /** (groupCol, idCol, n_tokens, bin_id). Token count = whitespace words
    * of `textCol` (the WET convention used across the ops layer). */
  def packGreedy(docs: DataFrame, budget: Int, groupCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val slim = docs.select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        // null/empty text → 0 tokens, explicitly: size(split('', ' ')) is 1
        // (the empty string counts as a word) and size(split(null)) is
        // null/-1, either of which corrupts the fill accounting
        when(length(coalesce(col(textCol), lit(""))) === 0, 0L)
          .otherwise(size(split(col(textCol), " ")).cast("long")).as("ntok"))
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("id"))
    slim.as[(String, Long, Long)].mapPartitions { it =>
      // partitions contain whole groups (repartition on g); state resets
      // at each group boundary
      var curG: String = null
      var bin = 0L
      var fill = 0L
      it.map { case (g, id, ntok) =>
        if (g != curG) { curG = g; bin = 0L; fill = 0L }
        if (fill > 0L && fill + ntok > budget) { bin += 1L; fill = ntok }
        else fill += ntok
        (g, id, ntok, bin)
      }
    }.toDF(groupCol, idCol, "n_tokens", "bin_id")
  }

  /** Bin-level utilization summary: (groupCol, bin_id, n_docs, used,
    * fill_frac) — the packing-efficiency report a data loader wants. */
  def packStats(packed: DataFrame, budget: Int, groupCol: String = "source"): DataFrame =
    packed.groupBy(col(groupCol), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("used"))
      .withColumn("fill_frac",
        round(least(col("used"), lit(budget.toLong)).cast("double") / budget, 4))
}
