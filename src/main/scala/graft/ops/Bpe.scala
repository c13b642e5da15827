package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding APPLY (Sennrich, Haddow, Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016; the GPT-2
  * tokenizer's merge discipline): given a rank-ordered MERGE TABLE —
  * the static model artifact a production tokenizer ships (GPT-2's
  * merges.txt is ~450 KB) — split each word into characters and
  * repeatedly merge the LEFTMOST occurrence of the LOWEST-RANK applicable
  * adjacent pair until none applies. One merge per step makes the fold a
  * deterministic sequential recurrence per word — the same per-group
  * fold class as the greedy pack (`q_pack_bins`), and the DuckDB oracle
  * replicates it as a recursive CTE with single-occurrence string
  * surgery (strpos + substr, NOT replace-all).
  *
  * Vocabulary ids out: a single character keeps its code point; a merged
  * token gets 256 + the LOWEST rank producing it (two merges can emit
  * the same surface string; min-rank makes the id deterministic).
  *
  * Why this matters in the loader tier (VERDICT r7 #4): token budgets,
  * context windows, and packing all counted WHITESPACE tokens; real
  * budgets are subword. `q_bpe_budget` re-parameterizes the token-budget
  * selection over these counts in one composed plan.
  *
  * 100-TB shape: the merge table is MODEL-scale (KBs), broadcast once as
  * a task literal — the one legitimate broadcast-a-model case (contrast
  * [[Classifier]], whose corpus-derived model joins as a table). The
  * apply is purely narrow per-doc work: no shuffle, per-task state
  * bounded by one word. A per-task memo keyed by word collapses the
  * Zipf-heavy head (the same word never folds twice per task). */
object Bpe {

  /** Apply the merge loop to one word. Spec (documented contract, shared
    * with the oracle): while some adjacent pair is in `ranks`, merge the
    * LEFTMOST occurrence of the lowest-rank pair present; one occurrence
    * per step. */
  def applyWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var toks: Vector[String] = word.map(_.toString).toVector
    var go = toks.length > 1
    while (go) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPos = i }
        i += 1
      }
      if (bestPos < 0) go = false
      else {
        toks = toks.patch(bestPos, Vector(toks(bestPos) + toks(bestPos + 1)), 2)
        go = toks.length > 1
      }
    }
    toks
  }

  /** (merge-pair → rank) and (token → vocab id) from a merges frame
    * (rank, l, r). Model-scale driver collect by design (see object
    * scaladoc). */
  private def model(merges: DataFrame): (Map[(String, String), Int], Map[String, Long]) = {
    val rows = merges.select(col("rank").cast("int"), col("l"), col("r")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    val ranks = rows.map { case (rk, l, r) => ((l, r), rk) }.toMap
    require(ranks.size == rows.length, "duplicate merge pair in merges table")
    val vocab = rows.groupBy { case (rk, l, r) => l + r }
      .map { case (tok, g) => tok -> (256L + g.map(_._1).min) }
    (ranks, vocab)
  }

  /** Subword tokenization of `docs` under `merges`: one output row per
    * subword token — (idCol, widx, pos, token, token_id); widx is the
    * 1-based word index in the space-split (empty words skipped, index
    * kept), pos the 1-based token position within the word. Ids: code
    * point for single chars, 256 + min merge rank otherwise. */
  def tokenize(docs: DataFrame, merges: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (ranks, vocab) = model(merges)
    val bRanks = spark.sparkContext.broadcast(ranks)
    val bVocab = spark.sparkContext.broadcast(vocab)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val rk = bRanks.value
        val vb = bVocab.value
        // Zipf memo: per-task, keyed by surface word — bounded by the
        // task's distinct-word count
        val memo = new scala.collection.mutable.HashMap[String, Vector[String]]()
        def tokId(t: String): Long =
          if (t.length == 1) t.charAt(0).toLong
          else vb.getOrElse(t, -1L) // unmergeable multi-char never happens; -1 marks a bug
        it.flatMap { case (id, text) =>
          val words = (if (text == null) "" else text).split(" ", -1)
          words.iterator.zipWithIndex.flatMap { case (w, wi) =>
            if (w.isEmpty) Iterator.empty
            else {
              val toks = memo.getOrElseUpdate(w, applyWord(w, rk))
              toks.iterator.zipWithIndex.map { case (t, p) =>
                (id, (wi + 1).toLong, (p + 1).toLong, t, tokId(t))
              }
            }
          }
        }
      }
      .toDF(idCol, "widx", "pos", "token", "token_id")
  }

  /** BPE TRAINING (Sennrich 2016 learn_bpe): iterate numMerges times —
    * tokenize every DISTINCT word under the merges so far, count
    * frequency-weighted adjacent token pairs (every adjacent position,
    * the symbol-sequence count), adopt the most frequent pair as the
    * next merge (ties: lexicographic (l, r) — deterministic), stop early
    * when the best count falls below `minCount`. Output: the learned
    * merge table (rank, l, r, cnt).
    *
    * 100-TB shape: ONE corpus-scale pass builds the (word, freq) frame —
    * VOCAB-scale, checkpointed; every iteration is a distributed
    * flatMap+agg over that frame (re-applying the merges so far via
    * [[applyWord]] — stateless, O(numMerges² · vocab) total, all
    * vocab-scale) plus a ONE-ROW argmax collect. Merges accumulate on
    * the driver (numMerges rows — model-scale, the kmeans-centroid
    * precedent). No per-iteration corpus rescan.
    *
    * The DuckDB oracle replays training EXACTLY: numMerges unrolled
    * blocks, each folding the distinct words through the recursive-CTE
    * apply under the PREVIOUS blocks' adopted merges, recounting pairs,
    * and re-running the argmax — tokenizer training verified against an
    * independent engine. (The oracle cannot stop early; pick numMerges
    * small enough that every level's best count stays ≥ minCount on the
    * target corpus.) */
  def trainMerges(docs: DataFrame, numMerges: Int, minCount: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = CheckpointScratch.ckpt(
      docs.select(explode(filter(split(coalesce(col(textCol), lit("")), " "),
          w => length(w) > 0)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq")))
      .as[(String, Long)]
    var ranks = Map.empty[(String, String), Int]
    val learned = Vector.newBuilder[(Int, String, String, Long)]
    var k = 0
    var go = true
    while (go && k < numMerges) {
      val bRanks = spark.sparkContext.broadcast(ranks)
      val best = words.flatMap { case (w, f) =>
        val toks = applyWord(w, bRanks.value)
        (0 until toks.length - 1).iterator.map(i => (toks(i), toks(i + 1), f))
      }.toDF("l", "r", "f")
        .groupBy(col("l"), col("r")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) go = false
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        ranks += ((l, r) -> k)
        learned += ((k, l, r, c))
        k += 1
      }
    }
    learned.result().toDF("rank", "l", "r", "cnt")
  }

  /** Per-doc subword token counts: (idCol, n_bpe_tokens) — every input
    * doc appears (zero for empty text). The count feeding real token
    * budgets. */
  def tokenCounts(docs: DataFrame, merges: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val counts = tokenize(docs, merges, idCol, textCol)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_bpe_tokens"))
    docs.select(col(idCol).cast("long").as(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}
