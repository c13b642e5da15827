package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents to fixed-token-budget bins
  * (context windows) for training, the standard "pack examples into
  * sequences of length L" step (T5 / GPT data loaders). Docs are packed
  * in id order within each (group, shard); a doc that would overflow the
  * current bin closes it and opens the next. A doc larger than the budget
  * gets its own bin (never split here — truncation is a separate policy).
  *
  * Shape at 100 TB: the greedy fold is SEQUENTIAL by definition (bin N+1
  * depends on bin N), so parallelism must come from the partitioning —
  * and "one fold per group" dies when one source holds 50% of the corpus
  * (the exact skew class the stratified sampler's salted top-k fixed).
  * TWO-LEVEL packing instead: each group is split into `shards`
  * deterministic salted sub-shards (`(salted_hash(id) >>> 1) % shards` —
  * recomputable by any engine), the greedy fold runs per (group, shard),
  * and bin identity is (group, shard, bin). That is also the contract
  * real data loaders use — packing is per OUTPUT SHARD, and a training
  * run reads shards, not whole sources. One shuffle: repartition by
  * (group, shard), sort within partitions, single O(1)-state pass. Only
  * (group, shard, id, tokens) cross the wire, never text. Max fold length
  * drops from |mega-group| to ~|mega-group|/shards; raise `shards` to
  * bound it at any corpus size.
  */
object Packing {

  /** (groupCol, idCol, n_tokens, shard_id, bin_id). Token count =
    * whitespace words of `textCol` (the WET convention used across the
    * ops layer). `shards` >= 1; shards = 1 reproduces whole-group packing
    * (shard_id 0 everywhere). */
  def packGreedy(docs: DataFrame, budget: Int, groupCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text",
      shards: Int = 16): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.functions.register(spark)
    // deterministic sub-shard from the shared salted row hash. The
    // unsigned >>> 1 keeps the value non-negative so a plain % equals the
    // unsigned mod an external engine computes on the UBIGINT image of
    // the same hash (no signed-pmod 2^64-alignment trap).
    val shard = pmod(shiftrightunsigned(
      graft.functions.functions.graft_salted_hash("pack", col(idCol)), 1),
      lit(shards.toLong))
    val slim = docs.select(col(groupCol).cast("string").as("g"),
        shard.as("shard"),
        col(idCol).cast("long").as("id"),
        // null/empty text → 0 tokens, explicitly: size(split('', ' ')) is 1
        // (the empty string counts as a word) and size(split(null)) is
        // null/-1, either of which corrupts the fill accounting
        when(length(coalesce(col(textCol), lit(""))) === 0, 0L)
          .otherwise(size(split(col(textCol), " ")).cast("long")).as("ntok"))
      // EXPLICIT partition count: a bare repartition(cols) is fair game
      // for AQE coalescing, which at probe scale collapsed the exchange to
      // 2-4 partitions and serialized the folds the shard fan-out exists
      // to parallelize — a user-specified N is never coalesced
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("g"), col("shard"))
      .sortWithinPartitions(col("g"), col("shard"), col("id"))
    slim.as[(String, Long, Long, Long)].mapPartitions { it =>
      // partitions contain whole (group, shard) cells (repartition on
      // both); state resets at each cell boundary
      var curG: String = null
      var curS = -1L
      var bin = 0L
      var fill = 0L
      it.map { case (g, sh, id, ntok) =>
        if (g != curG || sh != curS) { curG = g; curS = sh; bin = 0L; fill = 0L }
        if (fill > 0L && fill + ntok > budget) { bin += 1L; fill = ntok }
        else fill += ntok
        (g, id, ntok, sh, bin)
      }
    }.toDF(groupCol, idCol, "n_tokens", "shard_id", "bin_id")
  }

  /** Sliding-window chunking — the OTHER sequence-shaping step trainers
    * run (packing joins short docs; chunking splits long ones): cut each
    * document's token stream into windows of at most `maxLen` tokens
    * whose starts advance by `stride` (stride < maxLen → overlapping
    * context, the GPT-style convention). Chunk count for an n-token doc
    * is 1 + ceil((n − maxLen)/stride) when n > maxLen, else one chunk
    * (zero-token docs chunk to nothing). Purely narrow — per-row
    * arithmetic + one explode, zero shuffle at any corpus size.
    * Output: (idCol, chunk_idx, start_tok, chunk_len). */
  def chunkDocs(docs: DataFrame, maxLen: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    require(stride >= 1 && stride <= maxLen,
      s"stride must be in [1, maxLen], got $stride")
    val n = when(length(coalesce(col(textCol), lit(""))) === 0, 0L)
      .otherwise(size(split(col(textCol), " ")).cast("long"))
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division — integer
    // division keeps the ceil arithmetic exact and engine-independent
    val nc = when(col("n_tokens") === 0L, 0L)
      .when(col("n_tokens") <= maxLen, 1L)
      .otherwise(lit(1L) +
        expr(s"(n_tokens - $maxLen + $stride - 1) div $stride"))
    docs.select(col(idCol).cast("long").as(idCol), n.as("n_tokens"))
      .withColumn("n_chunks", nc.cast("long"))
      .filter(col("n_chunks") >= 1)
      .select(col(idCol), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(maxLen.toLong), col("n_tokens") - col("chunk_idx") * stride)
          .as("chunk_len"))
  }

  /** GPT-loader CONTEXT WINDOWS (Brown et al. 2020 §2.3 data-loading
    * shape): concatenate the whole corpus in idCol order and cut it into
    * fixed `winLen`-token windows, documents SPLITTING across window
    * boundaries — the complement of [[chunkDocs]] (per-doc, no concat)
    * and [[packGreedy]] (whole docs, no splits). Output is the loader's
    * index: one row per (window, document) piece,
    * (win_id, idCol, doc_off, win_off, n_take) — read n_take tokens of
    * the doc starting at doc_off into the window at win_off. Every
    * column is BIGINT arithmetic over the exclusive token prefix sum,
    * so windows are reproducible by an independent engine and invariant
    * to partitioning.
    *
    * Scale shape: offsets via [[Selection.prefixSumBy]] (range sort +
    * per-partition stats — one long per partition to the driver, never
    * a single-partition window); the window explode is narrow, emitting
    * ceil(n/winLen)+1 rows max per doc. Zero-token docs emit nothing;
    * the final partial window is emitted short. */
  def contextWindows(docs: DataFrame, winLen: Int, idCol: String = "doc_id",
      textCol: String = "text", numPartitions: Int = 0): DataFrame = {
    require(winLen >= 1, s"winLen must be >= 1, got $winLen")
    val n = size(filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      w => length(w) > 0)).cast("long")
    val withN = docs.select(col(idCol).cast("long").as(idCol), n.as("__n"))
    val ps = Selection.prefixSumBy(withN, Seq(col(idCol)), Seq(true),
      col("__n"), idCol, numPartitions)
    val L = winLen.toLong
    ps.filter(col("w") > 0L)
      .select(col(idCol), col("w").as("n"), col("offset"))
      .withColumn("win_id", explode(sequence(
        expr(s"offset div $L"), expr(s"(offset + n - 1) div $L"))))
      .select(col("win_id"), col(idCol),
        greatest(col("win_id") * L - col("offset"), lit(0L)).as("doc_off"),
        greatest(col("offset") - col("win_id") * L, lit(0L)).as("win_off"),
        (least(col("offset") + col("n"), (col("win_id") + 1) * L)
          - greatest(col("offset"), col("win_id") * L)).as("n_take"))
  }

  /** CONTENT-DEFINED chunking (the CDC idea of Muthitacharoen et al.
    * 2001 "A low-bandwidth network file system", at token granularity):
    * a token is an ANCHOR when its hash lands in a 1/(mask+1) band, and
    * every anchor closes its chunk. Boundaries depend only on LOCAL
    * content, so an insertion re-syncs at the next anchor and leaves
    * all later chunks byte-identical — the property that makes
    * variable-size chunks dedup-friendly where fixed windows
    * ([[contextWindows]]) shift everything downstream.
    *
    * Output: (idCol, chunk_idx, start_tok, n_toks) — 0-based token
    * offsets, expected chunk length mask+1. Pure integer/hash
    * arithmetic (mix64∘fnv1a per token, exact pmod band). Shape: one
    * narrow tokenize+flag pass; the running anchor count is a per-DOC
    * window (state bounded by doc length — the LM-fold class, never a
    * corpus-wide sort); one hash aggregation per (doc, chunk). */
  /** Token stream with CDC chunk assignment: (sid, pos, tok, chunk_idx)
    * — the shared core of [[cdcChunks]] and [[cdcChunkDedup]]. */
  private def cdcAssign(docs: DataFrame, mask: Int, idCol: String,
      textCol: String): DataFrame = {
    require(mask >= 0, s"mask must be >= 0, got $mask")
    graft.functions.functions.register(docs.sparkSession)
    import graft.functions.functions.{graft_fnv1a64, graft_mix64}
    val stream = docs.select(col(idCol).cast("long").as("sid"),
      posexplode(filter(split(coalesce(col(textCol), lit("")), "\\s+"),
        w => length(w) > 0)).as(Seq("pos", "tok")))
    val flagged = stream.withColumn("anchor",
      pmod(graft_mix64(graft_fnv1a64(col("tok"))), lit(mask.toLong + 1L)) === 0L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sid")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    flagged.withColumn("chunk_idx",
      coalesce(sum(when(col("anchor"), 1L).otherwise(0L)).over(w), lit(0L)))
  }

  def cdcChunks(docs: DataFrame, mask: Int = 63, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    cdcAssign(docs, mask, idCol, textCol)
      .groupBy(col("sid"), col("chunk_idx"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        count(lit(1)).as("n_toks"))
      .select(col("sid").as(idCol), col("chunk_idx"),
        col("start_tok"), col("n_toks"))

  /** CDC chunk-level dedup profile — the content-addressable-storage
    * view of the corpus: every chunk's CONTENT hashes (graft_fnv1a64 of
    * its space-joined tokens — the engine-shared hash, so an independent
    * SQL engine reproduces the buckets), chunks repeated anywhere in the
    * corpus count as duplicated, and each doc reports
    * (idCol, n_chunks, n_dup_chunks, dup_chunk_frac). Because CDC
    * boundaries RE-SYNC at anchors, a boilerplate tail shared by many
    * docs collapses to the same chunk hashes regardless of what precedes
    * it — exactly the storage/transfer saving a chunk store realizes
    * (LBFS, Muthitacharoen 2001).
    *
    * Scale shape: per-chunk token lists are bounded by chunk size (the
    * anchor band keeps E[chunk] = mask+1 tokens); the corpus-wide count
    * groups on 8-byte hashes — text never crosses the dedup shuffle. */
  /** Per-chunk CONTENT hashes (sid, chunk_idx, ch): graft_fnv1a64 of the
    * chunk's space-joined tokens — the engine-shared hash, reproducible
    * by an independent SQL engine. Shared core of [[cdcChunkDedup]] and
    * [[Revisit.delta]]. */
  private[ops] def chunkHashes(docs: DataFrame, mask: Int, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.functions.graft_fnv1a64
    cdcAssign(docs, mask, idCol, textCol)
      .groupBy(col("sid"), col("chunk_idx"))
      .agg(graft_fnv1a64(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ")).as("ch"))
  }

  def cdcChunkDedup(docs: DataFrame, mask: Int = 63, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val chunks = chunkHashes(docs, mask, idCol, textCol)
      .transform(CheckpointScratch.ckpt) // feeds the count AND the rejoin
    val freq = chunks.groupBy(col("ch")).agg(count(lit(1)).as("n"))
    val perDoc = chunks.join(freq, Seq("ch"))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
    docs.select(col(idCol).cast("long").as("sid")).distinct()
      .join(perDoc, Seq("sid"), "left")
      .select(col("sid").as(idCol),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        round(coalesce(col("n_dup_chunks"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_chunks"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("dup_chunk_frac"))
  }

  /** Bin-level utilization summary: (groupCol, shard_id, bin_id, n_docs,
    * used, fill_frac) — the packing-efficiency report a data loader
    * wants, keyed by the full bin identity. */
  def packStats(packed: DataFrame, budget: Int, groupCol: String = "source"): DataFrame =
    packed.groupBy(col(groupCol), col("shard_id"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("used"))
      .withColumn("fill_frac",
        round(least(col("used"), lit(budget.toLong)).cast("double") / budget, 4))
}
