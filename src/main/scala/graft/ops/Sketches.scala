package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed sketches over document streams.
  *
  * KMV / bottom-k distinct counting (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002): keep the k smallest distinct
  * hash values; if the kth smallest (unsigned) is U, the distinct count is
  * ≈ (k−1)·2⁶⁴/U. The sketch state is O(k), merges associatively (so
  * Spark partial-aggregates it map-side — one shuffle of k longs per
  * group), and, unlike HyperLogLog, is EXACTLY reproducible by an
  * independent engine from the same hash function — the DuckDB oracle
  * recomputes the identical estimate. */
object Sketches {

  val TwoPow64: Double = 1.8446744073709552e19

  import org.apache.spark.sql.Column

  /** (n_kept, estimate) from a bottom-k array column — ONE definition so
    * the distinct and overlap estimators (and their DuckDB oracles) stay
    * in lock-step. The unsigned-double conversion is fp(signed)+2⁶⁴ (two
    * roundings); the oracles mirror the identical two-step arithmetic. */
  private[ops] def kmvEstimate(bk: Column, k: Int): (Column, Column) = {
    val kth = get(bk, lit(k - 1))
    val kthU = when(kth < 0, kth.cast("double") + lit(TwoPow64))
      .otherwise(kth.cast("double"))
    val nKept = size(bk)
    val est = round(
      when(nKept < k, nKept.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(TwoPow64) / kthU), 2)
    (nKept, est)
  }

  /** Per-group bottom-k sketches of the token-hash sets: (groupCol, bk). */
  def kmvSketches(docs: DataFrame, groupCol: String, k: Int = 64,
      textCol: String = "text"): DataFrame = {
    graft.functions.functions.register(docs.sparkSession)
    val toks = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(groupCol), graft.functions.functions.graft_fnv1a64(col("tok")).as("h"))
    toks.groupBy(col(groupCol))
      .agg(graft.functions.functions.graft_bottomk(col("h"), lit(k)).as("bk"))
  }

  /** Per-group distinct-token estimate: (groupCol, n_kept, distinct_est).
    * Exact (= the true distinct count) whenever the group has fewer than k
    * distinct tokens. */
  def kmvDistinctTokens(docs: DataFrame, groupCol: String, k: Int = 64,
      textCol: String = "text"): DataFrame = {
    val sk = kmvSketches(docs, groupCol, k, textCol)
    val (nKept, est) = kmvEstimate(col("bk"), k)
    sk.select(col(groupCol), nKept.cast("long").as("n_kept"),
      est.as("distinct_est"))
  }

  /** Approximate per-group quantiles from a bottom-k UNIFORM SAMPLE
    * (Cohen & Kaplan, PODC 2007): each row's identity hashes through
    * mix64∘fnv1a (full avalanche — raw fnv1a of short strings is NOT
    * uniform in the high bits); the k hash-smallest rows per group are a
    * uniform sample, and the interpolated percentile of the sample
    * estimates the group quantile. Mergeable O(k) state per group (the
    * [[graft.functions.BottomKSample]] TypedImperativeAggregate,
    * map-side partials), so a 100-TB group costs one shuffle of k doubles
    * — and unlike t-digest/GK the result is EXACTLY reproducible by an
    * independent engine from the shared hash.
    * Output: (groupCol, n_sample, q50_est, q90_est, q99_est). */
  def sampleQuantiles(docs: DataFrame, groupCol: String, valueCol: String,
      idCol: String = "doc_id", k: Int = 64): DataFrame = {
    graft.functions.functions.register(docs.sparkSession)
    // the SHARED salted identity hash (one definition with Splits and the
    // oracle's saltedHashSql — hand-rolled copies drift)
    val h = graft.functions.functions.graft_salted_hash("qsample", col(idCol))
    docs.groupBy(col(groupCol))
      .agg(graft.functions.functions
        .graft_bottomk_sample(h, col(valueCol).cast("double"), lit(k)).as("smp"))
      .select(col(groupCol), explode(col("smp")).as("v"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sample"),
        round(expr("percentile(v, 0.5)"), 4).as("q50_est"),
        round(expr("percentile(v, 0.9)"), 4).as("q90_est"),
        round(expr("percentile(v, 0.99)"), 4).as("q99_est"))
  }

  /** Exact per-group top-k frequent tokens AT SCALE via the classic
    * sketch-then-verify two-pass: pass 1 runs a SpaceSaving sketch
    * (Metwally et al., ICDT 2005 — [[graft.functions.SpaceSaving]],
    * bounded O(m) mergeable state, map-side partials) whose output is a
    * certified CANDIDATE SUPERSET (every token with true count > N/m is
    * present); pass 2 exactly recounts ONLY the ≤ m candidates per group
    * (broadcast join — candidate lists are sketch-sized) and takes the
    * deterministic top-k. The naive alternative shuffles EVERY distinct
    * token's count; this shuffles the sketch + candidate hits only.
    * `certified` is true iff the kth count × m > N — the provable-exact
    * condition (a flat distribution can defeat the superset; raise m).
    * Output: (groupCol, token, cnt, rank, certified). */
  def heavyTokens(docs: DataFrame, groupCol: String, k: Int = 5, m: Int = 64,
      textCol: String = "text"): DataFrame = {
    require(k >= 1 && m >= k, s"need m >= k >= 1, got k=$k m=$m")
    graft.functions.functions.register(docs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(groupCol), explode(split(coalesce(col(textCol), lit("")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val cands = toks.groupBy(col(groupCol))
      .agg(graft.functions.functions.graft_spacesaving(col("tok"), lit(m)).as("cand"),
        count(lit(1)).as("n_total"))
      .transform(CheckpointScratch.ckpt _) // consumed twice (candidate join + n_total)
    val candFlat = broadcast(cands.select(col(groupCol), explode(col("cand")).as("tok")))
    val exact = toks.join(candFlat, Seq(groupCol, "tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("cnt").desc, col("tok"))
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .join(cands.select(col(groupCol), col("n_total")), Seq(groupCol))
      .withColumn("certified",
        min(col("cnt")).over(Window.partitionBy(col(groupCol))) * lit(m.toLong) > col("n_total"))
      .select(col(groupCol), col("tok").as("token"), col("cnt"), col("rank"),
        col("certified"))
  }

  /** Count-min row seed: the i-th hash is mix64(fnv1a(tok) XOR cmsSeed(i))
    * — ONE constant derivation shared with the DuckDB oracle. */
  def cmsSeed(i: Int): Long = Dedup.mix64(0x5EEDC0DEL + i)

  /** Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
    * summary: the count-min sketch and its applications", J. Algorithms
    * 2005) in TABLE form: one row per non-empty (group, row i, bucket)
    * cell, cnt = Σ over tokens hashing there. depth×width bounds the
    * per-group state (est ≥ true always; err ≤ N/width w.p. 1−2^−depth).
    *
    * Deliberately NOT a TypedImperativeAggregate (the KMV/SpaceSaving
    * route): a CMS cell is a plain count keyed by (i, bucket), so Spark's
    * partial hash aggregation IS the mergeable sketch — map-side partials
    * are per-task sketches, the shuffle merges them cellwise, and at most
    * depth·width rows per group ever cross the wire. A custom aggregate
    * would re-implement exactly that merge with worse codegen. The table
    * form also persists/unions naturally (store per-crawl increments,
    * GROUP BY again to merge — the [[graft.ops.NearDupStore]] pattern).
    *
    * `width` must be a power of two: bucket = hash & (width−1) picks the
    * LOW bits, which agree between Spark's signed long and the oracle's
    * UBIGINT domain (a modulo would not). */
  def countMinSketch(docs: DataFrame, groupCol: String, depth: Int = 4,
      width: Int = 16, textCol: String = "text"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 2, got $width")
    graft.functions.functions.register(docs.sparkSession)
    val h = docs
      .select(col(groupCol), explode(split(coalesce(col(textCol), lit("")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(groupCol), graft.functions.functions.graft_fnv1a64(col("tok")).as("h"))
    h.select(col(groupCol), explode(array((0 until depth).map(i =>
        struct(lit(i.toLong).as("i"),
          graft.functions.functions.graft_mix64(col("h").bitwiseXOR(lit(cmsSeed(i))))
            .bitwiseAND(lit((width - 1).toLong)).as("bucket"))): _*)).as("ib"))
      .groupBy(col(groupCol), col("ib.i").as("i"), col("ib.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[countMinSketch]] table: est(token) =
    * min over rows i of cell(i, h_i(token)), absent cells = 0. Probes
    * join the sketch on its (group, i, bucket) key — the sketch is never
    * collected or broadcast, so a probe set of any size streams through
    * one hash join. Output: (groupCol, tokenCol, est). */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, groupCol: String,
      depth: Int = 4, width: Int = 16, tokenCol: String = "token"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 2, got $width")
    graft.functions.functions.register(probes.sparkSession)
    probes
      .select(col(groupCol), col(tokenCol),
        graft.functions.functions.graft_fnv1a64(col(tokenCol)).as("h"))
      .select(col(groupCol), col(tokenCol), explode(array((0 until depth).map(i =>
        struct(lit(i.toLong).as("i"),
          graft.functions.functions.graft_mix64(col("h").bitwiseXOR(lit(cmsSeed(i))))
            .bitwiseAND(lit((width - 1).toLong)).as("bucket"))): _*)).as("ib"))
      .select(col(groupCol), col(tokenCol),
        col("ib.i").as("i"), col("ib.bucket").as("bucket"))
      .join(sketch, Seq(groupCol, "i", "bucket"), "left")
      .groupBy(col(groupCol), col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Pairwise set-operation estimates between group sketches — the KMV
    * union/Jaccard construction (Beyer et al., SIGMOD 2007): the union
    * sketch is the bottom-k of the merged sketches, ρ = the fraction of
    * union-sketch members present in BOTH input sets estimates Jaccard,
    * and the union size comes from the union sketch's kth value. For any
    * x in the union's bottom-k, x ∈ bottom-k(A) ⟺ x ∈ A, so membership is
    * decidable from the sketches alone — no second pass over the data.
    * Output: (g_a, g_b, n_union_kept, union_est, jaccard_est). */
  def kmvOverlap(docs: DataFrame, groupCol: String, k: Int = 64,
      textCol: String = "text", maxGroups: Int = 4096): DataFrame = {
    // The pair enumeration below is O(G²) BY CONSTRUCTION (every group pair
    // gets an overlap estimate — that is the query's output), so G must be
    // sketch-sized, not data-sized. Guard it: 4096 groups = 8.4M output
    // rows × k longs is the most a driver-facing overlap matrix can want.
    val sk = CheckpointScratch.ckpt(kmvSketches(docs, groupCol, k, textCol))
    val nGroups = sk.count()
    require(nGroups <= maxGroups,
      s"kmvOverlap enumerates all group pairs (O(G²) output): $nGroups groups " +
        s"exceeds maxGroups=$maxGroups — aggregate to coarser groups or raise " +
        "maxGroups deliberately")
    val a = sk.select(col(groupCol).as("g_a"), col("bk").as("bk_a"))
    val b = sk.select(col(groupCol).as("g_b"), col("bk").as("bk_b"))
    // unsigned sort of signed longs = signed sort of sign-flipped values
    def flip(c: org.apache.spark.sql.Column) =
      transform(c, x => x.bitwiseXOR(lit(Long.MinValue)))
    val joined = a.join(b, col("g_a") < col("g_b")) // tiny: one row per group pair
      .withColumn("union_k",
        transform(slice(array_sort(flip(array_union(col("bk_a"), col("bk_b")))), 1, k),
          x => x.bitwiseXOR(lit(Long.MinValue))))
      .withColumn("n_both", size(
        array_intersect(array_intersect(col("union_k"), col("bk_a")), col("bk_b"))))
    val (nKept, est) = kmvEstimate(col("union_k"), k)
    joined.select(col("g_a"), col("g_b"),
      nKept.cast("long").as("n_union_kept"),
      est.as("union_est"),
      round(col("n_both").cast("double") / nKept, 4).as("jaccard_est"))
  }

  /** HyperLogLog scaling constant α_m·m² for 2^p registers (Flajolet,
    * Fuss, Gandouet, Meunier, AofA 2007 §4; the m ≥ 128 branch). One
    * Scala-side double so the Spark query and the DuckDB oracle embed
    * the IDENTICAL shortest-roundtrip literal. */
  def hllAlphaM2(p: Int): Double = {
    val m = (1 << p).toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m
  }

  /** 2^48 — the dyadic scale that keeps the HLL harmonic-sum fold in
    * exact BIGINT arithmetic (see [[hllEstimate]]). */
  val HllScale: Double = 281474976710656.0

  /** HyperLogLog register TABLE — the relational form of the sketch
    * (Flajolet et al. 2007): one row per (group, bucket) holding the max
    * rank ρ = leading-zero count + 1 of the hash bits above the p bucket
    * bits. The table IS the sketch: O(2^p) rows per group regardless of
    * data size, built in one two-phase hash aggregation (partial max
    * map-side — the mergeability of HLL is Catalyst's partial-agg for
    * free), re-mergeable across shards or crawl increments by re-maxing
    * ([[hllMerge]]) with no rescan, and foldable to a distinct estimate
    * ([[hllEstimate]]) that never leaves integer arithmetic until one
    * final literal multiply/divide — so, unlike a floating-point HLL
    * blob, exactly reproducible by an independent engine from the shared
    * mix64∘fnv1a hash. Output: (groupCol, bucket, rho). */
  def hllRegisters(docs: DataFrame, groupCol: String, p: Int = 8,
      textCol: String = "text", shingle: Int = 1): DataFrame = {
    // p ≤ 15: hllEstimate's BIGINT harmonic scaling sums up to m·2^48,
    // which overflows Long at p = 16 when registers are sparse (ADVICE r8)
    require(p >= 4 && p <= 15, s"p must be in [4,15], got $p")
    require(shingle >= 1, s"shingle must be >= 1, got $shingle")
    graft.functions.functions.register(docs.sparkSession)
    val m = 1L << p
    // items: words, or n-gram shingles of words (token-level distinct
    // counts on web corpora sit in HLL's linear-counting range where the
    // raw estimator overshoots — shingles put real cardinality behind it)
    val ws = filter(split(col(textCol), " "), x => length(x) > 0)
    val items =
      if (shingle == 1)
        docs.select(col(groupCol), explode(ws).as("tok"))
      else docs
        .select(col(groupCol), ws.as("ws"))
        .filter(size(col("ws")) >= shingle)
        .select(col(groupCol), explode(
          transform(sequence(lit(1), size(col("ws")) - (shingle - 1)), i =>
            concat_ws(" ", (0 until shingle).map(j =>
              element_at(col("ws"), i + lit(j))): _*))).as("tok"))
    items
      .select(col(groupCol), graft.functions.functions.graft_mix64(
        graft.functions.functions.graft_fnv1a64(col("tok"))).as("h"))
      // bucket = low p bits (identical in signed and unsigned domains);
      // v = the remaining 64-p bits via logical shift; ρ = (65-p) − bitlen(v),
      // with bin() minimal-width on the non-negative v in both engines
      .withColumn("bucket", expr(s"h & ${m - 1}"))
      .withColumn("v", expr(s"shiftrightunsigned(h, $p)"))
      .withColumn("rho", (lit(65 - p) -
        when(col("v") === 0L, 0).otherwise(length(bin(col("v"))))).cast("long"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge register tables from independent shards/increments: the HLL
    * union is an elementwise register max — one narrow re-aggregation
    * over sketch-sized inputs, no data rescan. */
  def hllMerge(groupCol: String, sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "hllMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Fold a register table to the raw HLL distinct estimate
    * E = α_m·m² / Σ 2^(−M_j) — kept bit-exact across engines by scaling
    * the harmonic sum to BIGINT: Σ 2^(48−ρ) over present registers plus
    * 2^48 per absent register (ρ=0), every term a dyadic integer, so the
    * only float ops are one multiply and one divide on shared literals.
    * No small/large-range corrections (the raw estimator is the spec —
    * callers wanting the ±1.04/√m band at low cardinality should use
    * [[kmvDistinctTokens]], exact below k).
    * Output: (groupCol, n_buckets, sum_scaled, distinct_est). */
  def hllEstimate(registers: DataFrame, groupCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 15, s"p must be in [4,15], got $p") // 2^48·m < 2^63
    val m = 1L << p
    registers.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("rho") <= 48,
          expr("shiftleft(cast(1 as bigint), cast(48 - rho as int))"))
          .otherwise(0L)).as("present_sum"))
      .select(col(groupCol), col("n_buckets"),
        (col("present_sum") + (lit(m) - col("n_buckets")) * lit(281474976710656L))
          .as("sum_scaled"))
      .withColumn("distinct_est",
        round(lit(hllAlphaM2(p)) * lit(HllScale) / col("sum_scaled").cast("double"), 2))
  }
}
