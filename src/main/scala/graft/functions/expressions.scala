package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType, MapType, StringType}
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

import graft.core.TextMetrics
import graft.ops.{Dedup, TextAnalysis}

/** Native Catalyst expressions for the engine's bespoke scalar functions —
  * the custom-operator tier below a full LogicalPlan (builder brief
  * preference order: compose built-ins > custom Expression > Strategy >
  * mapPartitions). Each generates code that calls a static evaluator, so
  * they stay inside whole-stage codegen spans (no ScalaUDF boxing, no
  * closure serialization, null handling by the framework).
  */
object GraftExprs {
  def requireString(children: Expression*): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string arguments, got ${children.map(_.dataType).mkString(", ")}")

  def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  def isFloatVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

object ExprEval {
  // static entry points for generated code
  def simhash64(s: UTF8String): Long = Dedup.simhash(s.toString)
  def fingerprint64(s: UTF8String): Long = TextAnalysis.fingerprint64(s.toString)
  def ratcliff(a: UTF8String, b: UTF8String): Double =
    TextMetrics.similarityRatio(a.toString, b.toString)
  def werEval(a: UTF8String, b: UTF8String): Double =
    TextMetrics.wer(a.toString, b.toString)

  /** Fused cosine: dot + both norms in one pass over the raw ArrayData —
    * no per-element boxing, no HOF interpretation. Element accessors are
    * chosen by the statically-known array element types. Summation order
    * matches the old aggregate(zip_with(...)) formulation element-for-
    * element, so rounded results are bit-identical. */
  def cosineArr(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // deterministic hyperplanes are pure functions of (p, dim): cache per
  // (dim, bits) so executors build each plane set once, not once per row
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()
  private def planes(dim: Int, bits: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((dim.toLong << 32) | bits.toLong,
      _ => Array.tabulate(bits)(p => graft.ops.Similarity.hyperplane(p, dim)))

  /** Occurrence counts of every probe term in ONE pass over the token
    * array (term→index HashMap lookup per token) — replaces the per-term
    * interpreted `filter` HOFs in the BM25 hot path (VERDICT r4 #3: up to
    * 32 lambda evaluations per row broke whole-stage codegen). Integer
    * counts keep the downstream score arithmetic bit-exact. */
  def termCounts(toks: ArrayData,
      termIdx: java.util.HashMap[UTF8String, Integer], nTerms: Int): ArrayData = {
    val counts = new Array[Int](nTerms)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val idx = termIdx.get(toks.getUTF8String(i))
        if (idx != null) counts(idx.intValue) += 1
      }
      i += 1
    }
    ArrayData.toArrayData(counts)
  }

  /** One-probe mixture-sampling gate: keep iff the source is configured
    * and (its threshold is NULL — rate >= 1.0 — or the row hash is below
    * it). Absent source → drop, matching the mixture contract. */
  def mixtureKeep(src: UTF8String, h: Long,
      m: java.util.HashMap[UTF8String, java.lang.Long]): Boolean = {
    val t = m.get(src)
    if (t != null) h < t.longValue
    else m.containsKey(src) // present with NULL value = unconditional keep
  }

  /** All `bits` sign-buckets of the random-hyperplane LSH in ONE pass:
    * bit p = sign(v · plane_p). Replaces `bits` separate interpreted
    * aggregate/zip_with dots per row. */
  /** Morton/Z-order interleave of the low `bits` bits of x and y — x on
    * even result bits, y on odd. bits ≤ 31 keeps the result positive. */
  def zValue(x: Long, y: Long, bits: Int): Long = {
    // analysis catches foldable bits; this guards non-literal callers —
    // silent shift wrap-around would interleave garbage (ADVICE r7)
    require(bits >= 1 && bits <= 31, s"zvalue bits must be in [1, 31], got $bits")
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >>> b) & 1L) << (2 * b) | ((y >>> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  /** Product-quantization encode (Jégou et al., PAMI 2011): for each of
    * the m = cb.length/(k·dsub) subspaces, the code is the L2-argmin over
    * the k sub-centroids, ties to the LOWEST code (strict < keeps the
    * first winner). One fused pass — m·k·dsub multiply-adds per row with
    * no per-element boxing; dim folds in index order so an independent
    * engine summing the same addends in the same order is bit-identical. */
  def pqEncode(v: ArrayData, cb: Array[Double], dsub: Int, k: Int,
      isFloat: Boolean): ArrayData = {
    val m = cb.length / (k * dsub)
    require(v.numElements() == m * dsub,
      s"pq_encode: vector dim ${v.numElements()} != m*dsub = ${m * dsub}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        val off = (s * k + j) * dsub
        val base = s * dsub
        var d2 = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (isFloat) v.getFloat(base + d).toDouble else v.getDouble(base + d)
          val diff = x - cb(off + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    ArrayData.toArrayData(codes)
  }

  def hyperplaneSig(v: ArrayData, dim: Int, bits: Int, isFloat: Boolean): Long = {
    val ps = planes(dim, bits)
    val n = math.min(v.numElements(), dim)
    var sig = 0L
    var p = 0
    while (p < bits) {
      val plane = ps(p)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) * plane(i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** simhash64(text): 64-bit Charikar SimHash over whitespace tokens. */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftExprs.requireString(child)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override protected def nullSafeEval(v: Any): Any =
    ExprEval.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprEval.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** fingerprint64(text): rolling Karp-Rabin fingerprint over tokens. */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftExprs.requireString(child)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"
  override protected def nullSafeEval(v: Any): Any =
    ExprEval.fingerprint64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprEval.fingerprint64($c)")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** ratcliff_ratio(a, b): difflib.SequenceMatcher.ratio() ∈ [0,1]
  * (xbrl_validate.py:100-101 similarity). */
case class RatcliffRatio(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftExprs.requireString(left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ratcliff_ratio"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprEval.ratcliff(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprEval.ratcliff($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RatcliffRatio =
    copy(left = l, right = r)
}

/** word_error_rate(ref, hyp): Levenshtein over whitespace tokens / |ref|. */
case class WordErrorRate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftExprs.requireString(left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_wer"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprEval.werEval(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprEval.werEval($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordErrorRate =
    copy(left = l, right = r)
}

/** graft_cosine(a, b): cosine similarity over two array<float|double>
  * columns as ONE codegen'd call — the aggregate/zip_with HOF version has
  * no doGenCode and ran interpreted in every ANN hot path (r2 finding).
  * Assumes non-null elements (the embedding contract). */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (GraftExprs.isVec(left.dataType) && GraftExprs.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<float|double> arguments, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprEval.cosineArr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      GraftExprs.isFloatVec(left.dataType), GraftExprs.isFloatVec(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprEval.cosineArr($a, $b, " +
      s"${GraftExprs.isFloatVec(left.dataType)}, ${GraftExprs.isFloatVec(right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** graft_hyperplane_sig(vec, dim, bits): all sign-bucket bits of the
  * random-hyperplane LSH signature in one codegen'd pass. */
case class HyperplaneSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (GraftExprs.isVec(first.dataType) && second.dataType == IntegerType &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (array<float|double>, int, int), got " +
        s"${Seq(first, second, third).map(_.dataType).mkString(", ")}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"
  override protected def nullSafeEval(v: Any, d: Any, b: Any): Any =
    ExprEval.hyperplaneSig(v.asInstanceOf[ArrayData], d.asInstanceOf[Int],
      b.asInstanceOf[Int], GraftExprs.isFloatVec(first.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, d, b) =>
      s"graft.functions.ExprEval.hyperplaneSig($v, $d, $b, ${GraftExprs.isFloatVec(first.dataType)})")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HyperplaneSig =
    copy(first = f, second = s, third = t)
}

/** graft_pq_encode(vec, codebook, dsub, k): product-quantization codes —
  * the L2-argmin sub-centroid per subspace, fused into one codegen'd call
  * (the CosineSim discipline: a HOF zip_with/aggregate formulation has no
  * doGenCode and would run interpreted in the encode hot path). The flat
  * codebook literal (layout [(s·k + j)·dsub + d]) parses once per plan
  * into a double[] shipped via `addReferenceObj` (the TermCounts
  * pattern), not re-evaluated per row. */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (!GraftExprs.isVec(first.dataType))
      return TypeCheckResult.TypeCheckFailure(
        s"expected array<float|double> vector, got ${first.dataType}")
    val cbOk = second.dataType == ArrayType(DoubleType, containsNull = false) ||
      second.dataType == ArrayType(DoubleType, containsNull = true)
    if (!cbOk || !second.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"codebook must be a foldable array<double>, got ${second.dataType} " +
          s"(foldable=${second.foldable})")
    if (third.dataType != IntegerType || !third.foldable ||
      fourth.dataType != IntegerType || !fourth.foldable)
      return TypeCheckResult.TypeCheckFailure("dsub and k must be int literals")
    val cbv = second.eval(null)
    val d = third.eval(null)
    val kk = fourth.eval(null)
    if (cbv == null || d == null || kk == null)
      return TypeCheckResult.TypeCheckFailure("codebook/dsub/k must be non-null")
    val (dsubV, kV) = (d.asInstanceOf[Int], kk.asInstanceOf[Int])
    val len = cbv.asInstanceOf[ArrayData].numElements()
    if (dsubV < 1 || kV < 1 || len < 1 || len % (kV * dsubV) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"codebook length $len must be a positive multiple of k*dsub = ${kV * dsubV}")
    else TypeCheckResult.TypeCheckSuccess
  }
  @transient private lazy val cb: Array[Double] =
    second.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val dsubV: Int = third.eval(null).asInstanceOf[Int]
  @transient private lazy val kV: Int = fourth.eval(null).asInstanceOf[Int]
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override protected def nullSafeEval(v: Any, _cb: Any, _d: Any, _k: Any): Any =
    ExprEval.pqEncode(v.asInstanceOf[ArrayData], cb, dsubV, kV,
      GraftExprs.isFloatVec(first.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    defineCodeGen(ctx, ev, (v, _, _, _) =>
      s"graft.functions.ExprEval.pqEncode($v, $cbRef, $dsubV, $kV, " +
        s"${GraftExprs.isFloatVec(first.dataType)})")
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): PqEncode =
    copy(first = f, second = s, third = t, fourth = q)
}

/** graft_zvalue(x, y, bits): Morton/Z-order bit interleave — the
  * multi-dimensional clustering key behind Iceberg-style z-order data
  * layout (sort by z → files hold small rectangles of (x, y) space, so
  * min/max file stats prune range reads on EITHER dimension). Pure
  * integer arithmetic, codegen'd. */
case class ZValue(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != LongType || second.dataType != LongType ||
      third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"expected (bigint, bigint, int), got " +
          s"${Seq(first, second, third).map(_.dataType).mkString(", ")}")
    else if (third.foldable) {
      // ADVICE r7: a SQL caller's graft_zvalue(x, y, 40) used to wrap
      // shifts mod 64 and interleave garbage (and negative bits returned
      // 0) — only the Scala-side Layout.zValue guarded the range. Fail
      // at analysis for literals; non-foldable bits fail per-row in
      // ExprEval.zValue.
      third.eval(null) match {
        case null => TypeCheckResult.TypeCheckSuccess // null propagates
        case b: java.lang.Integer if b >= 1 && b <= 31 =>
          TypeCheckResult.TypeCheckSuccess
        case b => TypeCheckResult.TypeCheckFailure(
          s"bits must be in [1, 31], got $b")
      }
    } else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"
  override protected def nullSafeEval(x: Any, y: Any, b: Any): Any =
    ExprEval.zValue(x.asInstanceOf[Long], y.asInstanceOf[Long], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, b) => s"graft.functions.ExprEval.zValue($x, $y, $b)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZValue =
    copy(first = f, second = s, third = t)
}

/** graft_fnv1a64(text): the FNV-1a fold over UTF-16 units — shared with
  * the DuckDB oracle machinery, so sketch inputs hash identically on both
  * engines. */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftExprs.requireString(child)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fnv1a64"
  override protected def nullSafeEval(v: Any): Any =
    graft.ops.Dedup.fnv1a(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Dedup.fnv1a($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/** graft_spacesaving(token, m): the SpaceSaving frequent-items sketch
  * (Metwally, Agrawal, El Abbadi, "Efficient computation of frequent and
  * top-k elements in data streams", ICDT 2005) — m counters; a new item
  * evicts the minimum counter and inherits its count (as over-estimate
  * error). GUARANTEE: every item with true count > N/m is in the sketch,
  * so the output is a certified CANDIDATE SUPERSET for top-k — the
  * downstream exact recount makes final answers deterministic (the
  * sketch's own counts are merge-order-dependent and are NOT emitted).
  * Bounded O(m) state, associative-enough merge (supersets stay
  * supersets under the standard combine-and-trim merge). Returns the
  * candidate tokens sorted (deterministic set, order-stable). */
case class SpaceSaving(child: Expression, mExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[SpaceSaving.State] {
  import SpaceSaving.State

  private lazy val m: Int = mExpr.eval(null) match {
    case i: java.lang.Integer => i.intValue
    case l: java.lang.Long    => l.intValue
    case other => throw new IllegalArgumentException(s"m must be an int literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && mExpr.foldable &&
      (mExpr.dataType == IntegerType || mExpr.dataType == LongType)) {
      val mv = mExpr.eval(null) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long    => l.longValue
        case _                    => -1L
      }
      if (mv >= 1L && mv <= 100000L) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_spacesaving: m must be in [1, 100000], got $mv")
    } else TypeCheckResult.TypeCheckFailure(
      s"expected (string, int literal), got ${child.dataType}, ${mExpr.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_spacesaving"

  override def createAggregationBuffer(): State = new State()

  private def offer(buf: State, tok: String, count: Long, err: Long): Unit = {
    if (!buf.ordered) {
      // below capacity: pure O(1) HashMap path, no ordered view yet
      val cur0 = buf.counts.get(tok)
      if (cur0 != null) { cur0(0) += count; cur0(1) += err; return }
      buf.counts.put(tok, Array(count, err))
      if (buf.counts.size >= m) buf.buildOrder()
      return
    }
    val cur = buf.counts.get(tok)
    if (cur != null) {
      // O(log m): reposition in the ordered view instead of rescanning
      buf.order.remove((cur(0), tok))
      cur(0) += count; cur(1) += err
      buf.order.add((cur(0), tok))
    } else {
      // deterministic victim = smallest (count, token); the full O(m)
      // HashMap scan per eviction made updates O(n·m) on exactly the
      // vocab >> m workload the sketch targets (review r4-4)
      val victim = buf.order.first()
      buf.order.remove(victim)
      buf.counts.remove(victim._2)
      val vCount = victim._1
      // inherit the victim's count as over-estimate error (SpaceSaving)
      buf.counts.put(tok, Array(vCount + count, vCount + err))
      buf.order.add((vCount + count, tok))
    }
  }

  override def update(buf: State,
      input: org.apache.spark.sql.catalyst.InternalRow): State = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: State, other: State): State = {
    // standard combine-and-trim: add matching counters, offer the rest;
    // the superset guarantee (count > N/m present) survives the merge
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.getKey, e.getValue()(0), e.getValue()(1))
    }
    buf
  }

  override def eval(buf: State): Any = {
    val toks = new Array[String](buf.counts.size)
    val it = buf.counts.keySet().iterator()
    var i = 0
    while (it.hasNext) { toks(i) = it.next(); i += 1 }
    java.util.Arrays.sort(toks, java.util.Comparator.naturalOrder[String]())
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString))
  }

  override def serialize(buf: State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // int-length-prefixed UTF-8, NOT writeUTF: writeUTF throws on tokens
      // whose encoding exceeds 64 KB (one base64 blob in crawl text is a
      // single "token" and would crash the partial-aggregate shuffle)
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val klen = in.readInt()
      val kb = new Array[Byte](klen)
      in.readFully(kb)
      val tok = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      buf.counts.put(tok, Array(c, e))
      i += 1
    }
    // lazy-order invariant: the ordered view exists iff the buffer is full
    if (buf.counts.size >= m) buf.buildOrder()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child, mExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSaving =
    copy(child = newChildren(0), mExpr = newChildren(1))
}

object SpaceSaving {
  /** Counter map plus an ordered (count, token) view of the same entries:
    * evictions and repositions are O(log m) instead of an O(m) scan. The
    * ordered view is built LAZILY when the buffer first fills — below
    * capacity nothing ever evicts, so repeated-token hits stay a bare
    * O(1) HashMap increment (a small-vocab group would otherwise pay
    * TreeSet rebalancing + tuple boxing on every occurrence). */
  final class State extends Serializable {
    val counts = new java.util.HashMap[String, Array[Long]]()
    val order = new java.util.TreeSet[(Long, String)](
      implicitly[Ordering[(Long, String)]])
    var ordered = false

    /** Populate `order` from `counts` (called once, at first fill). */
    def buildOrder(): Unit = {
      val it = counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); order.add((e.getValue()(0), e.getKey)) }
      ordered = true
    }
  }
}

/** graft_term_counts(tokens, terms): per-term occurrence counts over a
  * token array in one codegen'd pass. `terms` must be a foldable
  * array<string> literal — its term→index map is built once at plan time
  * and shipped as a codegen reference object, so the per-row work is one
  * HashMap probe per token regardless of |terms|. Output: array<int>
  * aligned with `terms` (element_at(counts, i+1) = tf of terms(i)). */
case class TermCounts(left: Expression, right: Expression) extends BinaryExpression {
  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et, _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).contains(StringType) &&
      elemType(right.dataType).contains(StringType) && right.foldable) {
      // reject a NULL terms literal at ANALYSIS: it is foldable and
      // array-typed, but forcing termIndex at codegen time would NPE
      if (right.eval(null) == null)
        TypeCheckResult.TypeCheckFailure("terms must be a non-null array literal")
      else TypeCheckResult.TypeCheckSuccess
    } else TypeCheckResult.TypeCheckFailure(
      s"expected (array<string>, array<string> literal), got " +
        s"${left.dataType}, ${right.dataType} (foldable=${right.foldable})")

  /** term → position; first occurrence wins on duplicate terms. */
  @transient private lazy val termIndex: java.util.HashMap[UTF8String, Integer] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val m = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        // clone: literal UTF8Strings can share backing memory with the
        // evaluator's buffers; map keys must be stable
        val k = UTF8String.fromBytes(arr.getUTF8String(i).getBytes)
        if (!m.containsKey(k)) m.put(k, Integer.valueOf(i))
      }
      i += 1
    }
    m
  }
  @transient private lazy val nTerms: Int =
    right.eval(null).asInstanceOf[ArrayData].numElements()

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_term_counts"
  override protected def nullSafeEval(toks: Any, _terms: Any): Any =
    ExprEval.termCounts(toks.asInstanceOf[ArrayData], termIndex, nTerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("termIdx", termIndex,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, java.lang.Integer>")
    defineCodeGen(ctx, ev, (toks, _) =>
      s"graft.functions.ExprEval.termCounts($toks, $mapRef, $nTerms)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TermCounts =
    copy(left = l, right = r)
}

/** graft_mixture_keep(source, hash, thresholds): the mixture-sampling
  * keep decision as ONE hash-map probe per row. `thresholds` is a
  * foldable map<string,bigint> literal of signed-domain (sign-bit
  * flipped) unsigned cut points; a NULL value means rate >= 1.0 (keep
  * unconditionally — the 2⁶⁴−1 threshold literal would drop one hash
  * value in 2⁶⁴), an absent source means drop. Folded to a plan-time
  * HashMap via the TermCounts pattern (`ctx.addReferenceObj`): a
  * Dolma-style mixture with 1000+ sources stays O(1) per row and
  * constant codegen size, where the K-arm OR-chain form risks the 64 KB
  * generated-method limit and interpreted fallback (VERDICT r5 missing
  * #4). */
case class MixtureKeep(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val mapOk = third.dataType match {
      case MapType(StringType, LongType, _) => true
      case _ => false
    }
    if (first.dataType == StringType && second.dataType == LongType &&
      mapOk && third.foldable) {
      if (third.eval(null) == null)
        TypeCheckResult.TypeCheckFailure("thresholds must be a non-null map literal")
      else TypeCheckResult.TypeCheckSuccess
    } else TypeCheckResult.TypeCheckFailure(
      s"expected (string, bigint, map<string,bigint> literal), got " +
        s"${first.dataType}, ${second.dataType}, ${third.dataType} " +
        s"(foldable=${third.foldable})")
  }

  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] = {
    val md = third.eval(null).asInstanceOf[MapData]
    val ks = md.keyArray(); val vs = md.valueArray()
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < md.numElements()) {
      // clone: literal UTF8Strings can share backing memory with the
      // evaluator's buffers; map keys must be stable
      val k = UTF8String.fromBytes(ks.getUTF8String(i).getBytes)
      m.put(k, if (vs.isNullAt(i)) null else java.lang.Long.valueOf(vs.getLong(i)))
      i += 1
    }
    m
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_mixture_keep"
  override protected def nullSafeEval(src: Any, h: Any, _t: Any): Any =
    ExprEval.mixtureKeep(src.asInstanceOf[UTF8String], h.asInstanceOf[Long], lookup)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("mixThresholds", lookup,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, java.lang.Long>")
    defineCodeGen(ctx, ev, (s, h, _) =>
      s"graft.functions.ExprEval.mixtureKeep($s, $h, $mapRef)")
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): MixtureKeep = copy(first = f, second = s, third = t)
}

/** graft_mix64(h): the splitmix64 finalizer over a bigint — full-avalanche
  * mixing for hash values whose raw distribution is skewed (fnv1a of short
  * strings concentrates below ~0.8·2⁶⁴, which broke unsigned-threshold
  * splits). Shared with the DuckDB oracle's mix64Sql. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected bigint, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix64"
  override protected def nullSafeEval(v: Any): Any =
    graft.ops.Dedup.mix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Dedup.mix64($c)")
  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

/** graft_bottomk(hash, k): the K-Minimum-Values (bottom-k) sketch state —
  * the k smallest DISTINCT hash values in UNSIGNED order, as a sorted
  * array. A TypedImperativeAggregate with bounded O(k) state that
  * partial-aggregates map-side and merges associatively — the custom-
  * aggregate tier of the operator preference order (scalar Expression <
  * aggregate < LogicalPlan). KMV distinct estimate = (k−1)·2⁶⁴ / kth
  * (Bar-Yossef et al., RANDOM 2002). */
case class BottomKUnsigned(child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"k must be an int literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && kExpr.foldable &&
      (kExpr.dataType == IntegerType || kExpr.dataType == LongType)) {
      // validate k at ANALYSIS time: k <= 0 would otherwise pass and then
      // throw NoSuchElementException on the empty TreeSet at runtime
      // (add() calls buf.last() when size >= k) — ADVICE r3
      val kv = kExpr.eval(null) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long    => l.longValue
        case _                    => -1L
      }
      if (kv >= 1L && kv <= 1000000L) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_bottomk: k must be in [1, 1000000], got $kv")
    } else TypeCheckResult.TypeCheckFailure(
      s"expected (bigint, int literal), got ${child.dataType}, ${kExpr.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottomk"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](BottomKUnsigned.UnsignedOrder)

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // early reject: once the sketch is full, almost every row's hash is
    // unsigned-larger than the current kth — one comparison, no boxing,
    // no TreeSet insert+pollLast churn
    if (buf.size >= k && java.lang.Long.compareUnsigned(v, buf.last()) >= 0) return
    buf.add(v)
    if (buf.size > k) buf.pollLast() // drop the unsigned-largest
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKUnsigned =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKUnsigned =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKUnsigned =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object BottomKUnsigned {
  /** Serializable — the expression ships to executors with its task. */
  val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    new java.util.Comparator[java.lang.Long] with Serializable {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    }
}

/** graft_bottomk_sample(hash, value, k): bottom-k SAMPLING sketch — the
  * values carried by the k unsigned-smallest distinct hash keys (Cohen &
  * Kaplan, "Summarizing data using bottom-k sketches", PODC 2007). When
  * the hash is a full-avalanche function of a row identity, the carried
  * values are a uniform k-sample of the group, so quantile/mean estimates
  * follow from the sample alone. O(k) state, map-side partial merge,
  * associative; hash ties keep the SMALLEST value so merge order never
  * changes the result. Returns the sampled values ordered by hash
  * (deterministic, engine-reproducible). */
case class BottomKSample(hashExpr: Expression, valueExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: java.lang.Integer => i.intValue
    case l: java.lang.Long    => l.intValue
    case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType == LongType && valueExpr.dataType == DoubleType &&
      kExpr.foldable &&
      (kExpr.dataType == IntegerType || kExpr.dataType == LongType)) {
      val kv = kExpr.eval(null) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long    => l.longValue
        case _                    => -1L
      }
      if (kv >= 1L && kv <= 1000000L) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_bottomk_sample: k must be in [1, 1000000], got $kv")
    } else TypeCheckResult.TypeCheckFailure(
      s"expected (bigint, double, int literal), got ${hashExpr.dataType}, " +
        s"${valueExpr.dataType}, ${kExpr.dataType}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottomk_sample"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double](BottomKUnsigned.UnsignedOrder)

  private def add(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      h: Long, v: Double): Unit = {
    if (buf.size >= k) {
      val last = buf.lastKey()
      val cmp = java.lang.Long.compareUnsigned(h, last)
      if (cmp > 0) return // unsigned-larger than the kth: reject
      if (cmp == 0) { // hash tie on the boundary: keep the smaller value
        val cur = buf.get(last)
        if (v < cur) buf.put(last, v)
        return
      }
    }
    val cur = buf.get(h)
    if (cur == null) {
      buf.put(h, v)
      if (buf.size > k) buf.pollLastEntry()
    } else if (v < cur) buf.put(h, v) // tie rule: min value wins
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val h = hashExpr.eval(input)
    val v = valueExpr.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      other: java.util.TreeMap[java.lang.Long, java.lang.Double])
      : java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(buf, e.getKey, e.getValue) }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putDouble(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(hashExpr, valueExpr, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSample =
    copy(hashExpr = newChildren(0), valueExpr = newChildren(1), kExpr = newChildren(2))
}

/** Column-API front + SQL registration. Call [[functions.register]] once
  * per session (Column builders go through the function registry —
  * `call_function` — since Expression↔Column bridges are sql-private in
  * Spark 4). */
object functions {
  import org.apache.spark.sql.functions.call_function
  def graft_simhash64(c: Column): Column = call_function("graft_simhash64", c)
  def graft_fingerprint64(c: Column): Column = call_function("graft_fingerprint64", c)
  def graft_ratcliff_ratio(a: Column, b: Column): Column =
    call_function("graft_ratcliff_ratio", a, b)
  def graft_wer(a: Column, b: Column): Column = call_function("graft_wer", a, b)
  def graft_cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def graft_hyperplane_sig(v: Column, dim: Column, bits: Column): Column =
    call_function("graft_hyperplane_sig", v, dim, bits)
  def graft_fnv1a64(c: Column): Column = call_function("graft_fnv1a64", c)
  def graft_mix64(c: Column): Column = call_function("graft_mix64", c)
  def graft_zvalue(x: Column, y: Column, bits: Column): Column =
    call_function("graft_zvalue", x, y, bits)
  def graft_term_counts(toks: Column, terms: Column): Column =
    call_function("graft_term_counts", toks, terms)
  def graft_mixture_keep(source: Column, hash: Column, thresholds: Column): Column =
    call_function("graft_mixture_keep", source, hash, thresholds)
  def graft_bottomk(h: Column, k: Column): Column = call_function("graft_bottomk", h, k)
  def graft_bottomk_sample(h: Column, v: Column, k: Column): Column =
    call_function("graft_bottomk_sample", h, v, k)
  def graft_spacesaving(tok: Column, m: Column): Column =
    call_function("graft_spacesaving", tok, m)
  /** mix64∘fnv1a of "salt:id" — THE salted row-identity hash used by
    * splits, Bernoulli/stratified sampling and the quantile sketch. ONE
    * definition (the DuckDB oracles mirror it via saltedHashSql): two
    * hand-rolled spellings of this chain drifting apart would silently
    * break every threshold-based oracle. */
  def graft_salted_hash(salt: String, id: Column): Column = {
    import org.apache.spark.sql.functions.{concat, lit}
    graft_mix64(graft_fnv1a64(concat(lit(salt), lit(":"), id.cast("string"))))
  }
  def graft_pq_encode(v: Column, codebook: Column, dsub: Column, k: Column): Column =
    call_function("graft_pq_encode", v, codebook, dsub, k)
  def graft_bloom_agg(h: Column, nItems: Column, nBits: Column): Column =
    call_function("graft_bloom_agg", h, nItems, nBits)
  def graft_might_contain(bloom: Column, h: Column): Column =
    call_function("graft_might_contain", bloom, h)

  /** Register the functions for SQL use on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash64", es => Simhash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_fingerprint64", es => Fingerprint64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_ratcliff_ratio", es => RatcliffRatio(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_wer", es => WordErrorRate(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine", es => CosineSim(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hyperplane_sig",
      es => HyperplaneSig(es.head, es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_fnv1a64", es => Fnv1a64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_zvalue",
      es => ZValue(es.head, es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_mix64", es => Mix64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_pq_encode",
      es => PqEncode(es.head, es(1), es(2), es(3)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_term_counts",
      es => TermCounts(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_mixture_keep",
      es => MixtureKeep(es.head, es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bottomk",
      es => BottomKUnsigned(es.head, es(1)).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bottomk_sample",
      es => BottomKSample(es.head, es(1), es(2)).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_spacesaving",
      es => SpaceSaving(es.head, es(1)).toAggregateExpression(), "scala_udf")
    // Spark's OWN Bloom expressions (public classes, but not exposed in the
    // SQL registry — they normally serve runtime join filtering): surface
    // them for explicit sketch-then-verify pipelines
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      es => org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es.head, es(1), es(2), 0, 0).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_might_contain",
      es => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es.head, es(1)), "scala_udf")
  }
}
