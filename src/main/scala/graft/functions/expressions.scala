package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
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
}

object ExprEval {
  // static entry points for generated code
  def simhash64(s: UTF8String): Long = Dedup.simhash(s.toString)
  def fingerprint64(s: UTF8String): Long = TextAnalysis.fingerprint64(s.toString)
  def ratcliff(a: UTF8String, b: UTF8String): Double =
    TextMetrics.similarityRatio(a.toString, b.toString)
  def werEval(a: UTF8String, b: UTF8String): Double =
    TextMetrics.wer(a.toString, b.toString)
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

  /** Register the functions for SQL use on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash64", es => Simhash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_fingerprint64", es => Fingerprint64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_ratcliff_ratio", es => RatcliffRatio(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_wer", es => WordErrorRate(es.head, es(1)), "scala_udf")
  }
}
