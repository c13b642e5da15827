package graft.spark

import graft.core.TextMetrics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Numeric cross-verification stage (SURVEY §3 E3; reference
  * /root/reference/src/xbrl_validate.py:104-146) — the J1 theta join,
  * re-expressed at scale.
  *
  * Reference semantics: every fact × every table cell; match when
  * |cell·f − fact| ≤ max(0.01, 0.001·|fact|) for some scale f ∈ {1, 1000,
  * 1e6}; EXACT when the difference < 1e-6, else CLOSE; leftover facts
  * whose label~concept similarity > 50 become MISMATCH rows.
  *
  * Spark shape: the nested loop becomes a *banded equi-join*. Because the
  * tolerance is RELATIVE (0.001·|fact|), a fixed-width band cannot cover
  * every magnitude — a 4096-wide band misses nearly all CLOSE matches once
  * facts exceed ~4e6 (tolerance 6e7 at fact 6e10 spans ~14600 such bands).
  * Instead the band key is magnitude-aware, two regimes chosen by |value|:
  *  - |v| < 16 — the absolute 0.01 floor dominates the tolerance
  *    (0.001·16 = 0.016): band = floor(v / 0.02); a ±1-band probe covers
  *    offsets up to 0.02 ≥ the max tolerance 0.016 in this regime.
  *  - |v| ≥ 16 — the relative term dominates: band =
  *    floor(ln|v| · 256) per sign; one band is 1/256 ≈ 0.39% in log space,
  *    so a ±1-band probe covers relative offsets up to 0.39% ≥ 0.1% —
  *    CONSTANT coverage at every magnitude, 1e2 or 1e11 alike.
  * The fact side emits exactly one key (its own regime); the cell side
  * probes ±1 in every regime its scaled value could pair across (both,
  * near the 16 boundary), so no duplicate pairs arise. The exact tolerance
  * predicate then filters. Facts are broadcast (tiny side). This turns an
  * O(cells × facts) loop into a hash join Catalyst can plan.
  */
object ValidateJob {

  val Scales: Seq[Double] = Seq(1.0, 1000.0, 1e6)
  /** Regime boundary: below it the 0.01 absolute tolerance floor dominates. */
  val RegimeSplit = 16.0
  /** Absolute-regime band width (≥ 2× the max tolerance below the split). */
  val AbsBand = 0.02
  /** Log-regime resolution: bands of 1/LogScale in ln-space (≈0.39%). */
  val LogScale = 256.0

  /** Abs-regime band, computed on a ±2·RegimeSplit clamp: the clamp never
    * changes a key that survives the regime filters, and keeps floor()'s
    * long conversion from overflowing when a 1e17-scale value flows through
    * the (later discarded) abs branch of a transform(). */
  private def absBandOf(v: Column): Column =
    floor(least(greatest(v, lit(-2 * RegimeSplit)), lit(2 * RegimeSplit)) / AbsBand)

  private def logBandOf(v: Column): Column =
    floor(log(greatest(abs(v), lit(1e-12))) * LogScale)

  /** The single band key of a probe-target value (one per row). Struct
    * (regime, band): regime 0 = absolute, 1 = log-positive, 2 = log-negative. */
  def bandKey(v: Column): Column =
    when(abs(v) < RegimeSplit,
      struct(lit(0).as("regime"), absBandOf(v).as("band")))
      .otherwise(struct(
        when(v >= 0, lit(1)).otherwise(lit(2)).as("regime"),
        logBandOf(v).as("band")))

  /** All band keys a probing value must search: ±1 band in each regime the
    * value sits near (both regimes inside the boundary slack, since a
    * within-tolerance partner can land on the other side of the split).
    * Built as a flat 6-element array of plain when/struct expressions —
    * higher-order functions (transform/filter) have no doGenCode and would
    * break the probe side out of whole-stage codegen. Entries for a regime
    * the value is NOT near carry regime = -1: no fact key ever has that
    * regime, so they can never join; callers should still drop them right
    * after the explode to halve the probe rows. */
  def probeKeys(v: Column): Column = {
    val absRegime = when(abs(v) < RegimeSplit + 1.0, lit(0)).otherwise(lit(-1))
    val logRegime = when(abs(v) > RegimeSplit - 1.0,
      when(v >= 0, lit(1)).otherwise(lit(2))).otherwise(lit(-1))
    val entries =
      (-1 to 1).map(d => struct(absRegime.as("regime"), (absBandOf(v) + d).as("band"))) ++
      (-1 to 1).map(d => struct(logRegime.as("regime"), (logBandOf(v) + d).as("band")))
    array(entries: _*)
  }

  /** cells(url, page, r, c, v:string) × facts(url, concept, value:double) →
    * matches(url, page, r, c, cell_value, concept, fact_value, scale,
    * diff, quality). */
  def matches(spark: SparkSession, cells: DataFrame, facts: DataFrame): DataFrame = {
    import spark.implicits._
    val parseNum = udf((s: String) => TextMetrics.parseNumeric(s))
    val numericCells = cells
      .withColumn("cell_value", parseNum(col("v")))
      .filter(col("cell_value").isNotNull)
      .select(col("url"), col("page"), col("r"), col("c"), col("v"),
        col("cell_value"), explode(typedLit(Scales)).as("scale"))
      .withColumn("scaled", col("cell_value") * col("scale"))
      .withColumn("bk", explode(probeKeys(col("scaled"))))
      .filter(col("bk.regime") >= 0)
    val bandedFacts = facts
      .select(col("url"), col("concept"), col("value").as("fact_value"))
      .withColumn("bk", bandKey(col("fact_value")))
    numericCells
      .join(broadcast(bandedFacts), Seq("url", "bk"))
      .withColumn("diff", abs(col("scaled") - col("fact_value")))
      .filter(col("diff") <= greatest(lit(0.01), lit(0.001) * abs(col("fact_value"))))
      .withColumn("quality", when(col("diff") < 1e-6, "EXACT").otherwise("CLOSE"))
      .drop("bk", "scaled")
  }

  /** Unmatched facts with fuzzy label evidence (xbrl_validate.py:135-145):
    * facts that matched nothing, paired with the most similar row label
    * when SequenceMatcher-style similarity > 50. `labels(url, label)`. */
  def mismatches(spark: SparkSession, facts: DataFrame, matched: DataFrame, labels: DataFrame): DataFrame = {
    import spark.implicits._
    val unmatched = facts.join(matched.select(col("url"), col("concept")).distinct(),
      Seq("url", "concept"), "left_anti")
    graft.functions.functions.register(spark)
    unmatched.join(labels, Seq("url"))
      .withColumn("similarity",
        graft.functions.functions.graft_ratcliff_ratio(
          lower(col("concept")), lower(col("label"))) * 100.0)
      .filter(col("similarity") > 50.0)
      .withColumn("quality", lit("MISMATCH"))
  }

  /** Quality histogram (xbrl_validate.py:159-161). */
  def qualityCounts(matched: DataFrame): DataFrame =
    matched.groupBy(col("quality")).agg(count(lit(1)).as("n")).orderBy(col("quality"))
}
