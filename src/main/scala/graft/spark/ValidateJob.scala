package graft.spark

import graft.core.TextMetrics
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Spark shape: the nested loop becomes a *banded equi-join* — both sides
  * key on floor(value / band) and the cell side explodes to {band-1, band,
  * band+1} so every tolerance window is covered; the exact tolerance
  * predicate then filters. Facts are broadcast (tiny side). This turns an
  * O(cells × facts) loop into a hash join Catalyst can plan.
  */
object ValidateJob {

  val Scales: Seq[Double] = Seq(1.0, 1000.0, 1e6)
  /** Band width ≥ 2× the max tolerance at the largest plausible fact. */
  val BandWidth = 4096.0

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
      .withColumn("band", explode(sequence(
        floor(col("scaled") / BandWidth) - 1,
        floor(col("scaled") / BandWidth) + 1)))
    val bandedFacts = facts
      .select(col("url"), col("concept"), col("value").as("fact_value"))
      .withColumn("band", floor(col("fact_value") / BandWidth))
    numericCells
      .join(broadcast(bandedFacts), Seq("url", "band"))
      .withColumn("diff", abs(col("scaled") - col("fact_value")))
      .filter(col("diff") <= greatest(lit(0.01), lit(0.001) * abs(col("fact_value"))))
      .withColumn("quality", when(col("diff") < 1e-6, "EXACT").otherwise("CLOSE"))
      .drop("band", "scaled")
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
