package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robust CSV source with the reference's exact read semantics
  * (/root/reference/src/error_rate_detection.py:27-55): no header row,
  * every cell a string, utf-8-sig (BOM stripped), QUOTE_NONE — quotes are
  * ordinary characters, a line is split on raw commas, ragged rows are
  * filled with "". pandas' ParserError→manual-split fallback collapses to
  * one code path here because naive splitting IS the declared dialect.
  *
  * Two narrow passes (width discovery, then projection) — both
  * column-pruned text scans; no shuffle.
  */
object RobustCsv {

  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("value", regexp_replace(col("value"), "^\uFEFF", "")) // utf-8-sig
      .filter(length(col("value")) > 0)
      .withColumn("cells", split(col("value"), ",", -1))
    val width = lines.agg(max(size(col("cells")))).head().getInt(0)
    val cols = (0 until width).map(i =>
      coalesce(get(col("cells"), lit(i)), lit("")).as(s"c$i"))
    lines.select(cols: _*)
  }

  /** Long form: (line, col, value) — the shape the alignment join (J4)
    * consumes directly. Line numbers follow file order per file. */
  def readCells(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(input_file_name()).orderBy(monotonically_increasing_id())
    spark.read.text(path)
      .withColumn("value", regexp_replace(col("value"), "^\uFEFF", ""))
      .filter(length(col("value")) > 0)
      .withColumn("r", row_number().over(w) - 1)
      .select(col("r"), posexplode(split(col("value"), ",", -1)).as(Seq("c", "v")))
  }
}
