package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional: extra args = run only these query names (dev iteration)
    val only = args.drop(2).toSet
    def keep(name: String) = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    try SparkEntry.ensureFixtures(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[verify] fixture gen: ${e.getMessage}") }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // filtered dev runs must not SHRINK an existing oracle map — a stale
    // outDir would then selfcheck only the filtered subset and silently
    // mask regressions in every other query
    val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
    if (only.isEmpty || !Files.exists(oraclePath)) {
      val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(oraclePath, json)
    }
    // non-recursive fragments for the large-scale selfcheck (--pyfold):
    // a SEPARATE file — the driver consumes oracle_sql.json only and a
    // `name!fragment` key there would read as a query with no output
    val pyfoldPath = Paths.get(s"$outDir/pyfold_sql.json")
    if (only.isEmpty || !Files.exists(pyfoldPath)) {
      val json = SparkEntry.pyfoldSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(pyfoldPath, json)
    }
    spark.stop()
  }
}
