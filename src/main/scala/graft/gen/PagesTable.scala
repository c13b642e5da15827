package graft.gen

import graft.core.PageRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Distributed fixture materialization: the synthetic `pages` table (and
  * its golden counterpart) generated ON EXECUTORS from the deterministic
  * index — no driver-side corpus, no external data. `spark.range` → typed
  * map means a 10^9-row table costs the same plan shape as 10^3. */
object PagesTable {

  final case class GoldenRow(url: String, text: String)

  def pages(spark: SparkSession, n: Long, partitions: Int = 0, sizeBoost: Int = 1): Dataset[PageRow] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0L, n, 1L, parts).as[Long].map(i => FixtureGen.fixture(i, sizeBoost).row)
  }

  def golden(spark: SparkSession, n: Long, partitions: Int = 0): Dataset[GoldenRow] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0L, n, 1L, parts).as[Long].map { i =>
      val f = FixtureGen.fixture(i)
      GoldenRow(f.row.url, f.golden)
    }
  }

  def pagesDF(spark: SparkSession, n: Long, partitions: Int = 0, sizeBoost: Int = 1): DataFrame =
    pages(spark, n, partitions, sizeBoost).toDF()
}
