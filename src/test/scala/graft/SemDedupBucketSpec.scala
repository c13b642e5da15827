package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** VERDICT r7 #3: semDedup's mega-cell bucketing — a PLANTED mega-cell
  * (k = 1: every vector in one cell) with near-exact echoes must remove
  * exactly the same members through the (cell, bucket) Hamming-1 join as
  * the exact within-cell screen does. */
class SemDedupBucketSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("planted mega-cell: bucketed screen equals the exact screen; echoes removed") {
    import spark.implicits._
    graft.functions.functions.register(spark)
    val dim = 16
    // deterministic base vectors + tiny-perturbation echoes of every 5th
    // (perturbation ~1e-4: a near-exact duplicate straddles at most one
    // hyperplane, the Hamming-1 contract)
    val base = spark.range(0, 400).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (pmod(graft.functions.functions.graft_mix64(col("id") * dim + d), lit(1024))
          .cast("double") / 512.0 - 1.0).cast("float")).as("embedding"))
    val echoes = base.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"), (x, d) =>
          (x.cast("double") +
            (pmod(col("vec_id") * dim + d, lit(3L)).cast("double") - 1.0) / 8192.0)
            .cast("float")).as("embedding"))
    val inp = base.unionByName(echoes)
    def keeps(bits: Int) = graft.ops.Similarity
      .semDedup(inp, eps = 0.999, k = 1, iters = 0, dim = dim, bucketBits = bits)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sorted.toSeq
    val exact = keeps(0)
    val bucketed = keeps(6)
    assert(exact == bucketed, {
      val d = exact.zip(bucketed).filter { case (a, b) => a != b }.take(5)
      s"bucketed screen diverged from exact: $d"
    })
    // every echo pair collapsed to one survivor
    val kept = bucketed.filter(_._2).map(_._1).toSet
    (0L until 400L by 5).foreach { i =>
      assert(kept(i) ^ kept(i + 10000L), s"echo pair $i not collapsed to one survivor")
    }
  }
}
