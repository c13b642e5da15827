package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Int8 scalar quantization for embedding columns — the FAISS SQ8 scale
  * path (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", 2011 §2 discusses the scalar baseline): at 100 TB an
  * `array<float>` embedding column is 4× the bytes of int8 codes, and
  * the codes ride dictionary/bit-packed parquet pages. Codes are
  * per-vector symmetric: scale = max|x|/127, code_i = round(x_i/scale)
  * (round-half-up via floor(x/scale + 0.5) — exact IEEE ops, so Spark
  * and an independent SQL engine agree bit-for-bit).
  *
  * Quantized cosine is scale-FREE: cos(qa, qb) = Σqa·qb /
  * (√Σqa²·√Σqb²) approximates cos(a, b) regardless of the two scales
  * (they cancel), so the dot products are EXACT BIGINT arithmetic and
  * the only float ops are two correctly-rounded sqrts, one multiply and
  * one divide — the repo's bit-exactness discipline holds with no
  * ordered-fold machinery.
  *
  * 100-TB shape: [[int8]] is a pure narrow map (zero shuffle);
  * [[quantizedTopK]] is the brute-force verify tier (broadcast queries ×
  * corpus scan, the [[Similarity.bruteForceTopK]] plan) meant to run
  * cell- or bucket-pruned in composition with the IVF/LSH candidate
  * generators, which stay as they are. */
object Quantize {

  /** Per-vector int8 codes: (id, scale DOUBLE, qvec ARRAY<TINYINT>,
    * qnorm BIGINT). Zero vectors quantize to scale 0 / all-zero codes
    * (guarded — no division). qnorm = Σ code², precomputed because every
    * downstream cosine needs it and the codes page stays unread for
    * norm-only work. */
  def int8(embeddings: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val xd = transform(col(vecCol), x => abs(x.cast("double")))
    val scale = array_max(xd) / lit(127.0d)
    val codes = transform(col(vecCol), x =>
      when(col("scale") === 0.0d, lit(0L))
        .otherwise(floor(x.cast("double") / col("scale") + lit(0.5d)))
        .cast("byte"))
    embeddings
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol), scale.as("scale"))
      .withColumn("qvec", codes)
      .withColumn("qnorm", aggregate(col("qvec"), lit(0L),
        (acc, x) => acc + x.cast("long") * x.cast("long")))
      .select(col("vec_id"), col("scale"), col("qvec"), col("qnorm"))
  }

  /** Exact BIGINT dot product of two code arrays. */
  private def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Brute-force top-k neighbors in CODE space — symmetric quantized
    * cosine, deterministic rank (rounded cosine desc, neighbor id asc),
    * the [[Similarity.bruteForceTopK]] contract over int8 codes. Zero
    * vectors (qnorm 0) can't rank — they are excluded from both sides
    * rather than dividing by zero. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = int8(corpus, idCol, vecCol).filter(col("qnorm") > 0L)
      .select(col("vec_id").as("neighbor_id"), col("qvec").as("cq"),
        col("qnorm").as("cn"))
    val q = int8(queries, idCol, vecCol).filter(col("qnorm") > 0L)
      .select(col("vec_id").as("query_id"), col("qvec").as("qq"),
        col("qnorm").as("qn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos", round(
        qdot(col("cq"), col("qq")).cast("double")
          / (sqrt(col("cn").cast("double")) * sqrt(col("qn").cast("double"))), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("qcos"),
        col("rank").cast("long").as("rank"))
  }
}
