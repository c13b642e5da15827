package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-shaped decode / feature-extract /
  * frame-sample transforms.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape — the
  * mapInPandas analogue done with typed mapPartitions) is REAL and tested;
  * the codec itself is a STUB: this container ships no image/audio
  * libraries, so `decodeStub` parses our deterministic fake header format
  * instead of JPEG/PNG/WAV. Swap `decodeStub` for a real codec binding
  * and nothing else changes.
  */
object Multimodal {

  /** Typed metadata for a decoded asset. */
  final case class AssetMeta(
      assetId: Long,
      format: String,
      width: Int,
      height: Int,
      nFrames: Int,
      bytes: Long,
      checksum: Long,
      valid: Boolean)

  final case class AssetRow(assetId: Long, payload: Array[Byte])

  /** Fake asset header: "GRFT" + format byte + w:int + h:int + frames:int,
    * then payload. FixtureGen for assets. */
  def fakeAsset(id: Long, format: String, w: Int, h: Int, frames: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(17 + w * h / 64)
    bb.put("GRFT".getBytes)
    bb.put((format match { case "img" => 1; case "aud" => 2; case _ => 3 }).toByte)
    bb.putInt(w); bb.putInt(h); bb.putInt(frames)
    var i = 0
    while (bb.hasRemaining) { bb.put((Dedup.mix64(id ^ i.toLong) & 0xFF).toByte); i += 1 }
    bb.array()
  }

  /** ??? in spirit: the real codec goes here. Deterministic stub decode. */
  def decodeStub(assetId: Long, payload: Array[Byte]): AssetMeta = {
    if (payload == null || payload.length < 17 ||
        payload(0) != 'G' || payload(1) != 'R' || payload(2) != 'F' || payload(3) != 'T')
      return AssetMeta(assetId, "unknown", 0, 0, 0,
        if (payload == null) 0L else payload.length.toLong, 0L, valid = false)
    val bb = java.nio.ByteBuffer.wrap(payload)
    bb.position(4)
    val fmt = bb.get() match { case 1 => "img"; case 2 => "aud"; case _ => "vid" }
    val w = bb.getInt; val h = bb.getInt; val fr = bb.getInt
    var ck = 0xcbf29ce484222325L
    var i = 17
    while (i < payload.length) { ck = (ck ^ payload(i)) * 0x100000001b3L; i += 1 }
    AssetMeta(assetId, fmt, w, h, fr, payload.length.toLong, ck, valid = true)
  }

  /** Batch-shaped decode: mapPartitions in fixed-size batches (the
    * vectorized-UDF shape — a real codec amortizes init per batch, exactly
    * like mapInPandas). Narrow: no shuffle. */
  def decodeBatches(spark: SparkSession, assets: DataFrame, batchSize: Int = 64): Dataset[AssetMeta] = {
    import spark.implicits._
    assets.select(col("assetId"), col("payload")).as[AssetRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec init would go here
          batch.iterator.map(r => decodeStub(r.assetId, r.payload))
        }
      }
  }

  /** Frame sampling for video-like assets: every nth frame index, emitted
    * as (assetId, frameIdx) rows — the downstream shape for per-frame
    * feature extraction. */
  def sampleFrames(meta: DataFrame, everyNth: Int): DataFrame =
    meta.filter(col("format") === "vid" && col("valid"))
      .withColumn("frameIdx",
        explode(sequence(lit(0), greatest(col("nFrames") - 1, lit(0)), lit(everyNth))))
      .select(col("assetId").as("asset_id"), col("frameIdx").cast("long").as("frame_idx"))

  /** Resize plan (no pixels in the stub): target dims preserving aspect. */
  def resizePlan(meta: DataFrame, maxSide: Int): DataFrame =
    meta.filter(col("valid"))
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide).cast("double") / greatest(col("width"), col("height"))))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))
}
