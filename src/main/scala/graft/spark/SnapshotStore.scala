package graft.spark

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style snapshot layout + exactly-once resume (SURVEY §4.4).
  *
  * No Iceberg runtime jar exists offline, so the *semantics* are
  * implemented directly: Parquet data files + a manifest per snapshot,
  * committed via atomic rename — readers only ever see a fully-committed
  * manifest. The reference analogue is DVC's content-hash stage memoization
  * (/root/reference/dvc.lock) — re-running skips completed work.
  *
  * Layout under `root/`:
  *   data/run-<runId>/        parquet data for the buckets of one run
  *   lineage/run-<runId>/     per-partition lineage rows for that run
  *   snapshot-<N>.tsv         manifest: committed buckets + data dirs
  *
  * Resume unit = url bucket: `pmod(xxhash64(url), nBuckets)`. A bucket's
  * rows are written by exactly one committed run, so the union of all
  * committed data dirs is exactly-once per url.
  */
object SnapshotStore {

  final case class Snapshot(id: Long, buckets: Set[Int], dataDirs: Vector[String])

  def lastSnapshot(root: String): Option[Snapshot] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return None
    val manifests = Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.matches("snapshot-\\d+\\.tsv"))
      .toVector
    if (manifests.isEmpty) return None
    val latest = manifests.maxBy(p =>
      p.getFileName.toString.stripPrefix("snapshot-").stripSuffix(".tsv").toLong)
    Some(readManifest(latest))
  }

  private def readManifest(p: Path): Snapshot = {
    var id = 0L
    val buckets = Set.newBuilder[Int]
    val dirs = Vector.newBuilder[String]
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.foreach { line =>
      line.split('\t') match {
        case Array("snapshot", v) => id = v.toLong
        case Array("bucket", v)   => buckets += v.toInt
        case Array("dir", v)      => dirs += v
        case _                    =>
      }
    }
    Snapshot(id, buckets.result(), dirs.result())
  }

  /** Atomic manifest commit: write tmp in the same directory, then rename. */
  def commitManifest(root: String, s: Snapshot): Unit = {
    val dir = Paths.get(root)
    Files.createDirectories(dir)
    val body = new StringBuilder()
    body ++= s"snapshot\t${s.id}\n"
    s.buckets.toVector.sorted.foreach(b => body ++= s"bucket\t$b\n")
    s.dataDirs.foreach(d => body ++= s"dir\t$d\n")
    val tmp = dir.resolve(s"snapshot-${s.id}.tsv.tmp")
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"snapshot-${s.id}.tsv"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** One resumable run: extract only the buckets not yet committed, write
    * data + lineage, then commit the next snapshot. `maxBuckets` caps how
    * many pending buckets this run takes (the kill-mid-job test knob).
    * Returns the committed snapshot. */
  def run(spark: SparkSession, pages: DataFrame, root: String, runId: String,
      nBuckets: Int = 16, maxBuckets: Int = Int.MaxValue): Snapshot = {
    val prev = lastSnapshot(root).getOrElse(Snapshot(0L, Set.empty, Vector.empty))
    val pending = (0 until nBuckets).filterNot(prev.buckets).take(maxBuckets)
    if (pending.isEmpty) return prev

    val withBucket = pages.withColumn("_bucket",
      pmod(xxhash64(col("url")), lit(nBuckets)).cast("int"))
    val selected = withBucket.filter(col("_bucket").isin(pending: _*)).drop("_bucket")

    val extracted = ExtractJob.extractTexts(spark, selected)
    val dataDir = s"$root/data/run-$runId"
    extracted.write.mode("overwrite").parquet(dataDir)

    // lineage folded from the just-written data (one read, column-pruned —
    // never re-extracts) and committed before the manifest flips.
    val snapId = prev.id + 1
    val lineage = ExtractJob.lineage(
      spark.read.parquet(dataDir).as[ExtractJob.ExtractedText](
        { import spark.implicits._; implicitly[org.apache.spark.sql.Encoder[ExtractJob.ExtractedText]] }),
      runId, snapId)
    lineage.write.mode("overwrite").parquet(s"$root/lineage/run-$runId")

    val snap = Snapshot(snapId, prev.buckets ++ pending, prev.dataDirs :+ dataDir)
    commitManifest(root, snap)
    snap
  }

  /** Read the committed table state (union of all committed data dirs). */
  def readCommitted(spark: SparkSession, root: String): Option[DataFrame] =
    lastSnapshot(root).filter(_.dataDirs.nonEmpty)
      .map(s => spark.read.parquet(s.dataDirs: _*))

  /** Compaction (Iceberg-style table maintenance): rewrite all committed
    * data dirs into one and commit a new snapshot referencing only it.
    * Readers of older snapshots are unaffected — their manifests still
    * point at the old files until [[expireSnapshots]]. */
  def compact(spark: SparkSession, root: String, runId: String): Snapshot = {
    val prev = lastSnapshot(root).getOrElse(return Snapshot(0L, Set.empty, Vector.empty))
    if (prev.dataDirs.length <= 1) return prev
    val dataDir = s"$root/data/compact-$runId"
    spark.read.parquet(prev.dataDirs: _*).write.mode("overwrite").parquet(dataDir)
    val snap = Snapshot(prev.id + 1, prev.buckets, Vector(dataDir))
    commitManifest(root, snap)
    snap
  }

  /** Snapshot expiry: drop all but the newest `keepLast` manifests and
    * delete data dirs no surviving manifest references. */
  def expireSnapshots(root: String, keepLast: Int = 1): Unit = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return
    val manifests = Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.matches("snapshot-\\d+\\.tsv"))
      .toVector
      .sortBy(p => p.getFileName.toString.stripPrefix("snapshot-").stripSuffix(".tsv").toLong)
    if (manifests.length <= keepLast) return
    val (expire, keep) = manifests.splitAt(manifests.length - keepLast)
    val live = keep.map(readManifest).flatMap(_.dataDirs).toSet
    val dead = expire.map(readManifest).flatMap(_.dataDirs).toSet -- live
    expire.foreach(Files.delete)
    dead.foreach { d =>
      val p = Paths.get(d)
      if (Files.isDirectory(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.delete)
      }
    }
  }
}
