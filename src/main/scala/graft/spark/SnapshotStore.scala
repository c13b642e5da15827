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

  /** Per-data-file column statistics (the Iceberg manifest-entry analogue):
    * min/max `warcTs` (epoch millis) and min/max url host per parquet
    * file, recorded at commit time so ranged reads prune FILES from the
    * manifest alone — no footer reads, no data scan. */
  final case class FileStats(path: String, tsMin: Long, tsMax: Long,
      hostMin: String, hostMax: String)

  final case class Snapshot(id: Long, buckets: Set[Int], dataDirs: Vector[String],
      files: Vector[FileStats] = Vector.empty)

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

  /** Time travel (Iceberg's `VERSION AS OF`): the manifest committed as
    * snapshot `id`, when it still exists ([[expireSnapshots]] may have
    * dropped it). Data files are immutable once committed and survive
    * until NO retained manifest references them, so a historical
    * manifest reconstructs that snapshot's exact table state — including
    * its file stats, so ranged reads prune against the state AS OF then. */
  def snapshotAt(root: String, id: Long): Option[Snapshot] = {
    val p = Paths.get(root).resolve(s"snapshot-$id.tsv")
    if (Files.isRegularFile(p)) Some(readManifest(p)) else None
  }

  private def readManifest(p: Path): Snapshot = {
    var id = 0L
    val buckets = Set.newBuilder[Int]
    val dirs = Vector.newBuilder[String]
    val files = Vector.newBuilder[FileStats]
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.foreach { line =>
      line.split('\t') match {
        case Array("snapshot", v) => id = v.toLong
        case Array("bucket", v)   => buckets += v.toInt
        case Array("dir", v)      => dirs += v
        case Array("file", path, tMin, tMax, hMin, hMax) =>
          files += FileStats(path, tMin.toLong, tMax.toLong, hMin, hMax)
        case _                    =>
      }
    }
    Snapshot(id, buckets.result(), dirs.result(), files.result())
  }

  /** Atomic manifest commit: write tmp in the same directory, then rename.
    * File stats are deduped by path — a repeated backfill of the same dir
    * (e.g. a formerly-unnormalizable relative root) must not accumulate
    * duplicate entries that pruneFiles would feed to the reader twice. */
  def commitManifest(root: String, s: Snapshot): Unit = {
    val dir = Paths.get(root)
    Files.createDirectories(dir)
    val body = new StringBuilder()
    body ++= s"snapshot\t${s.id}\n"
    s.buckets.toVector.sorted.foreach(b => body ++= s"bucket\t$b\n")
    s.dataDirs.foreach(d => body ++= s"dir\t$d\n")
    s.files.distinctBy(_.path).foreach { f =>
      body ++= s"file\t${f.path}\t${f.tsMin}\t${f.tsMax}\t${f.hostMin}\t${f.hostMax}\n"
    }
    val tmp = dir.resolve(s"snapshot-${s.id}.tsv.tmp")
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"snapshot-${s.id}.tsv"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Compute per-file min/max stats for a freshly-written data dir: ONE
    * column-pruned scan of (warcTs, url) grouped by the physical file.
    * The collect is manifest-scale (one row per parquet file), the
    * bounded-collect pattern. Tab/newline are stripped from host bounds so
    * the TSV manifest stays line-parseable. */
  def collectFileStats(spark: SparkSession, dataDir: String): Vector[FileStats] = {
    val clean = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c, "[\\t\\n\\r]", " ")
    spark.read.parquet(dataDir)
      .select(input_file_name().as("f"), col("warcTs"),
        clean(coalesce(parse_url(col("url"), lit("HOST")), lit(""))).as("h"))
      .groupBy(col("f"))
      .agg(min(col("warcTs")).as("tsMin"), max(col("warcTs")).as("tsMax"),
        min(col("h")).as("hMin"), max(col("h")).as("hMax"))
      .collect()
      .map(r => FileStats(r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
      .toVector.sortBy(_.path)
  }

  /** UTF-8 byte comparison — the hostMin/hostMax bounds were computed by
    * Spark's min/max, which orders strings by UTF8String BINARY order;
    * Java String `<=` is UTF-16 code-unit order and disagrees for
    * supplementary-plane characters (surrogates sort low), which could
    * wrongly prune a file whose bounds straddle the plane boundary. */
  private def utf8Lte(a: String, b: String): Boolean = {
    val ab = a.getBytes(StandardCharsets.UTF_8)
    val bb = b.getBytes(StandardCharsets.UTF_8)
    java.util.Arrays.compareUnsigned(ab, bb) <= 0
  }

  /** Committed data dirs with NO file-stats coverage (a legacy manifest,
    * or one written by a partially-covering intermediate build). Stats
    * paths are input_file_name() URIs (file:///...), dataDirs are plain
    * paths — normalize before the containment check; and the dir prefix
    * carries a trailing separator, or run-r10's files would mark sibling
    * run-r1 as covered and its backfill would be skipped (silent row loss
    * in every later ranged read). */
  def uncoveredDirs(s: Snapshot): Vector[String] = {
    def normFile(p: String) = p.stripPrefix("file:").replaceAll("^/+", "/")
    // dirs may be RELATIVE (a relative store root): resolve to absolute
    // normalized paths — input_file_name() URIs are always absolute, so a
    // relative prefix never matches and every dir would read as uncovered
    // on every run (duplicate stats entries + redundant re-scans, ADVICE r5)
    def normDir(d: String) =
      Paths.get(d.stripPrefix("file:")).toAbsolutePath.normalize.toString
    s.dataDirs.filterNot { d =>
      val prefix = normDir(d).stripSuffix("/") + "/"
      s.files.exists(f => normFile(f.path).startsWith(prefix))
    }
  }

  /** Manifest-only file pruning for a ranged read: keep files whose
    * [tsMin,tsMax] overlaps the requested ts window and whose
    * [hostMin,hostMax] could contain `host`. Stats bound a SUPERSET —
    * callers re-apply the exact predicate after the pruned scan. */
  def pruneFiles(s: Snapshot, tsMin: Option[Long] = None,
      tsMax: Option[Long] = None, host: Option[String] = None): Vector[String] =
    s.files.filter { f =>
      tsMax.forall(f.tsMin <= _) && tsMin.forall(f.tsMax >= _) &&
        host.forall(h => utf8Lte(f.hostMin, h) && utf8Lte(h, f.hostMax))
    }.map(_.path)

  /** Ranged read over the committed state: prune data FILES from the
    * manifest stats, scan only the survivors, then apply the exact
    * predicate (the stats are a superset bound). Falls back to a full
    * scan + filter when the manifest predates file stats entirely; a
    * PARTIALLY-covered manifest (some dirs with no stats entries — the
    * legacy/intermediate state run() repairs on its next commit) scans
    * the uncovered dirs in full alongside the pruned files: a read-only
    * consumer must see correct results BEFORE any repair commit happens,
    * not silently lose the uncovered dirs' rows (ADVICE r5). */
  def readCommittedRange(spark: SparkSession, root: String,
      tsMin: Option[Long] = None, tsMax: Option[Long] = None,
      host: Option[String] = None, asOf: Option[Long] = None): Option[DataFrame] =
    asOf.fold(lastSnapshot(root))(snapshotAt(root, _))
      .filter(_.dataDirs.nonEmpty).map { s =>
      val base =
        if (s.files.isEmpty) spark.read.parquet(s.dataDirs: _*)
        else {
          val paths = pruneFiles(s, tsMin, tsMax, host) ++ uncoveredDirs(s)
          if (paths.isEmpty) spark.read.parquet(s.dataDirs: _*).limit(0)
          else spark.read.parquet(paths: _*)
        }
      val hostCol = coalesce(parse_url(col("url"), lit("HOST")), lit(""))
      Seq(
        tsMin.map(col("warcTs") >= _), tsMax.map(col("warcTs") <= _),
        host.map(hostCol === _)
      ).flatten.foldLeft(base)(_.filter(_))
    }

  /** One resumable run: extract only the buckets not yet committed, write
    * data + lineage, then commit the next snapshot. `maxBuckets` caps how
    * many pending buckets this run takes (the kill-mid-job test knob).
    * Returns the committed snapshot. */
  def run(spark: SparkSession, pages: DataFrame, root: String, runId: String,
      nBuckets: Int = 16, maxBuckets: Int = Int.MaxValue,
      clusterWrite: Boolean = true, clusterPartitions: Int = 0): Snapshot = {
    val prev = lastSnapshot(root).getOrElse(Snapshot(0L, Set.empty, Vector.empty))
    val pending = (0 until nBuckets).filterNot(prev.buckets).take(maxBuckets)
    if (pending.isEmpty) {
      // nothing to extract — but a FULLY-committed store can still carry a
      // partially-covered manifest (legacy/intermediate builds); repair it
      // here or ranged reads keep pruning the uncovered dirs' rows forever
      // (the backfill below this guard would never be reached again)
      val missing = uncoveredDirs(prev)
      if (missing.isEmpty) return prev
      val repaired = Snapshot(prev.id + 1, prev.buckets, prev.dataDirs,
        (prev.files ++ missing.flatMap(d => collectFileStats(spark, d)))
          .distinctBy(_.path))
      commitManifest(root, repaired)
      return repaired
    }

    val withBucket = pages.withColumn("_bucket",
      pmod(xxhash64(col("url")), lit(nBuckets)).cast("int"))
    val selected = withBucket.filter(col("_bucket").isin(pending: _*)).drop("_bucket")

    val extracted = ExtractJob.extractTexts(spark, selected)
    val dataDir = s"$root/data/run-$runId"
    // CLUSTER the write layout so the manifest's (host, warcTs) min/max
    // stats are TIGHT per file: the resume unit is a url-HASH bucket, so
    // an as-extracted write gives every data file near-domain-wide host
    // bounds and pruneFiles on a host range selects everything — the
    // stats were decorative for store-written data (VERDICT r5 #2).
    // repartitionByRange assigns each file a contiguous host range (the
    // range sampler splits a skewed mega-host across files whose bounds
    // stay the tight [h, h]); the within-partition sort additionally
    // clusters parquet row groups for min/max skipping inside a file.
    // clusterWrite=false preserves the caller's input layout (e.g. a
    // crawl table pre-sorted by fetch time for ts-ranged reads);
    // clusterPartitions=0 lets AQE size the range partitions (≈ target
    // file size at scale), >0 pins the file count (tests, compaction).
    val toWrite =
      if (!clusterWrite) extracted
      else {
        val hosted = extracted
          .withColumn("_host", coalesce(parse_url(col("url"), lit("HOST")), lit("")))
        val ranged =
          if (clusterPartitions > 0)
            hosted.repartitionByRange(clusterPartitions, col("_host"), col("warcTs"))
          else hosted.repartitionByRange(col("_host"), col("warcTs"))
        ranged.sortWithinPartitions(col("_host"), col("warcTs")).drop("_host")
      }
    toWrite.write.mode("overwrite").parquet(dataDir)

    // lineage folded from the just-written data (one read, column-pruned —
    // never re-extracts) and committed before the manifest flips.
    val snapId = prev.id + 1
    val lineage = ExtractJob.lineage(
      spark.read.parquet(dataDir).as[ExtractJob.ExtractedText](
        { import spark.implicits._; implicitly[org.apache.spark.sql.Encoder[ExtractJob.ExtractedText]] }),
      runId, snapId)
    lineage.write.mode("overwrite").parquet(s"$root/lineage/run-$runId")

    // manifest column stats: new files always; prior snapshots' entries
    // carry over untouched (files are immutable once committed). Any
    // committed dir with NO stats coverage (a legacy manifest, or one
    // written by a partially-covering intermediate build) is BACKFILLED
    // here — committing partial coverage would make readCommittedRange
    // prune away the uncovered dirs' rows silently (its full-scan
    // fallback only fires when files is entirely empty).
    // stats paths are input_file_name() URIs (file:///...), dataDirs are
    // plain paths — normalize before the containment check or every dir
    // reads as uncovered and gets re-scanned each run
    val uncovered = uncoveredDirs(prev)
    val prevFiles = prev.files ++ uncovered.flatMap(d => collectFileStats(spark, d))
    val snap = Snapshot(snapId, prev.buckets ++ pending, prev.dataDirs :+ dataDir,
      (prevFiles ++ collectFileStats(spark, dataDir)).distinctBy(_.path))
    commitManifest(root, snap)
    snap
  }

  /** Read the committed table state (union of all committed data dirs);
    * `asOf` reads a PRIOR snapshot's state instead of the latest. */
  def readCommitted(spark: SparkSession, root: String,
      asOf: Option[Long] = None): Option[DataFrame] =
    asOf.fold(lastSnapshot(root))(snapshotAt(root, _))
      .filter(_.dataDirs.nonEmpty)
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
    val snap = Snapshot(prev.id + 1, prev.buckets, Vector(dataDir),
      collectFileStats(spark, dataDir))
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
