package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.core.PageRow
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC/WET ingestion — the real Common-Crawl first mile that the synthetic
  * `pages` generator stands in for (the reference's ingestion analogue is
  * its HTTP fetcher, `/root/reference/src/sec_data_extraction.py:17-59`,
  * declared out-of-scope; the CONTAINER format here is from the public
  * ISO 28500 WARC spec and Common Crawl's published layout, not from the
  * reference).
  *
  * Format facts the scanner relies on (all public):
  *   - a `.warc.gz` is a sequence of gzip MEMBERS, conventionally one per
  *     record, so byte-range readers can seek; JDK `GZIPInputStream`
  *     transparently reads concatenated members, so one bounded inflate
  *     pass handles both the per-record and the whole-file-member layout;
  *   - each record is `WARC/1.0\r\n` + header lines + blank line +
  *     exactly `Content-Length` payload bytes + `\r\n\r\n`;
  *   - `response` records carry an HTTP message (status line + headers +
  *     blank line + body); `conversion` records (WET) carry plain text.
  *
  * Never-throw scanner contract (the `Xlsx`/`Multimodal` guard
  * discipline): hostile input — truncated members, lying Content-Length,
  * header blocks with no terminator, gzip bombs, LF-only line endings —
  * degrades to fewer records, never to an executor exception or OOM.
  *
  * 100-TB shape: `binaryFile` scan → per-file record iterator, purely
  * narrow (one task per WARC file, the same unit Common Crawl shards by:
  * ~1 GB per file). No shuffle; downstream extraction re-partitions by
  * salted host exactly as it does for generated pages.
  */
object Warc {

  /** One parsed record. `headers` keys are lower-cased; the version line
    * and payload are kept verbatim. */
  final case class Record(
      warcType: String,
      targetUri: String,
      date: String,
      headers: Map[String, String],
      payload: Array[Byte])

  /** Decompression cap per WARC file: real CC files inflate ~3-4x from
    * ~1 GB; 2 GiB also keeps every offset in Int range. A bomb member
    * that would cross it yields only the bytes before the cap. */
  val MaxInflatedBytes: Int = Int.MaxValue - 64

  /** A header block larger than this has a missing blank-line terminator
    * (or is hostile) — the scanner resyncs to the next record instead of
    * consuming the file as "headers". Real WARC headers are < 1 KB. */
  val MaxHeaderBlockBytes: Int = 64 << 10

  def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte

  /** Inflate all concatenated gzip members, bounded. Truncated/corrupt
    * tails salvage the bytes already inflated (complete earlier members
    * survive a mid-file truncation — the scanner then drops whatever
    * record the cut landed in). */
  def gunzipBounded(bytes: Array[Byte], cap: Int = MaxInflatedBytes): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.min(bytes.length.toLong * 4, 1L << 20).toInt)
    val chunk = new Array[Byte](64 << 10)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      var n = in.read(chunk)
      while (n >= 0) {
        if (out.size.toLong + n > cap) return out.toByteArray // bomb: keep prefix
        out.write(chunk, 0, n)
        n = in.read(chunk)
      }
    } catch { case _: Exception => /* salvage complete prefix */ }
    out.toByteArray
  }

  private def startsWith(b: Array[Byte], pos: Int, s: String): Boolean = {
    if (pos < 0 || pos + s.length > b.length) return false
    var i = 0
    while (i < s.length) { if (b(pos + i) != s.charAt(i).toByte) return false; i += 1 }
    true
  }

  /** Next position p > from where "WARC/" begins a line (p == 0 or the
    * previous byte is '\n'); -1 when none. Resync point after malformed
    * records. */
  private def nextRecordStart(b: Array[Byte], from: Int): Int = {
    var p = math.max(from, 0)
    while (p < b.length) {
      if (b(p) == 'W' && (p == 0 || b(p - 1) == '\n') && startsWith(b, p, "WARC/"))
        return p
      p += 1
    }
    -1
  }

  /** Parse one header block starting at `start` (the "WARC/" version
    * line). Returns (headers, payloadStart) or null when malformed
    * (no blank-line terminator within bounds). Tolerates LF-only lines. */
  private def parseHeaderBlock(b: Array[Byte], start: Int): (Map[String, String], Int) = {
    val limit = math.min(b.length, start + MaxHeaderBlockBytes)
    val hdrs = Map.newBuilder[String, String]
    var pos = start
    var first = true
    while (pos < limit) {
      var nl = pos
      while (nl < limit && b(nl) != '\n') nl += 1
      if (nl >= limit) return null // no terminator in bounds
      var end = nl
      if (end > pos && b(end - 1) == '\r') end -= 1
      if (end == pos) return (hdrs.result(), nl + 1) // blank line → payload
      val line = new String(b, pos, end - pos, StandardCharsets.ISO_8859_1)
      if (first) { first = false } // version line, no colon
      else {
        val c = line.indexOf(':')
        if (c > 0) hdrs += (line.substring(0, c).trim.toLowerCase -> line.substring(c + 1).trim)
        // colon-less continuation/garbage lines are skipped, not fatal
      }
      pos = nl + 1
    }
    null
  }

  /** Scan every well-formed record out of one WARC file's bytes
    * (gzip-inflating first when the magic matches). Malformed records are
    * dropped and scanning resyncs at the next `WARC/` line start. */
  def scanRecords(fileBytes: Array[Byte]): Vector[Record] = {
    val b = if (isGzip(fileBytes)) gunzipBounded(fileBytes) else fileBytes
    val out = Vector.newBuilder[Record]
    var pos = nextRecordStart(b, 0)
    while (pos >= 0 && pos < b.length) {
      val parsed = parseHeaderBlock(b, pos)
      if (parsed == null) { pos = nextRecordStart(b, pos + 1) }
      else {
        val (hdrs, payloadStart) = parsed
        val lenOk = hdrs.get("content-length").flatMap(_.toLongOption)
          .filter(n => n >= 0 && payloadStart + n <= b.length)
        lenOk match {
          case Some(n) =>
            val payload = java.util.Arrays.copyOfRange(b, payloadStart, payloadStart + n.toInt)
            out += Record(
              hdrs.getOrElse("warc-type", ""),
              hdrs.getOrElse("warc-target-uri", null),
              hdrs.getOrElse("warc-date", null),
              hdrs, payload)
            pos = nextRecordStart(b, payloadStart + n.toInt)
          case None => // missing/negative/lying Content-Length → drop, resync
            pos = nextRecordStart(b, pos + 1)
        }
      }
    }
    out.result()
  }

  /** Split an HTTP message payload into its body (the HTML): bytes after
    * the first blank line when the payload starts with `HTTP/`; the whole
    * payload otherwise (a WARC writer MAY store bare content). */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    if (!startsWith(payload, 0, "HTTP/")) return payload
    var p = 0
    while (p < payload.length) {
      if (payload(p) == '\n') {
        if (startsWith(payload, p + 1, "\r\n"))
          return java.util.Arrays.copyOfRange(payload, p + 3, payload.length)
        if (p + 1 < payload.length && payload(p + 1) == '\n')
          return java.util.Arrays.copyOfRange(payload, p + 2, payload.length)
      }
      p += 1
    }
    Array.emptyByteArray // header-only HTTP message: empty body
  }

  private def parseTs(iso: String): java.sql.Timestamp =
    if (iso == null) null
    else try java.sql.Timestamp.from(java.time.Instant.parse(iso))
    catch { case _: Exception => null }

  // ---------------------------------------------------------------------
  // Writer (fixtures + the export side of the round-trip contract)
  // ---------------------------------------------------------------------

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length / 2 + 64)
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  /** Deterministic record id (no randomness — fixtures must be stable). */
  private def recordId(uri: String, date: String): String =
    f"<urn:uuid:${graft.ops.Dedup.fnv1a(uri + " " + date)}%016x-0000-0000-0000-000000000000>"

  /** Header names the writer emits itself — dropped from `r.headers` so a
    * SCANNED record (whose map contains every parsed header) re-serializes
    * without duplicates. */
  private val ReservedHeaders = Set("warc-type", "warc-target-uri",
    "warc-date", "warc-record-id", "content-length")

  /** Serialize one record per the spec: version line, headers, blank
    * line, payload, record separator. Round-trip safe: reserved headers
    * already present in `r.headers` (a record from [[scanRecords]]) are
    * not written twice. */
  def recordBytes(r: Record): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(r.warcType).append("\r\n")
    if (r.targetUri != null) sb.append("WARC-Target-URI: ").append(r.targetUri).append("\r\n")
    if (r.date != null) sb.append("WARC-Date: ").append(r.date).append("\r\n")
    sb.append("WARC-Record-ID: ").append(recordId(r.targetUri + "", r.date + "")).append("\r\n")
    r.headers.filterNot(kv => ReservedHeaders(kv._1.toLowerCase))
      .foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(r.payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + r.payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(r.payload, 0, out, head.length, r.payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Whole-file bytes. `perRecordMembers = true` is the Common-Crawl
    * layout (one gzip member per record); false compresses the file as a
    * single member — both must scan identically. */
  def writeWarcGz(records: Seq[Record], perRecordMembers: Boolean = true): Array[Byte] =
    if (perRecordMembers) records.iterator.map(r => gzipMember(recordBytes(r))).toArray.flatten
    else gzipMember(records.iterator.flatMap(r => recordBytes(r).iterator).toArray)

  /** A `response` record wrapping an HTTP 200 message around the HTML. */
  def responseRecord(url: String, tsIso: String, html: Array[Byte]): Record =
    Record("response", url, tsIso,
      Map("content-type" -> "application/http; msgtype=response"),
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
        s"Content-Length: ${html.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++ html)

  /** A WET `conversion` record carrying extracted plain text. */
  def conversionRecord(url: String, tsIso: String, text: String, lang: String = null): Record =
    Record("conversion", url, tsIso,
      Map("content-type" -> "text/plain") ++
        Option(lang).map("warc-identified-content-language" -> _),
      text.getBytes(StandardCharsets.UTF_8))

  // ---------------------------------------------------------------------
  // Distributed readers
  // ---------------------------------------------------------------------

  /** Low-level record table: one row per well-formed record across every
    * `.warc`/`.warc.gz`/`.wet.gz` under `path`. Narrow (no shuffle). */
  def readRecords(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        scanRecords(bytes).iterator.zipWithIndex.map { case (r, i) =>
          (file, i.toLong, r.warcType, r.targetUri, r.date,
            r.payload.length.toLong, r.payload)
        }
      }
      .toDF("file", "rec_idx", "warc_type", "url", "warc_date", "n_bytes", "payload")
  }

  /** `pages`-schema view (the `input_hint` shape): `response` records
    * yield html bytes (HTTP headers stripped) with `text = null`;
    * `conversion` (WET) records yield decoded text with `html = null`;
    * `lang` comes from `WARC-Identified-Content-Language` when a WET
    * writer recorded one. Other record types (warcinfo, request,
    * metadata) are skipped — they carry no page. */
  def readPages(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        scanRecords(bytes).iterator.collect {
          case r if r.warcType == "response" && r.targetUri != null =>
            PageRow(r.targetUri, parseTs(r.date), httpBody(r.payload), null,
              r.headers.getOrElse("warc-identified-content-language", null))
          case r if r.warcType == "conversion" && r.targetUri != null =>
            PageRow(r.targetUri, parseTs(r.date), null,
              new String(r.payload, StandardCharsets.UTF_8),
              r.headers.getOrElse("warc-identified-content-language", null))
        }
      }
      .toDF()
  }
}
