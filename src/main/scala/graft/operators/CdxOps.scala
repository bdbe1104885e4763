package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDX index generation — the web-archive ecosystem's random-access
  * index beside every WARC file: one line per archived capture with a
  * sort-friendly URL key, 14-digit timestamp, payload digest, and the
  * (offset, length) pair that lets a replayer seek straight to the
  * record. This is the artifact that turns q128's sequential archives
  * into an addressable corpus — dedup-by-digest, URL lookup, and
  * incremental recrawl all read the CDX, not the archive.
  *
  * Fields follow the public CDX(J) convention:
  *   - `urlkey`: SURT (Sort-friendly URI Reordering Transform) —
  *     scheme dropped, host lowercased with its labels REVERSED and
  *     comma-joined, default ports elided, `)` joining key to path —
  *     so all of a domain's captures sort together;
  *   - `ts`: WARC-Date collapsed to `yyyyMMddHHmmss` (a REAL
  *     ISO-8601 parse + UTC format, not string surgery);
  *   - `digest`: sha-256 hex over the HTTP payload BODY bytes (the
  *     classic format's sha-1/base32 swapped for the stronger hash,
  *     declared);
  *   - `offset`/`length`: byte-exact record extents measured on the
  *     record stream — the oracle REBUILDS every record's octets in
  *     SQL and prefix-sums them, so a one-byte walk slip anywhere in
  *     any header fails the compare.
  *
  * Scale shape (100 TB): one pass per archive inside `mapPartitions`
  * (offsets are a per-file running sum — embarrassingly parallel at
  * the file grain, exactly how the production tools shard); no
  * shuffle before the output sort.
  */
object CdxOps {

  final case class CdxRow(
      urlkey: String, ts: String, url: String, mime: String, status: Int,
      digest: String, offset: Long, length: Long, filename: String)

  // ----------------------------------------------------------------- SURT

  /** SURT key: `https://Example.test:443/a/b?q` → `test,example)/a/b?q`.
    * Safe subset: scheme dropped, host lowercased + label-reversed,
    * default ports (80/443) elided, other ports kept after the host,
    * path/query verbatim (`/` when absent). No www-stripping — that
    * aggressive class of canonicalization belongs to `UrlOps`.
    */
  private[graft] def surt(url: String): String = {
    val ss = url.indexOf("://")
    val rest = if (ss < 0) url else url.substring(ss + 3)
    val cut = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val (hostPort, path) =
      if (cut < 0) (rest, "/")
      else (rest.substring(0, cut),
        if (rest.charAt(cut) == '/') rest.substring(cut) else "/" + rest.substring(cut))
    val colon = hostPort.lastIndexOf(':')
    val (host, port) =
      if (colon < 0) (hostPort, "")
      else (hostPort.substring(0, colon), hostPort.substring(colon + 1))
    val portSuffix = port match {
      case "" | "80" | "443" => ""
      case p => ":" + p
    }
    host.toLowerCase.split('.').reverse.mkString(",") + portSuffix + ")" + path
  }

  // ----------------------------------------------------------------- walk

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val tsFormat = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMddHHmmss").withZone(java.time.ZoneOffset.UTC)

  /** One archive → CDX rows. The Latin-1 view makes char offsets byte
    * offsets (the `WarcOps` discipline); non-response records and
    * structurally-lying records drop, the walk continuing at the next
    * parseable boundary only when Content-Length framing allows.
    */
  private[graft] def cdxRecords(filename: String, bytes: Array[Byte]): Seq[CdxRow] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.ArrayBuffer.empty[CdxRow]
    var p = 0
    var ok = true
    while (ok && p < s.length) {
      if (!s.startsWith("WARC/", p)) ok = false
      else {
        val hdrEnd = s.indexOf("\r\n\r\n", p)
        if (hdrEnd < 0) ok = false
        else {
          val headers = s.substring(p, hdrEnd).split("\r\n").drop(1)
            .flatMap { line =>
              val c = line.indexOf(':')
              if (c < 0) None
              else Some(line.substring(0, c).trim.toLowerCase ->
                line.substring(c + 1).trim)
            }.toMap
          headers.get("content-length").flatMap(_.toLongOption) match {
            case None => ok = false
            case Some(clen) =>
              val payloadStart = hdrEnd + 4
              val end = payloadStart + clen.toInt + 4
              if (clen < 0 || payloadStart + clen > s.length) ok = false
              else {
                val row = for {
                  typ <- headers.get("warc-type") if typ == "response"
                  uri <- headers.get("warc-target-uri")
                  date <- headers.get("warc-date")
                  ts <-
                    try Some(tsFormat.format(java.time.Instant.parse(date)))
                    catch { case _: java.time.format.DateTimeParseException => None }
                  httpEnd = s.indexOf("\r\n\r\n", payloadStart)
                  if httpEnd >= 0 && httpEnd < payloadStart + clen
                  status <- {
                    val line = s.substring(payloadStart,
                      s.indexOf("\r\n", payloadStart) max payloadStart)
                    if (line.startsWith("HTTP/")) {
                      val parts = line.split(" ")
                      if (parts.length >= 2) parts(1).toIntOption else None
                    } else None
                  }
                } yield {
                  val mime = s.substring(payloadStart, httpEnd).split("\r\n")
                    .collectFirst {
                      case l if l.toLowerCase.startsWith("content-type:") =>
                        l.substring(l.indexOf(':') + 1).trim.split(";")(0).trim
                    }.getOrElse("")
                  val body = java.util.Arrays.copyOfRange(
                    bytes, httpEnd + 4, payloadStart + clen.toInt)
                  val md = java.security.MessageDigest.getInstance("SHA-256")
                  val digest = md.digest(body)
                    .map(b => f"${b & 0xff}%02x").mkString
                  CdxRow(surt(uri), ts, uri, mime, status, digest,
                    p.toLong, (math.min(end, s.length) - p).toLong, filename)
                }
                out ++= row
                p = end
              }
          }
        }
      }
    }
    out.toSeq
  }

  // ----------------------------------------------------------------- q146

  /** q146: archive indexing end-to-end — build dated multi-record
    * WARC archives (the q128 markup + a `WARC-Date` header from
    * doc_id arithmetic), walk them measuring byte-exact extents, and
    * emit CDX rows; the oracle REBUILDS every record's octets in SQL
    * (markup, HTTP envelope, WARC headers) and replays urlkey, the
    * collapsed timestamp, digest, and the offset/length prefix sums.
    */
  def q146CdxIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), col("html"))
    val uri = concat(lit("https://example.test/doc/"), col("doc_id").cast("string"))
    val date = format_string("2026-%02d-%02dT%02d:00:00Z",
      col("doc_id") % 12 + 1, col("doc_id") % 28 + 1, col("doc_id") % 24)
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Length: "), octet_length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    HtmlOps.syntheticHtml(Tables.documents(spark, dir))
      .select((col("doc_id") % 8).as("gid"),
        struct(col("doc_id"), rec.as("rec")).as("s"))
      .groupBy(col("gid"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(s)), x -> x.rec)"), "")
        .cast("binary").as("warc"))
      .as[(Long, Array[Byte])]
      .flatMap { case (gid, warc) => cdxRecords(s"crawl_$gid.warc", warc) }
      .toDF()
      .select(col("urlkey"), col("ts"), col("url"), col("mime"),
        col("status").cast("long").as("status"),
        col("digest"), col("offset"), col("length"), col("filename"))
      .orderBy(col("filename"), col("offset"))
  }

  // ------------------------------------------------- selective access (q172)

  /** CDX rows for a PRODUCTION gzip-member archive: one record per
    * member, `offset`/`length` the member's COMPRESSED extent — the
    * numbers a replayer range-reads, which is the actual 100 TB access
    * pattern (fetch one record out of a petabyte corpus without
    * walking any archive). A member whose inflated payload isn't a
    * single well-formed response record indexes nothing (the walk's
    * error-as-value grain).
    */
  private[graft] def cdxRecordsGz(
      filename: String, bytes: Array[Byte]): Seq[CdxRow] =
    WarcOps.gunzipMemberExtents(bytes).flatMap { case (off, len, rec) =>
      // index ONLY single-record members: a multi-record member's
      // extent is not a record address, and fetchRecordGz would
      // rightly refuse it — the index and the fetch must agree on
      // what an extent means
      cdxRecords(filename, rec) match {
        case Seq(one) => Some(one.copy(offset = off, length = len))
        case _ => None
      }
    }

  /** Range-read ONE record by its CDX extent: slice `[offset,
    * offset+length)`, inflate the single member, parse the single
    * response record. None on any lie — extent out of range, slice
    * not exactly one member, or a malformed record — never garbage.
    */
  private[graft] def fetchRecordGz(
      archive: Array[Byte], offset: Long, length: Long
  ): Option[(String, Int, String, String, String)] = {
    if (offset < 0 || length <= 0 || offset + length > archive.length)
      return None
    val slice = java.util.Arrays.copyOfRange(
      archive, offset.toInt, (offset + length).toInt)
    val members = WarcOps.gunzipMembers(slice)
    if (members.length != 1) None
    else WarcOps.parseWarc(members.head) match {
      case Seq(one) => Some(one)
      case _ => None
    }
  }

  /** The STANDING CDX artifact for a corpus state: `cdx-<fp>` parquet
    * keyed by the documents corpus fingerprint (the `graph-<fp>`
    * discipline, `SimilarityOps.corpusFingerprint`) — built once per
    * corpus state from one archive walk, range-read from forever
    * after; stale fingerprints GC on the next build check. Returns the
    * index dir.
    */
  private[graft] def standingCdxIndex(
      spark: SparkSession, dir: String,
      archives: DataFrame,
      rootPrefix: String = "/graft_cdx_",
      indexer: (String, Array[Byte]) => Seq[CdxRow] = cdxRecordsGz): String = {
    import spark.implicits._
    val root = sys.props("java.io.tmpdir") +
      rootPrefix + dir.replaceAll("[^A-Za-z0-9]", "_")
    val hconf = spark.sparkContext.hadoopConfiguration
    val corpusPath = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fp = SimilarityOps.corpusFingerprint(
      corpusPath.getFileSystem(hconf), corpusPath)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val idxFs = rootPath.getFileSystem(hconf)
    val indexDir = s"$root/cdx-$fp"
    if (idxFs.exists(new org.apache.hadoop.fs.Path(indexDir, "_SUCCESS")))
      graft.BenchPhases.reused("cdx_build")
    if (!idxFs.exists(new org.apache.hadoop.fs.Path(indexDir, "_SUCCESS")))
      graft.BenchPhases.timed("cdx_build") {
        archives.as[(Long, Array[Byte])]
          .flatMap { case (gid, warc) =>
            indexer(s"crawl_$gid.warc", warc).map(r =>
              (gid, r.urlkey, r.ts, r.url, r.mime, r.status, r.digest,
                r.offset, r.length, r.filename))
          }
          .toDF("group_id", "urlkey", "ts", "url", "mime", "status",
            "digest", "offset", "length", "filename")
          .write.mode("overwrite").parquet(indexDir)
      }
    idxFs.listStatus(rootPath).map(_.getPath)
      .filter(p => p.getName.matches("cdx-[0-9a-f]{16}") &&
        p.getName != s"cdx-$fp")
      .foreach(p => idxFs.delete(p, true))
    indexDir
  }

  /** q172: CDX-driven SELECTIVE record access end to end — the q135
    * production-shape gzip-member archives are indexed ONCE into the
    * standing `cdx-<fp>` artifact (compressed member extents), then
    * every document reconstructs by RANGE-READING its record through
    * `fetchRecordGz` against the extents READ BACK from the artifact —
    * no archive walk on the extraction path, which is the actual
    * 100 TB pattern (index once, fetch many). The output contract (and
    * oracle) is exactly q135's: if any persisted extent is off by a
    * byte, the member inflate fails or desyncs and rows change.
    */
  def q172CdxFetch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val archives = WarcOps.syntheticWarcGz(Tables.documents(spark, dir))
    val indexDir = standingCdxIndex(spark, dir, archives)
    // per-archive extent lists from the ARTIFACT (offset-sorted for a
    // deterministic fetch order), equi-joined to the archive bytes
    val extents = spark.read.parquet(indexDir)
      .groupBy(col("group_id"))
      .agg(expr("array_sort(collect_list(struct(offset, length)))").as("exts"))
    val recs = archives.join(extents, Seq("group_id"))
      .select(col("group_id"), col("warc"), col("exts"))
      .as[(Long, Array[Byte], Seq[(Long, Long)])]
      .mapPartitions(_.flatMap { case (gid, warc, exts) =>
        exts.flatMap { case (off, len) =>
          fetchRecordGz(warc, off, len)
            .map { case (uri, st, body, enc, cs) =>
              WarcOps.WarcHttpRecord(gid, uri, st, body, enc, cs)
            }
        }
      })
    WarcOps.extractToDocs(recs.toDF())
  }

  // ----------------------------------------- selective access, zst (q192)

  /** CDX rows for a `.warc.zst` archive: one row per record FRAME with
    * its compressed extent (the dictionary skippable frame indexes
    * nothing — it is not a record); the q185 extent walk supplies the
    * boundaries and the dict-aware decode the payloads.
    */
  private[graft] def cdxRecordsZst(
      filename: String, bytes: Array[Byte]): Seq[CdxRow] =
    WarcOps.zstdMemberExtents(bytes).flatMap { case (off, len, rec) =>
      cdxRecords(filename, rec) match {
        case Seq(one) => Some(one.copy(offset = off, length = len))
        case _ => None
      }
    }

  /** Range-read ONE record by its CDX extent from a `.warc.zst`
    * archive: slice `[offset, offset+length)`, decode the single frame
    * against the archive's shared dictionary (read ONCE per archive by
    * the caller), parse the single response record. None on any lie.
    */
  private[graft] def fetchRecordZst(
      archive: Array[Byte], dict: graft.operators.Zstd.Dictionary,
      offset: Long, length: Long
  ): Option[(String, Int, String, String, String)] = {
    if (offset < 0 || length <= 0 || offset + length > archive.length)
      return None
    val slice = java.util.Arrays.copyOfRange(
      archive, offset.toInt, (offset + length).toInt)
    Zstd.decode(slice, 1 << 26, dict).toOption.flatMap { rec =>
      WarcOps.parseWarc(rec) match {
        case Seq(one) => Some(one)
        case _ => None
      }
    }
  }

  /** q192: CDX-driven selective access over the PRODUCTION `.warc.zst`
    * shape — the dict-bearing q186 archives index ONCE into a standing
    * `cdx-<fp>` artifact (compressed FRAME extents), then every
    * document reconstructs by reading the shared dictionary once per
    * archive and RANGE-READING its record frame against the persisted
    * extents — the replayer's actual access pattern (dict frame + one
    * range read per record, no archive walk). Output contract (and
    * oracle) exactly q135/q185/q186's: an extent off by a byte fails
    * the frame decode and changes rows.
    */
  def q192CdxZstFetch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val archives = WarcOps.syntheticWarcZstDict(Tables.documents(spark, dir))
    val indexDir = standingCdxIndex(spark, dir, archives,
      "/graft_cdxz_", cdxRecordsZst)
    val extents = spark.read.parquet(indexDir)
      .groupBy(col("group_id"))
      .agg(expr("array_sort(collect_list(struct(offset, length)))").as("exts"))
    val recs = archives.join(extents, Seq("group_id"))
      .select(col("group_id"), col("warc"), col("exts"))
      .as[(Long, Array[Byte], Seq[(Long, Long)])]
      .mapPartitions(_.flatMap { case (gid, warc, exts) =>
        val (dict, _) = WarcOps.warcZstDict(warc) // once per archive
        exts.flatMap { case (off, len) =>
          fetchRecordZst(warc, dict, off, len)
            .map { case (uri, st, body, enc, cs) =>
              WarcOps.WarcHttpRecord(gid, uri, st, body, enc, cs)
            }
        }
      })
    WarcOps.extractToDocs(recs.toDF())
  }
}
