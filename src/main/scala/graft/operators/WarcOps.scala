package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) crawl-archive ingestion — the container wrapped
  * around every real web crawl (Common Crawl et al.): a WARC file is a
  * sequence of records, each `WARC/1.0` + header lines + blank line +
  * exactly `Content-Length` payload octets + a blank-line separator;
  * a `response` record's payload is a full HTTP response (status line,
  * headers, blank line, body). Chained with `HtmlOps` this completes
  * the crawl front door: WARC → HTTP body → markup → text.
  *
  * The parser is a per-row byte walker (the codec discipline — same
  * class as `Jpeg`/`Gif`/`Webp`, via `mapPartitions`): strictly
  * offset-driven (records are found by COUNTING Content-Length octets,
  * never by scanning for the next magic — bodies may contain anything,
  * including "WARC/1.0"), error-as-value (a malformed record ends the
  * walk and the remainder is dropped with the records already parsed
  * kept — a truncated archive yields its intact prefix, never a throw),
  * and allocation-bounded.
  *
  * The oracle corpus (q128) builds multi-record WARC blobs
  * deterministically from `documents` (groups of ~1/8 of the corpus per
  * blob, records in doc_id order), runs the REAL parse + HTTP split +
  * q122 extraction chain, and the oracle replays the expected output
  * directly from (doc_id, text) — the q46 encode→decode-collapse
  * discipline: any container-walk slip (miscounted length, lost
  * record, header misparse) changes rows or hashes.
  */
object WarcOps {

  final case class WarcHttpRecord(
      group_id: Long, target_uri: String, status: Int, body: String)

  /** Parse concatenated WARC records; keep `response` records' HTTP
    * payloads split into (status, body). ISO-8859-1 maps bytes 1:1 to
    * chars, so char offsets ARE byte offsets.
    */
  private[graft] def parseWarc(bytes: Array[Byte]): Seq[(String, Int, String)] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)]
    var p = 0
    while (p < s.length) {
      if (!s.startsWith("WARC/1.0\r\n", p)) return out.toSeq
      p += 10
      // header lines until the blank line
      var uri: String = null
      var wtype: String = null
      var clen = -1L
      var ok = true
      var done = false
      while (ok && !done) {
        val eol = s.indexOf("\r\n", p)
        if (eol < 0) ok = false
        else if (eol == p) { p += 2; done = true } // blank line
        else {
          val line = s.substring(p, eol)
          val colon = line.indexOf(':')
          if (colon > 0) {
            val name = line.substring(0, colon).trim.toLowerCase
            val value = line.substring(colon + 1).trim
            name match {
              case "warc-target-uri" => uri = value
              case "warc-type" => wtype = value
              case "content-length" =>
                clen = try value.toLong catch { case _: NumberFormatException => -1L }
              case _ => ()
            }
          }
          p = eol + 2
        }
      }
      if (!ok || clen < 0 || p + clen > s.length) return out.toSeq
      val payload = s.substring(p, (p + clen).toInt)
      p = (p + clen).toInt
      // record separator: \r\n\r\n (tolerate a truncated tail)
      if (s.startsWith("\r\n\r\n", p)) p += 4
      else if (p < s.length) return out.toSeq
      if (wtype == "response" && uri != null) {
        // HTTP split: status line, headers, blank line, body
        val eol = payload.indexOf("\r\n")
        val hdrEnd = payload.indexOf("\r\n\r\n")
        if (eol > 0 && hdrEnd >= eol) {
          val statusLine = payload.substring(0, eol).split(" ")
          val status = if (statusLine.length >= 2)
            try statusLine(1).toInt catch { case _: NumberFormatException => -1 }
          else -1
          if (status > 0)
            out += ((uri, status, payload.substring(hdrEnd + 4)))
        }
      }
    }
    out.toSeq
  }

  /** Distributed record extraction over (group_id, warc binary) rows. */
  def extractRecords(spark: SparkSession, warcs: DataFrame): Dataset[WarcHttpRecord] = {
    import spark.implicits._
    warcs.select(col("group_id"), col("warc"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (gid, bytes) =>
        parseWarc(bytes).map { case (uri, st, body) =>
          WarcHttpRecord(gid, uri, st, body)
        }
      })
  }

  /** Deterministic synthetic WARC blobs from `documents`: each doc's
    * q122 markup wrapped in an HTTP 200 response wrapped in a WARC
    * response record; `groups` blobs, records concatenated in doc_id
    * order — so the parser must walk REAL multi-record archives with
    * correct octet counting (`octet_length`, not chars).
    */
  private[graft] def syntheticWarc(docs: DataFrame, groups: Int = 8): DataFrame = {
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), col("html"))
    val uri = concat(lit("https://example.test/doc/"), col("doc_id").cast("string"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Length: "), octet_length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    HtmlOps.syntheticHtml(docs)
      .select((col("doc_id") % groups).as("group_id"),
        struct(col("doc_id"), rec.as("rec")).as("s"))
      .groupBy(col("group_id"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(s)), x -> x.rec)"), "")
        .cast("binary").as("warc"))
  }

  /** q128: the full crawl front door — WARC walk → HTTP split → HTML
    * extraction — over multi-record synthetic archives; per document
    * the URI, HTTP status, block count, and extracted-text sha, all
    * replayed by the oracle directly from (doc_id, text) (the q46
    * encode→decode-collapse discipline).
    */
  def q128WarcExtract(spark: SparkSession, dir: String): DataFrame = {
    val recs = extractRecords(spark,
      syntheticWarc(Tables.documents(spark, dir))).toDF()
    recs
      .select(
        regexp_extract(col("target_uri"), "doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("target_uri").as("url"),
        col("status").cast("long").as("status"),
        HtmlOps.htmlBlocks(col("body")).as("blocks"))
      .select(col("doc_id"), col("url"), col("status"),
        size(col("blocks")).cast("long").as("n_blocks"),
        sha2(array_join(col("blocks"), "\n"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
