package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WET derivation — the extracted-text sibling of the WARC front door:
  * Common Crawl publishes each crawl three ways (WARC = raw responses,
  * WAT = metadata, WET = extracted plain text as `conversion` records),
  * and a training-data pipeline is the WET WRITER as much as the
  * reader — curate once, re-export the text layer so every downstream
  * consumer reads text records instead of re-running extraction.
  *
  * q148 runs that full production loop: the gzip-member WARC corpus
  * (q135, with its planted non-ASCII paragraph) → the real record
  * walk + HTTP split → the q122 extraction chain → WET `conversion`
  * records (`WARC-Type: conversion`, `WARC-Refers-To` the source
  * record, `Content-Type: text/plain`, `Content-Length` in OCTETS)
  * written one gzip member per record (the production `.wet.gz`
  * layout) → re-parsed by a generic conversion-record walker back to
  * (doc_id, url, octets, text).
  *
  * The oracle replays url, the OCTET length, and the text sha straight
  * from (doc_id, text) — `strlen` on the DuckDB side — so the writer's
  * `Content-Length` is pinned EXTERNALLY: a char-counted length, a
  * lost gzip member boundary, or a non-UTF-8 re-decode cannot cancel
  * between the writer and the parser.
  *
  * Walk discipline (`WarcOps.parseWarc`'s contract): strictly
  * offset-driven — records are found by COUNTING Content-Length
  * octets, never by scanning for magic, so a text body containing
  * literal `WARC/1.0` lines walks correctly; Latin-1 view for offsets,
  * every header value and the payload re-decoded from the raw bytes as
  * UTF-8; error-as-value (a malformed record ends its member's walk
  * with prior records kept; a corrupt gzip member drops alone).
  *
  * Scale shape (100 TB): one shuffle to group records into archives
  * (output-sized, the q146 CDX shape), then per-row gzip + walk;
  * re-parse is a per-row byte walker via `mapPartitions`.
  */
object WetOps {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  final case class WetRecord(doc_id: Long, url: String, n_octets: Long, text: String)

  // --------------------------------------------------------------- encode

  /** One WET conversion record; `Content-Length` counts payload OCTETS. */
  private[graft] def wetRecord(docId: Long, uri: String, text: String): Array[Byte] = {
    val body = text.getBytes(Utf8)
    val head = ("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: " + uri +
      "\r\nWARC-Refers-To: <urn:graft:doc:" + docId + ">" +
      "\r\nContent-Type: text/plain\r\nContent-Length: " + body.length +
      "\r\n\r\n").getBytes(Utf8)
    head ++ body ++ "\r\n\r\n".getBytes(Utf8)
  }

  /** The production `.wet.gz` layout: one gzip member per record. */
  private[graft] def buildWet(recs: Seq[(Long, String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    recs.foreach { case (id, uri, text) =>
      bos.write(WarcOps.gzipBytes(wetRecord(id, uri, text)))
    }
    bos.toByteArray
  }

  // ----------------------------------------------------------------- walk

  /** Generic WARC record walk: offset-driven over the Latin-1 view,
    * every header value and the payload re-decoded UTF-8 from the raw
    * bytes; yields (lower-cased headers, payload text, payload octet
    * count); a malformed record ends the walk with prior records kept.
    * The shared base under the WET reader (conversion records) and the
    * revisit accounting (q166).
    */
  private[graft] def walkRecords(
      bytes: Array[Byte]): Seq[(Map[String, String], String, Long)] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    def utf8(from: Int, until: Int): String =
      new String(bytes, from, until - from, Utf8)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Map[String, String], String, Long)]
    var p = 0
    while (p < s.length) {
      if (!s.startsWith("WARC/1.0\r\n", p)) return out.toSeq
      p += 10
      var headers = Map.empty[String, String]
      var clen = -1L
      var ok = true
      var done = false
      while (ok && !done) {
        val eol = s.indexOf("\r\n", p)
        if (eol < 0) ok = false
        else if (eol == p) { p += 2; done = true }
        else {
          val line = s.substring(p, eol)
          val colon = line.indexOf(':')
          if (colon > 0) {
            val name = line.substring(0, colon).trim.toLowerCase
            val value = utf8(p + colon + 1, eol).trim
            if (!headers.contains(name)) headers += (name -> value)
            if (name == "content-length")
              clen = try value.toLong catch { case _: NumberFormatException => -1L }
          }
          p = eol + 2
        }
      }
      if (!ok || clen < 0 || p + clen > s.length) return out.toSeq
      val text = utf8(p, (p + clen).toInt)
      p = (p + clen).toInt
      // Keep the fully-parsed record FIRST: a malformed inter-record
      // separator ends the walk with prior records (including this one)
      // kept — garbage after a well-formed record never discards it.
      out += ((headers, text, clen))
      if (s.startsWith("\r\n\r\n", p)) p += 4
      else if (p < s.length) return out.toSeq
    }
    out.toSeq
  }

  private val RefersRe = "<urn:graft:doc:(\\d+)>".r

  /** Conversion records only — the WET reader. */
  private[graft] def parseWet(bytes: Array[Byte]): Seq[WetRecord] =
    walkRecords(bytes).flatMap { case (h, text, clen) =>
      val refers = h.get("warc-refers-to")
        .flatMap(v => RefersRe.findFirstMatchIn(v))
        .map(_.group(1).toLong).getOrElse(-1L)
      (h.get("warc-type"), h.get("warc-target-uri")) match {
        case (Some("conversion"), Some(uri)) if refers >= 0 =>
          Some(WetRecord(refers, uri, clen, text))
        case _ => None
      }
    }

  private[graft] def parseWetAuto(bytes: Array[Byte]): Seq[WetRecord] =
    if (WarcOps.isGzip(bytes)) WarcOps.gunzipMembers(bytes).flatMap(parseWet)
    else parseWet(bytes)

  // ----------------------------------------------------------------- q148

  // ---------------------------------------------------------------- q166

  private[graft] final case class RevisitRow(
      uri: String, kind: String, digest_hdr: String, payload: String)

  /** q166: revisit-record accounting — Common Crawl stores an
    * UNCHANGED page as a body-less `revisit` record whose
    * `WARC-Payload-Digest` points at the content, so dedup accounting
    * must read the digest from two different places depending on the
    * record kind: the HEADER for revisits, a COMPUTATION over the HTTP
    * body for responses. The corpus plants both kinds (`id % 4 == 0`
    * revisits) and the oracle replays ONE digest formula for all rows
    * — the two acquisition paths must collapse to it.
    */
  def q166WarcRevisit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val uri = concat(lit("https://example.test/doc/"), col("doc_id").cast("string"))
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), col("html"))
    val responseRec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Length: "), octet_length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    val revisitRec = concat(
      lit("WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Refers-To: <urn:graft:doc:"), col("doc_id").cast("string"),
      lit(">\r\nWARC-Payload-Digest: sha256:"), sha2(col("html"), 256),
      lit("\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))
    HtmlOps.syntheticHtml(graft.Tables.documents(spark, dir))
      .select((col("doc_id") % 8).as("gid"),
        struct(col("doc_id"),
          when(col("doc_id") % 4 === 0, revisitRec).otherwise(responseRec)
            .as("rec")).as("s"))
      .groupBy(col("gid"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(s)), x -> x.rec)"), "")
        .cast("binary").as("warc"))
      .select(col("warc")).as[Array[Byte]]
      .mapPartitions(_.flatMap(bytes => walkRecords(bytes).map {
        case (h, payload, _) => RevisitRow(
          h.getOrElse("warc-target-uri", ""),
          h.getOrElse("warc-type", ""),
          h.getOrElse("warc-payload-digest", "").stripPrefix("sha256:"),
          payload)
      }))
      .toDF()
      .select(
        regexp_extract(col("uri"), "doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("kind"),
        when(col("kind") === "revisit", col("digest_hdr"))
          .otherwise(sha2(
            regexp_replace(col("payload"), "(?s)^.*?\r\n\r\n", ""), 256))
          .as("digest"),
        (col("kind") =!= "revisit").as("refreshed"))
      .orderBy(col("doc_id"))
  }

  /** q148: WARC → text → WET → re-parse, end to end — the q135 corpus
    * through the real extraction chain, re-exported as gzip-member
    * conversion records, walked back; url, octet count, and text sha
    * all replayed by the oracle from (doc_id, text) with `strlen`
    * pinning the writer's octet-counted `Content-Length` externally.
    */
  def q148WetRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = WarcOps.widenRecords(WarcOps.extractRecords(spark,
      WarcOps.syntheticWarcGz(Tables.documents(spark, dir))).toDF())
    val perDoc = recs.select(
      regexp_extract(col("target_uri"), "doc/(\\d+)$", 1).cast("long").as("doc_id"),
      col("target_uri").as("uri"),
      array_join(HtmlOps.htmlBlocks(col("body")), "\n").as("text"))
    val wets = perDoc
      .select((col("doc_id") % 8).as("group_id"),
        struct(col("doc_id"), col("uri"), col("text")).as("s"))
      .groupBy(col("group_id"))
      .agg(array_sort(collect_list(col("s"))).as("recs"))
      .as[(Long, Seq[(Long, String, String)])]
      .map { case (_, rs) => buildWet(rs) }
    wets
      .mapPartitions(_.flatMap(parseWetAuto))
      .toDF()
      .select(col("doc_id"), col("url"), col("n_octets"),
        sha2(col("text"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
