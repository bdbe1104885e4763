package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WAT derivation — the metadata sibling of the WET text layer (q148):
  * Common Crawl publishes each crawl as WARC + WAT + WET, and the WAT
  * layer is `metadata` records whose payload is an ENVELOPE JSON
  * (header echo + per-format payload metadata: the HTML head fields
  * and the outlink list). q189 runs the full production loop the q148
  * discipline prescribes: the q150 metadata corpus → the real head/
  * anchor extraction (shared entity decode + the q129 canonicalizer)
  * → envelope JSON via native `to_json` → `metadata` records
  * (`Content-Type: application/json`, `Content-Length` in OCTETS —
  * the em-dash in og:title makes octets ≠ chars) written one gzip
  * member per record (the production `.wat.gz` layout) → re-parsed by
  * the shared offset-driven record walk → `from_json` against the
  * envelope schema → every field compared to the oracle's pure
  * doc_id-arithmetic replay, so a writer/reader asymmetry cannot
  * cancel.
  *
  * Scale shape (100 TB): one output-sized shuffle to group records
  * into archives (the q146/q148 shape); everything else is per-row
  * codegen (to_json/from_json/filter/transform — no UDFs) or a
  * per-row byte walk.
  */
object WatOps {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  // --------------------------------------------------------------- encode

  /** One WAT metadata record; `Content-Length` counts payload OCTETS. */
  private[graft] def watRecord(docId: Long, uri: String, json: String): Array[Byte] = {
    val body = json.getBytes(Utf8)
    val head = ("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: " + uri +
      "\r\nWARC-Refers-To: <urn:graft:doc:" + docId + ">" +
      "\r\nContent-Type: application/json\r\nContent-Length: " + body.length +
      "\r\n\r\n").getBytes(Utf8)
    head ++ body ++ "\r\n\r\n".getBytes(Utf8)
  }

  /** The production `.wat.gz` layout: one gzip member per record. */
  private[graft] def buildWat(recs: Seq[(Long, String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    recs.foreach { case (id, uri, json) =>
      bos.write(WarcOps.gzipBytes(watRecord(id, uri, json)))
    }
    bos.toByteArray
  }

  // ----------------------------------------------------------------- walk

  private val RefersRe = "<urn:graft:doc:(\\d+)>".r

  /** Metadata records only — the WAT reader (over the shared
    * offset-driven walk): yields (doc_id, target uri, payload octets,
    * envelope JSON).
    */
  private[graft] def parseWat(bytes: Array[Byte]): Seq[(Long, String, Long, String)] =
    WetOps.walkRecords(bytes).flatMap { case (h, text, clen) =>
      val refers = h.get("warc-refers-to")
        .flatMap(v => RefersRe.findFirstMatchIn(v))
        .map(_.group(1).toLong).getOrElse(-1L)
      (h.get("warc-type"), h.get("warc-target-uri"),
        h.get("content-type")) match {
        case (Some("metadata"), Some(uri), Some("application/json"))
          if refers >= 0 => Some((refers, uri, clen, text))
        case _ => None
      }
    }

  private[graft] def parseWatAuto(bytes: Array[Byte]): Seq[(Long, String, Long, String)] =
    if (WarcOps.isGzip(bytes)) WarcOps.gunzipMembers(bytes).flatMap(parseWat)
    else parseWat(bytes)

  // ---------------------------------------------------------------- q189

  /** The envelope schema the reader parses against (hyphenated field
    * names are the Common Crawl WAT convention).
    */
  private[graft] val EnvelopeSchema: StructType = {
    def st(fields: (String, DataType)*): StructType =
      StructType(fields.map { case (n, t) => StructField(n, t) })
    val metas = ArrayType(st("name" -> StringType, "content" -> StringType))
    val linkHd = ArrayType(st("rel" -> StringType, "url" -> StringType))
    val links = ArrayType(st("path" -> StringType, "url" -> StringType))
    val head = st("Title" -> StringType, "Metas" -> metas, "Link" -> linkHd)
    val htmlMeta = st("Head" -> head, "Links" -> links)
    st(
      "Envelope" -> st(
        "WARC-Header-Metadata" -> st(
          "WARC-Target-URI" -> StringType, "WARC-Type" -> StringType),
        "Payload-Metadata" -> st(
          "HTTP-Response-Metadata" -> st("HTML-Metadata" -> htmlMeta))),
      "Container" -> st("Filename" -> StringType, "Offset" -> StringType))
  }

  /** q189: metadata → WAT → re-parse, end to end — the q150 corpus
    * through the real head/anchor extraction, packed into envelope
    * JSON, written as gzip-member `metadata` records, walked back and
    * `from_json`-parsed; title, description, og:title, the canonical
    * link, outlink count, and the canonical-outlink sha all replayed
    * by the oracle from doc_id arithmetic (the q148 external-pin
    * discipline: a symmetric writer/reader bug cannot cancel).
    */
  def q189WatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = MetaOps.syntheticMetaHtml(Tables.documents(spark, dir))
    val html = col("html")
    val links = MetaOps.outlinks(html)
    val uri = concat(lit("https://example.test/doc/"), col("doc_id").cast("string"))
    def head(re: String) = HtmlOps.decodeEntities(regexp_extract(html, re, 1))
    val envelope = to_json(struct(
      struct(
        struct(
          uri.as("WARC-Target-URI"),
          lit("response").as("WARC-Type")).as("WARC-Header-Metadata"),
        struct(
          struct(
            struct(
              struct(
                trim(head("(?is)<title[^>]*>(.*?)</title>")).as("Title"),
                array(
                  struct(lit("description").as("name"),
                    head("(?is)<meta\\s[^>]*name=\"description\"[^>]*content=\"([^\"]*)\"")
                      .as("content")),
                  struct(lit("og:title").as("name"),
                    head("(?is)<meta\\s[^>]*property=\"og:title\"[^>]*content=\"([^\"]*)\"")
                      .as("content"))).as("Metas"),
                array(
                  struct(lit("canonical").as("rel"),
                    UrlOps.urlCanonical(head(
                      "(?is)<link\\s[^>]*rel=\"canonical\"[^>]*href=\"([^\"]*)\""))
                      .as("url"))).as("Link")).as("Head"),
              transform(links, u =>
                struct(lit("A@/href").as("path"), u.as("url"))).as("Links"))
              .as("HTML-Metadata")).as("HTTP-Response-Metadata"))
          .as("Payload-Metadata")).as("Envelope"),
      struct(lit("graft.warc.gz").as("Filename"),
        col("doc_id").cast("string").as("Offset")).as("Container")))
    val perDoc = docs.select(col("doc_id"), uri.as("uri"), envelope.as("json"))
    val wats = perDoc
      .select((col("doc_id") % 8).as("group_id"),
        struct(col("doc_id"), col("uri"), col("json")).as("s"))
      .groupBy(col("group_id"))
      .agg(array_sort(collect_list(col("s"))).as("recs"))
      .as[(Long, Seq[(Long, String, String)])]
      .map { case (_, rs) => buildWat(rs) }
    val env = col("env")
    val htmlMeta = env("Envelope")("Payload-Metadata")(
      "HTTP-Response-Metadata")("HTML-Metadata")
    def meta(name: String) =
      element_at(filter(htmlMeta("Head")("Metas"),
        m => m("name") === name), 1)("content")
    // n_octets is validated structurally, not projected: each record is
    // alone in its gzip member and the offset-driven walk consumes
    // exactly Content-Length octets before requiring the separator — a
    // char-counted length (the em-dash makes octets ≠ chars) drops the
    // record and changes rows
    WarcOps.widenRecords(wats
      .mapPartitions(_.flatMap(parseWatAuto))
      .toDF("doc_id", "url", "n_octets", "json"), "url")
      .select(col("doc_id"), col("url"),
        from_json(col("json"), EnvelopeSchema).as("env"))
      .select(col("doc_id"), col("url"),
        htmlMeta("Head")("Title").as("title"),
        meta("description").as("description"),
        meta("og:title").as("og_title"),
        element_at(filter(htmlMeta("Head")("Link"),
          l => l("rel") === "canonical"), 1)("url").as("canonical"),
        size(htmlMeta("Links")).cast("long").as("n_links"),
        sha2(array_join(transform(htmlMeta("Links"), l => l("url")), "\n"), 256)
          .as("links_sha"))
      .orderBy(col("doc_id"))
  }
}
