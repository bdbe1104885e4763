package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML metadata + outlink extraction — the WAT-layer complement of the
  * q122 text chain: a crawl pipeline needs the page's HEAD (title,
  * description, OpenGraph, canonical URL, declared language) for
  * indexing/quality signals, and its anchors for the link graph and
  * frontier. q150 extracts both and pushes every discovered URL
  * through the q129 canonicalizer — the metadata, dedup, and frontier
  * operators sharing ONE URL normal form.
  *
  * Extraction semantics (each pinned by spec + oracle):
  *   - `<title>`, `name="description"` / `property="og:title"` meta
  *     content, the `rel="canonical"` link href, and the `<html lang>`
  *     attribute, each entity-decoded through the SHARED
  *     `HtmlOps.decodeEntities` chain (attributes escape exactly like
  *     body text: `&amp;` in hrefs, `&quot;`/numeric references in
  *     content values);
  *   - anchors: every `<a … href="…">`, entity-decoded, kept only if
  *     absolute http(s) (anchors without href, relative paths, and
  *     mailto: are structurally out of frontier scope), then
  *     canonicalized via `UrlOps.urlCanonical` in DOCUMENT ORDER.
  *
  * The corpus plants the hostile realities: case-shifted schemes/hosts
  * and default ports the canonicalizer must fold, tracking params it
  * must strip, query orders it must sort, escaped ampersands and
  * numeric references in attribute values, and href-less / relative /
  * mailto anchors that must not count. The oracle replays every column
  * — including both canonical outlinks under the sha — from pure
  * (doc_id, lang) arithmetic.
  *
  * Scale shape (100 TB): one codegen projection per row — regex
  * extracts + the entity fold + the canonical rewrite chain, zero
  * exchange, no UDFs.
  */
object MetaOps {

  // --------------------------------------------------------------- corpus

  /** Metadata-rich synthetic page per document: head block with escaped
    * ampersands, a quoted-entity description, a numeric-reference
    * OpenGraph title, a messy canonical URL, and a body whose anchors
    * mix real frontier links with href-less/relative/mailto decoys.
    */
  private[graft] def syntheticMetaHtml(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def s(c: Column) = c.cast("string")
    val canonicalHref = concat(
      lit("https://Example.TEST:443/doc//"), s(id % 50),
      lit("/?x="), s(id % 7), lit("&amp;utm_source=z&amp;y="), s(id % 3),
      lit("#top"))
    val link1 = concat(
      lit("HTTPS://h"), s(id % 8), lit(".Example.TEST/p//"), s((id + 1) % 25),
      lit("?b="), s(id % 2), lit("&amp;utm_x=1&amp;a="), s(id % 5), lit("#frag"))
    val link2 = concat(
      lit("https://h"), s((id + 3) % 8), lit(".example.test/item/"),
      s((id * 3) % 100))
    docs.select(col("doc_id"), concat(
      lit("<html lang=\""), col("lang"), lit("\"><head>"),
      lit("<title>Title &amp; "), s(id), lit("</title>"),
      lit("<meta name=\"description\" content=\"Desc &quot;of&quot; "), s(id),
      lit("\"/><meta property=\"og:title\" content=\"OG &#8212; "), s(id),
      lit("\"><link rel=\"canonical\" href=\""), canonicalHref,
      lit("\"></head><body><h1>Heading</h1><a href=\""), link1,
      lit("\">first &amp; link</a><a name=\"no-href\">skip</a>"),
      lit("<a href=\"/relative/"), s(id),
      lit("\">rel skipped</a><a href=\"mailto:u@example.test\">mail</a>"),
      lit("<a href=\""), link2, lit("\">second</a></body></html>"))
      .as("html"))
  }

  // ----------------------------------------------------------- extraction

  private def headField(html: Column, re: String): Column =
    HtmlOps.decodeEntities(regexp_extract(html, re, 1))

  /** Canonicalized absolute outlinks in document order. */
  def outlinks(html: Column): Column =
    transform(
      filter(
        transform(
          regexp_extract_all(html, lit("(?is)<a\\s[^>]*href=\"([^\"]*)\""), lit(1)),
          u => HtmlOps.decodeEntities(u)),
        u => u.rlike("(?i)^https?://")),
      u => UrlOps.urlCanonical(u))

  /** The head fields + outlinks projection over an `html` column. */
  def metaColumns(html: Column): Seq[Column] = {
    val links = outlinks(html)
    Seq(
      regexp_extract(html, "(?is)<html[^>]*\\blang=\"([^\"]*)\"", 1).as("lang_attr"),
      trim(headField(html, "(?is)<title[^>]*>(.*?)</title>")).as("title"),
      headField(html,
        "(?is)<meta\\s[^>]*name=\"description\"[^>]*content=\"([^\"]*)\"")
        .as("description"),
      headField(html,
        "(?is)<meta\\s[^>]*property=\"og:title\"[^>]*content=\"([^\"]*)\"")
        .as("og_title"),
      {
        val href = headField(html,
          "(?is)<link\\s[^>]*rel=\"canonical\"[^>]*href=\"([^\"]*)\"")
        when(href === "", lit("")).otherwise(UrlOps.urlCanonical(href))
          .as("canonical")
      },
      size(links).cast("long").as("n_links"),
      sha2(array_join(links, "\n"), 256).as("links_sha"))
  }

  /** q150: metadata + link extraction end to end — the synthetic head/
    * anchor corpus through the shared entity decode and the q129
    * canonicalizer; every column (including both canonical outlinks
    * under the sha) replayed by the oracle from (doc_id, lang).
    */
  def q150MetaExtract(spark: SparkSession, dir: String): DataFrame =
    syntheticMetaHtml(Tables.documents(spark, dir))
      .select(col("doc_id") +: metaColumns(col("html")): _*)
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------- JSON-LD

  /** JSON-LD page per document: an Article block whose every field is
    * doc_id arithmetic (headline carries a JSON-escaped quote pair),
    * a BreadcrumbList decoy block that must be passed over, and a
    * plain `<script>` that must not match the typed selector. Script
    * content is RAW — entities never decode inside script elements.
    */
  private[graft] def syntheticJsonLd(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def s(c: Column) = c.cast("string")
    val mm = lpad(s(id % 12 + 1), 2, "0")
    val dd = lpad(s(id % 28 + 1), 2, "0")
    docs.select(col("doc_id"), concat(
      lit("<html><head><script>var x = {\"@type\": \"Article\"};</script>" +
        "<script type=\"application/ld+json\">" +
        "{\"@context\":\"https://schema.org\",\"@type\":\"BreadcrumbList\"," +
        "\"name\":\"decoy "), s(id), lit("\"}</script>"),
      lit("<script type=\"application/ld+json\">{\"@context\":" +
        "\"https://schema.org\",\"@type\":\"Article\",\"headline\":" +
        "\"Story \\\""), s(id),
      lit("\\\"\",\"datePublished\":\"2026-"), mm, lit("-"), dd,
      lit("\",\"author\":{\"@type\":\"Person\",\"name\":\"Author "), s(id % 20),
      lit("\"},\"wordCount\":"), s(id % 1000),
      lit("}</script></head><body><p>Body "), s(id),
      lit("</p></body></html>")).as("html"))
  }

  /** q151: schema.org structured-data extraction — typed `ld+json`
    * blocks located by one regex pass, then Spark's native JSON path
    * machinery (`get_json_object`, codegen, no UDF) selects the
    * Article block past the decoy and pulls nested fields; the date
    * lands as an epoch day. Every column oracle-replayed from doc_id
    * arithmetic.
    */
  def q151JsonldExtract(spark: SparkSession, dir: String): DataFrame = {
    val blocks = regexp_extract_all(col("html"),
      lit("(?is)<script type=\"application/ld\\+json\">(.*?)</script>"), lit(1))
    val article = filter(blocks,
      j => get_json_object(j, "$['@type']") === "Article")(0)
    syntheticJsonLd(Tables.documents(spark, dir))
      .select(col("doc_id"),
        size(blocks).cast("long").as("n_ld"),
        article.as("j"))
      .select(col("doc_id"), col("n_ld"),
        get_json_object(col("j"), "$.headline").as("headline"),
        datediff(to_date(get_json_object(col("j"), "$.datePublished")),
          to_date(lit("1970-01-01"))).cast("long").as("pub_day"),
        get_json_object(col("j"), "$.author.name").as("author_name"),
        get_json_object(col("j"), "$.wordCount").cast("long").as("word_count"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------ data URIs

  /** Inline-resource page per document: a base64 PNG-role payload and a
    * text/plain payload as data URIs (payload strings pure doc_id
    * arithmetic, padded across all three base64 remainder classes by
    * `id % 50`), plus an ordinary http `src` that must not match.
    * Spark's `base64` is a MIME encoder (CRLF wrap every 76 chars);
    * data URIs carry UNWRAPPED base64, so the corpus strips the wrap
    * — which also makes the text byte-equal to DuckDB's encoder.
    */
  private[graft] def syntheticDataUri(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def s(c: Column) = c.cast("string")
    def b64(c: Column) =
      regexp_replace(base64(c.cast("binary")), "[\\r\\n]", "")
    val p1 = concat(lit("PNGDATA:"), s(id), lit(":"),
      expr("repeat('x', cast(doc_id % 50 as int))"))
    val p2 = concat(lit("inline text "), s(id))
    docs.select(col("doc_id"),
      concat(
        lit("<html><body><img src=\"data:image/png;base64,"), b64(p1),
        lit("\"><img src=\"https://example.test/static/"), s(id),
        lit(".png\"><object data=\"data:text/plain;base64,"), b64(p2),
        lit("\"></object><p>Body "), s(id), lit("</p></body></html>")).as("html"),
      p1.as("p1"), p2.as("p2"))
  }

  /** q156: inline-resource extraction — every `data:` URI's mime and
    * base64 payload by one regex pass, decoded with `unbase64`; the
    * oracle pins BOTH directions (payload sha from the raw strings,
    * base64-text sha via DuckDB's own encoder) so a symmetric
    * encode/decode bug cannot cancel. Pure codegen, no UDFs.
    */
  def q156DataUriExtract(spark: SparkSession, dir: String): DataFrame = {
    val uris = regexp_extract_all(col("html"),
      lit("data:([a-z]+/[a-z0-9.+-]+);base64,([A-Za-z0-9+/=]+)"), lit(0))
    val mimes = transform(uris, u => regexp_extract(u, "^data:([^;]+);", 1))
    val b64s = transform(uris, u => regexp_extract(u, ";base64,(.*)$", 1))
    val payloads = transform(b64s, b => unbase64(b).cast("string"))
    syntheticDataUri(Tables.documents(spark, dir))
      .select(col("doc_id"),
        size(uris).cast("long").as("n_uris"),
        array_join(mimes, ",").as("mimes"),
        aggregate(payloads, lit(0L),
          (acc, p) => acc + octet_length(p)).as("n_bytes"),
        sha2(array_join(payloads, "\n"), 256).as("payload_sha"),
        sha2(array_join(b64s, "\n"), 256).as("b64_sha"))
      .orderBy(col("doc_id"))
  }
}
