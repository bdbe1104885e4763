package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata + outlink extraction: head fields entity-decode through the
  * shared chain, anchor filtering (href-less / relative / mailto out),
  * canonicalization of every discovered URL, document order, and
  * hostile-markup behavior (missing fields are empty, never a throw).
  */
class MetaOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def meta(html: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq((1L, html)).toDF("doc_id", "html")
      .select(MetaOps.metaColumns(col("html")): _*)
      .collect().head
  }

  private def links(html: String): Seq[String] = {
    import spark.implicits._
    Seq((1L, html)).toDF("doc_id", "html")
      .select(MetaOps.outlinks(col("html")).as("l"))
      .collect().head.getSeq[String](0).toSeq
  }

  test("head fields extract and entity-decode through the shared chain") {
    val html = """<html lang="de"><head><title> Title &amp; &#8212; x </title>""" +
      """<meta name="description" content="Desc &quot;q&quot;"/>""" +
      """<meta property="og:title" content="OG &#233;"/>""" +
      """<link rel="canonical" href="HTTPS://Ex.TEST:443/a//b/?z=1&amp;utm_source=t&amp;a=2#f">""" +
      """</head><body></body></html>"""
    val r = meta(html)
    assert(r.getAs[String]("lang_attr") == "de")
    assert(r.getAs[String]("title") == "Title & — x") // trimmed, decoded
    assert(r.getAs[String]("description") == "Desc \"q\"")
    assert(r.getAs[String]("og_title") == "OG é")
    assert(r.getAs[String]("canonical") == "https://ex.test/a/b/?a=2&z=1")
  }

  test("anchors: href-less, relative, and mailto are out; order is document order") {
    val html = """<body><a href="https://b.test/2">two</a>""" +
      """<a name="x">skip</a><a href="/rel">skip</a>""" +
      """<a href="mailto:a@b.c">skip</a><a href="http://a.test/1">one</a></body>"""
    assert(links(html) == Seq("https://b.test/2", "http://a.test/1"))
  }

  test("outlinks canonicalize: case, ports, tracking params, sort, fragment") {
    val html = """<a href="HTTP://A.Test:80/p//x/?b=2&amp;utm_x=9&amp;a=1#s">l</a>"""
    assert(links(html) == Seq("http://a.test/p/x/?a=1&b=2"))
  }

  test("missing fields are empty strings and zero links, never a throw") {
    val r = meta("<html><body>no head at all</body></html>")
    assert(r.getAs[String]("title") == "")
    assert(r.getAs[String]("description") == "")
    assert(r.getAs[String]("og_title") == "")
    assert(r.getAs[String]("canonical") == "") // no canonical link → empty
    assert(r.getAs[Long]("n_links") == 0L)
    val hostile = "<title><title></title><a href=\"<>\">x</a><meta content="
    meta(hostile) // must not throw
  }

  test("json-ld: Article selected past the decoy, fields decode (escaped quotes, nested, date)") {
    import spark.implicits._
    val docs = Seq((7L, "t", "fr"), (33L, "t", "en"))
      .toDF("doc_id", "text", "lang")
    val blocks = org.apache.spark.sql.functions.filter(
      regexp_extract_all(col("html"),
        lit("(?is)<script type=\"application/ld\\+json\">(.*?)</script>"), lit(1)),
      j => get_json_object(j, "$['@type']") === "Article")
    val rows = MetaOps.syntheticJsonLd(docs)
      .select(col("doc_id"),
        size(blocks).as("n_articles"),
        get_json_object(blocks(0), "$.headline").as("h"),
        get_json_object(blocks(0), "$.author.name").as("a"),
        get_json_object(blocks(0), "$.datePublished").as("d"),
        get_json_object(blocks(0), "$.wordCount").as("w"))
      .orderBy(col("doc_id")).collect()
    val r7 = rows(0)
    assert(r7.getAs[Int]("n_articles") == 1) // the BreadcrumbList decoy is out
    assert(r7.getAs[String]("h") == "Story \"7\"")
    assert(r7.getAs[String]("a") == "Author 7")
    assert(r7.getAs[String]("d") == "2026-08-08")
    assert(r7.getAs[String]("w") == "7")
    assert(rows(1).getAs[String]("a") == "Author 13") // 33 % 20
  }

  test("data uris: mimes and payloads extract, http src never matches") {
    import spark.implicits._
    val docs = Seq((7L, "t", "fr")).toDF("doc_id", "text", "lang")
    val uris = regexp_extract_all(col("html"),
      lit("data:([a-z]+/[a-z0-9.+-]+);base64,([A-Za-z0-9+/=]+)"), lit(0))
    val r = MetaOps.syntheticDataUri(docs)
      .select(size(uris).as("n"),
        transform(uris, u => unbase64(regexp_extract(u, ";base64,(.*)$", 1))
          .cast("string")).as("p"),
        col("p1"), col("p2"))
      .collect().head
    assert(r.getAs[Int]("n") == 2) // the plain http src is out
    assert(r.getSeq[String](1) ==
      Seq(r.getAs[String]("p1"), r.getAs[String]("p2")))
    assert(r.getAs[String]("p1") == "PNGDATA:7:" + "x" * 7)
  }

  test("synthetic corpus round trip matches the oracle arithmetic") {
    import spark.implicits._
    val docs = Seq((7L, "t", "fr"), (12L, "t", "zh"))
      .toDF("doc_id", "text", "lang")
    val rows = MetaOps.syntheticMetaHtml(docs)
      .select(col("doc_id") +: MetaOps.metaColumns(col("html")): _*)
      .orderBy(col("doc_id")).collect()
    val r7 = rows(0)
    assert(r7.getAs[String]("lang_attr") == "fr")
    assert(r7.getAs[String]("title") == "Title & 7")
    assert(r7.getAs[String]("description") == "Desc \"of\" 7")
    assert(r7.getAs[String]("og_title") == "OG — 7")
    assert(r7.getAs[String]("canonical") == "https://example.test/doc/7/?x=0&y=1")
    assert(r7.getAs[Long]("n_links") == 2L)
    val r12 = rows(1)
    assert(r12.getAs[String]("canonical") == "https://example.test/doc/12/?x=5&y=0")
  }
}
