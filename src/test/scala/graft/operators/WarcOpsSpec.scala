package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC crawl-archive ingestion: offset-exact record walking (bodies
  * containing "WARC/1.0" must NOT resync the parser), HTTP splitting,
  * non-response record skipping, truncation/garbage hostility
  * (intact-prefix semantics, never a throw), and the q128 end-to-end
  * chain on real data.
  */
class WarcOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def iso(s: String) =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def record(
      uri: String, body: String, wtype: String = "response",
      status: String = "200 OK"): String = {
    val http = s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n\r\n$body"
    val payload = if (wtype == "response") http else body
    s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"
  }

  test("multi-record walk is offset-exact: a body containing WARC/1.0 does not resync") {
    val evil = "before WARC/1.0\r\nContent-Length: 0\r\n\r\n after"
    val warc = record("https://a/1", evil) + record("https://a/2", "second")
    val recs = WarcOps.parseWarc(iso(warc))
    assert(recs.map(_._1) == Seq("https://a/1", "https://a/2"))
    assert(recs.head._3 == evil, "body must round-trip exactly")
    assert(recs(1)._3 == "second")
  }

  test("non-response records are skipped but correctly stepped over") {
    val warc = record("https://a/meta", "warcinfo body", wtype = "warcinfo") +
      record("https://a/1", "real") +
      record("https://a/req", "GET / HTTP/1.1", wtype = "request") +
      record("https://a/2", "also real")
    assert(WarcOps.parseWarc(iso(warc)).map(_._1) == Seq("https://a/1", "https://a/2"))
  }

  test("HTTP status parses; malformed HTTP payloads drop without killing the walk") {
    val warc = record("https://a/1", "ok", status = "404 Not Found") +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a/bad\r\n" +
      "Content-Length: 7\r\n\r\nnot-http\r\n\r\n".replace("not-http", "nothttp") +
      record("https://a/2", "after")
    val recs = WarcOps.parseWarc(iso(warc))
    assert(recs.map(r => (r._1, r._2)) == Seq(("https://a/1", 404), ("https://a/2", 200)))
  }

  test("truncation and garbage: intact prefix kept, never a throw") {
    val warc = record("https://a/1", "one") + record("https://a/2", "two")
    for (cut <- 0 to warc.length) {
      val recs = WarcOps.parseWarc(iso(warc.substring(0, cut))) // must not throw
      assert(recs.length <= 2)
      if (cut >= warc.length) assert(recs.length == 2)
    }
    // lying Content-Length (overruns the blob) ends the walk at the lie
    val lying = record("https://a/1", "one") +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a/x\r\n" +
      "Content-Length: 999999\r\n\r\nshort"
    assert(WarcOps.parseWarc(iso(lying)).map(_._1) == Seq("https://a/1"))
    assert(WarcOps.parseWarc(iso("complete garbage")).isEmpty)
    assert(WarcOps.parseWarc(Array.empty[Byte]).isEmpty)
  }

  test("q128 end-to-end on sf0.001: every document extracted through the container") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = WarcOps.q128WarcExtract(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == docs.count(), "every doc must survive the container walk")
    // and the extraction equals the containerless q122 chain per doc
    val direct = HtmlOps.q122HtmlExtract(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text_sha")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getString(4) == direct(r.getLong(0)),
        s"doc ${r.getLong(0)}: WARC-path extraction diverged")
      assert(r.getLong(2) == 200L)
      assert(r.getString(1) == s"https://example.test/doc/${r.getLong(0)}")
    }
  }
}
