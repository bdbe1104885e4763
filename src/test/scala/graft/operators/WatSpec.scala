package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** WAT envelope records: writer/reader round-trip, the metadata-record
  * filter, octet-counted lengths, and the q189 contract vs q150 (the
  * same extraction must surface through the WAT layer unchanged).
  */
class WatSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("a WAT record round-trips: envelope JSON intact, octet-counted " +
    "Content-Length (multi-byte content), metadata-type filter holds") {
    val json = """{"Envelope":{"x":"em — dash"}}""" // octets != chars
    val rec = WatOps.watRecord(7L, "https://t.example/7", json)
    val got = WatOps.parseWat(rec)
    assert(got == Seq((7L, "https://t.example/7",
      json.getBytes("UTF-8").length.toLong, json)))
    // a conversion record (the WET kind) must not surface here
    val wet = WetOps.wetRecord(8L, "https://t.example/8", "plain")
    assert(WatOps.parseWat(wet).isEmpty)
    // gzip-member archive form
    val archive = WatOps.buildWat(Seq((7L, "https://t.example/7", json)))
    assert(WatOps.parseWatAuto(archive).map(_._1) == Seq(7L))
  }

  test("a char-counted Content-Length truncates the payload (the walk " +
    "consumes OCTETS) — the envelope JSON no longer parses, so the " +
    "oracle catches the writer bug") {
    val json = """{"a":"— z"}"""
    val chars = json.length // 11 chars, 13 octets (the em-dash)
    val bad = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "WARC-Target-URI: u\r\nWARC-Refers-To: <urn:graft:doc:1>\r\n" +
      "Content-Type: application/json\r\nContent-Length: " + chars +
      "\r\n\r\n" + json + "\r\n\r\n").getBytes("UTF-8")
    val got = WatOps.parseWat(bad)
    // the record surfaces (the walk keeps a fully-parsed record) but
    // its payload is cut two octets short: no longer valid JSON
    assert(got.map(_._4) == Seq(json.substring(0, json.length - 2)))
  }

  test("q189 on sf0.001 equals q150's extraction through the WAT layer") {
    val viaWat = WatOps.q189WatRoundtrip(spark, sf)
      .select("doc_id", "title", "description", "og_title", "canonical",
        "n_links", "links_sha")
      .collect().map(_.toSeq)
    val direct = MetaOps.q150MetaExtract(spark, sf)
      .select("doc_id", "title", "description", "og_title", "canonical",
        "n_links", "links_sha")
      .collect().map(_.toSeq)
    assert(viaWat.nonEmpty && viaWat.length == direct.length)
    viaWat.zip(direct).foreach { case (w, d) => assert(w == d, s"$w != $d") }
  }
}
