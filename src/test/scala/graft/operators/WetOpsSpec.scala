package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** WET writer/parser round trip: octet-counted lengths, gzip-member
  * layout, offset-driven walk over hostile payloads, error-as-value,
  * and truncation fuzz (never throws).
  */
class WetOpsSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("round trip: multi-record archive re-parses exactly") {
    val recs = Seq(
      (3L, "https://example.test/doc/3", "first text\nsecond line"),
      (7L, "https://example.test/doc/7", "naïve café — № 7"),
      (9L, "https://example.test/doc/9", ""))
    val out = WetOps.parseWetAuto(WetOps.buildWet(recs))
    assert(out.map(r => (r.doc_id, r.url, r.text)) == recs.map(r => (r._1, r._2, r._3)))
    assert(out.map(_.n_octets) == recs.map(_._3.getBytes(utf8).length.toLong))
  }

  test("octet discipline: multi-byte text's Content-Length counts bytes") {
    val text = "déjà vu — № 42"
    assert(text.getBytes(utf8).length > text.length)
    val out = WetOps.parseWetAuto(WetOps.buildWet(Seq((42L, "u", text))))
    assert(out.head.n_octets == text.getBytes(utf8).length.toLong)
    assert(out.head.text == text)
  }

  test("offset-driven walk: a body containing literal WARC magic walks correctly") {
    val hostile = "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nnot a record"
    val recs = Seq((1L, "a", hostile), (2L, "b", "after"))
    val out = WetOps.parseWet(
      WetOps.wetRecord(1L, "a", hostile) ++ WetOps.wetRecord(2L, "b", "after"))
    assert(out.map(_.text) == Seq(hostile, "after"))
    // and through the gzip-member layout too
    assert(WetOps.parseWetAuto(WetOps.buildWet(recs)).map(_.text) ==
      Seq(hostile, "after"))
  }

  test("corrupt gzip member drops alone; neighbors survive") {
    val a = WarcOps.gzipBytes(WetOps.wetRecord(1L, "a", "alpha"))
    val b = WarcOps.gzipBytes(WetOps.wetRecord(2L, "b", "beta"))
    val bad = b.clone()
    bad(12) = (bad(12) ^ 0x55).toByte // corrupt the deflate stream
    val out = WetOps.parseWetAuto(a ++ bad ++ a)
    assert(out.count(_.text == "alpha") >= 1)
    assert(!out.exists(_.text == "beta"))
  }

  test("non-conversion and unattributable records are skipped, walk continues") {
    val resp = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: x\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n").getBytes(utf8)
    val noRefers = ("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: y\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n").getBytes(utf8)
    val good = WetOps.wetRecord(5L, "z", "kept")
    val out = WetOps.parseWet(resp ++ noRefers ++ good)
    assert(out.map(_.text) == Seq("kept"))
  }

  test("lying Content-Length ends the walk with prior records kept") {
    val good = WetOps.wetRecord(1L, "a", "first")
    val lie = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Refers-To: <urn:graft:doc:2>\r\nWARC-Target-URI: b\r\n" +
      "Content-Length: 999999\r\n\r\nshort").getBytes(utf8)
    val out = WetOps.parseWet(good ++ lie)
    assert(out.map(_.doc_id) == Seq(1L))
  }

  test("garbage after a well-formed record keeps THAT record (tail separator lie)") {
    val good = WetOps.wetRecord(1L, "a", "first")
    val alsoGood = WetOps.wetRecord(2L, "b", "second")
    // the second record is complete; the bytes after its payload are
    // junk, not \r\n\r\n — the walk ends but BOTH parsed records survive
    val out = WetOps.parseWet(good ++ alsoGood.dropRight(4) ++ "XXXX".getBytes(utf8))
    assert(out.map(_.doc_id) == Seq(1L, 2L))
    assert(out.map(_.text) == Seq("first", "second"))
  }

  test("generic walk surfaces headers for any record type") {
    val rec = ("WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: u\r\n" +
      "WARC-Payload-Digest: sha256:abc123\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
      .getBytes(utf8)
    val out = WetOps.walkRecords(rec ++ WetOps.wetRecord(3L, "v", "text"))
    assert(out.length == 2)
    assert(out.head._1("warc-type") == "revisit")
    assert(out.head._1("warc-payload-digest") == "sha256:abc123")
    assert(out.head._2 == "")
    assert(out(1)._1("warc-type") == "conversion")
    assert(out(1)._2 == "text")
  }

  test("truncation fuzz: every byte prefix never throws") {
    val full = WetOps.buildWet(Seq(
      (1L, "u1", "some text body"), (2L, "u2", "naïve № two")))
    var p = 0
    while (p <= full.length) {
      WetOps.parseWetAuto(java.util.Arrays.copyOfRange(full, 0, p))
      p += 1
    }
    // plaintext prefixes too
    val plain = WetOps.wetRecord(1L, "u1", "body") ++ WetOps.wetRecord(2L, "u2", "more")
    p = 0
    while (p <= plain.length) {
      WetOps.parseWet(java.util.Arrays.copyOfRange(plain, 0, p))
      p += 1
    }
  }
}
