package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** CDX generation: SURT semantics, byte-exact extents, digest/seek
  * round trip (the index actually ADDRESSES the archive), non-response
  * skips, and framing-lie/truncation behavior.
  */
class CdxOpsSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def record(uri: String, date: String, body: String,
      warcType: String = "response",
      httpHead: String = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"): String = {
    val http = httpHead + body
    s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\nContent-Length: ${http.getBytes(utf8).length}\r\n\r\n" +
      http + "\r\n\r\n"
  }

  test("SURT: label reversal, default-port elision, casing, bare host") {
    assert(CdxOps.surt("https://Example.test/doc/5") == "test,example)/doc/5")
    assert(CdxOps.surt("http://a.b.c.example.com/x?q=1") == "com,example,c,b,a)/x?q=1")
    assert(CdxOps.surt("https://host.test:443/p") == "test,host)/p")
    assert(CdxOps.surt("http://host.test:80/p") == "test,host)/p")
    assert(CdxOps.surt("http://host.test:8080/p") == "test,host:8080)/p")
    assert(CdxOps.surt("https://host.test") == "test,host)/")
    assert(CdxOps.surt("https://host.test?q=2") == "test,host)/?q=2")
  }

  test("extents are byte-exact and the index ADDRESSES the archive: seek+slice re-digests") {
    val r1 = record("https://a.test/1", "2026-03-05T07:00:00Z", "body one")
    val r2 = record("https://a.test/2", "2026-03-05T08:30:15Z", "the second body")
    val archive = (r1 + r2).getBytes(utf8)
    val rows = CdxOps.cdxRecords("f.warc", archive)
    assert(rows.length == 2)
    assert(rows(0).offset == 0 && rows(0).length == r1.getBytes(utf8).length)
    assert(rows(1).offset == r1.getBytes(utf8).length)
    assert(rows(1).ts == "20260305083015")
    // the whole point of CDX: seek to (offset, length) and recover the record
    rows.foreach { r =>
      val slice = java.util.Arrays.copyOfRange(
        archive, r.offset.toInt, (r.offset + r.length).toInt)
      val again = CdxOps.cdxRecords(r.filename, slice)
      assert(again.length == 1 && again.head.digest == r.digest &&
        again.head.urlkey == r.urlkey)
    }
  }

  test("gzip-member extents: range reads recover every record exactly; " +
    "lying extents dead-letter, never garbage") {
    val recs = Seq(
      record("https://a.test/1", "2026-03-05T07:00:00Z", "body one"),
      record("https://a.test/2", "2026-03-05T08:30:15Z", "naïve café body"),
      record("https://a.test/3", "2026-03-05T09:00:00Z", "third"))
    val archive = WarcOps.gzipMembers(recs)
    val rows = CdxOps.cdxRecordsGz("f.warc.gz", archive)
    assert(rows.length == 3)
    // extents tile the archive exactly (one member per record)
    assert(rows.head.offset == 0)
    assert(rows.map(r => r.offset + r.length).max == archive.length)
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a.offset + a.length == b.offset, "members must tile")
    }
    // selective access == the full walk, record for record
    val full = WarcOps.parseWarcAuto(archive)
    rows.zip(full).foreach { case (row, expect) =>
      val got = CdxOps.fetchRecordGz(archive, row.offset, row.length)
      assert(got.contains(expect), s"range read diverged at ${row.offset}")
    }
    // lies: shifted offset, short length, out of range — all None
    assert(CdxOps.fetchRecordGz(archive, rows(1).offset + 1, rows(1).length).isEmpty)
    assert(CdxOps.fetchRecordGz(archive, rows(1).offset, rows(1).length - 3).isEmpty)
    assert(CdxOps.fetchRecordGz(archive, archive.length - 2L, 10L).isEmpty)
    // a slice spanning TWO members is not a record address
    assert(CdxOps.fetchRecordGz(archive, rows(0).offset,
      rows(0).length + rows(1).length).isEmpty)
    // a MULTI-record member is not addressable either: the index skips
    // it (index and fetch must agree on what an extent means)
    val multi = WarcOps.gzipMembers(Seq(recs(0) + recs(1), recs(2)))
    val rows2 = CdxOps.cdxRecordsGz("m.warc.gz", multi)
    assert(rows2.length == 1 && rows2.head.url == "https://a.test/3")
  }

  test("q172 on sf0.001: every document reconstructs through range reads " +
    "only, matching the full-walk q135 output") {
    val spark = graft.SparkTestSession.spark
    val viaFetch = CdxOps.q172CdxFetch(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq)
    val viaWalk = WarcOps.q135WarcGzExtract(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq)
    assert(viaFetch.nonEmpty && viaFetch.length == viaWalk.length)
    viaFetch.zip(viaWalk).foreach { case (f, w) => assert(f == w) }
  }

  test("the CDX index is a STANDING fingerprint-keyed artifact: built " +
    "once, served from disk on re-run, stale generations GC'd") {
    val spark = graft.SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    val root = new java.io.File(sys.props("java.io.tmpdir") +
      "/graft_cdx_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    // a planted stale generation must be deleted by the next build check
    val stale = new java.io.File(root, "cdx-" + "0" * 16)
    stale.mkdirs()
    CdxOps.q172CdxFetch(spark, dir).count()
    val gens = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("cdx-")).map(_.getName).toSeq
    assert(gens.length == 1, s"exactly one live generation: $gens")
    assert(!stale.exists(), "stale generation must be GC'd")
    val live = new java.io.File(root, gens.head)
    val mtime = live.lastModified()
    val success = new java.io.File(live, "_SUCCESS")
    assert(success.exists())
    // re-run: the artifact is reused, not rebuilt (mtime unchanged)
    CdxOps.q172CdxFetch(spark, dir).count()
    assert(live.lastModified() == mtime, "re-run must not rebuild the index")
  }

  test("non-response records are skipped but still advance the walk") {
    val req = record("https://a.test/1", "2026-01-01T00:00:00Z", "q", warcType = "request")
    val resp = record("https://a.test/2", "2026-01-01T00:00:00Z", "r")
    val rows = CdxOps.cdxRecords("f.warc", (req + resp).getBytes(utf8))
    assert(rows.map(_.url) == Seq("https://a.test/2"))
    assert(rows.head.offset == req.getBytes(utf8).length)
  }

  test("bad date / missing URI / non-HTTP payload drop the record, not the walk") {
    val bad = record("https://a.test/1", "not-a-date", "x")
    val noHttp = record("https://a.test/2", "2026-01-01T00:00:00Z", "", httpHead = "JUNK\r\n\r\n")
    val good = record("https://a.test/3", "2026-01-01T00:00:00Z", "y")
    val rows = CdxOps.cdxRecords("f.warc", (bad + noHttp + good).getBytes(utf8))
    assert(rows.map(_.url) == Seq("https://a.test/3"))
  }

  test("framing lies and truncation end the walk with the intact prefix kept") {
    val good = record("https://a.test/1", "2026-01-01T00:00:00Z", "keep")
    val lying = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 99999\r\n\r\nshort"
    val rows = CdxOps.cdxRecords("f.warc", (good + lying).getBytes(utf8))
    assert(rows.map(_.url) == Seq("https://a.test/1"))
    val archive = (good + good).getBytes(utf8)
    for (cut <- 0 to archive.length by 11) {
      CdxOps.cdxRecords("f.warc", archive.take(cut)) // never throws
    }
  }
}
