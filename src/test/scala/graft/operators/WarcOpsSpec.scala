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
    val octets = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: $octets\r\n\r\n$payload\r\n\r\n"
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

  test("non-ASCII payloads round-trip byte-identical (UTF-8 re-decode, not Latin-1 mojibake)") {
    // Content-Length counts OCTETS; the 2-byte é/3-byte — force
    // octet != char counts through the whole walk
    val body = "naïve café — résumé № é中文 end"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body"
    val octets = http.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    val rec = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a/u\r\n" +
      s"Content-Length: $octets\r\n\r\n$http\r\n\r\n"
    val recs = WarcOps.parseWarc(
      (rec + record("https://a/2", "after")).getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    assert(recs.map(_._1) == Seq("https://a/u", "https://a/2"))
    assert(recs.head._3 == body, "UTF-8 body must round-trip byte-identical")
  }

  private def gz(recs: String*): Array[Byte] = WarcOps.gzipMembers(recs)

  test("gzip members: member-at-a-time inflate equals the plaintext walk") {
    val r1 = record("https://g/1", "first")
    val r2 = record("https://g/2", "naïve café №2")
    val plain = WarcOps.parseWarc(
      (r1 + r2).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val gzipped = WarcOps.parseWarcAuto(gz(r1, r2))
    assert(gzipped == plain)
    assert(gzipped.map(_._3) == Seq("first", "naïve café №2"))
    // plaintext dispatch unchanged
    assert(WarcOps.parseWarcAuto(iso(r1)) == WarcOps.parseWarc(iso(r1)))
  }

  test("gzip hostility: corrupt/truncated/lying members drop, neighbors survive") {
    val members = Seq(
      record("https://g/1", "one"), record("https://g/2", "two"),
      record("https://g/3", "three"))
    val whole = gz(members: _*)
    // locate member boundaries by re-gzipping prefixes
    val b01 = gz(members.head).length
    val b02 = gz(members.take(2): _*).length
    // bit-flip inside member 2's deflate data: members 1 and 3 survive
    val flipped = whole.clone()
    flipped(b01 + 14) = (flipped(b01 + 14) ^ 0x55).toByte
    val survivors = WarcOps.parseWarcAuto(flipped).map(_._1)
    assert(survivors.contains("https://g/1") && survivors.contains("https://g/3"))
    assert(!survivors.contains("https://g/2"))
    // truncation anywhere never throws; full blob yields all three
    for (cut <- Seq(0, 5, b01 - 1, b01, b01 + 9, b02 + 3, whole.length)) {
      val got = WarcOps.parseWarcAuto(whole.take(cut))
      assert(got.length <= 3)
      if (cut == whole.length) assert(got.length == 3)
    }
    // CRC lie (flip a trailer byte): that member drops, the rest survive
    val crcLie = whole.clone()
    crcLie(b01 - 6) = (crcLie(b01 - 6) ^ 0x7f).toByte
    val afterCrc = WarcOps.parseWarcAuto(crcLie).map(_._1)
    assert(!afterCrc.contains("https://g/1"))
    assert(afterCrc.contains("https://g/2") && afterCrc.contains("https://g/3"))
  }

  test("gzip bomb: a member inflating past the cap drops; the next member survives") {
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      val zeros = new Array[Byte](1 << 20)
      (0 to 70).foreach(_ => g.write(zeros)) // ~71 MiB > 64 MiB cap
      g.finish()
      bos.toByteArray
    }
    val after = record("https://g/ok", "fine")
    val blob = bomb ++ gz(after)
    val got = WarcOps.parseWarcAuto(blob).map(_._1)
    assert(got == Seq("https://g/ok"))
  }

  test("gzip header flags (FNAME/FCOMMENT/FEXTRA/FHCRC) step over correctly") {
    val rec = record("https://g/f", "flagged")
    val deflated = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      val in = rec.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      d.setInput(in); d.finish()
      val buf = new Array[Byte](1 << 16)
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      (in, bos.toByteArray)
    }
    val (in, comp) = deflated
    val crc = new java.util.zip.CRC32(); crc.update(in)
    val bos = new java.io.ByteArrayOutputStream()
    // magic, deflate, FLG = FEXTRA|FNAME|FCOMMENT (4|8|16 = 0x1c)
    bos.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0x1c, 0, 0, 0, 0, 0, 3))
    bos.write(Array[Byte](4, 0)) // XLEN=4
    bos.write(Array[Byte](1, 2, 3, 4)) // extra field
    bos.write("file.warc".getBytes); bos.write(0) // FNAME
    bos.write("a comment".getBytes); bos.write(0) // FCOMMENT
    bos.write(comp)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    bos.write(le32(crc.getValue)); bos.write(le32(in.length.toLong))
    val got = WarcOps.parseWarcAuto(bos.toByteArray ++ gz(record("https://g/2", "x")))
    assert(got.map(_._1) == Seq("https://g/f", "https://g/2"))
  }

  test("HTTP codings: chunked un-frames (extensions skipped), gzip inflates, " +
    "both stack; multi-byte chars split across chunks survive") {
    def http(hdrs: String, body: Array[Byte]): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$hdrs\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val httpB = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://c/1\r\n" +
        s"Content-Length: ${httpB.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        httpB ++ "\r\n\r\n".getBytes
    }
    // chunk size 3 splits the 2-byte é and the 3-byte — mid-character
    val text = "naïve café — résumé fin"
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val chunked = WarcOps.parseWarc(http(
      "Transfer-Encoding: chunked\r\n", WarcOps.encodeChunked(raw, 3)))
    assert(chunked.map(r => (r._3, r._4)) == Seq((text, "chunked")))
    val gzipped = WarcOps.parseWarc(http(
      "Content-Encoding: gzip\r\n", WarcOps.gzipBytes(raw)))
    assert(gzipped.map(r => (r._3, r._4)) == Seq((text, "gzip")))
    val stacked = WarcOps.parseWarc(http(
      "Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
      WarcOps.encodeChunked(WarcOps.gzipBytes(raw), 5)))
    assert(stacked.map(r => (r._3, r._4)) == Seq((text, "chunked,gzip")))
    // identity records report identity
    assert(WarcOps.parseWarc(http("", raw)).map(_._4) == Seq("identity"))
  }

  test("HTTP coding lies: bad chunk framing / corrupt gzip drop THE RECORD; " +
    "the walk continues (boundaries come from Content-Length)") {
    def rec(uri: String, hdrs: String, body: Array[Byte]): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\n$hdrs\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val httpB = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${httpB.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        httpB ++ "\r\n\r\n".getBytes
    }
    val good = "fine".getBytes
    // lying chunk size (overruns), bad hex, truncated framing, bad gzip
    val cases = Seq(
      "ff\r\nshort\r\n0\r\n\r\n".getBytes,
      "zz\r\nbody\r\n0\r\n\r\n".getBytes,
      "4\r\nbo".getBytes,
      Array[Byte](0x1f, 0x8b.toByte, 8, 0, 1, 2, 3))
    for ((bad, i) <- cases.zipWithIndex) {
      val hdr = if (i == 3) "Content-Encoding: gzip\r\n"
      else "Transfer-Encoding: chunked\r\n"
      val blob = rec("https://c/bad", hdr, bad) ++ rec("https://c/ok", "", good)
      val out = WarcOps.parseWarc(blob)
      assert(out.map(_._1) == Seq("https://c/ok"), s"case $i: ${out.map(_._1)}")
    }
    // dechunk unit: extension + trailer tolerated, zero-length body ok
    val framed = "3;ext=1\r\nabc\r\n0\r\nTrailer: x\r\n\r\n".getBytes
    assert(WarcOps.dechunk(framed, 0, framed.length).map(new String(_)) ==
      Some("abc"))
    val empty = "0\r\n\r\n".getBytes
    assert(WarcOps.dechunk(empty, 0, empty.length).map(_.length) == Some(0))
  }

  test("charset-labeled bodies decode to identical Unicode; unknown labels default to UTF-8") {
    def recCt(ct: String, body: Array[Byte]): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val httpB = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://cs/1\r\n" +
        s"Content-Length: ${httpB.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        httpB ++ "\r\n\r\n".getBytes
    }
    val text = "café è ø end"
    val latin = WarcOps.parseWarc(recCt("text/html; charset=ISO-8859-1",
      text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
    assert(latin.map(r => (r._3, r._5)) == Seq((text, "iso-8859-1")))
    val cpText = "équipe € end"
    val cp = WarcOps.parseWarc(recCt("text/html; charset=Windows-1252",
      cpText.getBytes(java.nio.charset.Charset.forName("windows-1252"))))
    assert(cp.map(r => (r._3, r._5)) == Seq((cpText, "windows-1252")))
    // quoted charset parameter form
    val q = WarcOps.parseWarc(recCt("text/html; charset=\"iso-8859-1\"",
      text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
    assert(q.map(_._3) == Seq(text))
    // unknown label: UTF-8 default (deterministic replacement, no throw)
    val unk = WarcOps.parseWarc(recCt("text/html; charset=klingon-8",
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    assert(unk.map(r => (r._3, r._5)) == Seq((text, "klingon-8")))
  }

  test("q139 on sf0.001: decodable coding paths (REAL brotli and zstd " +
    "included) extract to the q122 text; the compress leg stays typed") {
    val rows = WarcOps.q139WarcHttpExtract(spark, "/root/testdata/sf0.001").collect()
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(rows.length == docs.count())
    val direct = HtmlOps.q122HtmlExtract(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text_sha")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val emptySha = org.apache.commons.codec.digest.DigestUtils.sha256Hex("")
    rows.foreach { r =>
      val id = r.getLong(0)
      val expectEnc =
        if (id % 20 == 19) "unsupported:compress"
        else if (id % 20 == 9) "zstd"
        else if (id % 10 == 4) "br"
        else (id % 5) match {
          case 0 => "identity"; case 1 => "chunked"
          case 2 => "chunked,gzip"; case _ => "deflate"
        }
      assert(r.getString(3) == expectEnc, s"doc $id enc ${r.getString(3)}")
      if (id % 20 == 19) {
        assert(r.getLong(4) == 0L, s"doc $id: compress body must stay empty")
        assert(r.getString(5) == emptySha)
      } else
        assert(r.getString(5) == direct(id), s"doc $id text diverged through codings")
    }
  }

  test("deflate coding: zlib inflates; RAW deflate under the same label inflates " +
    "via the fallback; corrupt deflate drops the record") {
    def rec(hdrs: String, body: Array[Byte]): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\n$hdrs\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val httpB = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://c/1\r\n" +
        s"Content-Length: ${httpB.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        httpB ++ "\r\n\r\n".getBytes
    }
    val text = "deflate naïve — body"
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val zlib = WarcOps.parseWarc(rec("Content-Encoding: deflate\r\n",
      WarcOps.deflateBytes(raw)))
    assert(zlib.map(r => (r._3, r._4)) == Seq((text, "deflate")))
    // raw deflate (no zlib wrapper) mislabeled as deflate
    val d = new java.util.zip.Deflater(-1, true)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](1 << 16)
    val n = d.deflate(buf); d.end()
    val rawDef = WarcOps.parseWarc(rec("Content-Encoding: deflate\r\n",
      java.util.Arrays.copyOf(buf, n)))
    assert(rawDef.map(r => (r._3, r._4)) == Seq((text, "deflate")))
    // deflate inside chunked frames
    val stacked = WarcOps.parseWarc(rec(
      "Content-Encoding: deflate\r\nTransfer-Encoding: chunked\r\n",
      WarcOps.encodeChunked(WarcOps.deflateBytes(raw), 5)))
    assert(stacked.map(r => (r._3, r._4)) == Seq((text, "chunked,deflate")))
    // corrupt deflate bytes: record drops, walk survives
    val corrupt = WarcOps.parseWarc(
      rec("Content-Encoding: deflate\r\n", Array[Byte](1, 2, 3, 4)) ++
        rec("", "ok".getBytes))
    assert(corrupt.map(_._3) == Seq("ok"))
  }

  test("unrecognized content codings (compress/stacks) surface TYPED, " +
    "never the compressed octets as text; brotli and zstd decode for real") {
    def rec(hdrs: String, body: Array[Byte]): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\n$hdrs\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val httpB = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://c/u\r\n" +
        s"Content-Length: ${httpB.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        httpB ++ "\r\n\r\n".getBytes
    }
    val junk = Array[Byte](0x0b, 0x01, 0x00, 0x62)
    for (coding <- Seq("compress", "x-compress", "gzip, compress", "compress, gzip")) {
      val out = WarcOps.parseWarc(rec(s"Content-Encoding: $coding\r\n", junk))
      assert(out.length == 1, coding)
      assert(out.head._4.startsWith("unsupported:"), s"$coding -> ${out.head._4}")
      assert(out.head._3 == "", s"$coding body must be empty")
    }
    // br is now a DECODED coding: a real stream extracts, a corrupt one
    // drops the record (the corrupt-deflate discipline), and br stacks
    // with gzip in either application order
    val brText = "brotli naïve — body"
    val brRaw = brText.getBytes("UTF-8")
    val viaBr = WarcOps.parseWarc(rec("Content-Encoding: br\r\n",
      graft.operators.Brotli.encodeUncompressed(brRaw)))
    assert(viaBr.map(r => (r._3, r._4)) == Seq((brText, "br")))
    val corruptBr = WarcOps.parseWarc(
      rec("Content-Encoding: br\r\n", junk) ++ rec("", "ok".getBytes))
    assert(corruptBr.map(_._3) == Seq("ok"), "corrupt br must drop typed")
    val gzThenBr = WarcOps.parseWarc(rec("Content-Encoding: gzip, br\r\n",
      graft.operators.Brotli.encodeUncompressed(
        WarcOps.gzipBytes(brRaw))))
    assert(gzThenBr.map(r => (r._3, r._4)) == Seq((brText, "gzip,br")))
    val brThenGz = WarcOps.parseWarc(rec("Content-Encoding: br, gzip\r\n",
      WarcOps.gzipBytes(graft.operators.Brotli.encodeUncompressed(brRaw))))
    assert(brThenGz.map(r => (r._3, r._4)) == Seq((brText, "br,gzip")))
    // zstd decodes for real, corrupt zstd drops, and it stacks too
    val viaZstd = WarcOps.parseWarc(rec("Content-Encoding: zstd\r\n",
      graft.operators.Zstd.encodeRaw(brRaw)))
    assert(viaZstd.map(r => (r._3, r._4)) == Seq((brText, "zstd")))
    val corruptZstd = WarcOps.parseWarc(
      rec("Content-Encoding: zstd\r\n", junk) ++ rec("", "ok".getBytes))
    assert(corruptZstd.map(_._3) == Seq("ok"), "corrupt zstd must drop typed")
    val gzThenZstd = WarcOps.parseWarc(rec("Content-Encoding: gzip, zstd\r\n",
      graft.operators.Zstd.encodeRaw(WarcOps.gzipBytes(brRaw))))
    assert(gzThenZstd.map(r => (r._3, r._4)) == Seq((brText, "gzip,zstd")))
    // identity tokens are transparent; x-gzip aliases gzip
    val text = "alias body"
    val viaAlias = WarcOps.parseWarc(rec("Content-Encoding: x-gzip\r\n",
      WarcOps.gzipBytes(text.getBytes("UTF-8"))))
    assert(viaAlias.map(_._3) == Seq(text))
    val viaIdentity = WarcOps.parseWarc(
      rec("Content-Encoding: identity\r\n", text.getBytes("UTF-8")))
    assert(viaIdentity.map(r => (r._3, r._4)) == Seq((text, "identity")))
  }

  test("charset sniffing: BOM wins and strips; meta prescan fills the header " +
    "gap; labels beyond the window are ignored") {
    def rec(body: Array[Byte], ct: String = "text/html"): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val httpB = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://c/s\r\n" +
        s"Content-Length: ${httpB.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        httpB ++ "\r\n\r\n".getBytes
    }
    // meta charset form
    val cp = "<meta charset='windows-1252'><p>€ café</p>"
      .getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val m1 = WarcOps.parseWarc(rec(cp))
    assert(m1.map(r => (r._5, r._3.contains("€ café"))) ==
      Seq(("windows-1252", true)))
    // http-equiv form
    val eq = ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=ISO-8859-1\"><p>è fin</p>")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(WarcOps.parseWarc(rec(eq)).map(_._5) == Seq("iso-8859-1"))
    // BOM wins over the header label AND strips
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "naïve".getBytes("UTF-8")
    val b1 = WarcOps.parseWarc(rec(bom, "text/html; charset=ISO-8859-1"))
    assert(b1.map(r => (r._5, r._3)) == Seq(("utf-8", "naïve")))
    // header label still beats the meta prescan
    val both = ("<meta charset='utf-8'><p>x</p>")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(WarcOps.parseWarc(rec(both, "text/html; charset=windows-1252"))
      .map(_._5) == Seq("windows-1252"))
    // a meta past the 1024-byte prescan window is ignored
    val far = ("<p>" + "x" * 1200 + "</p><meta charset='windows-1252'>")
      .getBytes("UTF-8")
    assert(WarcOps.parseWarc(rec(far)).map(_._5) == Seq("utf-8"))
    // the prescan is HTML-only: a non-HTML body containing the byte
    // pattern never triggers it
    val plain = "<meta charset='windows-1252'> but text/plain".getBytes("UTF-8")
    assert(WarcOps.parseWarc(rec(plain, "text/plain")).map(_._5) == Seq("utf-8"))
  }

  test("q173 on sf0.001: sniffed charsets decode to the labeled-delivery text") {
    val rows = WarcOps.q173WarcMetaCharset(spark, "/root/testdata/sf0.001").collect()
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val id = r.getLong(0)
      val expect = (id % 4) match {
        case 0 => "windows-1252"; case 1 => "iso-8859-1"; case _ => "utf-8"
      }
      assert(r.getString(3) == expect, s"doc $id charset ${r.getString(3)}")
    }
  }

  test("q135 end-to-end: gzip archive extraction matches q128 plus the UTF-8 marker block") {
    val out = WarcOps.q135WarcGzExtract(spark, "/root/testdata/sf0.001")
      .collect()
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(out.length == docs.count(), "every doc must survive member inflate")
    // the marker paragraph adds exactly one block vs q128
    val q128 = WarcOps.q128WarcExtract(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("n_blocks")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(3) == q128(r.getLong(0)) + 1,
        s"doc ${r.getLong(0)}: expected the one extra UTF-8 marker block")
    }
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
