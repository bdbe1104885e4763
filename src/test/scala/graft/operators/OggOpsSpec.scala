package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Ogg container: the non-reflected CRC (a zlib CRC must NOT
  * validate), page-grain drop + resync, lacing/continuation packet
  * assembly, Vorbis and Opus ident/comment parsing, truncation fuzz,
  * and the q174 end-to-end round trip.
  */
class OggOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("round trip: both codecs parse back the planted fields") {
    val v = OggOps.extractOgg(4L, OggOps.buildOgg(4L, "alpha beta gamma"))
    assert(v.kind == "vorbis")
    assert(v.serial == 4096 + 4)
    assert(v.n_pages == 5 + 4 % 3 && v.n_packets == v.n_pages)
    assert(v.channels == 1 && v.sample_rate == 8000 + 4 * 4000)
    assert(v.total_samples == (100 + 4) * 256L)
    assert(v.title == "alpha beta gamma № 4")
    val o = OggOps.extractOgg(7L, OggOps.buildOgg(7L, "naïve — drei"))
    assert(o.kind == "opus")
    assert(o.channels == 2 && o.title == "naïve — drei № 7")
  }

  test("the CRC is Ogg's non-reflected polynomial: a zlib CRC never validates") {
    val ogg = OggOps.buildOgg(2L, "x y z")
    // recompute page 0's CRC with zlib's (reflected) CRC32 — the walk
    // must REJECT that page
    val page0End = {
      val nSegs = ogg(26) & 0xff
      27 + nSegs + (0 until nSegs).map(k => ogg(27 + k) & 0xff).sum
    }
    val forged = ogg.clone()
    forged(22) = 0; forged(23) = 0; forged(24) = 0; forged(25) = 0
    val z = new java.util.zip.CRC32()
    z.update(forged, 0, page0End)
    val zc = z.getValue
    forged(22) = (zc & 0xff).toByte
    forged(23) = ((zc >> 8) & 0xff).toByte
    forged(24) = ((zc >> 16) & 0xff).toByte
    forged(25) = ((zc >> 24) & 0xff).toByte
    val info = OggOps.extractOgg(2L, forged)
    // page 0 (the ident) dropped -> the first surviving packet is the
    // comment header, which is neither \x01vorbis nor OpusHead
    assert(info.kind == "unknown")
    assert(info.n_pages == OggOps.extractOgg(2L, ogg).n_pages - 1)
  }

  test("a corrupt page drops alone and the walk resyncs; later pages survive") {
    val ogg = OggOps.buildOgg(6L, "a b c")
    val good = OggOps.extractOgg(6L, ogg)
    // flip one payload byte inside page 3 (an audio page)
    var p = 0
    var pageIdx = 0
    var flipAt = -1
    while (flipAt < 0) {
      val nSegs = ogg(p + 26) & 0xff
      val end = p + 27 + nSegs + (0 until nSegs).map(k => ogg(p + 27 + k) & 0xff).sum
      if (pageIdx == 3) flipAt = end - 2
      else { p = end; pageIdx += 1 }
    }
    val bad = ogg.clone()
    bad(flipAt) = (bad(flipAt) ^ 0x55).toByte
    val info = OggOps.extractOgg(6L, bad)
    assert(info.n_pages == good.n_pages - 1, "exactly the corrupt page drops")
    assert(info.kind == good.kind && info.title == good.title,
      "headers before the corruption survive")
    assert(info.total_samples == good.total_samples,
      "the EOS page after the corruption survives the resync")
  }

  test("a promised continuation that never comes drops the half-packet loudly") {
    // pages built by hand: a BOS page whose lacing ends at 255 (open
    // packet), then a fresh page WITHOUT the continuation flag
    val id = Array.tabulate[Byte](255)(_.toByte)
    val pages = Seq(
      OggOps.OggPage(0x02, 0L, 9L, 0L, Seq(255), id, crcOk = true),
      OggOps.OggPage(0x00, 0L, 9L, 1L, Seq(3), Array[Byte](1, 2, 3), crcOk = true))
    val packets = OggOps.assemblePackets(pages)
    assert(packets.map(_.toSeq) == Seq(Seq[Byte](1, 2, 3)),
      "the orphaned 255-run must not leak into the next packet")
  }

  test("truncation fuzz: every prefix parses typed, never a throw") {
    val ogg = OggOps.buildOgg(11L, "p q r")
    for (cut <- 0 to ogg.length by 13)
      OggOps.extractOgg(11L, ogg.take(cut)) // must not throw
    assert(OggOps.extractOgg(11L, Array.empty[Byte]).kind == "not-ogg")
    assert(OggOps.extractOgg(11L, "OggS garbage".getBytes).kind == "not-ogg")
  }

  test("q174 on sf0.001: every document round-trips with the arithmetic fields") {
    val rows = OggOps.q174OggExtract(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == (if (id % 2 == 0) "vorbis" else "opus"))
      assert(r.getLong(3) == 5 + id % 3, s"doc $id pages")
      assert(r.getLong(6) == 8000 + (id % 8) * 4000)
    }
  }
}
