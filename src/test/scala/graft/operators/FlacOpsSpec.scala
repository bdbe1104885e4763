package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC scan: round trip, the packed-field arithmetic, the
  * little-endian comment island, case-insensitive keys, octet lengths,
  * structural dead letters, truncation + bit-flip fuzz.
  */
class FlacOpsSpec extends AnyFunSuite {

  test("round trip: every field matches the arithmetic") {
    for (id <- Seq(0L, 5L, 22L, 39L)) {
      val out = FlacOps.parseFlac(id, FlacOps.buildFlac(id))
      assert(out.status == "ok")
      assert(out.sample_rate == FlacOps.rateOf(id))
      assert(out.channels == FlacOps.channelsOf(id))
      assert(out.bits == FlacOps.bitsOf(id))
      assert(out.total_samples == FlacOps.samplesOf(id))
      assert(out.duration_ms == FlacOps.samplesOf(id) * 1000L / FlacOps.rateOf(id))
      assert(out.title == "Track № " + id)
      assert(out.artist == "Artist " + (id % 20), "lower-case key must match")
      assert(out.n_blocks == 3)
    }
  }

  test("the walk never reads past the last-block flag") {
    val full = FlacOps.buildFlac(7L)
    // wound the pseudo-frame bytes after the metadata: scan unaffected
    val bad = full.clone()
    for (i <- full.length - 32 until full.length) bad(i) = 0x55
    assert(FlacOps.parseFlac(7L, bad) == FlacOps.parseFlac(7L, full))
  }

  test("structural dead letters") {
    assert(FlacOps.parseFlac(1L, Array.empty[Byte]).status == "not-flac")
    assert(FlacOps.parseFlac(1L, "OggS not flac data".getBytes).status == "not-flac")
    val full = FlacOps.buildFlac(2L)
    // first block not STREAMINFO: flip its type to PADDING
    val noSi = full.clone()
    noSi(4) = 0x01
    assert(FlacOps.parseFlac(2L, noSi).status == "no-streaminfo")
    // comment length lying past its block
    val lie = full.clone()
    val vcOff = 4 + 4 + 34 + 4 + 16 // magic + si hdr + si + pad hdr + pad
    lie(vcOff + 6) = 0x7f // vendor length's 3rd LE byte → huge
    assert(FlacOps.parseFlac(2L, lie).status == "bad-comment")
    // truncated mid-block
    assert(FlacOps.parseFlac(2L,
      java.util.Arrays.copyOfRange(full, 0, 20)).status == "truncated")
  }

  test("truncation and bit-flip fuzz never throw") {
    val full = FlacOps.buildFlac(3L)
    var p = 0
    while (p <= full.length) {
      FlacOps.parseFlac(3L, java.util.Arrays.copyOfRange(full, 0, p))
      p += 1
    }
    for (i <- full.indices) {
      val bad = full.clone()
      bad(i) = (bad(i) ^ 0x24).toByte
      FlacOps.parseFlac(3L, bad)
    }
  }
}
