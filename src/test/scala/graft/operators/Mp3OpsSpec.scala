package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MP3 scan: tag skip + text frames, computed-length walk over planted
  * sync bytes, table dead letters, CBR/VBR, truncation and bit-flip
  * fuzz.
  */
class Mp3OpsSpec extends AnyFunSuite {

  test("round trip: tagged CBR stream scans to the arithmetic") {
    for (id <- Seq(0L, 5L, 22L)) {
      val info = Mp3Ops.parseMp3(id, Mp3Ops.buildMp3(id))
      assert(info.status == "ok")
      assert(info.title == "Track " + id)
      assert(info.artist == "Artist " + (id % 20))
      assert(info.mode == "cbr")
      assert(info.bitrate_kbps == Mp3Ops.Bitrates(9 + (id % 3).toInt * 2))
      assert(info.sample_rate == Mp3Ops.SampleRates((id % 2).toInt))
      assert(info.n_frames == 8 + (id % 12).toInt)
      assert(info.duration_ms ==
        info.n_frames.toLong * 1152L * 1000L / info.sample_rate)
    }
  }

  test("walk advances by computed length, never by sync scan") {
    // payloads contain planted 0xFF bytes (every 7th) — frame count
    // must still equal the arithmetic, not the sync-byte count
    val info = Mp3Ops.parseMp3(3L, Mp3Ops.buildMp3(3L))
    assert(info.n_frames == 8 + 3)
  }

  test("untagged stream: frames from byte 0 parse fine") {
    val tagged = Mp3Ops.buildMp3(4L)
    val tagLen = { // recompute the tag length to strip it
      val b = tagged
      10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
    }
    val info = Mp3Ops.parseMp3(4L, java.util.Arrays.copyOfRange(tagged, tagLen, tagged.length))
    assert(info.status == "ok")
    assert(info.title == "")
    assert(info.n_frames == 8 + 4)
  }

  test("vbr detection: mixed bitrate indices report vbr") {
    val a = Mp3Ops.buildMp3(0L) // brIdx 9 throughout
    val b = Mp3Ops.buildMp3(1L) // brIdx 11 throughout, ends with TAG
    // concatenate a's frames (strip its ID3v1 tail) with b's untagged frames
    val aFrames = java.util.Arrays.copyOfRange(a, a.length - 128, a.length)
    val aNoTail = java.util.Arrays.copyOfRange(a, 0, a.length - 128)
    assert(new String(aFrames, 0, 3) == "TAG")
    val bTag = 10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
    val bFrames = java.util.Arrays.copyOfRange(b, bTag, b.length)
    val info = Mp3Ops.parseMp3(9L, aNoTail ++ bFrames)
    assert(info.status == "ok")
    assert(info.mode == "vbr")
    assert(info.bitrate_kbps == 128) // first frame's
  }

  test("dead letters: bad table indices, non-MPEG1-L3, lying length") {
    val good = Mp3Ops.buildMp3(2L)
    // free-form bitrate (idx 0) on the first audio frame
    val tagLen = 10 + (((good(6) & 0x7f) << 21) | ((good(7) & 0x7f) << 14) |
      ((good(8) & 0x7f) << 7) | (good(9) & 0x7f))
    val freeBr = good.clone()
    freeBr(tagLen + 2) = (freeBr(tagLen + 2) & 0x0f).toByte
    assert(Mp3Ops.parseMp3(2L, freeBr).status == "bad-frame")
    // layer bits wounded → unsupported
    val badLayer = good.clone()
    badLayer(tagLen + 1) = 0xf9.toByte // Layer II
    assert(Mp3Ops.parseMp3(2L, badLayer).status == "unsupported")
    // truncated mid-frame keeps prior frames
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length - 200)
    val info = Mp3Ops.parseMp3(2L, cut)
    assert(info.status == "truncated")
    assert(info.n_frames > 0)
  }

  test("hostile inputs: empty, garbage, tag-only never throw") {
    assert(Mp3Ops.parseMp3(1L, Array.empty[Byte]).status == "no-frames")
    assert(Mp3Ops.parseMp3(1L, "random noise bytes".getBytes).status == "no-frames")
    assert(Mp3Ops.parseMp3(1L, Mp3Ops.buildId3v2("t", "a")).status == "no-frames")
  }

  test("bit-flip fuzz: every single-byte corruption is a value, never a throw") {
    val full = Mp3Ops.buildMp3(7L)
    for (i <- full.indices by 3) { // every 3rd byte keeps the spec fast
      val bad = full.clone()
      bad(i) = (bad(i) ^ 0x40).toByte
      Mp3Ops.parseMp3(7L, bad)
    }
  }
}
