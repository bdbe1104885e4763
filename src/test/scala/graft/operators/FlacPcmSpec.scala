package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC frame codec (RFC 9639): encode→decode round-trips across every
  * subframe type, residual form, bit depth, and stereo decorrelation;
  * hand-pinned bit layouts for the spec's fixed constants; malformed
  * streams stay typed errors. (No libFLAC exists in this environment —
  * the encoder is an independent writer of the public format, so a
  * round-trip crosses two implementations of the spec, not one
  * inverted.)
  */
class FlacPcmSpec extends AnyFunSuite {

  private def tone(n: Int, f: Int => Int): Array[Int] = Array.tabulate(n)(f)

  private def roundTrip(
      samples: Array[Int], channels: Int, rate: Int = 44100, bits: Int = 16,
      blockSize: Int = 4096, force: String = "", stereo: String = "indep"): Unit = {
    val enc = FlacOps.encodeFlac(samples, channels, rate, bits, blockSize,
      force, stereo)
    FlacOps.decodePcm(enc) match {
      case Right(pcm) =>
        assert(pcm.sample_rate == rate && pcm.channels == channels &&
          pcm.bits == bits)
        assert(java.util.Arrays.equals(pcm.samples, samples),
          s"force=$force stereo=$stereo bits=$bits bs=$blockSize")
      case Left(r) => fail(s"decode($force/$stereo/$bits): $r")
    }
  }

  test("mono 16-bit round-trips: constant, two-tone, ramp, step, noise-ish " +
    "— across frame boundaries (blockSize 256 over 1000 samples)") {
    roundTrip(tone(1000, _ => 1234), 1, blockSize = 256) // CONSTANT frames
    roundTrip(tone(1000, i => if (i % 2 == 0) 700 else -300), 1, blockSize = 256)
    roundTrip(tone(1000, i => i * 13 - 6500), 1, blockSize = 256) // order-2-flat
    roundTrip(tone(1000, i => if (i < 500) -20000 else 20000), 1, blockSize = 256)
    roundTrip(tone(1000, i => ((i * 2654435761L) % 65536L - 32768L).toInt),
      1, blockSize = 256) // incompressible: large rice params
  }

  test("every forced subframe type round-trips: verbatim, lpc (real " +
    "coefficient/shift fields), rice escape, wasted bits") {
    val s = tone(600, i => ((i * 37) % 4000) - 2000)
    roundTrip(s, 1, blockSize = 200, force = "verbatim")
    roundTrip(s, 1, blockSize = 200, force = "lpc")
    roundTrip(s, 1, blockSize = 200, force = "escape")
    // wasted bits: all samples share 3 low zero bits
    roundTrip(tone(600, i => (((i * 37) % 4000) - 2000) << 3), 1,
      blockSize = 200, force = "wasted")
  }

  test("stereo decorrelations round-trip: independent, left/side, " +
    "right/side, mid/side (side channel carries bps+1 bits)") {
    val n = 500
    val inter = new Array[Int](n * 2)
    for (i <- 0 until n) {
      inter(2 * i) = ((i * 91) % 30000) - 15000
      inter(2 * i + 1) = ((i * 53) % 28000) - 14000
    }
    for (st <- Seq("indep", "leftside", "rightside", "midside"))
      roundTrip(inter, 2, blockSize = 128, stereo = st)
    // extreme values exercise the side channel's 17th bit
    val ext = new Array[Int](64)
    for (i <- 0 until 32) {
      ext(2 * i) = if (i % 2 == 0) 32767 else -32768
      ext(2 * i + 1) = if (i % 2 == 0) -32768 else 32767
    }
    for (st <- Seq("leftside", "rightside", "midside"))
      roundTrip(ext, 2, blockSize = 32, stereo = st)
  }

  test("multi-channel (4 and 8, independent assignment) round-trips") {
    for (ch <- Seq(4, 8)) {
      val n = 240
      val inter = Array.tabulate[Int](n * ch)(i =>
        ((i * 2654435761L >> 5) % 20000L - 10000L).toInt)
      roundTrip(inter, ch, blockSize = 64)
    }
  }

  test("8- and 24-bit depths round-trip") {
    roundTrip(tone(300, i => (i % 256) - 128), 1, bits = 8, blockSize = 100)
    roundTrip(tone(300, i => ((i * 999983) % (1 << 24)) - (1 << 23)), 1,
      bits = 24, blockSize = 100)
  }

  test("UTF-8 coded frame numbers cross the one-byte boundary (200 frames)") {
    // blockSize 16 over 3200 samples = 200 frames; frame 128+ needs the
    // two-byte coded form
    roundTrip(tone(3200, i => (i % 100) - 50), 1, blockSize = 16)
  }

  test("hand-pinned layout: a one-frame constant stream's frame header " +
    "fields and CRCs sit where RFC 9639 puts them") {
    val enc = FlacOps.encodeFlac(Array.fill(16)(5), 1, 44100, 16, 16)
    // fLaC + 4-byte block header + 34-byte STREAMINFO = frame at 42
    val f = 42
    assert((enc(f) & 0xff) == 0xff && (enc(f + 1) & 0xfc) == 0xf8,
      "14-bit sync 0b11111111111110 + reserved/strategy zeros")
    assert(((enc(f + 2) & 0xff) >> 4) == 7, "block size code: explicit 16-bit")
    assert((enc(f + 2) & 0x0f) == 0, "sample rate from STREAMINFO")
    assert(((enc(f + 3) & 0xff) >> 4) == 0, "mono channel assignment")
    assert(((enc(f + 3) & 0xff) >> 1 & 7) == 4, "16-bit depth code")
    assert((enc(f + 4) & 0xff) == 0, "frame number 0, one byte")
    // explicit block size field: 16-1
    assert((enc(f + 5) & 0xff) == 0 && (enc(f + 6) & 0xff) == 15)
    // subframe: padding 0, type 000000 (CONSTANT), no wasted bits
    assert((enc(f + 8) & 0xff) == 0)
  }

  test("malformed frames are typed errors, never throws or garbage: " +
    "CRC flips, truncation, bad sync") {
    val good = FlacOps.encodeFlac(
      tone(400, i => (i * 7 % 2000) - 1000), 1, 44100, 16, 128)
    assert(FlacOps.decodePcm(good).isRight)
    for (i <- 42 until good.length by 7) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x20).toByte
      FlacOps.decodePcm(bad) match {
        case Left(reason) => assert(reason.nonEmpty)
        case Right(pcm) => assert(pcm.samples.length <= 400) // a lucky flip
      }
    }
    for (cut <- Seq(10, 40, 43, 60, good.length - 3)) {
      assert(FlacOps.decodePcm(good.take(cut)).isLeft)
    }
    // declared total samples must match the decoded count
    val lying = good.clone()
    lying(21) = (lying(21) ^ 1).toByte // low bit of total samples
    assert(FlacOps.decodePcm(lying) == Left("sample-count-mismatch") ||
      FlacOps.decodePcm(lying).isLeft)
  }

  test("hand-pinned FULL byte layout: a FIXED-order-1 subframe with " +
    "Rice-coded residuals, every bit derived from RFC 9639 by hand — " +
    "pins unary polarity (q zeros then a 1) and the zigzag fold " +
    "independently of the repo's own encoder") {
    // PCM (mono, 8-bit): 10 12 11 14 10 13 12 15
    // FIXED order 1 → warmup s0=10; residuals e_i = s_i − s_{i−1}:
    //   e = 2, −1, 3, −4, 3, −1, 3
    // zigzag (RFC 9639 §9.2.7.1: n≥0 → 2n, n<0 → −2n−1):
    //   u = 4, 1, 6, 7, 6, 1, 6
    // Rice k=2, u = q·4 + r, quotient UNARY = q ZERO bits then a 1:
    //   u=4 → q1 r00 → 01|00      u=1 → q0 r01 → 1|01
    //   u=6 → q1 r10 → 01|10      u=7 → q1 r11 → 01|11
    // Frame header (§9.1): sync 11111111111110, reserved 0, fixed-
    // blocksize strategy 0 → FF F8; bsCode 6 (8-bit field follows),
    // srCode 9 (44.1 kHz table) → 69; mono 0000, bdCode 001 (8 bps),
    // reserved 0 → 02; coded frame number 0 → 00; blocksize−1=7 → 07;
    // CRC-8 (poly 0x07, init 0) of those six bytes = 8F.
    // Subframe: pad 0, type 001001 (FIXED order 1), wasted 0 → 12;
    // warmup 8-bit signed 10 → 0A.
    // Residual section: method 00 (4-bit params), partition order
    // 0000, param 0010 (k=2), then the Rice bits above:
    //   00 0000 0010 | 0100 101 0110 0111 0110 101 0110 + 0000 pad
    //   = 00 92 B3 B5 60
    // CRC-16 (poly 0x8005, init 0) over the 14 frame bytes = CF 80.
    val streamInfo = Array[Int](
      0x00, 0x08, 0x00, 0x08, // min/max blocksize 8
      0, 0, 0, 0, 0, 0, // min/max framesize unknown
      // rate 44100 | channels−1=0 | bits−1=7 | total samples 8
      0x0A, 0xC4, 0x40, 0x70, 0x00, 0x00, 0x00, 0x08,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) // md5 unset
    val frame = Array[Int](
      0xFF, 0xF8, 0x69, 0x02, 0x00, 0x07, 0x8F, // header + CRC-8
      0x12, 0x0A, // subframe header + warmup
      0x00, 0x92, 0xB3, 0xB5, 0x60, // residual partition
      0xCF, 0x80) // CRC-16
    val file = ("fLaC".getBytes("US-ASCII").map(_.toInt) ++
      Array(0x80, 0x00, 0x00, 34) ++ streamInfo ++ frame).map(_.toByte)
    FlacOps.decodePcm(file) match {
      case Right(pcm) =>
        assert(pcm.sample_rate == 44100 && pcm.channels == 1 && pcm.bits == 8)
        assert(pcm.samples.toSeq == Seq(10, 12, 11, 14, 10, 13, 12, 15))
      case Left(r) => fail(s"hand-built RFC frame rejected: $r")
    }
    // a decoder with MIRRORED unary polarity (ones then a terminating
    // zero) or an unfolded residual would decode different samples or
    // fail the CRC — flip one residual bit and the CRC-16 must catch it
    val flipped = file.clone()
    flipped(file.length - 5) = (flipped(file.length - 5) ^ 0x10).toByte
    assert(FlacOps.decodePcm(flipped) == Left("crc16-mismatch"))
  }

  test("bomb cap: a stream declaring 2^35 samples is refused before " +
    "allocation") {
    val enc = FlacOps.encodeFlac(Array.fill(16)(1), 1, 44100, 16, 16)
    val bad = enc.clone()
    // STREAMINFO packed region: total-samples top bits live at byte 14
    // (offset 4+4+10 = 18 is packed start; samples bits 0..35 of the
    // 64-bit BE load at 18 → bytes 22..25)
    bad(22) = 0x08.toByte // set a high total-samples bit
    assert(FlacOps.decodePcm(bad, maxSamples = 1 << 20).isLeft)
  }
}
