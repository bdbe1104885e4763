package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** G.711 μ-law / A-law expansion (the telephony audio formats): spec
  * anchors, segment structure, compand round-trips, the WAV tag-6/7 arm,
  * and the q89 all-real-decode gate.
  */
class G711Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("μ-law anchors and structure") {
    assert(MultimodalOps.mulawExpand(0xFF) == 0, "0xFF is μ-law +0")
    assert(MultimodalOps.mulawExpand(0x7F) == 0, "0x7F is μ-law -0")
    assert(MultimodalOps.mulawExpand(0x80) == 32124, "0x80 is max positive")
    assert(MultimodalOps.mulawExpand(0x00) == -32124, "0x00 is max negative")
    // positive codes descend as the byte ascends (complemented encoding):
    // 0x80 (max) .. 0xFF (zero) strictly monotone
    val pos = (0x80 to 0xFF).map(MultimodalOps.mulawExpand)
    assert(pos.zip(pos.tail).forall { case (a, b) => a > b })
    // negative mirror: expand(b) == -expand(b ^ 0x80)
    (0 to 127).foreach { b =>
      assert(MultimodalOps.mulawExpand(b) == -MultimodalOps.mulawExpand(b | 0x80))
    }
  }

  test("A-law anchors and structure") {
    assert(MultimodalOps.alawExpand(0xD5) == 8, "0xD5 is quietest positive (no true zero)")
    assert(MultimodalOps.alawExpand(0x55) == -8)
    assert(MultimodalOps.alawExpand(0xAA) == 32256, "0xAA is max positive")
    assert(MultimodalOps.alawExpand(0x2A) == -32256)
    // sign mirror across bit 7 (A-law sign bit, pre-xor toggling)
    (0 to 255).foreach { b =>
      assert(MultimodalOps.alawExpand(b) == -MultimodalOps.alawExpand(b ^ 0x80))
    }
    // all 256 codes distinct in linear space except nothing (A-law is
    // injective: 256 distinct levels)
    assert((0 to 255).map(MultimodalOps.alawExpand).distinct.size == 256)
    // μ-law collapses only ±0
    assert((0 to 255).map(MultimodalOps.mulawExpand).distinct.size == 255)
  }

  test("expansion is the standard one: segment k spans double segment k-1's step") {
    // within one positive μ-law segment the step is constant and doubles
    // per segment — the defining G.711 property
    for (seg <- 0 to 7) {
      val codes = (0 to 15).map(m => 0x80 | ((7 - seg) << 4) | (15 - m))
      // careful: complemented encoding — recompute via expand directly
      val vals = codes.map(MultimodalOps.mulawExpand).sorted
      val steps = vals.zip(vals.tail).map { case (a, b) => b - a }.distinct
      assert(steps.size == 1 && steps.head == (8 << seg),
        s"μ-law segment $seg step ${steps} != ${8 << seg}")
    }
  }

  test("WAV tag 6/7 arm: decode matches direct expansion; fuzz-safe") {
    val bytes = Array.tabulate(200)(i => ((i * 37 + 3) % 256).toByte)
    for (aLaw <- Seq(false, true)) {
      val wav = MultimodalOps.encodeWavG711(8000, 1, bytes, aLaw)
      val d = MultimodalOps.decodeWav(wav)
      assert(d.isDefined && d.get.sampleRate == 8000 && d.get.samples.length == 200)
      bytes.indices.foreach { i =>
        val want =
          if (aLaw) MultimodalOps.alawExpand(bytes(i) & 0xFF)
          else MultimodalOps.mulawExpand(bytes(i) & 0xFF)
        assert(math.round(d.get.samples(i) * 32768f) == want, s"sample $i (aLaw=$aLaw)")
      }
      // the G.711 arm inherits decodeWav's never-throw contract
      (0 until wav.length).foreach { n => MultimodalOps.decodeWav(wav.take(n)) }
      (0 until wav.length).foreach { i =>
        val c = wav.clone(); c(i) = (c(i) ^ 0x5A).toByte
        MultimodalOps.decodeWav(c)
      }
    }
  }

  test("WAV tag 3 arm (IEEE float32): samples read exactly, NaN zeroed, " +
    "out-of-range clamped; wrong bit depth refused; fuzz-safe") {
    // hand-build a float32 WAV: canonical header with tag 3 / 32 bits
    def floatWav(samples: Array[Float], rate: Int = 8000): Array[Byte] = {
      val dataLen = samples.length * 4
      val out = new Array[Byte](44 + dataLen)
      val hdr = MultimodalOps.encodeWavSilence(rate, 1, 0)
      System.arraycopy(hdr, 0, out, 0, 44)
      // patch: RIFF size, format tag 3, byte rate, block align, bits, data size
      def le16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
      def le32(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      le32(4, 36 + dataLen)
      le16(20, 3) // IEEE float
      le32(28, rate * 4)
      le16(32, 4)
      le16(34, 32)
      le32(40, dataLen)
      samples.zipWithIndex.foreach { case (f, i) =>
        le32(44 + 4 * i, java.lang.Float.floatToIntBits(f))
      }
      out
    }
    val s = Array(0f, 0.5f, -0.25f, 1f, -1f, 2.5f, -3f, Float.NaN, 0.125f)
    val got = MultimodalOps.decodeWav(floatWav(s)).getOrElse(fail("None"))
    assert(got.bitsPerSample == 32 && got.channels == 1 &&
      got.sampleRate == 8000)
    val want = Array(0f, 0.5f, -0.25f, 1f, -1f, 1f, -1f, 0f, 0.125f)
    assert(got.samples.sameElements(want), got.samples.mkString(","))
    // a float WAV claiming 16 bits is refused (tag 3 is 32-bit only)
    val bad = floatWav(s)
    bad(34) = 16
    assert(MultimodalOps.decodeWav(bad).isEmpty)
    // truncation never throws
    val full = floatWav(s)
    (0 until full.length by 3).foreach(n => MultimodalOps.decodeWav(full.take(n)))
  }

  test("q89 rows replay driver-side") {
    val rows = MultimodalOps.q89G711Decode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (64 + id % 128).toInt
      assert(r.getLong(1) == n, s"asset $id n_samples")
      var cs = 0L
      (0 until n).foreach { i =>
        val b = ((id * 29 + i.toLong * 11) % 256).toInt
        val v = if (id % 2 == 0) MultimodalOps.mulawExpand(b)
                else MultimodalOps.alawExpand(b)
        cs += (i + 1).toLong * v
      }
      assert(r.getLong(2) == cs, s"asset $id checksum")
    }
  }
}
