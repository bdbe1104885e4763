package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec (round-12 brief item 4): marker walk, canonical
  * Huffman (DC prediction + AC run-length + byte stuffing + restarts),
  * dequant, fixed-point IDCT, 4:2:0 upsample, integer YCbCr→RGB —
  * exact-recovery and accuracy pins plus the PNG-discipline hostile-input
  * fuzz, and the q83/q84 all-real-decode gates.
  */
class JpegCodecSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def check(prop: org.scalacheck.Prop, minSuccessful: Int = 100): Unit = {
    import org.scalacheck.{Test => SCTest}
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("grayscale per-block-constant corpus decodes EXACTLY (the q83 contract)") {
    import org.scalacheck.{Gen, Prop}
    val prop = Prop.forAll(
      Gen.chooseNum(1, 5), Gen.chooseNum(1, 5), Gen.long,
      Gen.chooseNum(0, 3)) { (wB, hB, seed, ri) =>
      def v(bx: Int, by: Int): Int = (((seed % 251) + 251) % 251 + 13 * bx + 31 * by).toInt % 256
      val bytes = Jpeg.encodeJpegGrayBlocks(wB, hB, v, restartInterval = ri)
      Jpeg.decodeJpeg(bytes).exists { d =>
        d.width == wB * 8 && d.height == hB * 8 &&
          (0 until d.height).forall { y =>
            (0 until d.width).forall { x =>
              val expect = v(x / 8, y / 8)
              (0 until 3).forall(c => (d.pixels((y * d.width + x) * 3 + c) & 0xFF) == expect)
            }
          }
      }
    }
    check(prop)
  }

  test("every flat value 0..255 survives the DC-only loop bit-exactly") {
    (0 to 255).foreach { v =>
      val d = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayBlocks(1, 1, (_, _) => v)).get
      assert(d.pixels.forall(p => (p & 0xFF) == v), s"flat $v drifted")
    }
  }

  test("4:2:0 color corpus decodes to the exact fixed-point BT.601 conversion") {
    import org.scalacheck.{Gen, Prop}
    // the spec's own independent YCbCr→RGB: floorDiv replicates the
    // decoder's arithmetic >> 16 without sharing its code path
    def rgbRef(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def clamp(v: Long): Int = math.max(0, math.min(255, v)).toInt
      val r = y + Math.floorDiv(91881L * (cr - 128) + 32768, 65536L)
      val g = y + Math.floorDiv(-22554L * (cb - 128) - 46802L * (cr - 128) + 32768, 65536L)
      val b = y + Math.floorDiv(116130L * (cb - 128) + 32768, 65536L)
      (clamp(r), clamp(g), clamp(b))
    }
    val prop = Prop.forAll(
      Gen.chooseNum(1, 3), Gen.chooseNum(1, 3), Gen.long) { (wM, hM, seed) =>
      def ycc(mx: Int, my: Int): (Int, Int, Int) = {
        val s = ((seed % 97) + 97) % 97
        (((s * 3 + 17 * mx + 29 * my) % 256).toInt,
          ((s * 5 + 23 * mx + 7 * my) % 256).toInt,
          ((s * 11 + 19 * mx + 37 * my) % 256).toInt)
      }
      val bytes = Jpeg.encodeJpeg420Mcus(wM, hM, ycc)
      Jpeg.decodeJpeg(bytes).exists { d =>
        d.width == wM * 16 && d.height == hM * 16 &&
          (0 until d.height).forall { y =>
            (0 until d.width).forall { x =>
              val (yv, cb, cr) = ycc(x / 16, y / 16)
              val (r, g, b) = rgbRef(yv, cb, cr)
              val o = (y * d.width + x) * 3
              (d.pixels(o) & 0xFF) == b && (d.pixels(o + 1) & 0xFF) == g &&
                (d.pixels(o + 2) & 0xFF) == r
            }
          }
      }
    }
    check(prop)
  }

  test("decoder's fixed-point conversion stays within ±1 of the real-valued BT.601") {
    for (y <- 0 to 255 by 5; cb <- 0 to 255 by 5; cr <- 0 to 255 by 5) {
      val (r, g, b) = Jpeg.yccToRgb(y, cb, cr)
      def clampD(v: Double): Double = math.max(0.0, math.min(255.0, v))
      val rD = clampD(y + 1.402 * (cr - 128))
      val gD = clampD(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
      val bD = clampD(y + 1.772 * (cb - 128))
      assert(math.abs(r - rD) <= 1.0 && math.abs(g - gD) <= 1.0 && math.abs(b - bD) <= 1.0,
        s"ycc($y,$cb,$cr) → ($r,$g,$b) vs ($rD,$gD,$bD)")
    }
  }

  test("entropy coding round-trips ARBITRARY coefficient blocks exactly") {
    import org.scalacheck.{Gen, Prop}
    // random sparse blocks: DC in ±1023 (diff category ≤ 11), AC magnitudes
    // ≤ 1023 (size ≤ 10) at random zigzag positions — exercises magnitude
    // categories, ZRL runs, EOB, byte stuffing, and restart resets; the
    // decoder's pre-dequant coefficient hook must return them bit-exactly
    val prop = Prop.forAll(
      Gen.chooseNum(1, 4), Gen.chooseNum(1, 4), Gen.long,
      Gen.chooseNum(0, 3)) { (wB, hB, seed, ri) =>
      val rnd = new scala.util.Random(seed)
      val blocks = Seq.fill(wB * hB) {
        val c = new Array[Int](64)
        c(0) = rnd.nextInt(2047) - 1023
        val nAc = rnd.nextInt(20)
        (0 until nAc).foreach { _ =>
          val k = 1 + rnd.nextInt(63)
          var v = rnd.nextInt(2047) - 1023
          if (v == 0) v = 1
          c(Jpeg.ZigZag(k)) = v
        }
        c
      }
      val quant = Array.tabulate(64)(k => 1 + (k * 7) % 32)
      val bytes = Jpeg.encodeJpegCoeffsGray(wB, hB, blocks, quant, restartInterval = ri)
      Jpeg.decodeJpegCoefficients(bytes).exists { got =>
        got.length == blocks.length &&
          got.zip(blocks).forall { case (a, b) => a.sameElements(b) }
      }
    }
    check(prop)
  }

  test("fixed-point IDCT stays within ±1 of the double-precision reference") {
    import org.scalacheck.{Gen, Prop}
    def idctRef(coef: Array[Int]): Array[Double] = {
      val out = new Array[Double](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8) {
          val au = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
          val av = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
          s += au * av / 4.0 * coef(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16.0) *
            math.cos((2 * y + 1) * v * math.Pi / 16.0)
        }
        out(y * 8 + x) = math.max(0.0, math.min(255.0, s + 128.0))
      }
      out
    }
    def fdctRef(px: Array[Int]): Array[Int] = {
      val out = new Array[Int](64)
      for (v <- 0 until 8; u <- 0 until 8) {
        val au = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val av = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        var s = 0.0
        for (y <- 0 until 8; x <- 0 until 8)
          s += (px(y * 8 + x) - 128) *
            math.cos((2 * x + 1) * u * math.Pi / 16.0) *
            math.cos((2 * y + 1) * v * math.Pi / 16.0)
        out(v * 8 + u) = math.round(au * av / 4.0 * s).toInt
      }
      out
    }
    // IEEE-1180-style domain: coefficients OF PIXEL-DOMAIN BLOCKS (what a
    // real scan ever dequantizes to), ±1 against the double reference
    val prop = Prop.forAll(Gen.long) { seed =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(64)(rnd.nextInt(256))
      val coef = fdctRef(px)
      val out = new Array[Int](64)
      Jpeg.idctBlock(coef.clone(), out)
      val ref = idctRef(coef)
      (0 until 64).forall(i => math.abs(out(i) - ref(i)) <= 1.0 + 1e-9)
    }
    check(prop)
    // adversarial dense-extreme blocks (beyond any pixel-domain energy,
    // output mostly saturating): still bounded, at ±2
    val extreme = Prop.forAll(Gen.long, Gen.chooseNum(1, 64)) { (seed, nNz) =>
      val rnd = new scala.util.Random(seed)
      val coef = new Array[Int](64)
      (0 until nNz).foreach(_ => coef(rnd.nextInt(64)) = rnd.nextInt(4081) - 2040)
      val out = new Array[Int](64)
      Jpeg.idctBlock(coef.clone(), out)
      val ref = idctRef(coef)
      (0 until 64).forall(i => math.abs(out(i) - ref(i)) <= 2.0 + 1e-9)
    }
    check(extreme)
  }

  test("restart markers are equivalence-preserving, not content-bearing") {
    // same blocks with and without DRI must decode to identical pixels
    def v(bx: Int, by: Int): Int = (40 + 50 * bx + 90 * by) % 256
    val plain = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayBlocks(4, 3, v)).get
    for (ri <- 1 to 5) {
      val withRst = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayBlocks(4, 3, v, restartInterval = ri)).get
      assert(withRst.pixels.sameElements(plain.pixels), s"restart interval $ri drifted")
    }
  }

  test("corruption never throws: truncations, bit flips, hostile headers") {
    val good = Jpeg.encodeJpeg420Mcus(2, 2, (mx, my) => (80 + mx, 100 + my, 120 + mx))
    (0 until good.length).foreach { n =>
      Jpeg.decodeJpeg(good.take(n)) // Option out, never a throw
      assert(MultimodalOps.decodeBytes(good.take(n)).length == 16)
    }
    (0 until good.length).foreach { i =>
      val c = good.clone(); c(i) = (c(i) ^ 0x5A).toByte
      Jpeg.decodeJpeg(c)
      assert(MultimodalOps.decodeBytes(c).length == 16)
    }
    // hostile dims: gigapixel SOF over a tiny body — rejected by the size
    // cap before any allocation; find the SOF0 dims offset dynamically
    val gray = Jpeg.encodeJpegGrayBlocks(2, 2, (_, _) => 50)
    val sofAt = (0 until gray.length - 1)
      .find(i => (gray(i) & 0xFF) == 0xFF && (gray(i + 1) & 0xFF) == 0xC0).get
    val bomb = gray.clone()
    bomb(sofAt + 5) = 0x7F.toByte; bomb(sofAt + 6) = 0xFF.toByte // height
    bomb(sofAt + 7) = 0x7F.toByte; bomb(sofAt + 8) = 0xFF.toByte // width
    assert(Jpeg.decodeJpeg(bomb).isEmpty)
    // random garbage (seeded), foreign formats, null
    val rnd = new scala.util.Random(12021)
    (0 until 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      Jpeg.decodeJpeg(junk)
      // adversarial: garbage that STARTS like a JPEG
      Jpeg.decodeJpeg(Array[Byte](0xFF.toByte, 0xD8.toByte) ++ junk)
    }
    assert(Jpeg.decodeJpeg(null).isEmpty)
    assert(Jpeg.decodeJpeg("not a jpeg at all, definitely".getBytes).isEmpty)
    assert(Jpeg.decodeJpeg(MultimodalOps.encodePngConst(4, 4, 1, 2, 3)).isEmpty)
    // a BASELINE stream with its SOF marker flipped to SOF2 is a
    // MALFORMED progressive stream (its single scan claims the full
    // spectral band 0..63, which Annex G forbids) — rejected, while real
    // progressive streams decode (ProgressiveJpegSpec)
    val prog = gray.clone(); prog(sofAt + 1) = 0xC2.toByte
    assert(Jpeg.decodeJpeg(prog).isEmpty)
  }

  test("decodeBytes dispatches JPEG to the image feature path, not the fallback") {
    val f = MultimodalOps.decodeBytes(Jpeg.encodeJpegGrayBlocks(2, 1, (bx, _) => 100 + bx * 20))
    assert(f(0) == 16f && f(1) == 8f, "dims did not come from the real decode")
    // mean of two flat blocks at 100 and 120 = 110
    assert(math.abs(f(2) * 255f - 110f) < 1e-3 && f(2) == f(3) && f(3) == f(4))
  }

  test("real encoder: unit quantization round-trips arbitrary images within ±3") {
    import org.scalacheck.{Gen, Prop}
    // quant all-1s: the only loss is DCT coefficient rounding (≤0.5 per
    // bin, worst-case superposition ~±3 per pixel) plus the IDCT's ±1 —
    // pinned as max ≤ 3 AND mean ≤ 1 on ARBITRARY content, not just flat
    // blocks
    val unit = Array.fill(64)(1)
    val prop = Prop.forAll(
      Gen.chooseNum(1, 20), Gen.chooseNum(1, 20), Gen.long) { (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      Jpeg.decodeJpeg(Jpeg.encodeJpegGray(w, h, px, unit)).exists { d =>
        val errs = (0 until w * h)
          .map(i => math.abs((d.pixels(i * 3) & 0xFF) - (px(i) & 0xFF)))
        d.width == w && d.height == h &&
          errs.max <= 3 && errs.sum.toDouble / errs.size <= 1.0
      }
    }
    check(prop)
  }

  test("real encoder: quality-90 keeps a smooth gradient within quantization error") {
    val w = 37; val h = 29 // non-multiples: edge-replicate padding on both axes
    val px = Array.tabulate(w * h)(i => (40 + (i % w) * 3 + (i / w) * 2).toByte)
    val d = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(w, h, px, Jpeg.quantForQuality(90))).get
    assert(d.width == w && d.height == h)
    var se = 0.0
    var maxErr = 0
    (0 until w * h).foreach { i =>
      val e = math.abs((d.pixels(i * 3) & 0xFF) - (px(i) & 0xFF))
      maxErr = math.max(maxErr, e)
      se += e.toDouble * e
    }
    val psnr = 10 * math.log10(255.0 * 255.0 / math.max(se / (w * h), 1e-12))
    assert(maxErr <= 8 && psnr > 35, s"maxErr=$maxErr psnr=$psnr")
  }

  test("quantForQuality scales K.1 sanely across the knob") {
    val q50 = Jpeg.quantForQuality(50)
    assert(q50(0) == 16, "quality 50 must reproduce the base table")
    val q90 = Jpeg.quantForQuality(90)
    val q10 = Jpeg.quantForQuality(10)
    assert((0 until 64).forall(i => q90(i) <= q50(i) && q50(i) <= q10(i)))
    assert(Jpeg.quantForQuality(100).forall(_ == 1))
    assert(Jpeg.quantForQuality(1).forall(q => q >= 1 && q <= 255))
  }

  test("q85 transcode replay: dims double, sums quadruple vs q83") {
    val q83 = MultimodalOps.q83JpegDecode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rows = MultimodalOps.q85JpegTranscode(spark, sf).collect()
    assert(rows.nonEmpty && rows.length == q83.size)
    rows.foreach { r =>
      val (w, h, s) = q83(r.getLong(0))
      assert(r.getLong(1) == 2 * w && r.getLong(2) == 2 * h && r.getLong(3) == 4 * s,
        s"asset ${r.getLong(0)} transcode drifted")
    }
  }

  test("q83 rows all take the real JPEG decode branch, never the fallback") {
    val rows = MultimodalOps.q83JpegDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val wB = (2 + id % 4).toInt; val hB = (2 + (id * 3) % 4).toInt
      assert(r.getLong(1) == wB * 8, s"asset $id width")
      assert(r.getLong(2) == hB * 8, s"asset $id height")
      val expect = 64L * (for (by <- 0 until hB; bx <- 0 until wB)
        yield (id * 7 + 13L * bx + 31L * by) % 256).sum
      assert(r.getLong(3) == expect, s"asset $id sum_gray")
    }
  }

  test("q84 rows replay the full color path driver-side") {
    val rows = MultimodalOps.q84JpegColorDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    def clamp(v: Long): Long = math.max(0, math.min(255, v))
    rows.foreach { r =>
      val id = r.getLong(0)
      val wM = (1 + id % 3).toInt; val hM = (1 + (id * 5) % 3).toInt
      assert(r.getLong(1) == wM * 16 && r.getLong(2) == hM * 16, s"asset $id dims")
      var sr = 0L; var sg = 0L; var sb = 0L
      for (my <- 0 until hM; mx <- 0 until wM) {
        val y = (id * 3 + 17L * mx + 29L * my) % 256
        val cb = (id * 5 + 23L * mx + 7L * my) % 256
        val cr = (id * 11 + 19L * mx + 37L * my) % 256
        sr += clamp(y + Math.floorDiv(91881L * (cr - 128) + 32768, 65536L))
        sg += clamp(y + Math.floorDiv(-22554L * (cb - 128) - 46802L * (cr - 128) + 32768, 65536L))
        sb += clamp(y + Math.floorDiv(116130L * (cb - 128) + 32768, 65536L))
      }
      assert(r.getLong(3) == 256 * sb, s"asset $id sum_b")
      assert(r.getLong(4) == 256 * sg, s"asset $id sum_g")
      assert(r.getLong(5) == 256 * sr, s"asset $id sum_r")
    }
  }
}
