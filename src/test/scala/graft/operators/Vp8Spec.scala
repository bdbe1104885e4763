package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8 key-frame codec: boolean-coder encode→decode property, iDCT/iWHT
  * DC-exact arithmetic, full strip round trip (modes, skip flags, Y2
  * path, token categories through CAT6), declared dead-letter shapes,
  * and truncation fuzz.
  */
class Vp8Spec extends AnyFunSuite {

  test("bool coder round-trips arbitrary (bit, prob) sequences") {
    val rnd = new scala.util.Random(0xC0DEC)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(2000)
      val bits = Array.fill(n)(rnd.nextInt(2))
      val probs = Array.fill(n)(1 + rnd.nextInt(254))
      val enc = new Vp8.BoolEncoder
      var i = 0
      while (i < n) { enc.bool(bits(i), probs(i)); i += 1 }
      val bytes = enc.bytes
      val dec = new Vp8.BoolDecoder(bytes, 0, bytes.length)
      i = 0
      while (i < n) {
        assert(dec.bool(probs(i)) == bits(i), s"trial $trial bit $i")
        i += 1
      }
      assert(dec.ok)
    }
  }

  test("literals and tree writes round-trip") {
    val enc = new Vp8.BoolEncoder
    enc.literal(0x5a, 8); enc.literal(3, 2); enc.literal(12345, 19)
    val t = Array(-4, 2, 4, 6, -0, -1, -2, -3)
    val p = Array(145, 156, 163, 128)
    for (v <- Seq(0, 1, 2, 3, 4, 2, 0)) enc.treeWrite(t, p, v)
    val bytes = enc.bytes
    val dec = new Vp8.BoolDecoder(bytes, 0, bytes.length)
    assert(dec.literal(8) == 0x5a)
    assert(dec.literal(2) == 3)
    assert(dec.literal(19) == 12345)
    for (v <- Seq(0, 1, 2, 3, 4, 2, 0)) assert(dec.tree(t, p) == v)
  }

  test("iWHT + DC-only iDCT give the exact closed forms the oracle replays") {
    // iwht of DC-only D: all 16 outputs (D+3)>>3
    for (d <- Seq(-896, -112, 0, 112, 896, 7, -3)) {
      val blk = new Array[Int](16); blk(0) = d
      Vp8.iwht4x4(blk)
      assert(blk.forall(_ == ((d + 3) >> 3)), s"iwht($d)")
    }
    // idct of DC-only c: all 16 outputs (c+4)>>3
    for (c <- Seq(-112, -16, 0, 16, 112)) {
      val blk = new Array[Int](16); blk(0) = c
      Vp8.idct4x4(blk)
      assert(blk.forall(_ == ((c + 4) >> 3)), s"idct($c)")
    }
  }

  test("strip round trip: DC-pred chain reconstructs the exact prefix sums") {
    // raw DC values scaled by 16: dequant(qi=0) makes residue exactly
    // 2*raw per MB; skipped MBs contribute 0
    val raw = Array(3, -7, 0, 7, -2, 5)
    val skip = Array(false, false, true, false, false, false)
    val d = raw.map(_ * 16)
    val payload = Vp8.encodeVp8Strip(d, skip)
    val frame = Vp8.decodeVp8(payload, 0, payload.length).get
    assert(frame.width == 96 && frame.height == 16)
    var v = 128
    for (i <- raw.indices) {
      if (!skip(i)) v += 2 * raw(i)
      // whole MB uniform at the prefix-sum value
      for (yy <- 0 until 16; xx <- 0 until 16)
        assert(frame.y(yy * 96 + i * 16 + xx) == v, s"mb $i at ($xx,$yy)")
    }
    // neutral chroma everywhere
    assert(frame.u.forall(_ == 128) && frame.v.forall(_ == 128))
    // and through the WebP container to BGR: grayscale at the Y values
    val webp = Vp8.webpFromVp8(payload)
    val bmp = Webp.decodeWebp(webp).get
    assert(bmp.width == 96 && bmp.height == 16)
    v = 128
    for (i <- raw.indices) {
      if (!skip(i)) v += 2 * raw(i)
      val px = (bmp.pixels(i * 16 * 3) & 0xff, bmp.pixels(i * 16 * 3 + 1) & 0xff,
        bmp.pixels(i * 16 * 3 + 2) & 0xff)
      assert(px == ((v, v, v)), s"mb $i BGR $px != gray $v")
    }
  }

  test("B_PRED strip: TM sub-modes propagate rows, the (3,3) residual " +
    "accumulates exactly (q168's closed form)") {
    val v0 = 128 + 2 * 3
    val ms = Array(2, -4, 0, 4, -1) // subblock-(3,3) residuals of MBs 1..5
    val mbs: Array[Vp8.StripMb] =
      Vp8.DcMb(3 * 16) +: ms.map(m => Vp8.BPredTmMb(2 * m): Vp8.StripMb)
    val payload = Vp8.encodeStrip(mbs)
    val frame = Vp8.decodeVp8(payload, 0, payload.length).get
    assert(frame.width == 96 && frame.height == 16)
    var s = 0
    for (i <- mbs.indices) {
      val sPrev = s
      if (i >= 1) s += ms(i - 1)
      for (yy <- 0 until 16; xx <- 0 until 16) {
        val expect =
          if (i == 0 || yy < 12) v0
          else if (xx < 12) v0 + sPrev
          else v0 + s
        assert(frame.y(yy * 96 + i * 16 + xx) == expect, s"mb $i ($xx,$yy)")
      }
    }
    assert(frame.u.forall(_ == 128) && frame.v.forall(_ == 128))
  }

  test("loop-filtered strip: mb-edge taps move boundary columns by the " +
    "closed-form deltas; a step past the mask is preserved (q169's math)") {
    // raw steps: small (filters), zero (no-op), large at low level
    for (level <- Seq(5, 20, 63)) {
      val raw = Array(0, 4, 0, -7, 7)
      val mbs: Array[Vp8.StripMb] = raw.map(r => Vp8.DcMb(r * 16): Vp8.StripMb)
      val payload = Vp8.encodeStrip(mbs, level)
      val frame = Vp8.decodeVp8(payload, 0, payload.length).get
      val vs = raw.scanLeft(128)((acc, r) => acc + 2 * r).tail
      for (i <- 1 until raw.length) {
        val t = vs(i) - vs(i - 1)
        val masked = 2 * math.abs(t) + math.abs(t) / 2 <= 3 * level + 4
        def d(m: Int) = if (masked) (m * t + 63) >> 7 else 0
        val (a1, a2, a3) = (d(54), d(36), d(18))
        for (yy <- 0 until 16) {
          val base = yy * 80
          assert(frame.y(base + i * 16) == vs(i) - a1, s"L$level mb$i q0 row$yy")
          assert(frame.y(base + i * 16 + 1) == vs(i) - a2)
          assert(frame.y(base + i * 16 + 2) == vs(i) - a3)
          assert(frame.y(base + i * 16 - 1) == vs(i - 1) + a1)
          assert(frame.y(base + i * 16 - 2) == vs(i - 1) + a2)
          assert(frame.y(base + i * 16 - 3) == vs(i - 1) + a3)
          // interior columns untouched
          assert(frame.y(base + i * 16 + 7) == vs(i))
        }
      }
      // chroma flat -> never filtered
      assert(frame.u.forall(_ == 128) && frame.v.forall(_ == 128))
    }
  }

  test("token categories through CAT6 and both signs survive the round trip") {
    // |raw*16| hits literal(0), CAT3 (16..18? -> 16), CAT4 (32,48),
    // CAT5 (64), CAT6 (80..112) bases — the whole extra-bit ladder
    val raw = Array(0, 1, -1, 2, -3, 4, -5, 6, -7, 7)
    val d = raw.map(_ * 16)
    val payload = Vp8.encodeVp8Strip(d, Array.fill(raw.length)(false))
    val frame = Vp8.decodeVp8(payload, 0, payload.length).get
    var v = 128
    for (i <- raw.indices) {
      v += 2 * raw(i)
      assert(frame.y(i * 16) == v, s"mb $i")
    }
  }

  test("declared dead letters: non-key, B_PRED-free corpus, truncation fuzz") {
    val payload = Vp8.encodeVp8Strip(Array(16, -16), Array(false, false))
    // flip the keyframe bit -> interframe -> None
    val inter = payload.clone(); inter(0) = (inter(0) | 1).toByte
    assert(Vp8.decodeVp8(inter, 0, inter.length).isEmpty)
    // corrupt start code
    val badSc = payload.clone(); badSc(3) = 0
    assert(Vp8.decodeVp8(badSc, 0, badSc.length).isEmpty)
    // truncation never throws
    for (cut <- 0 to payload.length) {
      Vp8.decodeVp8(payload.take(cut), 0, cut) // must not throw
    }
    // random byte flips never throw (may decode or dead-letter)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val m = payload.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Vp8.decodeVp8(m, 0, m.length)
    }
  }

  test("lossy WebP now decodes through the container (the flipped dead-letter)") {
    val webp = Vp8.webpFromVp8(Vp8.encodeVp8Strip(Array(48), Array(false)))
    val img = Webp.decodeWebp(webp)
    assert(img.isDefined, "lossy VP8 must no longer dead-letter")
    assert(img.get.width == 16 && img.get.height == 16)
  }
}
