package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** WebP VP8L codec (round-14 brief item 3): encoder↔decoder round trips
  * over literals / subtract-green / LZ77 row copies, hand-crafted
  * conformant streams for the decoder paths the encoder does not emit
  * (color cache, color-indexing with bundling, predictor transform,
  * color transform, meta prefix, close-neighbor distance codes), and
  * corruption fuzz (never throws, error-as-value).
  */
class WebpSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      val o = (y * w + x) * 3
      px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
    }
    px
  }

  private def decodedRgb(img: MultimodalOps.BmpImage): Array[Byte] = {
    val out = new Array[Byte](img.pixels.length)
    var i = 0
    while (i < img.pixels.length / 3) {
      out(i * 3) = img.pixels(i * 3 + 2)     // r
      out(i * 3 + 1) = img.pixels(i * 3 + 1) // g
      out(i * 3 + 2) = img.pixels(i * 3)     // b
      i += 1
    }
    out
  }

  test("round trip: 2-D gradient literals, no transform") {
    val (w, h) = (13, 7)
    val rgb = gradient(w, h, (x, y) => ((x * 11 + y * 3) % 256, (x * 5 + y * 7) % 256, (x + y * 13) % 256))
    val enc = Webp.encodeWebpLossless(w, h, rgb, subtractGreen = false, lz77Rows = false)
    val img = Webp.decodeWebp(enc).get
    assert(img.width == w && img.height == h)
    assert(decodedRgb(img).sameElements(rgb))
  }

  test("round trip: subtract-green + LZ77 row copies (column gradient)") {
    val (w, h) = (24, 17)
    val rgb = gradient(w, h, (x, _) => ((x * 9 + 1) % 256, (x * 2 + 5) % 256, (255 - x * 7 % 256) % 256))
    val enc = Webp.encodeWebpLossless(w, h, rgb)
    val encLit = Webp.encodeWebpLossless(w, h, rgb, lz77Rows = false)
    assert(enc.length < encLit.length, "row copies should compress")
    assert(decodedRgb(Webp.decodeWebp(enc).get).sameElements(rgb))
    assert(decodedRgb(Webp.decodeWebp(encLit).get).sameElements(rgb))
  }

  test("round trip: constant color (simple codes), 1x1, and single-row edges") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1), (5, 5))) {
      val rgb = gradient(w, h, (_, _) => (7, 200, 33))
      val img = Webp.decodeWebp(Webp.encodeWebpLossless(w, h, rgb)).get
      assert(img.width == w && img.height == h)
      assert(decodedRgb(img).sameElements(rgb))
    }
  }

  // -- hand-crafted conformant streams -------------------------------

  /** Wrap a VP8L payload in the RIFF framing. */
  private def riff(payload: Array[Byte]): Array[Byte] = {
    val chunkLen = payload.length
    val riffLen = 4 + 8 + chunkLen + (chunkLen & 1)
    val out = new Array[Byte](8 + riffLen)
    def put4(o: Int, s: String): Unit = (0 until 4).foreach(k => out(o + k) = s.charAt(k).toByte)
    def le32(o: Int, v: Int): Unit = (0 until 4).foreach(k => out(o + k) = ((v >> (8 * k)) & 0xff).toByte)
    put4(0, "RIFF"); le32(4, riffLen); put4(8, "WEBP"); put4(12, "VP8L"); le32(16, chunkLen)
    System.arraycopy(payload, 0, out, 20, chunkLen)
    out
  }

  private def header(bw: Webp.BitWriter, w: Int, h: Int): Unit = {
    bw.writeBits(0x2f, 8)
    bw.writeBits(w - 1, 14); bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1); bw.writeBits(0, 3)
  }

  private def emit(bw: Webp.BitWriter, t: Array[(Int, Int)], s: Int): Unit = {
    val (c, l) = t(s); bw.writeCodeMsb(c, l)
  }

  /** Write the five-code group and return the emit tables. */
  private def group(
      bw: Webp.BitWriter, cacheSize: Int, green: Array[Int], red: Array[Int],
      blue: Array[Int], alpha: Array[Int], dist: Array[Int]) = (
    Webp.writePrefixCode(bw, green, 256 + 24 + cacheSize),
    Webp.writePrefixCode(bw, red, 256),
    Webp.writePrefixCode(bw, blue, 256),
    Webp.writePrefixCode(bw, alpha, 256),
    Webp.writePrefixCode(bw, dist, 40))

  test("color cache: hits replay inserted pixels (hand-crafted stream)") {
    // 1×4: literal A, literal B, cache A (idx 2), cache B (idx 0) —
    // indexes precomputed from the spec hash (0x1e35a7bd·argb) >>> 30
    val bw = new Webp.BitWriter
    header(bw, 4, 1)
    bw.writeBits(0, 1)              // no transforms
    bw.writeBits(1, 1); bw.writeBits(2, 4) // cache bits = 2
    bw.writeBits(0, 1)              // no meta
    val (g, r, b, a, _) = group(bw, 4,
      Array(20, 50, 280, 282), Array(10, 40), Array(30, 60), Array(255), Array(0))
    emit(bw, g, 20); emit(bw, r, 10); emit(bw, b, 30); emit(bw, a, 255) // A
    emit(bw, g, 50); emit(bw, r, 40); emit(bw, b, 60); emit(bw, a, 255) // B
    emit(bw, g, 282) // cache idx 2 -> A
    emit(bw, g, 280) // cache idx 0 -> B
    val img = Webp.decodeWebp(riff(bw.bytes)).get
    assert(img.width == 4 && img.height == 1)
    assert(decodedRgb(img).sameElements(Array[Byte](
      10, 20, 30, 40, 50, 60, 10, 20, 30, 40, 50, 60)))
  }

  test("close-neighbor distance code 1 == plain distance w (hand-crafted)") {
    // 3×2: row 0 literals, row 1 = copy(len 3, map code 1 = (0,1) -> w)
    val bw = new Webp.BitWriter
    header(bw, 3, 2)
    bw.writeBits(0, 1); bw.writeBits(0, 1); bw.writeBits(0, 1)
    val (lenSym, lenEb, lenEv) = Webp.lz77Sym(3)
    val (g, r, b, a, d) = group(bw, 0,
      Array(1, 2, 3, 256 + lenSym), Array(9), Array(8), Array(255), Array(0))
    for (gv <- Seq(1, 2, 3)) { emit(bw, g, gv); emit(bw, r, 9); emit(bw, b, 8); emit(bw, a, 255) }
    emit(bw, g, 256 + lenSym); bw.writeBits(lenEv, lenEb)
    emit(bw, d, 0) // dist prefix value 1 -> map entry (0,1) -> dist = w
    val img = Webp.decodeWebp(riff(bw.bytes)).get
    val rgb = decodedRgb(img)
    assert(rgb.slice(0, 9).sameElements(rgb.slice(9, 18)), "row 1 must copy row 0")
    assert(rgb.slice(0, 9).sameElements(Array[Byte](9, 1, 8, 9, 2, 8, 9, 3, 8)))
  }

  test("color indexing with bundling: 2-color palette packs 8 px/byte (hand-crafted)") {
    // 2×2, palette [red, blue]; packed width 1, indices in green bits
    val bw = new Webp.BitWriter
    header(bw, 2, 2)
    bw.writeBits(1, 1); bw.writeBits(3, 2) // transform: color indexing
    bw.writeBits(1, 8)                     // table size - 1 = 1
    // palette image (2×1): entry0 = red raw, entry1 = delta to blue:
    // (a 0, r (0-255)&255=1, g 0, b 255)
    bw.writeBits(0, 1) // palette image: no cache
    val (pg, pr, pb, pa, _) = group(bw, 0,
      Array(0), Array(1, 255), Array(0, 255), Array(0, 255), Array(0))
    emit(bw, pg, 0); emit(bw, pr, 255); emit(bw, pb, 0); emit(bw, pa, 255)
    emit(bw, pg, 0); emit(bw, pr, 1); emit(bw, pb, 255); emit(bw, pa, 0)
    bw.writeBits(0, 1) // end of transforms
    // main packed image (1×2): green bytes 0b10, 0b11
    bw.writeBits(0, 1); bw.writeBits(0, 1) // no cache, no meta
    val (g, r, b, a, _) = group(bw, 0, Array(2, 3), Array(0), Array(0), Array(0), Array(0))
    emit(bw, g, 2); emit(bw, r, 0); emit(bw, b, 0); emit(bw, a, 0)
    emit(bw, g, 3); emit(bw, r, 0); emit(bw, b, 0); emit(bw, a, 0)
    val img = Webp.decodeWebp(riff(bw.bytes)).get
    assert(img.width == 2 && img.height == 2)
    assert(decodedRgb(img).sameElements(Array[Byte](
      255.toByte, 0, 0, 0, 0, 255.toByte,    // red, blue
      0, 0, 255.toByte, 0, 0, 255.toByte)))  // blue, blue
  }

  test("predictor transform mode Top reconstructs (hand-crafted)") {
    // 2×2, one 512-px block, mode 2 (Top); residuals derived by hand:
    // (0,0) vs BLACK, (1,0) vs Left, (0,1) vs Top, (1,1) vs Top
    val bw = new Webp.BitWriter
    header(bw, 2, 2)
    bw.writeBits(1, 1); bw.writeBits(0, 2) // predictor transform
    bw.writeBits(7, 3)                     // size_bits = 9
    bw.writeBits(0, 1)                     // transform image: no cache
    val (tg, tr, tb, ta, _) = group(bw, 0, Array(2), Array(0), Array(0), Array(0), Array(0))
    emit(bw, tg, 2); emit(bw, tr, 0); emit(bw, tb, 0); emit(bw, ta, 0)
    bw.writeBits(0, 1) // end of transforms
    bw.writeBits(0, 1); bw.writeBits(0, 1)
    val (g, r, b, a, _) = group(bw, 0,
      Array(1, 2, 20), Array(1, 2, 10), Array(1, 2, 30), Array(0), Array(0))
    def lit(av: Int, rv: Int, gv: Int, bv: Int): Unit = {
      emit(bw, g, gv); emit(bw, r, rv); emit(bw, b, bv); emit(bw, a, av)
    }
    lit(0, 10, 20, 30) // (0,0): orig (255,10,20,30) minus black
    lit(0, 2, 2, 2)    // (1,0): orig (255,12,22,32) minus left
    lit(0, 1, 1, 1)    // (0,1): orig (255,11,21,31) minus top
    lit(0, 1, 1, 1)    // (1,1): orig (255,13,23,33) minus top (1,0)
    val img = Webp.decodeWebp(riff(bw.bytes)).get
    assert(decodedRgb(img).sameElements(Array[Byte](
      10, 20, 30, 12, 22, 32, 11, 21, 31, 13, 23, 33)))
  }

  test("color transform inverse: signed multipliers, red feeds blue (hand-crafted)") {
    // 2×1, one cte block: g2r=64, g2b=0, r2b=64; expected values hand-
    // derived with the signed (t·c)>>5 delta algebra
    val bw = new Webp.BitWriter
    header(bw, 2, 1)
    bw.writeBits(1, 1); bw.writeBits(1, 2) // color transform
    bw.writeBits(0, 3)                     // size_bits = 2
    bw.writeBits(0, 1)
    // cte pixel: argb(a, r=r2b, g=g2b, b=g2r) = (0, 64, 0, 64)
    val (tg, tr, tb, ta, _) = group(bw, 0, Array(0), Array(64), Array(64), Array(0), Array(0))
    emit(bw, tg, 0); emit(bw, tr, 64); emit(bw, tb, 64); emit(bw, ta, 0)
    bw.writeBits(0, 1)
    bw.writeBits(0, 1); bw.writeBits(0, 1)
    val (g, r, b, a, _) = group(bw, 0,
      Array(20, 130), Array(10, 60), Array(5, 80), Array(255), Array(0))
    emit(bw, g, 20); emit(bw, r, 60); emit(bw, b, 80); emit(bw, a, 255)
    emit(bw, g, 130); emit(bw, r, 10); emit(bw, b, 5); emit(bw, a, 255)
    val img = Webp.decodeWebp(riff(bw.bytes)).get
    val rgb = decodedRgb(img)
    // pixel A: r = 60 + (64·20)>>5 = 100; b = 80 + (64·100₈ₛ)>>5 = 24 (mod 256)
    // pixel B: r = 10 + (64·(−126))>>5 = 10 − 252 ≡ 14; b = 5 + (64·14)>>5 = 33
    assert(rgb.sameElements(Array[Byte](
      100, 20, 24, 14, 130.toByte, 33)),
      s"got ${rgb.map(_ & 0xff).mkString(",")}")
  }

  test("meta prefix partitioning reads the entropy image (hand-crafted degenerate)") {
    val bw = new Webp.BitWriter
    header(bw, 2, 2)
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(0, 1) // no cache
    bw.writeBits(1, 1); bw.writeBits(0, 3) // meta, sb = 2 -> 1×1 meta image
    bw.writeBits(0, 1) // meta image: no cache
    val (mg, mr, mb, ma, _) = group(bw, 0, Array(0), Array(0), Array(0), Array(0), Array(0))
    emit(bw, mg, 0); emit(bw, mr, 0); emit(bw, mb, 0); emit(bw, ma, 0) // group 0
    val (g, r, b, a, _) = group(bw, 0, Array(5, 6, 7, 8), Array(1), Array(2), Array(255), Array(0))
    for (gv <- Seq(5, 6, 7, 8)) { emit(bw, g, gv); emit(bw, r, 1); emit(bw, b, 2); emit(bw, a, 255) }
    val img = Webp.decodeWebp(riff(bw.bytes)).get
    assert(decodedRgb(img).sameElements(Array[Byte](1, 5, 2, 1, 6, 2, 1, 7, 2, 1, 8, 2)))
  }

  // -- hostility ------------------------------------------------------

  test("corruption fuzz: truncations and byte flips never throw") {
    val rgb = gradient(16, 12, (x, y) => ((x * 3 + y) % 256, (x + y * 5) % 256, (x * 7) % 256))
    val enc = Webp.encodeWebpLossless(16, 12, rgb)
    for (cut <- 0 until enc.length) {
      Webp.decodeWebp(enc.take(cut)) // must not throw
    }
    for (i <- enc.indices) {
      val m = enc.clone(); m(i) = (m(i) ^ 0x55).toByte
      Webp.decodeWebp(m) // must not throw; None or some image, never an exception
    }
    // forged huge header must not allocate
    val big = enc.clone()
    // width/height live after the 0x2f byte inside VP8L payload at off 20
    big(21) = 0xff.toByte; big(22) = 0xff.toByte; big(23) = 0xff.toByte
    assert(Webp.decodeWebp(big).isEmpty)
  }

  test("VP8X extended format: metadata chunks are skipped, the VP8L inside decodes") {
    val rgb = gradient(6, 4, (x, y) => (x * 11, y * 17, (x + y) * 13))
    val plain = Webp.encodeWebpLossless(6, 4, rgb)
    // splice a 10-byte VP8X chunk between 'WEBP' and the VP8L chunk and
    // fix up the RIFF size
    val vp8x = "VP8X".getBytes("ISO-8859-1") ++
      Array[Byte](10, 0, 0, 0) ++ new Array[Byte](10)
    val out = new Array[Byte](plain.length + vp8x.length)
    System.arraycopy(plain, 0, out, 0, 12)
    System.arraycopy(vp8x, 0, out, 12, vp8x.length)
    System.arraycopy(plain, 12, out, 12 + vp8x.length, plain.length - 12)
    val riffLen = out.length - 8
    (0 until 4).foreach(k => out(4 + k) = ((riffLen >> (8 * k)) & 0xff).toByte)
    val img = Webp.decodeWebp(out).get
    assert(img.width == 6 && img.height == 4)
    assert(decodedRgb(img).sameElements(rgb))
  }

  test("lossy VP8 decodes (round-15 flip); malformed VP8 and non-WebP RIFF still dead-letter") {
    assert(Webp.decodeWebp("RIFF    WAVEfmt ".getBytes("ISO-8859-1")).isEmpty)
    val vp8 = riff(Array[Byte](1, 2, 3)).clone()
    vp8(15) = ' ' // VP8L -> "VP8 " chunk with garbage payload: malformed -> None
    assert(Webp.decodeWebp(vp8).isEmpty)
    // a REAL lossy key frame now decodes through the container -- the
    // round-14 "lossy dead-letters" gap is closed
    val lossy = Vp8.webpFromVp8(Vp8.encodeVp8Strip(Array(32, -32), Array(false, false)))
    val limg = Webp.decodeWebp(lossy)
    assert(limg.isDefined && limg.get.width == 32 && limg.get.height == 16,
      "lossy VP8 key frame must decode")
    assert(MultimodalOps.decodeImage(lossy).isDefined)
    // the feature dispatch now images a webp payload instead of falling
    // back to the byte histogram (the round-13 dead-letter gap closed)
    val rgb = gradient(8, 8, (x, y) => (x * 30 % 256, y * 30 % 256, 128))
    val enc = Webp.encodeWebpLossless(8, 8, rgb)
    val feats = MultimodalOps.decodeBytes(enc)
    assert(math.round(feats(0)) == 8 && math.round(feats(1)) == 8,
      s"webp payload fell back to histogram features: ${feats.take(4).mkString(",")}")
    // …and lands in the cross-container normal form
    assert(MultimodalOps.decodeImage(enc).isDefined)
  }
}
