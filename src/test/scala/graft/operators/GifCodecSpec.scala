package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** GIF/LZW codec: lossless round-trips through the variable-width
  * LSB-first LZW reader (including width growth and the deferred KwK
  * case against a REAL compressing reference encoder written here in the
  * spec), palette mapping, and the PNG-discipline hostile-input fuzz.
  */
class GifCodecSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def check(prop: org.scalacheck.Prop, minSuccessful: Int = 100): Unit = {
    import org.scalacheck.{Test => SCTest}
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("round-trip: arbitrary dims/indices decode back exactly through the palette") {
    import org.scalacheck.{Gen, Prop}
    val pal = MultimodalOps.gifArithmeticPalette
    val prop = Prop.forAll(
      Gen.chooseNum(1, 24), Gen.chooseNum(1, 24), Gen.long) { (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val idx = Array.fill(w * h)(rnd.nextInt(256).toByte)
      Gif.decodeGif(Gif.encodeGif(w, h, pal, idx)).exists { d =>
        d.width == w && d.height == h &&
          (0 until w * h).forall { i =>
            val ci = idx(i) & 0xFF
            (d.pixels(i * 3) & 0xFF) == (ci * 13) % 256 &&
              (d.pixels(i * 3 + 1) & 0xFF) == (ci * 7) % 256 &&
              (d.pixels(i * 3 + 2) & 0xFF) == ci
          }
      }
    }
    check(prop)
  }

  test("decoder handles a REAL compressing LZW stream (width growth + KwK case)") {
    // spec-side reference ENCODER: genuine LZW with dictionary build and
    // width growth — the literal-code corpus writer never grows past 9
    // bits, so this is what exercises the decoder's 10/11/12-bit reads
    // and the deferred code==next case (repetitive input forces KwK)
    def lzwCompress(indices: Array[Byte], minCode: Int): Array[Byte] = {
      val clear = 1 << minCode
      val eoi = clear + 1
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var nBits = 0
      var width = minCode + 1
      def put(c: Int): Unit = {
        acc |= c.toLong << nBits
        nBits += width
        while (nBits >= 8) { out.write((acc & 0xFF).toInt); acc >>>= 8; nBits -= 8 }
      }
      val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
      def resetDict(): Unit = {
        dict.clear()
        (0 until clear).foreach(i => dict(Seq(i.toByte)) = i)
      }
      resetDict()
      var next = eoi + 1
      put(clear)
      var cur = Seq.empty[Byte]
      indices.foreach { b =>
        val ext = cur :+ b
        if (dict.contains(ext)) cur = ext
        else {
          put(dict(cur))
          if (next < 4096) {
            dict(ext) = next; next += 1
            // the decoder's dictionary lags the encoder's by ONE entry
            // (no add on the first post-clear code), so where the decoder
            // widens at next==1<<width the encoder must widen one add
            // later — at next==(1<<width)+1 — for the streams to align
            if (next == (1 << width) + 1 && width < 12) width += 1
          } else { put(clear); resetDict(); next = eoi + 1; width = minCode + 1 }
          cur = Seq(b)
        }
      }
      if (cur.nonEmpty) put(dict(cur))
      put(eoi)
      if (nBits > 0) out.write((acc & 0xFF).toInt)
      out.toByteArray
    }
    def wrapGif(w: Int, h: Int, pal: Array[Byte], lzw: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      le16(w); le16(h); out.write(0xF7); out.write(0); out.write(0)
      out.write(pal, 0, 768)
      // 89a graphic control extension on the walk path (skipped block)
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(Array[Byte](0, 0, 0, 0)); out.write(0)
      out.write(0x2C); le16(0); le16(0); le16(w); le16(h); out.write(0)
      out.write(8)
      var o = 0
      while (o < lzw.length) {
        val n = math.min(255, lzw.length - o)
        out.write(n); out.write(lzw, o, n); o += n
      }
      out.write(0); out.write(0x3B)
      out.toByteArray
    }
    val pal = MultimodalOps.gifArithmeticPalette
    // highly repetitive content → long dictionary chains, KwK hits, and
    // (at this size) growth through 10-bit codes; plus a random tail
    val w = 60; val h = 40
    val rnd = new scala.util.Random(86)
    val idx = Array.tabulate(w * h) { i =>
      if (i < w * h / 2) ((i / 7) % 4).toByte else rnd.nextInt(256).toByte
    }
    val bytes = wrapGif(w, h, pal, lzwCompress(idx, 8))
    val d = Gif.decodeGif(bytes)
    assert(d.isDefined, "compressed GIF did not decode")
    assert(d.get.width == w && d.get.height == h)
    (0 until w * h).foreach { i =>
      val ci = idx(i) & 0xFF
      assert((d.get.pixels(i * 3 + 2) & 0xFF) == ci, s"pixel $i index drifted")
    }
    // pure KwK opener: 'aaaa...' forces code==next immediately
    val kwk = Array.fill(300)(7.toByte)
    val d2 = Gif.decodeGif(wrapGif(30, 10, pal, lzwCompress(kwk, 8)))
    assert(d2.exists(img => img.pixels.grouped(3).forall(p => (p(2) & 0xFF) == 7)))
  }

  test("corruption never throws: truncations, bit flips, hostile headers") {
    val pal = MultimodalOps.gifArithmeticPalette
    val good = Gif.encodeGif(11, 9, pal, Array.tabulate(99)(i => (i * 3).toByte))
    (0 until good.length).foreach { n =>
      Gif.decodeGif(good.take(n))
      assert(MultimodalOps.decodeBytes(good.take(n)).length == 16)
    }
    (0 until good.length).foreach { i =>
      val c = good.clone(); c(i) = (c(i) ^ 0x5A).toByte
      Gif.decodeGif(c)
      assert(MultimodalOps.decodeBytes(c).length == 16)
    }
    // gigapixel dims in the image descriptor: size cap, no allocation
    val bomb = good.clone()
    // image descriptor starts after 13-byte header + 768-byte GCT
    val id0 = 13 + 768
    assert((bomb(id0) & 0xFF) == 0x2C)
    bomb(id0 + 5) = 0xFF.toByte; bomb(id0 + 6) = 0x7F.toByte
    bomb(id0 + 7) = 0xFF.toByte; bomb(id0 + 8) = 0x7F.toByte
    assert(Gif.decodeGif(bomb).isEmpty)
    // flipping the interlace flag on a sequential stream is a VALID
    // interlaced GIF whose stored rows are pass-ordered: the decoder must
    // de-pass them — output rows are exactly the spec's 4-pass
    // permutation of the original (GifAnimSpec pins true interlace
    // round-trips; this pins that the flag is honored, not ignored)
    val inter = good.clone(); inter(id0 + 9) = (inter(id0 + 9) | 0x40).toByte
    val straight = Gif.decodeGif(good).get
    val dePass = Gif.decodeGif(inter).get
    val m = Gif.interlaceRowMap(9)
    for (sr <- 0 until 9; x <- 0 until 11; c <- 0 until 3)
      assert(dePass.pixels((m(sr) * 11 + x) * 3 + c) ==
        straight.pixels((sr * 11 + x) * 3 + c))
    assert(Gif.decodeGif(null).isEmpty)
    assert(Gif.decodeGif("GIF87a but not really a gif".getBytes).isEmpty)
    assert(Gif.decodeGif(MultimodalOps.encodePngConst(4, 4, 1, 2, 3)).isEmpty)
    val rnd = new scala.util.Random(8686)
    (0 until 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      Gif.decodeGif(junk)
      Gif.decodeGif("GIF87a".getBytes("US-ASCII") ++ junk)
    }
  }

  test("q86 rows all take the real GIF decode branch, never the fallback") {
    val rows = MultimodalOps.q86GifDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = (8 + id % 16).toInt; val h = (8 + (id * 3) % 16).toInt
      assert(r.getLong(1) == w && r.getLong(2) == h, s"asset $id dims")
      var sb = 0L; var sg = 0L; var sr = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val gi = (id * 5 + 3L * x + 7L * y) % 256
        sb += (gi * 13) % 256; sg += (gi * 7) % 256; sr += gi
      }
      assert(r.getLong(3) == sb && r.getLong(4) == sg && r.getLong(5) == sr,
        s"asset $id sums")
    }
  }
}
