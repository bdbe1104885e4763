package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Multi-frame + interlaced GIF (round-13 brief item 5): frame
  * enumeration with disposal/transparency compositing and the 4-pass row
  * interlace — the canvas-state semantics q114's full-canvas oracle can't
  * replay in SQL, pinned here on hand-built streams.
  */
class GifAnimSpec extends AnyFunSuite {

  private val pal = MultimodalOps.gifArithmeticPalette

  // palette entry i decodes to BGR (13i mod 256, 7i mod 256, i)
  private def bgr(i: Int): (Int, Int, Int) = ((13 * i) % 256, (7 * i) % 256, i)

  private def px(img: MultimodalOps.BmpImage, x: Int, y: Int): (Int, Int, Int) = {
    val o = (y * img.width + x) * 3
    (img.pixels(o) & 0xFF, img.pixels(o + 1) & 0xFF, img.pixels(o + 2) & 0xFF)
  }

  test("interlaced frame round-trips: stored pass order de-passes to the original") {
    for (h <- Seq(1, 2, 4, 5, 8, 9, 16, 23)) {
      val w = 7
      val idx = Array.tabulate(w * h)(i => ((i * 3 + h) % 256).toByte)
      val straightGif = Gif.encodeGif89(w, h, pal, 0,
        Seq(Gif.GifFrameData(0, 0, w, h, idx)))
      val interGif = Gif.encodeGif89(w, h, pal, 0,
        Seq(Gif.GifFrameData(0, 0, w, h, idx, interlaced = true)))
      val a = Gif.decodeGif(straightGif).get
      val b = Gif.decodeGif(interGif).get
      assert(a.pixels.sameElements(b.pixels), s"h=$h")
    }
  }

  test("interlace row map is the spec's pass order") {
    assert(Gif.interlaceRowMap(10).toSeq == Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
    assert(Gif.interlaceRowMap(1).toSeq == Seq(0))
    assert(Gif.interlaceRowMap(5).toSeq == Seq(0, 4, 2, 1, 3))
  }

  test("multi-frame enumeration: every frame composites, delays surface") {
    val frames = (0 until 3).map { f =>
      Gif.GifFrameData(0, 0, 4, 4,
        Array.fill(16)((10 * (f + 1)).toByte), delayCs = 5 + f)
    }
    val got = Gif.decodeGifFrames(Gif.encodeGif89(4, 4, pal, 0, frames)).get
    assert(got.length == 3)
    for ((fr, f) <- got.zipWithIndex) {
      assert(fr.delayCs == 5 + f)
      assert(px(fr.image, 2, 2) == bgr(10 * (f + 1)), s"frame $f")
    }
  }

  test("sub-rect frames draw at (left, top); untouched canvas keeps the background") {
    // frame 1: full canvas of index 1; frame 2: a 2x2 patch of index 9 at (3,1)
    val frames = Seq(
      Gif.GifFrameData(0, 0, 6, 4, Array.fill(24)(1.toByte)),
      Gif.GifFrameData(3, 1, 2, 2, Array.fill(4)(9.toByte)))
    val got = Gif.decodeGifFrames(Gif.encodeGif89(6, 4, pal, 0, frames)).get
    assert(got.length == 2)
    val f2 = got(1).image
    assert(px(f2, 3, 1) == bgr(9) && px(f2, 4, 2) == bgr(9))
    assert(px(f2, 0, 0) == bgr(1) && px(f2, 2, 1) == bgr(1) && px(f2, 5, 3) == bgr(1))
  }

  test("transparent pixels leave the previous canvas visible") {
    // frame 2 overwrites the full canvas with index 7 EXCEPT transparent
    // index 0 in a checkerboard — those pixels keep frame 1's content
    val check = Array.tabulate(16)(i =>
      (if ((i % 4 + i / 4) % 2 == 0) 7 else 0).toByte)
    val frames = Seq(
      Gif.GifFrameData(0, 0, 4, 4, Array.fill(16)(3.toByte)),
      Gif.GifFrameData(0, 0, 4, 4, check, transIdx = 0))
    val got = Gif.decodeGifFrames(Gif.encodeGif89(4, 4, pal, 0, frames)).get
    val f2 = got(1).image
    for (y <- 0 until 4; x <- 0 until 4)
      assert(px(f2, x, y) == bgr(if ((x + y) % 2 == 0) 7 else 3), s"($x,$y)")
  }

  test("disposal 2 restores the frame rect to the background color") {
    // bg index 5; frame 1 fills the canvas (disposal 2) -> frame 2's
    // canvas starts as background again outside its own patch
    val frames = Seq(
      Gif.GifFrameData(0, 0, 4, 4, Array.fill(16)(2.toByte), disposal = 2),
      Gif.GifFrameData(1, 1, 2, 2, Array.fill(4)(8.toByte)))
    val got = Gif.decodeGifFrames(Gif.encodeGif89(4, 4, pal, 5, frames)).get
    val f1 = got(0).image
    assert(px(f1, 0, 0) == bgr(2)) // frame 1 shows its own fill
    val f2 = got(1).image
    assert(px(f2, 1, 1) == bgr(8) && px(f2, 2, 2) == bgr(8))
    assert(px(f2, 0, 0) == bgr(5) && px(f2, 3, 3) == bgr(5), "rect not restored")
  }

  test("disposal 3 restores the pre-frame canvas") {
    // frame 1: index 4 everywhere; frame 2: index 11 everywhere with
    // disposal 3 -> frame 3's patch draws over frame 1's content again
    val frames = Seq(
      Gif.GifFrameData(0, 0, 4, 4, Array.fill(16)(4.toByte)),
      Gif.GifFrameData(0, 0, 4, 4, Array.fill(16)(11.toByte), disposal = 3),
      Gif.GifFrameData(0, 0, 2, 2, Array.fill(4)(6.toByte)))
    val got = Gif.decodeGifFrames(Gif.encodeGif89(4, 4, pal, 0, frames)).get
    assert(px(got(1).image, 3, 3) == bgr(11))
    val f3 = got(2).image
    assert(px(f3, 0, 0) == bgr(6))
    assert(px(f3, 3, 3) == bgr(4), "previous canvas not restored")
  }

  test("decodeGif returns the first composited frame of an animation") {
    val frames = Seq(
      Gif.GifFrameData(0, 0, 4, 4, Array.fill(16)(1.toByte)),
      Gif.GifFrameData(0, 0, 4, 4, Array.fill(16)(2.toByte)))
    val first = Gif.decodeGif(Gif.encodeGif89(4, 4, pal, 0, frames)).get
    assert(px(first, 0, 0) == bgr(1))
  }

  test("off-canvas frames and corruption degrade to None, never throw") {
    val frames = Seq(
      Gif.GifFrameData(0, 0, 5, 5, Array.tabulate(25)(_.toByte),
        delayCs = 3, interlaced = true),
      Gif.GifFrameData(2, 2, 3, 3, Array.fill(9)(9.toByte), disposal = 2))
    val good = Gif.encodeGif89(5, 5, pal, 0, frames)
    assert(Gif.decodeGifFrames(good).exists(_.length == 2))
    (0 until good.length).foreach { n =>
      Gif.decodeGifFrames(good.take(n)) // Option out, never a throw
      assert(MultimodalOps.decodeBytes(good.take(n)).length == 16)
    }
    (0 until good.length).foreach { i =>
      val c = good.clone(); c(i) = (c(i) ^ 0x5A).toByte
      Gif.decodeGifFrames(c)
      assert(MultimodalOps.decodeBytes(c).length == 16)
    }
    // a frame rect past the logical screen is rejected
    intercept[IllegalArgumentException] {
      Gif.encodeGif89(4, 4, pal, 0,
        Seq(Gif.GifFrameData(2, 2, 3, 3, Array.fill(9)(1.toByte))))
    }
  }

  test("truncated tail after a complete frame still yields that frame") {
    // drop the trailer byte: the walk tolerates a missing 0x3B once at
    // least one frame landed (common crawl artifact)
    val good = Gif.encodeGif89(4, 4, pal, 0,
      Seq(Gif.GifFrameData(0, 0, 4, 4, Array.fill(16)(3.toByte))))
    val noTrailer = good.take(good.length - 1)
    assert(Gif.decodeGifFrames(noTrailer).exists(_.length == 1))
  }
}
