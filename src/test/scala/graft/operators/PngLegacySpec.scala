package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Legacy PNG forms (Adam7 interlace + palettes): foreign libpng
  * fixtures decode byte-exactly, own encoder round-trips every
  * supported form, and malformed streams stay typed.
  */
class PngLegacySpec extends AnyFunSuite {

  private def resource(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    assert(in != null, s"missing resource $path")
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  private def checkFixture(name: String): Unit = {
    val png = resource(s"/png/fixture_$name.png")
    val raw = resource(s"/png/fixture_$name.raw")
    val w = ((raw(0) & 0xff) << 8) | (raw(1) & 0xff)
    val h = ((raw(2) & 0xff) << 8) | (raw(3) & 0xff)
    val img = MultimodalOps.decodePng(png).getOrElse(fail(s"$name: None"))
    assert(img.width == w && img.height == h, s"$name dims")
    var i = 0
    while (i < w * h) {
      // .raw is RGB; BmpImage is BGR
      assert((img.pixels(i * 3 + 2) & 0xff) == (raw(4 + i * 3) & 0xff) &&
        (img.pixels(i * 3 + 1) & 0xff) == (raw(4 + i * 3 + 1) & 0xff) &&
        (img.pixels(i * 3) & 0xff) == (raw(4 + i * 3 + 2) & 0xff),
        s"$name pixel $i")
      i += 1
    }
  }

  test("11 foreign libpng fixtures decode byte-exactly: Adam7 truecolor " +
    "(ragged + empty-pass dims), Adam7 gray, palette 8/4/2/1-bit, " +
    "Adam7 palette 8/4/1-bit") {
    for (name <- Seq("rgb_adam7_13x7", "rgb_adam7_3x3", "rgb_adam7_32x24",
      "gray_adam7_17x9", "pal8_19x11", "pal4_19x11", "pal2_19x11",
      "pal1_19x11", "pal8_adam7_13x7", "pal4_adam7_13x7", "pal1_adam7_9x5"))
      checkFixture(name)
  }

  test("10 more foreign libpng fixtures: sub-8-bit grayscale (1/2/4-bit, " +
    "levels scaled 255/(2^d-1)), 16-bit gray/truecolor (high-byte " +
    "reduction), and the ALPHA forms (RGBA / gray+alpha, color kept, " +
    "alpha dropped), sequential and Adam7") {
    for (name <- Seq("gray1_21x9", "gray2_21x9", "gray4_21x9",
      "gray4_adam7_13x7", "gray16_19x11", "rgb16_19x11", "rgb16_adam7_13x7",
      "rgba8_19x11", "rgba8_adam7_13x7", "graya8_17x9"))
      checkFixture(name)
  }

  private def checkTrnsFixture(name: String): Unit = {
    val png = resource(s"/png/fixture_$name.png")
    val raw = resource(s"/png/fixture_$name.raw")
    val w = ((raw(0) & 0xff) << 8) | (raw(1) & 0xff)
    val h = ((raw(2) & 0xff) << 8) | (raw(3) & 0xff)
    val (img, alpha) = MultimodalOps.decodePngWithAlpha(png)
      .getOrElse(fail(s"$name: None"))
    assert(img.width == w && img.height == h, s"$name dims")
    assert(alpha != null, s"$name: tRNS must surface an alpha plane")
    var i = 0
    while (i < w * h) {
      assert((img.pixels(i * 3 + 2) & 0xff) == (raw(4 + i * 3) & 0xff) &&
        (img.pixels(i * 3 + 1) & 0xff) == (raw(4 + i * 3 + 1) & 0xff) &&
        (img.pixels(i * 3) & 0xff) == (raw(4 + i * 3 + 2) & 0xff),
        s"$name pixel $i")
      assert((alpha(i) & 0xff) == (raw(4 + w * h * 3 + i) & 0xff),
        s"$name alpha $i")
      i += 1
    }
  }

  test("4 foreign libpng tRNS fixtures decode byte-exactly INCLUDING " +
    "the alpha plane: palette alpha table (4-bit sequential, 8-bit " +
    "Adam7 with a 100-entry table), gray level key, RGB color key") {
    for (name <- Seq("pal4_trns_19x11", "pal8_trns_adam7_13x7",
      "gray8_trns_17x9", "rgb8_trns_13x7"))
      checkTrnsFixture(name)
  }

  test("tRNS edges: alpha-channel forms surface their channel (not " +
    "tRNS); streams without any transparency return a null plane; a " +
    "malformed tRNS shape degrades to opaque, never throws") {
    // no transparency source → null plane
    val plain = MultimodalOps.encodePngExt(9, 5, 0, 8, interlace = false,
      Array.tabulate[Byte](45)(i => (i * 5).toByte))
    assert(MultimodalOps.decodePngWithAlpha(plain).exists(_._2 == null))
    // RGBA: plane comes from the channel
    val rgba = new Array[Byte](6 * 4 * 4)
    for (i <- 0 until 24) {
      rgba(i * 4) = (i * 7).toByte; rgba(i * 4 + 1) = (i * 3).toByte
      rgba(i * 4 + 2) = i.toByte; rgba(i * 4 + 3) = (255 - i * 10).toByte
    }
    val (img6, a6) = MultimodalOps.decodePngWithAlpha(
      MultimodalOps.encodePngExt(6, 4, 6, 8, interlace = false, rgba)).get
    assert(img6.width == 6 && a6 != null)
    for (i <- 0 until 24)
      assert((a6(i) & 0xff) == ((255 - i * 10) & 0xff), s"rgba alpha $i")
    // gray key round-trip through our own writer
    val g = Array.tabulate[Byte](45)(i => (i % 16).toByte)
    val (_, ag) = MultimodalOps.decodePngWithAlpha(
      MultimodalOps.encodePngExt(9, 5, 0, 8, interlace = false, g,
        trns = Array[Byte](0, 7))).get
    for (i <- 0 until 45)
      assert((ag(i) & 0xff) == (if (g(i) == 7) 0 else 255), s"gray key $i")
    // wrong-shaped tRNS (3 bytes on gray) is ignored — opaque result
    val bad = MultimodalOps.encodePngExt(9, 5, 0, 8, interlace = false, g,
      trns = Array[Byte](0, 7, 9))
    assert(MultimodalOps.decodePngWithAlpha(bad).exists(_._2 == null))
  }

  test("own encoder round-trips the alpha forms (RGBA / gray+alpha, " +
    "both interlace modes)") {
    for (il <- Seq(false, true); (w, h) <- Seq((13, 7), (8, 8))) {
      val rgba = Array.tabulate[Byte](w * h * 4)(i => ((i * 29 + 3) % 256).toByte)
      val img = MultimodalOps.decodePng(
        MultimodalOps.encodePngExt(w, h, 6, 8, il, rgba)).get
      for (i <- 0 until w * h) {
        assert((img.pixels(i * 3 + 2) & 0xff) == (rgba(i * 4) & 0xff), s"R $i")
        assert((img.pixels(i * 3 + 1) & 0xff) == (rgba(i * 4 + 1) & 0xff), s"G $i")
        assert((img.pixels(i * 3) & 0xff) == (rgba(i * 4 + 2) & 0xff), s"B $i")
      }
      val ga = Array.tabulate[Byte](w * h * 2)(i => ((i * 71 + 9) % 256).toByte)
      val gImg = MultimodalOps.decodePng(
        MultimodalOps.encodePngExt(w, h, 4, 8, il, ga)).get
      for (i <- 0 until w * h)
        assert((gImg.pixels(i * 3) & 0xff) == (ga(i * 2) & 0xff), s"GA $i")
    }
  }

  test("own encoder round-trips the depth forms: sub-byte gray levels " +
    "and 16-bit big-endian pairs, both interlace modes") {
    for (il <- Seq(false, true); (w, h) <- Seq((13, 7), (16, 4))) {
      for (depth <- Seq(1, 2, 4)) {
        val maxv = (1 << depth) - 1
        val scale = 255 / maxv
        val lvls = Array.tabulate[Byte](w * h)(i => (i % (maxv + 1)).toByte)
        val img = MultimodalOps.decodePng(
          MultimodalOps.encodePngExt(w, h, 0, depth, il, lvls)).get
        for (i <- 0 until w * h)
          assert((img.pixels(i * 3) & 0xff) == (lvls(i) & 0xff) * scale,
            s"gray$depth il=$il px $i")
      }
      // 16-bit gray: decoded value is the high byte
      val g16 = Array.tabulate[Byte](w * h * 2)(i =>
        ((i * 89 + 7) % 256).toByte)
      val gImg = MultimodalOps.decodePng(
        MultimodalOps.encodePngExt(w, h, 0, 16, il, g16)).get
      for (i <- 0 until w * h)
        assert((gImg.pixels(i * 3) & 0xff) == (g16(i * 2) & 0xff),
          s"gray16 il=$il px $i")
      // 16-bit truecolor
      val c16 = Array.tabulate[Byte](w * h * 6)(i =>
        ((i * 53 + 11) % 256).toByte)
      val cImg = MultimodalOps.decodePng(
        MultimodalOps.encodePngExt(w, h, 2, 16, il, c16)).get
      for (i <- 0 until w * h) {
        assert((cImg.pixels(i * 3 + 2) & 0xff) == (c16(i * 6) & 0xff),
          s"rgb16 R il=$il px $i")
        assert((cImg.pixels(i * 3 + 1) & 0xff) == (c16(i * 6 + 2) & 0xff),
          s"rgb16 G il=$il px $i")
        assert((cImg.pixels(i * 3) & 0xff) == (c16(i * 6 + 4) & 0xff),
          s"rgb16 B il=$il px $i")
      }
    }
  }

  test("own encoder round-trips every legacy form (both interlace modes, " +
    "all palette depths, ragged dims)") {
    for (w <- Seq(1, 3, 13, 16); h <- Seq(1, 7, 9); il <- Seq(false, true)) {
      val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 31 + 7) & 0xff).toByte)
      val viaRgb = MultimodalOps.decodePng(
        MultimodalOps.encodePngExt(w, h, 2, 8, il, rgb)).get
      var i = 0
      while (i < w * h) {
        assert((viaRgb.pixels(i * 3 + 2) & 0xff) == (rgb(i * 3) & 0xff) &&
          (viaRgb.pixels(i * 3) & 0xff) == (rgb(i * 3 + 2) & 0xff),
          s"rgb $w x $h il=$il px $i")
        i += 1
      }
      for (depth <- Seq(1, 2, 4, 8)) {
        val nc = 1 << depth
        val plte = Array.tabulate[Byte](nc * 3)(i => ((i * 41 + 3) & 0xff).toByte)
        val idx = Array.tabulate[Byte](w * h)(i => (i % nc).toByte)
        val img = MultimodalOps.decodePng(
          MultimodalOps.encodePngExt(w, h, 3, depth, il, idx, plte)).get
        i = 0
        while (i < w * h) {
          val j = (idx(i) & 0xff) * 3
          assert((img.pixels(i * 3 + 2) & 0xff) == (plte(j) & 0xff) &&
            (img.pixels(i * 3 + 1) & 0xff) == (plte(j + 1) & 0xff) &&
            (img.pixels(i * 3) & 0xff) == (plte(j + 2) & 0xff),
            s"pal$depth $w x $h il=$il px $i")
          i += 1
        }
      }
    }
  }

  test("malformed legacy streams are typed None, never throws: missing " +
    "PLTE, lying index, corruption fuzz over an interlaced fixture") {
    val good = resource("/png/fixture_pal4_adam7_13x7.png")
    // strip PLTE: type 3 without a palette is None
    val noPlte = {
      val s = good.indexOfSlice("PLTE".getBytes("US-ASCII"))
      assert(s > 0)
      val len = ((good(s - 4) & 0xff) << 24) | ((good(s - 3) & 0xff) << 16) |
        ((good(s - 2) & 0xff) << 8) | (good(s - 1) & 0xff)
      good.take(s - 4) ++ good.drop(s + 8 + len)
    }
    assert(MultimodalOps.decodePng(noPlte).isEmpty)
    for (i <- 8 until good.length by 3) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x40).toByte
      MultimodalOps.decodePng(bad) match {
        case Some(img) => assert(img.width > 0 && img.pixels.length > 0)
        case None => ()
      }
    }
    for (cut <- 8 until good.length by 11)
      MultimodalOps.decodePng(good.take(cut)) // must not throw
  }
}
