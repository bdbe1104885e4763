package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FOREIGN-stream conformance: the fixtures under
  * src/test/resources/vp8/ were produced by the reference encoder
  * (system libwebp via tools/gen_vp8_fixtures.py) and their expected
  * YUV planes are the reference DECODER's own output
  * (WebPDecodeYUV). Matching them byte-exactly proves the RFC 6386
  * tables and algorithms against an independent implementation — the
  * opposite of self-consistency. The set spans: flat / gradient /
  * noise / block / sharp-edge content, qualities 40–90, segmentation
  * on and off, loop-filter levels 4–55, B_PRED-heavy frames, odd
  * (non-multiple-of-16) dimensions, multi-MB-row frames, and a
  * FOUR-token-partition stream (fix9, via the advanced encoder API at
  * method 0 — the token-buffer methods always emit one partition).
  */
class Vp8ConformanceSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream("/vp8/" + name)
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val manifest: Seq[(String, Int, Int)] =
    new String(resource("manifest.txt"), "UTF-8").split("\n").toSeq
      .filter(_.nonEmpty)
      .map { l => val p = l.split(","); (p(0), p(1).toInt, p(2).toInt) }

  test("manifest covers the feature matrix") {
    assert(manifest.size >= 11)
  }

  test("hostile fixtures: truncations and byte flips of REAL streams " +
    "never throw — decode or dead-letter only") {
    val webp = resource("fix9_multipart96x80_q60.webp")
    val len = (webp(16) & 0xff) | ((webp(17) & 0xff) << 8) |
      ((webp(18) & 0xff) << 16) | ((webp(19) & 0xff) << 24)
    for (cut <- 0 to len by 37)
      Vp8.decodeVp8(webp, 20, cut) // must not throw
    val rnd = new scala.util.Random(16)
    for (_ <- 0 until 300) {
      val m = webp.clone()
      m(20 + rnd.nextInt(len)) = rnd.nextInt(256).toByte
      Vp8.decodeVp8(m, 20, len) // must not throw
    }
  }

  for ((name, w, h) <- manifest) {
    test(s"$name decodes byte-exactly to the reference decoder's YUV") {
      val webp = resource(name + ".webp")
      val yuv = resource(name + ".yuv")
      val frame = {
        // unwrap RIFF: VP8 chunk payload starts at byte 20
        assert(new String(webp.slice(12, 16), "ASCII") == "VP8 ", name)
        val len = (webp(16) & 0xff) | ((webp(17) & 0xff) << 8) |
          ((webp(18) & 0xff) << 16) | ((webp(19) & 0xff) << 24)
        Vp8.decodeVp8(webp, 20, len)
      }
      assert(frame.isDefined, s"$name dead-lettered")
      val f = frame.get
      assert(f.width == w && f.height == h, s"$name dims")
      val uw = (w + 1) / 2; val uh = (h + 1) / 2
      assert(yuv.length == w * h + 2 * uw * uh, s"$name fixture size")
      var bad = 0
      var firstBad = ""
      for (i <- 0 until w * h if bad < 5) {
        if (f.y(i) != (yuv(i) & 0xff)) {
          bad += 1
          if (firstBad.isEmpty)
            firstBad = s"Y($i=${i % w},${i / w}): got ${f.y(i)} want ${yuv(i) & 0xff}"
        }
      }
      for (i <- 0 until uw * uh if bad < 5) {
        if (f.u(i) != (yuv(w * h + i) & 0xff)) {
          bad += 1
          if (firstBad.isEmpty) firstBad = s"U($i): got ${f.u(i)} want ${yuv(w * h + i) & 0xff}"
        }
        if (f.v(i) != (yuv(w * h + uw * uh + i) & 0xff)) {
          bad += 1
          if (firstBad.isEmpty) firstBad = s"V($i): got ${f.v(i)} want ${yuv(w * h + uw * uh + i) & 0xff}"
        }
      }
      assert(bad == 0, s"$name: $firstBad (+${bad - 1} more sampled)")
    }
  }
}
