package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PNG codec (round-10 brief item 5): real deflate-compressed truecolor
  * PNGs through JDK zlib — round-trip across all five scanline filters,
  * cross-codec agreement with BMP, hostile-input fuzz (the never-throw
  * contract), and the q69 all-real-decode gate.
  */
class PngCodecSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** ScalaCheck under ScalaTest without the scalatestplus bridge (not in
    * the offline artifact cache) — MultimodalOpsSpec's pattern.
    */
  private def check(prop: org.scalacheck.Prop, minSuccessful: Int = 100): Unit = {
    import org.scalacheck.{Test => SCTest}
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("round-trip: arbitrary dims/pixels decode back exactly (all five filters)") {
    import org.scalacheck.{Gen, Prop}
    val prop = Prop.forAll(
      Gen.chooseNum(1, 12), Gen.chooseNum(5, 12), Gen.long) { (w, h, seed) =>
      // h >= 5 guarantees every filter type (row % 5) appears
      val rgb = Array.tabulate(w * h * 3)(i => ((seed + i * 31) & 0xFF).toByte)
      val img = MultimodalOps.decodePng(MultimodalOps.encodePng(w, h, rgb))
      img.exists { d =>
        d.width == w && d.height == h &&
          // decoder emits BGR (the shared BmpImage shape); compare swapped
          (0 until w * h).forall { p =>
            d.pixels(p * 3) == rgb(p * 3 + 2) &&
              d.pixels(p * 3 + 1) == rgb(p * 3 + 1) &&
              d.pixels(p * 3 + 2) == rgb(p * 3)
          }
      }
    }
    check(prop)
  }

  test("grayscale round-trip: arbitrary dims/samples through encodePngGray (all filters)") {
    import org.scalacheck.{Gen, Prop}
    val prop = Prop.forAll(
      Gen.chooseNum(1, 12), Gen.chooseNum(5, 12), Gen.long) { (w, h, seed) =>
      val px = Array.tabulate(w * h)(i => ((seed + i * 53) & 0xFF).toByte)
      val img = MultimodalOps.decodePng(MultimodalOps.encodePngGray(w, h, px))
      img.exists { d =>
        d.width == w && d.height == h &&
          (0 until w * h).forall { p =>
            d.pixels(p * 3) == px(p) && d.pixels(p * 3 + 1) == px(p) &&
              d.pixels(p * 3 + 2) == px(p)
          }
      }
    }
    check(prop)
  }

  test("cross-codec: the same image through PNG and BMP decodes to identical pixels") {
    val w = 7; val h = 6
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) & 0xFF).toByte)
    val bgr = rgb.grouped(3).flatMap(t => Seq(t(2), t(1), t(0))).toArray
    val viaPng = MultimodalOps.decodePng(MultimodalOps.encodePng(w, h, rgb)).get
    val viaBmp = MultimodalOps.decodeBmp(MultimodalOps.encodeBmp(w, h, bgr)).get
    assert(viaPng.width == viaBmp.width && viaPng.height == viaBmp.height)
    assert(viaPng.pixels.sameElements(viaBmp.pixels))
  }

  test("corruption never throws: truncations, bit flips, hostile headers, zip bombs") {
    val good = MultimodalOps.encodePngConst(9, 7, 10, 20, 30)
    // every truncation length — the chunk walk and inflate must both cope
    (0 until good.length).foreach { n =>
      val d = MultimodalOps.decodePng(good.take(n))
      assert(d.isEmpty || n >= good.length - 12,
        s"truncation to $n bytes produced a decode") // IEND-only loss may still decode
      assert(MultimodalOps.decodeBytes(good.take(n)).length == 16)
    }
    // single-byte corruption at every offset: Option out, never a throw
    (0 until good.length).foreach { i =>
      val c = good.clone(); c(i) = (c(i) ^ 0x5A).toByte
      MultimodalOps.decodePng(c) // result unconstrained; must not throw
      assert(MultimodalOps.decodeBytes(c).length == 16)
    }
    // unsupported shapes: palette / alpha / 16-bit / interlaced
    for ((off, v) <- Seq(24 -> 16, 25 -> 3, 25 -> 6, 28 -> 1)) {
      val c = good.clone(); c(off) = v.toByte
      assert(MultimodalOps.decodePng(c).isEmpty, s"ihdr byte $off=$v not rejected")
    }
    // hostile dims: a 1-gigapixel header over a tiny body must be rejected
    // by the size cap BEFORE any allocation
    val bomb = good.clone()
    val bb = java.nio.ByteBuffer.wrap(bomb)
    bb.putInt(16, 40000); bb.putInt(20, 40000)
    assert(MultimodalOps.decodePng(bomb).isEmpty)
    // garbage and foreign formats
    assert(MultimodalOps.decodePng(null).isEmpty)
    assert(MultimodalOps.decodePng("not a png at all, definitely".getBytes).isEmpty)
    assert(MultimodalOps.decodePng(
      MultimodalOps.encodeBmpConst(4, 4, 1, 2, 3)).isEmpty)
  }

  test("grayscale (color type 0) decodes: hand-built PNG, all five filters, gray→BGR") {
    // build a real grayscale PNG by hand (the engine's encoder is
    // truecolor-only): per-row filter = row % 5, samples g(x,y) = a known
    // gradient, zlib via JDK Deflater, CRC32 chunks
    val w = 9; val h = 7
    def g(x: Int, y: Int): Int = (7 * x + 13 * y + 5) % 256
    def pth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte]((w + 1) * h)
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (w + 1)) = ft.toByte
      for (x <- 0 until w) {
        val cur = g(x, y)
        val left = if (x > 0) g(x - 1, y) else 0
        val up = if (y > 0) g(x, y - 1) else 0
        val ul = if (x > 0 && y > 0) g(x - 1, y - 1) else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) / 2)
          case _ => cur - pth(left, up, ul)
        }
        raw(y * (w + 1) + 1 + x) = v.toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    val idat = zOut.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val td = typ.getBytes("US-ASCII") ++ data
      out.write(td)
      val crc = new java.util.zip.CRC32(); crc.update(td)
      out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0))
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    val img = MultimodalOps.decodePng(out.toByteArray)
    assert(img.isDefined, "grayscale PNG did not decode")
    val d = img.get
    assert(d.width == w && d.height == h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert((d.pixels((y * w + x) * 3 + c) & 0xFF) == g(x, y),
        s"pixel ($x,$y) channel $c")
  }

  test("q69 rows all take the real PNG decode branch, never the fallback") {
    val rows = MultimodalOps.q69PngDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 8 + id % 16, s"asset $id width")
      assert(r.getLong(2) == 8 + (id * 3) % 16, s"asset $id height")
      // gradient sums recomputed driver-side
      val w = (8 + id % 16).toInt; val h = (8 + (id * 3) % 16).toInt
      def s(f: Int => Long) = h.toLong * (0 until w).map(x => f(x)).sum
      assert(r.getLong(3) == s(x => (id * 11 + 3L * x) % 256), s"asset $id sum_b")
      assert(r.getLong(4) == s(x => (id * 5 + 2L * x) % 256), s"asset $id sum_g")
      assert(r.getLong(5) == s(x => (id + x) % 256), s"asset $id sum_r")
    }
  }
}
