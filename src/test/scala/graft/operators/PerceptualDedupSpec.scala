package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Decode-normalized dedup (q87) and perceptual dHash (q88): the image
  * counterparts of exact dedup and SimHash — byte-blind, content-aware.
  */
class PerceptualDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q87 pairs every cross-container twin and nothing else") {
    import spark.implicits._
    val rows = MultimodalOps.q87CrossContainerDedup(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, s"expected $nDocs duplicate groups, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) == r.getLong(0) + 1 &&
        r.getLong(2) == 2, s"group $r is not a planted PNG/BMP twin")
    }
  }

  test("decoded-pixel digest: container-blind, content- and dims-sensitive") {
    val w = 6; val h = 4
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 31 + 5) & 0xFF).toByte)
    val bgr = rgb.grouped(3).flatMap(t => Seq(t(2), t(1), t(0))).toArray
    val viaPng = MultimodalOps.decodePng(MultimodalOps.encodePng(w, h, rgb)).get
    val viaBmp = MultimodalOps.decodeBmp(MultimodalOps.encodeBmp(w, h, bgr)).get
    val d1 = MultimodalOps.decodedPixelDigest(viaPng)
    val d2 = MultimodalOps.decodedPixelDigest(viaBmp)
    assert(d1.sameElements(d2), "same pixels, different containers must match")
    // one-pixel change breaks it
    val mut = viaBmp.copy(pixels = viaBmp.pixels.clone())
    mut.pixels(7) = (mut.pixels(7) ^ 1).toByte
    assert(!MultimodalOps.decodedPixelDigest(mut).sameElements(d1))
    // same bytes under transposed dims breaks it (dims are in the digest)
    val t1 = MultimodalOps.BmpImage(2, 3, 24, Array.fill[Byte](18)(9))
    val t2 = MultimodalOps.BmpImage(3, 2, 24, Array.fill[Byte](18)(9))
    assert(!MultimodalOps.decodedPixelDigest(t1).sameElements(
      MultimodalOps.decodedPixelDigest(t2)))
  }

  test("dHash survives lossy re-encoding; distinguishes different content") {
    val w = 36; val h = 24
    // smooth gradient with grid-step contrast ~20 gray levels — far above
    // quality-90 quantization error, the regime dHash is built for
    val gray = Array.tabulate(w * h)(i => (10 + (i % w) * 5 + (i / w) * 2).toByte)
    def bmpOf(px: Array[Byte]): MultimodalOps.BmpImage = {
      val bgr = new Array[Byte](px.length * 3)
      px.indices.foreach { i =>
        bgr(i * 3) = px(i); bgr(i * 3 + 1) = px(i); bgr(i * 3 + 2) = px(i)
      }
      MultimodalOps.decodeBmp(MultimodalOps.encodeBmp(w, h, bgr)).get
    }
    val original = bmpOf(gray)
    val jpeg = Jpeg.decodeJpeg(
      Jpeg.encodeJpegGray(w, h, gray, Jpeg.quantForQuality(90))).get
    assert(MultimodalOps.dHash64(original) == MultimodalOps.dHash64(jpeg),
      "a quality-90 JPEG copy must keep its perceptual hash")
    val reversed = bmpOf(gray.reverse)
    assert(MultimodalOps.dHash64(original) != MultimodalOps.dHash64(reversed),
      "opposite gradients must not collide")
  }

  test("q88 hash values replay driver-side bit for bit") {
    val rows = MultimodalOps.q88ImageDhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = 8 + id % 16
      val h = 8 + (id * 3) % 16
      def g(sx: Long, sy: Long): Long = (id * 7 + 3 * sx + 5 * sy) % 256
      var hash = 0L
      for (i <- 0 until 64) {
        val x = i % 8; val y = i / 8
        if (g(x * w / 9, y * h / 8) < g((x + 1) * w / 9, y * h / 8)) hash |= 1L << i
      }
      assert(r.getLong(1) == (hash >>> 32) && r.getLong(2) == (hash & 0xFFFFFFFFL),
        s"asset $id dHash drifted")
    }
  }
}
