package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** TIFF strip compression: foreign libtiff fixtures decode byte-exactly
  * (LZW across all early-change width bumps, PackBits over run/literal
  * mixes), own encoders round-trip, and malformed strips stay typed.
  */
class TiffCompressionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

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

  test("10 foreign libtiff fixtures decode byte-exactly: LZW random " +
    "(crosses the 9/10/11-bit early-change bumps), LZW runs, PackBits " +
    "runs/random/mixed, LZW + predictor 2 (the writer-default pairing), " +
    "MULTI-STRIP files (offset/length arrays, ragged last band)") {
    for (name <- Seq("lzw_rand_96", "lzw_rand_160", "lzw_runs_64",
      "packbits_runs_64", "packbits_rand_32", "packbits_mixed_51",
      "lzw_pred2_77x33", "lzw_pred2_grad",
      "lzw_multistrip_40x29", "packbits_multistrip_33x10")) {
      val tif = resource(s"/tiff/fixture_$name.tif")
      val raw = resource(s"/tiff/fixture_$name.raw")
      val w = ((raw(0) & 0xff) << 8) | (raw(1) & 0xff)
      val h = ((raw(2) & 0xff) << 8) | (raw(3) & 0xff)
      val (gw, gh, bytes) = TiffOps.decodeGray(tif)
        .getOrElse(fail(s"$name: None"))
      assert(gw == w && gh == h, s"$name dims")
      assert(java.util.Arrays.equals(bytes, raw.drop(4)), s"$name bytes")
    }
  }

  test("7 more foreign libtiff fixtures: RGB (SamplesPerPixel 3) with " +
    "per-COMPONENT predictor 2 (single- and multi-strip), RGB " +
    "PackBits, and TILED layouts (16x16, padded edges, per-tile codec " +
    "+ predictor restarts) — gray and RGB, LZW and PackBits") {
    for (name <- Seq("rgb_lzw_pred2_37x21", "rgb_lzw_pred2_strips_40x18",
      "rgb_packbits_29x13", "tiled_gray_lzw_40x29",
      "tiled_gray_lzw_pred2_33x17", "tiled_rgb_lzw_pred2_37x21",
      "tiled_rgb_packbits_48x32")) {
      val tif = resource(s"/tiff/fixture_$name.tif")
      val raw = resource(s"/tiff/fixture_$name.raw")
      val w = ((raw(0) & 0xff) << 8) | (raw(1) & 0xff)
      val h = ((raw(2) & 0xff) << 8) | (raw(3) & 0xff)
      val (gw, gh, spp, bytes) = TiffOps.decodeRaster(tif)
        .getOrElse(fail(s"$name: None"))
      assert(gw == w && gh == h, s"$name dims")
      assert((raw.length - 4) == w * h * spp, s"$name spp")
      assert(java.util.Arrays.equals(bytes, raw.drop(4)), s"$name bytes")
    }
  }

  test("own tiled/RGB writer round-trips through parseTiff: every q200 " +
    "form, both endians, sums equal the (x, y, c) grid") {
    for (id <- 0L until 8L) {
      val (comp, pred, spp, tiled, rps) = (id % 4) match {
        case 0 => (5, 2, 3, false, 3)
        case 1 => (5, 2, 1, true, 0)
        case 2 => (32773, 1, 3, true, 0)
        case _ => (5, 2, 3, true, 0)
      }
      val info = TiffOps.parseTiff(id,
        TiffOps.buildTiffExt(id, comp, pred, spp, tiled, rps))
      assert(info.status == "ok", s"id=$id: ${info.status}")
      assert(info.spp == spp && info.layout == (if (tiled) "tiled" else "strips"))
      val pw = 20 + (id % 13).toInt
      val ph = 10 + (id % 9).toInt
      var want = 0L
      for (y <- 0 until ph; x <- 0 until pw; c <- 0 until spp)
        want += TiffOps.pixelC(id, x, y, c)
      assert(info.pixel_sum == want, s"id=$id sum")
    }
  }

  test("own encoders round-trip through own decoders: LZW across width " +
    "bumps and a table clear, PackBits over every run shape") {
    // > 4094 distinct sequences forces the encoder's mid-stream Clear
    val big = Array.tabulate[Byte](64 * 1024)(i =>
      ((i * 2654435761L >> 7) & 0xff).toByte)
    for (data <- Seq(
      big,
      Array.tabulate[Byte](5000)(i => (i / 37 % 7).toByte), // long runs
      Array.fill[Byte](300)(42), // one run
      Array.tabulate[Byte](129)(i => i.toByte), // literal > 128 cap
      Array[Byte](1), Array[Byte](1, 1), Array[Byte](1, 2, 2, 2, 3))) {
      val lz = TiffOps.lzwEncode(data)
      assert(TiffOps.lzwDecode(lz, 0, lz.length, data.length)
        .exists(java.util.Arrays.equals(_, data)), s"lzw n=${data.length}")
      val pb = TiffOps.packbitsEncode(data)
      assert(TiffOps.packbitsDecode(pb, 0, pb.length, data.length)
        .exists(java.util.Arrays.equals(_, data)), s"packbits n=${data.length}")
    }
  }

  test("malformed strips are typed: truncation and bit flips never " +
    "throw or yield short rasters") {
    val data = Array.tabulate[Byte](500)(i => (i * 13 % 251).toByte)
    val lz = TiffOps.lzwEncode(data)
    for (cut <- 0 until lz.length by 3)
      TiffOps.lzwDecode(lz, 0, cut, data.length).foreach(d =>
        assert(d.length == data.length))
    for (i <- 0 until lz.length by 2) {
      val bad = lz.clone()
      bad(i) = (bad(i) ^ 0x10).toByte
      TiffOps.lzwDecode(bad, 0, bad.length, data.length).foreach(d =>
        assert(d.length == data.length))
    }
    val pb = TiffOps.packbitsEncode(data)
    for (cut <- 0 until pb.length by 3)
      TiffOps.packbitsDecode(pb, 0, cut, data.length).foreach(d =>
        assert(d.length == data.length))
  }

  test("predictor 2 round-trips exactly through buildTiff/decodeGray: " +
    "the decoded raster equals the pixel grid, both endians") {
    for (id <- Seq(2L, 7L)) { // even = II, odd = MM
      val tif = TiffOps.buildTiff(id, comp = 5, predictor = 2)
      val (w, h, bytes) = TiffOps.decodeGray(tif).getOrElse(fail(s"id=$id"))
      assert(w == 8 + (id % 5).toInt && h == 4 + (id % 3).toInt)
      for (y <- 0 until h; x <- 0 until w)
        assert((bytes(y * w + x) & 0xff) == ((x + y + id) % 251).toInt,
          s"id=$id px ($x,$y)")
    }
    // an unsupported predictor value is a typed dead-letter
    assert(TiffOps.parseTiff(3L, TiffOps.buildTiff(3L, 5, 3)).status ==
      "unsupported-predictor")
  }

  test("multi-strip layout: RowsPerStrip bands with offset/length " +
    "ARRAYS and per-strip codec restarts decode to the same raster as " +
    "the single-strip form, every codec, both endians") {
    for (id <- Seq(4L, 9L); comp <- Seq(1, 5, 32773); rps <- Seq(1, 2, 3)) {
      val single = TiffOps.decodeGray(TiffOps.buildTiff(id, comp)).get
      val multi = TiffOps.decodeGray(
        TiffOps.buildTiff(id, comp, 1, rps)).getOrElse(
        fail(s"id=$id comp=$comp rps=$rps"))
      assert(multi._1 == single._1 && multi._2 == single._2)
      assert(java.util.Arrays.equals(multi._3, single._3),
        s"id=$id comp=$comp rps=$rps")
      // parseTiff agrees (multi-page sums included)
      assert(TiffOps.parseTiff(id, TiffOps.buildTiff(id, comp, 1, rps)) ==
        TiffOps.parseTiff(id, TiffOps.buildTiff(id, comp)))
    }
    // a strip-count lie is typed: shrink the declared RowsPerStrip so
    // ceil(h/rps) disagrees with the offset array's length
    val good = TiffOps.buildTiff(4L, 1, 1, 2) // II; w=12, h=5 → 3 strips
    assert(TiffOps.parseTiff(4L, good).status == "ok")
    // locate the 278 entry (II: tag bytes 0x16 0x01, type SHORT 0x03 0x00)
    val pat = Array[Byte](0x16, 0x01, 0x03, 0x00)
    val at = good.indexOfSlice(pat)
    assert(at > 0, "RowsPerStrip entry must exist")
    val lying = good.clone()
    lying(at + 8) = 1 // rps 2 → 1: now needs 5 strips, arrays hold 3
    assert(TiffOps.parseTiff(4L, lying).status == "bad-ifd")
  }

  test("q191 on sf0.001: every compression leg ok, sums equal the q162 " +
    "control row for row") {
    val rows = TiffOps.q191TiffCompressed(spark, sf)
      .select("doc_id", "status", "compression", "pixel_sum")
      .collect()
    assert(rows.nonEmpty)
    val control = TiffOps.q162TiffScan(spark, sf)
      .select("doc_id", "pixel_sum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "ok", s"doc $id")
      val want = (id % 3) match {
        case 0 => "packbits"; case 1 => "lzw"; case _ => "none"
      }
      assert(r.getString(2) == want)
      assert(r.getLong(3) == control(id), s"doc $id sum")
    }
  }
}
