package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("asset table: binary payload round-trips the source text bytes") {
    val a = MultimodalOps.assets(spark, sf)
    val bad = a.withColumn("rt", decode(col("payload"), "UTF-8"))
      .join(graft.Tables.documents(spark, sf),
        col("asset_id") === col("doc_id"))
      .filter(col("rt") =!= col("text"))
    assert(bad.isEmpty)
    assert(a.select("media_type").distinct().count() == 3)
  }

  test("feature extraction: normalized 16-bin histogram, deterministic") {
    val feats = MultimodalOps.extractFeatures(spark, MultimodalOps.assets(spark, sf))
      .collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, s"histogram not normalized: ${f.features.sum}")
    }
    // deterministic across invocations
    val again = MultimodalOps.extractFeatures(spark, MultimodalOps.assets(spark, sf))
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(feats.forall(f => again(f.asset_id) == f.features.toSeq))
  }

  test("features compose with cosine similarity search") {
    import spark.implicits._
    val feats = MultimodalOps.extractFeatures(spark, MultimodalOps.assets(spark, sf))
      .limit(20)
      .map(f => (f.asset_id, f.features.map(_.toDouble).toSeq))
      .toDF("vec_id", "v")
    val q = feats.select(col("vec_id").as("query_id"), col("v").as("qv")).limit(2)
    val top = SimilarityOps.bruteForceTopK(feats, q, 3)
    assert(top.count() == 6)
  }

  /** Byte-exact 24-bpp BMP: `pxTopDown` is (B,G,R) per pixel in top-down
    * row-major order; the fixture stores rows bottom-up with 4-byte row
    * padding, exactly as the format demands.
    */
  private def bmpFixture(w: Int, h: Int, pxTopDown: Seq[(Int, Int, Int)]): Array[Byte] = {
    val rowSize = ((24 * w + 31) / 32) * 4
    val size = 54 + rowSize * h
    val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
      .putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (r <- (h - 1) to 0 by -1) {
      for (c <- 0 until w) {
        val (bb, gg, rr) = pxTopDown(r * w + c)
        buf.put(bb.toByte).put(gg.toByte).put(rr.toByte)
      }
      for (_ <- 0 until rowSize - w * 3) buf.put(0.toByte)
    }
    buf.array()
  }

  /** Byte-exact mono PCM16 WAV. */
  private def wavFixture(rate: Int, samples: Seq[Short]): Array[Byte] = {
    val dlen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dlen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dlen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1).putInt(rate)
      .putInt(rate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(dlen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  test("BMP codec decodes a real 24-bpp fixture byte-exactly (incl. row padding and flip)") {
    // 2x2: TL=blue TR=green BL=red BR=white, distinct per corner so any
    // row-order or channel-order mistake shows
    val px = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255))
    val bytes = bmpFixture(2, 2, px)
    val img = MultimodalOps.decodeBmp(bytes).get
    assert(img.width == 2 && img.height == 2 && img.bpp == 24)
    val expect = px.flatMap { case (b, g, r) => Seq(b.toByte, g.toByte, r.toByte) }
    assert(img.pixels.toSeq == expect, "pixels not top-down BGR after unflip")
    // top-down variant (negative height) must decode to the same image
    val td = bmpFixture(2, 2, px)
    val buf = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -2) // height = -2: rows stored top-down
    // rewrite rows in top-down order
    val rowSize = 8
    val tdPx = px.flatMap { case (b, g, r) => Seq(b.toByte, g.toByte, r.toByte) }
    for (r <- 0 until 2; i <- 0 until 6) td(54 + r * rowSize + i) = tdPx(r * 6 + i)
    assert(MultimodalOps.decodeBmp(td).get.pixels.toSeq == expect)
    // features carry real image facts
    val feats = MultimodalOps.decodeBytes(bytes)
    assert(feats(0) == 2f && feats(1) == 2f)
    assert(math.abs(feats.drop(5).sum - 1.0f) < 1e-3, "gray histogram not normalized")
  }

  test("WAV codec decodes a real PCM16 fixture sample-exactly") {
    val samples = Seq[Short](0, 16384, -16384, 32767)
    val bytes = wavFixture(8000, samples)
    val a = MultimodalOps.decodeWav(bytes).get
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 16)
    val expect = Seq(0f, 0.5f, -0.5f, 32767 / 32768f)
    assert(a.samples.toSeq == expect, s"samples ${a.samples.toSeq}")
    val feats = MultimodalOps.decodeBytes(bytes)
    assert(feats(0) == 8000f && feats(1) == 1f && feats(2) == 4f)
  }

  test("codec is error-as-value: garbage, truncation and foreign RIFFs fall back, never throw") {
    val bmp = bmpFixture(2, 2, Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)))
    val wav = wavFixture(8000, Seq[Short](1, 2, 3))
    val cases = Seq[Array[Byte]](
      null,
      Array.empty[Byte],
      "just some text".getBytes,
      bmp.take(20), // truncated header
      bmp.take(60), // header promises more pixels than present
      wav.take(30), // truncated chunk walk
      ("RIFF1234AVI LIST".getBytes ++ Array.fill[Byte](40)(0)), // RIFF, not WAVE
      { val b = bmp.clone(); b(30) = 1; b } // compressed BMP: unsupported
    )
    cases.foreach { c =>
      assert(MultimodalOps.decodeBmp(c).isEmpty)
      assert(MultimodalOps.decodeWav(c).isEmpty)
      val f = MultimodalOps.decodeBytes(c)
      assert(f.length == 16, "fallback features must keep the uniform shape")
    }
    // hostile headers that defeat Int bounds checks via overflow: width
    // near 2^31/24 makes `24*w` negative in Int arithmetic, and
    // height = Int.MinValue survives math.abs — both must be None, not an
    // ArrayIndexOutOfBounds inside a partition iterator
    val hostile = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hostile.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
    hostile.putInt(40).putInt(100000000).putInt(1).putShort(1).putShort(24)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    val wide = hostile.array()
    assert(MultimodalOps.decodeBmp(wide).isEmpty, "overflowing width not rejected")
    val deep = wide.clone()
    java.nio.ByteBuffer.wrap(deep).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 2).putInt(22, Int.MinValue)
    assert(MultimodalOps.decodeBmp(deep).isEmpty, "Int.MinValue height not rejected")
    assert(MultimodalOps.decodeBytes(wide).length == 16)
    assert(MultimodalOps.decodeBytes(deep).length == 16)
  }

  test("feature extraction dispatches per row: media payloads decode, text falls back") {
    import spark.implicits._
    val bmp = bmpFixture(3, 1, Seq((0, 0, 255), (0, 255, 0), (255, 0, 0)))
    val wav = wavFixture(16000, Seq[Short](100, -100, 200, -200, 300, -300))
    val df = Seq(
      (1L, "image", bmp),
      (2L, "audio", wav),
      (3L, "text", "plain old text".getBytes))
      .toDF("asset_id", "media_type", "payload")
    val feats = MultimodalOps.extractFeatures(spark, df)
      .collect().map(f => f.asset_id -> f.features).toMap
    assert(feats(1L)(0) == 3f && feats(1L)(1) == 1f, "BMP row did not decode")
    assert(feats(2L)(0) == 16000f && feats(2L)(2) == 6f, "WAV row did not decode")
    assert(math.abs(feats(3L).sum - 1.0f) < 1e-3, "text row did not fall back to histogram")
  }

  test("BMP and WAV writers round-trip through the real codecs") {
    // encode → decode is the identity on every parameter the codecs expose
    val px = Array.tabulate(2 * 3 * 3)(i => (i * 17).toByte) // 3x2, distinct pixels
    val img = MultimodalOps.decodeBmp(MultimodalOps.encodeBmp(3, 2, px))
    assert(img.isDefined, "encoder output did not decode")
    assert(img.get.width == 3 && img.get.height == 2)
    assert(img.get.pixels.sameElements(px), "pixel round-trip mismatch")
    val const = MultimodalOps.decodeBmp(MultimodalOps.encodeBmpConst(5, 4, 10, 20, 30)).get
    assert(const.pixels.grouped(3).forall(p =>
      (p(0) & 0xFF) == 10 && (p(1) & 0xFF) == 20 && (p(2) & 0xFF) == 30))
    val wav = MultimodalOps.decodeWav(MultimodalOps.encodeWavSilence(11000, 2, 96))
    assert(wav.isDefined, "WAV encoder output did not decode")
    assert(wav.get.sampleRate == 11000 && wav.get.channels == 2 &&
      wav.get.samples.length == 96 && wav.get.samples.forall(_ == 0f))
  }

  test("q43 rows all take the real-decode branch, never the histogram fallback") {
    import spark.implicits._
    val assets = MultimodalOps.decodableAssets(spark, sf)
    val undecodable = assets.filter(a => (a.media_type == "image") !=
      MultimodalOps.decodeBmp(a.payload).isDefined ||
      (a.media_type == "audio") != MultimodalOps.decodeWav(a.payload).isDefined)
    assert(undecodable.isEmpty,
      s"fallback rows: ${undecodable.take(3).map(_.asset_id).mkString(",")}")
    assert(assets.count() > 0)
    // and the exposed columns are the DECODED values (spot-check one image)
    val row = MultimodalOps.q43DecodeFeatures(spark, sf)
      .filter(col("media_type") === "image").orderBy("asset_id").head
    val id = row.getLong(0)
    assert(row.getLong(2) == 8 + id % 16 && row.getLong(3) == 8 + (id * 3) % 16)
    assert(row.getLong(4) == id % 256 && row.getLong(5) == id * 7 % 256 &&
      row.getLong(6) == id * 13 % 256)
  }

  test("resize resamples decodable BMPs with the nearest-neighbor kernel") {
    import spark.implicits._
    // 2x2 image with four distinct colors; upsampling to 4x4 must replicate
    // each source pixel into its 2x2 block (exact NN index map)
    val quads = Seq((0, 0, 0), (50, 60, 70), (100, 110, 120), (200, 210, 220))
    val px = quads.flatMap { case (b, g, r) => Seq(b.toByte, g.toByte, r.toByte) }.toArray
    val bmp = MultimodalOps.encodeBmp(2, 2, px)
    val df = Seq((1L, "image", bmp, 2, 2, "bmp"))
      .toDF("asset_id", "media_type", "payload", "width", "height", "format")
    val out = MultimodalOps.resize(df, 4, 4).head
    assert(out.getAs[Int]("width") == 4 && out.getAs[Int]("height") == 4)
    val decoded = MultimodalOps.decodeBmp(out.getAs[Array[Byte]]("payload"))
    assert(decoded.isDefined, "resized payload is no longer a valid BMP")
    val got = decoded.get.pixels.grouped(3)
      .map(p => (p(0) & 0xFF, p(1) & 0xFF, p(2) & 0xFF)).toSeq
    val expected = Seq(0, 0, 1, 1).flatMap(row =>
      Seq(0, 0, 1, 1).map(colIdx => quads(row * 2 + colIdx)))
    assert(got == expected, s"NN resample mismatch: $got")
    // a non-decodable payload keeps the proportional-truncation fallback
    val txt = Seq((2L, "text", "0123456789abcdef".getBytes, 4, 4, "txt"))
      .toDF("asset_id", "media_type", "payload", "width", "height", "format")
    val t = MultimodalOps.resize(txt, 2, 2).head
    assert(t.getAs[Array[Byte]]("payload").length == 4) // 16 * (2*2)/(4*4)
  }

  test("resize shrinks payload proportionally and rewrites metadata") {
    val a = MultimodalOps.assets(spark, sf)
    val r = MultimodalOps.resize(a, 16, 16)
    val bad = r.filter(col("width") =!= 16 || col("height") =!= 16)
    assert(bad.isEmpty)
    val shrunk = r.select(sum(octet_length(col("payload")))).head.getLong(0)
    val orig = a.select(sum(octet_length(col("payload")))).head.getLong(0)
    assert(shrunk < orig)
  }

  test("bilinear kernel: identity, constant fill, hand-computed 2x2→3x3, float agreement") {
    // identity: same dims put every source position exactly on a pixel
    // center (fraction 0), so the bytes come back unchanged
    val rng = new scala.util.Random(7)
    val px = Array.fill[Byte](5 * 4 * 3)(rng.nextInt(256).toByte)
    val img = MultimodalOps.BmpImage(5, 4, 24, px)
    assert(MultimodalOps.resampleBilinear(img, 5, 4).toSeq == px.toSeq,
      "identity resample must be byte-exact")
    // a constant fill is a fixed point of any interpolating kernel
    val const = MultimodalOps.BmpImage(3, 3, 24, Array.fill[Byte](27)(42))
    assert(MultimodalOps.resampleBilinear(const, 7, 5).forall(_ == 42))
    // 2x2 → 3x3 by hand: corners replicate sources, edges average 2,
    // center averages all 4 (weights 9/36 each, floor division)
    val quad = MultimodalOps.BmpImage(2, 2, 24,
      Seq(10, 0, 0, 20, 0, 0, 40, 0, 0, 90, 0, 0).map(_.toByte).toArray)
    val out = MultimodalOps.resampleBilinear(quad, 3, 3)
    val b = out.grouped(3).map(_(0) & 0xFF).toSeq
    assert(b == Seq(10, 15, 20, 25, 40, 55, 40, 65, 90),
      s"hand-computed bilinear mismatch: $b")
    // fixed-point floor vs a float reference: every byte within 1
    for (_ <- 1 to 20) {
      val (w, h) = (1 + rng.nextInt(24), 1 + rng.nextInt(24))
      val (tw, th) = (1 + rng.nextInt(24), 1 + rng.nextInt(24))
      val p = Array.fill[Byte](w * h * 3)(rng.nextInt(256).toByte)
      val got = MultimodalOps.resampleBilinear(
        MultimodalOps.BmpImage(w, h, 24, p), tw, th)
      for (y <- 0 until th; x <- 0 until tw; c <- 0 until 3) {
        val sx = math.min(math.max((x + 0.5) * w / tw - 0.5, 0.0), w - 1.0)
        val sy = math.min(math.max((y + 0.5) * h / th - 0.5, 0.0), h - 1.0)
        val (x0, y0) = (sx.toInt, sy.toInt)
        val (x1, y1) = (math.min(x0 + 1, w - 1), math.min(y0 + 1, h - 1))
        val (fx, fy) = (sx - x0, sy - y0)
        def at(xx: Int, yy: Int) = p((yy * w + xx) * 3 + c) & 0xFF
        val ref = at(x0, y0) * (1 - fx) * (1 - fy) + at(x1, y0) * fx * (1 - fy) +
          at(x0, y1) * (1 - fx) * fy + at(x1, y1) * fx * fy
        val v = got((y * tw + x) * 3 + c) & 0xFF
        assert(math.abs(v - ref) <= 1.0 + 1e-9,
          s"fixed-point drifted from float bilinear at ($x,$y,$c): $v vs $ref " +
            s"(src ${w}x$h dst ${tw}x$th)")
      }
    }
  }

  test("q51 rows all decode; resize dispatches the bilinear kernel") {
    import spark.implicits._
    // the DataFrame surface routes kernel="bilinear" to the same kernel
    val grad = MultimodalOps.encodeBmpGradient(4, 4, 3L)
    val df = Seq((1L, "image", grad, 4, 4, "bmp"))
      .toDF("asset_id", "media_type", "payload", "width", "height", "format")
    val viaResize = MultimodalOps.decodeBmp(
      MultimodalOps.resize(df, 3, 3, kernel = "bilinear")
        .head.getAs[Array[Byte]]("payload")).get.pixels
    val direct = MultimodalOps.resampleBilinear(
      MultimodalOps.decodeBmp(grad).get, 3, 3)
    assert(viaResize.toSeq == direct.toSeq)
    intercept[IllegalArgumentException] {
      MultimodalOps.resize(df, 3, 3, kernel = "bicubic")
    }
    // gradient content actually distinguishes the kernels (a constant
    // fill would let a NN regression pass q51 silently)
    val nn = MultimodalOps.resampleNearest(
      MultimodalOps.decodeBmp(grad).get, 3, 3)
    assert(nn.toSeq != direct.toSeq,
      "gradient fixture failed to distinguish bilinear from NN")
    // every q51 row decodes (error-as-value would DROP rows, and the
    // oracle's row count would catch it — pin it here too)
    val rows = MultimodalOps.q51ResizeBilinear(spark, sf).collect()
    val nAssets = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0).count()
    assert(rows.length == nAssets, "q51 silently dropped a row")
    assert(rows.forall(r => r.getLong(1) == 16 && r.getLong(2) == 12))
  }

  test("linear audio kernel: identity, exact lerp on a non-divisible ratio, q52 shape") {
    // identity at the same rate: every fraction is 0
    val samples = Array.tabulate[Short](12)(i => (i * 999 - 6000).toShort)
    val wav = MultimodalOps.decodeWav(
      MultimodalOps.encodeWavPcm16(8000, 1, samples)).get
    assert(MultimodalOps.resampleWavLinear(wav, 8000).samples.toSeq ==
      wav.samples.toSeq)
    // integer ratio (8000→4000): fraction is always 0, lerp == NN
    assert(MultimodalOps.resampleWavLinear(wav, 4000).samples.toSeq ==
      MultimodalOps.resampleWav(wav, 4000).samples.toSeq)
    // non-divisible ratio (6000→4000): j=1 sits exactly between frames 1
    // and 2 (pos=6000/4000 → s0=1, f=2000/4000) — the lerp must land on
    // the biased-floor midpoint, computed here by hand on the int samples
    val w6 = MultimodalOps.decodeWav(
      MultimodalOps.encodeWavPcm16(6000, 1,
        Array[Short](100, 201, 400, -301, 1000, -2000))).get
    val lin = MultimodalOps.resampleWavLinear(w6, 4000)
    assert(lin.samples.length == 4)
    def toInt(f: Float) = math.round(f * 32768f)
    // frame map: out j sits at j*6000/4000 = 1.5j source frames, so
    // j=0 → frame 0; j=1 → midpoint of frames 1,2; j=2 → frame 3;
    // j=3 → midpoint of frames 4,5 — midpoints biased-floor on the
    // unsigned domain
    assert(toInt(lin.samples(0)) == 100)
    assert(toInt(lin.samples(1)) ==
      ((201 + 32768) + (400 + 32768)) / 2 - 32768) // = 300 (floor of 300.5)
    assert(toInt(lin.samples(2)) == -301)
    assert(toInt(lin.samples(3)) ==
      ((1000 + 32768) + (-2000 + 32768)) / 2 - 32768) // = -500
    // stereo interleaving
    val st = MultimodalOps.decodeWav(MultimodalOps.encodeWavPcm16(
      6000, 2, Array.tabulate[Short](12)(i => (i * 100).toShort))).get
    val res2 = MultimodalOps.resampleWavLinear(st, 4000)
    assert(res2.channels == 2 && res2.samples.length == 8)
    // q52 rows all decode and keep the NN length map
    val rows = MultimodalOps.q52AudioLinearResample(spark, sf).collect()
    val nAssets = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 1).count()
    assert(rows.length == nAssets, "q52 silently dropped a row")
    for (r <- rows.take(20)) {
      val id = r.getLong(0)
      assert(r.getLong(2) == (64 + id % 128) * 4000 / (8000 + (id % 8) * 1000))
    }
  }

  test("resampleAudio operator: kernel dispatch, pass-through, driver-side validation") {
    import spark.implicits._
    val wav = MultimodalOps.encodeWavPcm16(8000, 1,
      Array.tabulate[Short](100)(i => (i * 321 - 16000).toShort))
    val df = Seq((1L, "audio", wav), (2L, "text", "not audio".getBytes))
      .toDF("asset_id", "media_type", "payload")
    val out = MultimodalOps.resampleAudio(df, 6000, kernel = "linear")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    // the audio row went through the real kernel (compare against the
    // direct call, re-encoded the same way)
    val direct = {
      val a = MultimodalOps.decodeWav(wav).get
      val res = MultimodalOps.resampleWavLinear(a, 6000)
      MultimodalOps.encodeWavPcm16(res.sampleRate, res.channels,
        res.samples.map(f => math.round(f * 32768f).toShort))
    }
    assert(out(1L).toSeq == direct.toSeq, "operator drifted from the kernel")
    // non-audio passes through untouched (no truncation, no corruption)
    assert(out(2L).toSeq == "not audio".getBytes.toSeq)
    intercept[IllegalArgumentException] {
      MultimodalOps.resampleAudio(df, 6000, kernel = "cubic")
    }
    // the sinc path produces a decodable result at the right rate/length
    val sincRow = MultimodalOps.resampleAudio(df, 6000, kernel = "sinc")
      .filter(col("asset_id") === 1L).head.getAs[Array[Byte]]("payload")
    val sincDec = MultimodalOps.decodeWav(sincRow).get
    assert(sincDec.sampleRate == 6000 && sincDec.samples.length == 75)
  }

  test("windowed-sinc kernel: reconstructs a pure tone far better than linear") {
    // a 2 kHz tone at 8 kHz, resampled to 6 kHz (non-integer ratio, tone
    // well under the 3 kHz output Nyquist). Linear interpolation's error
    // at this frequency is ~(pi*f/fs)^2/2 ≈ 0.3 peak; the band-limited
    // kernel must be orders of magnitude closer to the ideal tone.
    val inRate = 8000
    val outRate = 6000
    val n = 2048
    val freq = 2000.0
    val tone = Array.tabulate(n)(i =>
      (0.8 * math.sin(2 * math.Pi * freq * i / inRate)).toFloat)
    val a = MultimodalOps.WavAudio(inRate, 1, 16, tone)
    val sinc = MultimodalOps.resampleWavSinc(a, outRate)
    val lin = MultimodalOps.resampleWavLinear(a, outRate)
    assert(sinc.samples.length == lin.samples.length)
    val m = sinc.samples.length
    // skip the kernel radius at both ends (edge windows are truncated)
    val guard = 64
    def rms(s: Array[Float]): Double = {
      var acc = 0.0
      var cnt = 0
      var j = guard
      while (j < m - guard) {
        val ideal = 0.8 * math.sin(2 * math.Pi * freq * j / outRate)
        acc += (s(j) - ideal) * (s(j) - ideal)
        cnt += 1
        j += 1
      }
      math.sqrt(acc / cnt)
    }
    val (se, le) = (rms(sinc.samples), rms(lin.samples))
    assert(se < 0.01, s"sinc reconstruction error too high: $se")
    assert(se < le / 10, s"sinc ($se) must beat linear ($le) by >10x")
    // identity at the same rate: centers land on integer taps, sinc(0)=1
    val id = MultimodalOps.resampleWavSinc(a, inRate)
    val idErr = id.samples.zip(tone).map { case (x, y) => math.abs(x - y) }.max
    assert(idErr < 1e-5, s"same-rate sinc resample drifted: $idErr")
  }

  test("PCM16 writer round-trips samples exactly; NN audio resample maps frames correctly") {
    val samples = Array.tabulate[Short](10)(i => (i * 1000 - 5000).toShort)
    val wav = MultimodalOps.decodeWav(MultimodalOps.encodeWavPcm16(8000, 1, samples))
    assert(wav.isDefined && wav.get.sampleRate == 8000)
    assert(wav.get.samples.map(f => math.round(f * 32768f)).toSeq ==
      samples.map(_.toInt).toSeq, "PCM16 sample round-trip drifted")
    // downsample 10 frames 8000→4000 Hz: out j takes in floor(j*2) → 5
    // frames 0,2,4,6,8
    val res = MultimodalOps.resampleWav(wav.get, 4000)
    assert(res.sampleRate == 4000 && res.samples.length == 5)
    assert(res.samples.toSeq == Seq(0, 2, 4, 6, 8).map(i => wav.get.samples(i)))
    // stereo keeps channel interleaving intact
    val st = MultimodalOps.decodeWav(MultimodalOps.encodeWavPcm16(
      8000, 2, Array.tabulate[Short](8)(i => (i * 100).toShort))).get
    val res2 = MultimodalOps.resampleWav(st, 4000)
    assert(res2.channels == 2 && res2.samples.length == 4)
    assert(res2.samples.toSeq == Seq(0, 1, 4, 5).map(i => st.samples(i)),
      "stereo NN resample broke channel interleaving")
    // q50 rows all decode (no silent drops) and sample counts match the map
    val rows = MultimodalOps.q50AudioResample(spark, sf).collect()
    val nAssets = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 1).count()
    assert(rows.length == nAssets, "q50 silently dropped a non-decodable row")
    for (r <- rows.take(20)) {
      val id = r.getLong(0)
      val rate = 8000 + (id % 8) * 1000
      val n = 64 + id % 128
      assert(r.getLong(1) == 4000 && r.getLong(2) == n * 4000 / rate,
        s"resampled length drifted for asset $id: $r")
    }
  }

  test("RLE8 AVI: round-trip, escape handling, hostile streams, q53 all-decode") {
    val rng = new scala.util.Random(11)
    val pal = MultimodalOps.rle8ArithmeticPalette
    // random index frames round-trip pixel-exactly through encode→decode
    // (the decoder expands runs and maps the palette; compare against a
    // driver-side palette expansion)
    for (_ <- 1 to 10) {
      val w = 1 + rng.nextInt(20)
      val h = 1 + rng.nextInt(20)
      val frames = Seq.fill(1 + rng.nextInt(4))(
        Array.fill[Byte](w * h)(rng.nextInt(256).toByte))
      val avi = MultimodalOps.encodeAviRle8(w, h, pal, frames)
      val dec = MultimodalOps.decodeAvi(avi)
      assert(dec.isDefined, s"RLE8 round-trip failed to decode (${w}x$h)")
      assert(dec.get.width == w && dec.get.height == h &&
        dec.get.frames.length == frames.length)
      for ((f, d) <- frames.zip(dec.get.frames)) {
        val expect = f.flatMap { b =>
          val (pb, pg, pr) = pal(b & 0xFF)
          Seq(pb.toByte, pg.toByte, pr.toByte)
        }
        assert(d.toSeq == expect.toSeq, "RLE8 frame pixels drifted")
      }
    }
    // long uniform rows exercise the 255-run cap
    val wide = Array.fill[Byte](600)(7)
    val capDec = MultimodalOps.decodeAvi(
      MultimodalOps.encodeAviRle8(600, 1, pal, Seq(wide))).get
    assert(capDec.frames.head.grouped(3).forall(p => (p(0) & 0xFF) == 7))
    // hand-built stream with ABSOLUTE and DELTA escapes: 4x2 bottom-up.
    // bottom row: abs(3 literals 1,2,3) + run(1 of 9); top row: run(1 of
    // 5), delta skips (2,0) leaving zeros, run(1 of 6)
    val handRle = Array[Byte](
      0, 3, 1, 2, 3, 0, /* abs pads to word */ 1, 9, 0, 0, // bottom row + EOL
      1, 5, 0, 2, 2, 0, 1, 6, 0, 0, // top row with delta + EOL
      0, 1) // EOB
    val hand = MultimodalOps.decodeRle8Frame(handRle, 0, handRle.length, 4, 2)
    assert(hand.isDefined, "hand-built RLE8 stream must decode")
    assert(hand.get.toSeq == Seq[Byte](5, 0, 0, 6, 1, 2, 3, 9),
      s"escape semantics drifted: ${hand.get.toSeq}")
    // hostile streams are None, never a throw or a silent wrap: run past
    // the row, absolute past the buffer, truncated pair, missing EOB
    assert(MultimodalOps.decodeRle8Frame(Array[Byte](5, 1, 0, 1), 0, 4, 4, 1).isEmpty,
      "run past row end must be rejected")
    assert(MultimodalOps.decodeRle8Frame(Array[Byte](0, 3, 1, 1), 0, 4, 4, 1).isEmpty,
      "absolute block past buffer must be rejected")
    assert(MultimodalOps.decodeRle8Frame(Array[Byte](2), 0, 1, 4, 1).isEmpty,
      "truncated pair must be rejected")
    assert(MultimodalOps.decodeRle8Frame(Array[Byte](2, 2, 0, 0), 0, 4, 4, 1).isEmpty,
      "stream ending without EOB must be rejected")
    // a pixel index past biClrUsed is rejected at the palette map:
    // shrink biClrUsed (fixed offset 204 in the writer's layout —
    // 12 RIFF + 12 LIST/hdrl + 64 avih + 12 LIST/strl + 64 strh +
    // 8 strf header + 32 into BITMAPINFOHEADER) to 16, under a frame
    // holding index 40
    val smallPal = MultimodalOps.encodeAviRle8(2, 1, pal, Seq(Array[Byte](0, 40)))
    assert(MultimodalOps.decodeAvi(smallPal).isDefined)
    val patched = smallPal.clone()
    patched(204) = 16; patched(205) = 0; patched(206) = 0; patched(207) = 0
    assert(MultimodalOps.decodeAvi(patched).isEmpty,
      "index past the declared palette must be rejected")
    // q53 rows all take the compressed decode path (row count == frame
    // count of the subset — a fallback would produce no frame rows)
    val rows = MultimodalOps.q53RleVideoFrames(spark, sf).collect()
    val expected = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2)
      .select(sum(lit(2) + col("doc_id") % 4)).head.getLong(0)
    assert(rows.length == expected, "q53 silently dropped a frame row")
  }

  test("AVI writer round-trips through the real codec, frames pixel-exact") {
    // distinct pixels per frame: any row-flip / frame-split / padding bug
    // lands somewhere in the comparison
    val frames = Seq(
      Array.tabulate(3 * 2 * 3)(i => (i * 17).toByte),
      Array.tabulate(3 * 2 * 3)(i => (i * 29 + 5).toByte))
    val v = MultimodalOps.decodeAvi(MultimodalOps.encodeAvi(3, 2, frames))
    assert(v.isDefined, "AVI encoder output did not decode")
    assert(v.get.width == 3 && v.get.height == 2 && v.get.frames.length == 2)
    assert(v.get.frames(0).sameElements(frames(0)) &&
      v.get.frames(1).sameElements(frames(1)), "frame pixel round-trip mismatch")
    // constant fills decode to exact per-frame colors
    val c = MultimodalOps.decodeAvi(MultimodalOps.encodeAviConst(
      5, 4, Seq((10, 20, 30), (40, 50, 60), (70, 80, 90)))).get
    assert(c.frames.length == 3)
    for ((f, i) <- c.frames.zipWithIndex)
      assert(f.grouped(3).forall(p =>
        (p(0) & 0xFF) == 10 + 30 * i && (p(1) & 0xFF) == 20 + 30 * i &&
          (p(2) & 0xFF) == 30 + 30 * i), s"frame $i fill drifted")
    // and decodeBytes dispatches it: [w, h, nFrames, means...]
    val feats = MultimodalOps.decodeBytes(MultimodalOps.encodeAviConst(
      5, 4, Seq((100, 100, 100))))
    assert(feats(0) == 5f && feats(1) == 4f && feats(2) == 1f)
    assert(math.abs(feats(3) - 100f / 255f) < 1e-6)
  }

  test("AVI codec is error-as-value: garbled walks and hostile headers are None") {
    val avi = MultimodalOps.encodeAviConst(4, 3, Seq((1, 2, 3), (4, 5, 6)))
    val cases = Seq[Array[Byte]](
      null,
      avi.take(20), // truncated header
      avi.take(avi.length - 10), // truncated last frame chunk
      { val b = avi.clone(); b(9) = 'X'; b }, // not an AVI fourcc
      // frame-size disagreement: shrink the strf width so the declared
      // shape no longer matches the 00db chunk sizes. strf data offset:
      // RIFF hdr 12 + hdrl LIST hdr 12 + avih (8+56) + strl LIST hdr 12 +
      // strh (8+56) + strf hdr 8 = 172; biWidth is 4 bytes in
      { val b = avi.clone()
        java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(176, 2)
        b })
    cases.foreach { c =>
      assert(MultimodalOps.decodeAvi(c).isEmpty)
      assert(MultimodalOps.decodeBytes(c).length == 16, "fallback shape lost")
    }
    // WAV/BMP magic stays disjoint: an AVI is not decodable as either
    assert(MultimodalOps.decodeWav(avi).isEmpty && MultimodalOps.decodeBmp(avi).isEmpty)
  }

  test("q48 rows all take the real AVI decode branch; per-frame means exact") {
    val vids = MultimodalOps.decodableVideos(spark, sf)
    val undecodable = vids.filter(a => MultimodalOps.decodeAvi(a.payload).isEmpty)
    assert(undecodable.isEmpty,
      s"fallback rows: ${undecodable.take(3).map(_.asset_id).mkString(",")}")
    assert(vids.count() > 0)
    val rows = MultimodalOps.q48VideoFrames(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows.take(40)) {
      val id = r.getLong(0); val f = r.getLong(1)
      assert(r.getLong(2) == 8 + id % 8 && r.getLong(3) == 6 + (id * 3) % 8)
      assert(r.getLong(4) == 2 + id % 4)
      assert(r.getLong(5) == (id + 11 * f) % 256 &&
        r.getLong(6) == (id * 7 + 17 * f) % 256 &&
        r.getLong(7) == (id * 13 + 23 * f) % 256, s"means drifted for ($id, $f)")
    }
    // every asset contributes exactly its declared frame count
    val counts = MultimodalOps.q48VideoFrames(spark, sf)
      .groupBy("asset_id").count().collect()
    assert(counts.forall(r => r.getLong(1) == 2 + r.getLong(0) % 4))
  }

  test("real frame sampling emits every stride-th frame as a decodable BMP") {
    import spark.implicits._
    val avi = MultimodalOps.encodeAviConst(4, 3,
      Seq((10, 0, 0), (0, 10, 0), (0, 0, 10), (20, 0, 0), (0, 20, 0)))
    val df = Seq((7L, "video", avi), (8L, "video", "not an avi".getBytes))
      .toDF("asset_id", "media_type", "payload")
    val out = MultimodalOps.sampleFramesDecoded(df, 2)
      .orderBy("asset_id", "frame_idx")
      .as[(Long, Long, Array[Byte])].collect()
    // frames 0, 2, 4 of the decodable asset; the garbled one contributes
    // no fake frames
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((7L, 0L), (7L, 2L), (7L, 4L)))
    val colors = out.map { case (_, _, bmp) =>
      val img = MultimodalOps.decodeBmp(bmp).get
      assert(img.width == 4 && img.height == 3)
      (img.pixels(0) & 0xFF, img.pixels(1) & 0xFF, img.pixels(2) & 0xFF)
    }
    assert(colors.toSeq == Seq((10, 0, 0), (0, 0, 10), (0, 20, 0)))
  }

  /** Run a ScalaCheck property under ScalaTest without the scalatestplus
    * bridge (not in the offline artifact cache) — DiffApplySpec's pattern.
    */
  private def check(prop: org.scalacheck.Prop, minSuccessful: Int = 100): Unit = {
    import org.scalacheck.{Test => SCTest}
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("codec round-trip properties: arbitrary dims/frames/samples survive encode→decode") {
    import org.scalacheck.{Gen, Prop}
    // BMP: any dims, arbitrary pixel bytes — decode(encode(px)) == px
    val bmpProp = Prop.forAll(
      Gen.chooseNum(1, 9), Gen.chooseNum(1, 9), Gen.long) { (w, h, seed) =>
      val px = Array.tabulate(w * h * 3)(i => ((seed + i * 31) & 0xFF).toByte)
      val img = MultimodalOps.decodeBmp(MultimodalOps.encodeBmp(w, h, px))
      img.exists(d => d.width == w && d.height == h && d.pixels.sameElements(px))
    }
    check(bmpProp)
    // AVI: any dims and 1..5 frames of arbitrary pixels — frame-exact
    val aviProp = Prop.forAll(
      Gen.chooseNum(1, 7), Gen.chooseNum(1, 7), Gen.chooseNum(1, 5), Gen.long) {
      (w, h, n, seed) =>
        val frames = (0 until n).map(f =>
          Array.tabulate(w * h * 3)(i => ((seed + f * 131 + i * 17) & 0xFF).toByte))
        val v = MultimodalOps.decodeAvi(MultimodalOps.encodeAvi(w, h, frames))
        v.exists(d => d.width == w && d.height == h && d.frames.length == n &&
          d.frames.zip(frames).forall { case (a, b) => a.sameElements(b) })
    }
    check(aviProp)
    // WAV PCM16: arbitrary rates/channels/samples — sample-exact, and the
    // resample length/index maps hold for any target rate
    val wavProp = Prop.forAll(
      Gen.chooseNum(1000, 48000), Gen.chooseNum(1, 3), Gen.chooseNum(0, 40),
      Gen.chooseNum(500, 48000), Gen.long) { (rate, ch, nFrames, outRate, seed) =>
      val samples = Array.tabulate(nFrames * ch)(i =>
        (((seed + i * 7919) % 65536) - 32768).toShort)
      val a = MultimodalOps.decodeWav(
        MultimodalOps.encodeWavPcm16(rate, ch, samples)).get
      val sampleExact =
        a.samples.map(f => math.round(f * 32768f)).toSeq == samples.map(_.toInt).toSeq
      val r = MultimodalOps.resampleWav(a, outRate)
      val outFrames = nFrames.toLong * outRate / rate
      val lenRight = r.samples.length == outFrames * ch
      val mapRight = (0 until outFrames.toInt).forall { j =>
        val src = (j.toLong * rate / outRate).toInt
        (0 until ch).forall(c => r.samples(j * ch + c) == a.samples(src * ch + c))
      }
      // the linear kernel shares the length map, and on integer-ratio
      // rates (every fraction 0) it must reduce to NN exactly
      val lin = MultimodalOps.resampleWavLinear(a, outRate)
      val linLen = lin.samples.length == r.samples.length
      val linNN = rate % outRate != 0 ||
        lin.samples.toSeq == r.samples.toSeq
      sampleExact && lenRight && mapRight && linLen && linNN
    }
    check(wavProp)
    // decoders never throw on arbitrary garbage (the per-partition
    // never-kill contract, fuzzed rather than enumerated)
    val fuzzProp = Prop.forAll(Gen.chooseNum(0, 200), Gen.long) { (len, seed) =>
      val b = Array.tabulate(len)(i => ((seed >> (i % 48)) + i * 2654435761L).toByte)
      MultimodalOps.decodeBmp(b)
      MultimodalOps.decodeWav(b)
      MultimodalOps.decodeAvi(b)
      MultimodalOps.decodeBytes(b).length == 16
    }
    check(fuzzProp)
    // and truncations of VALID containers never throw either (garbage
    // rarely has plausible headers; truncation always does)
    val truncProp = Prop.forAll(Gen.chooseNum(0, 100), Gen.long) { (cut, seed) =>
      val avi = MultimodalOps.encodeAviConst(4, 3,
        Seq((seed & 0xFF).toInt -> 2).map { case (c, _) => (c, c, c) })
      val wav = MultimodalOps.encodeWavPcm16(8000, 1,
        Array.tabulate[Short](16)(i => (i * 99).toShort))
      val bmp = MultimodalOps.encodeBmpConst(5, 4, 1, 2, 3)
      Seq(avi, wav, bmp).forall { full =>
        val t = full.take(math.min(cut, full.length))
        MultimodalOps.decodeBytes(t).length == 16
      }
    }
    check(truncProp)
    // RLE8: arbitrary index frames round-trip through the compressed
    // container; single-byte corruption anywhere (header, palette, or
    // the RLE stream itself) never throws — it decodes, degrades to
    // None, or falls back, but the partition survives
    val rleProp = Prop.forAll(
      Gen.chooseNum(1, 9), Gen.chooseNum(1, 9), Gen.chooseNum(1, 3),
      Gen.long, Gen.chooseNum(0, 4096), Gen.chooseNum(0, 255)) {
      (w, h, n, seed, corruptAt, corruptTo) =>
        val frames = (0 until n).map(f =>
          Array.tabulate(w * h)(i => ((seed + f * 131 + i * 17) & 0xFF).toByte))
        val avi = MultimodalOps.encodeAviRle8(
          w, h, MultimodalOps.rle8ArithmeticPalette, frames)
        val v = MultimodalOps.decodeAvi(avi)
        val roundTrip = v.exists(d =>
          d.width == w && d.height == h && d.frames.length == n)
        val mut = avi.clone()
        mut(corruptAt % mut.length) = corruptTo.toByte
        MultimodalOps.decodeBytes(mut) // must not throw
        roundTrip
    }
    check(rleProp)
  }

  test("frame sampling reassembles to the original payload") {
    import spark.implicits._
    val a = MultimodalOps.assets(spark, sf)
    val frames = MultimodalOps.sampleFrames(a, 4)
      .orderBy("asset_id", "frame_idx")
      .select(col("asset_id"), col("frame_bytes"))
      .as[(Long, Array[Byte])]
      .collect()
      .groupBy(_._1).map { case (id, fs) => id -> fs.flatMap(_._2) }
    val originals = a.filter(col("media_type") === "video")
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(frames.keySet == originals.keySet)
    frames.foreach { case (id, bytes) =>
      assert(bytes.sameElements(originals(id)), s"asset $id frames != payload")
    }
  }
}
