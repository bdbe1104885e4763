package graft.operators

/** Dependency-free JPEG codec — baseline sequential (SOF0) AND
  * progressive (SOF2, T.81 Annex G) — public ITU T.81 layout, JFIF color
  * model, the same discipline as `MultimodalOps.decodePng`:
  * bounds-checked marker walk, error-as-value (`None` on anything outside
  * the supported envelope — arithmetic coding, 12-bit
  * precision, >2× sampling factors, hierarchical/lossless), never-throw
  * under corruption (fuzz-pinned), decompressed-size cap before
  * allocating. Output lands in
  * the shared `MultimodalOps.BmpImage` shape (BGR row-major top-down) so
  * every downstream image operator (features, resize) works unchanged.
  *
  * Decoder surface: SOI → tables/misc (DQT 8-bit, DHT canonical Huffman,
  * DRI, APPn/COM skipped) → SOF0 (1 or 3 components, sampling factors
  * 1–2) → SOS → entropy-coded MCU walk (DC prediction + AC run-length,
  * 0xFF00 byte unstuffing, RSTn restart handling) → dequant → fixed-point
  * IDCT → chroma upsample (sample replication) → integer YCbCr→RGB.
  * For SOF2 the same machinery runs scan-by-scan into a per-component
  * coefficient store (spectral-selection bands, successive-approximation
  * bit planes, EOB runs, the AC-refinement correction-bit walk), with
  * dequant + IDCT + assembly deferred to EOI — most web-crawled JPEGs
  * are progressive, so this is the envelope's load-bearing half.
  *
  * Encoder surface exists for the ORACLE CORPUS and the specs, not as a
  * general image encoder: it emits spec-valid baseline streams whose
  * quantized coefficients are chosen DIRECTLY (the per-block-constant
  * corpus is DC-only with quant 8, which makes encode→decode EXACT — the
  * q83/q84 "gradient-corpus trick", see `MultimodalOps.decodableJpegAssets`),
  * plus an arbitrary-coefficient gray form the specs use to pin exact
  * Huffman/RLE coefficient recovery and IDCT accuracy.
  *
  * Reference behavior anchor: the reference service stores media as opaque
  * blobs (`cdc-agents-data-stream` keeps binary payloads opaque end-to-end);
  * the decode surface is the SURVEY's training-pipeline extension, and JPEG
  * is the dominant real-world image container that PNG/BMP left uncovered.
  */
object Jpeg {
  import MultimodalOps.BmpImage

  /** Decoded-plane cap, the PNG discipline: reject hostile dims before
    * allocating (64 MiB of BGR output ≈ 4.6k×4.6k — far above any test
    * asset, bounded per executor thread).
    */
  private val MaxOutBytes = 64L << 20

  /** Zig-zag index order (T.81 Figure A.6): position k in the entropy
    * stream lands at natural-order index ZigZag(k).
    */
  private[operators] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---------------------------------------------------------------------
  // Canonical Huffman tables (T.81 C.2 code assignment)
  // ---------------------------------------------------------------------

  /** Decode-side canonical Huffman table built from a DHT's BITS/HUFFVAL:
    * the spec's mincode/maxcode/valptr walk (T.81 F.2.2.3) — read one bit
    * at a time, length l is accepted once `code <= maxcode(l)`.
    */
  private final class HuffTable(bits: Array[Int], val vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Encode-side canonical codes for the same BITS/HUFFVAL: symbol →
    * (code, length), the generation order of T.81 C.2.
    */
  private final class HuffEncoder(bits: Array[Int], vals: Array[Int]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          codeOf(vals(k)) = code
          lenOf(vals(k)) = l
          code += 1
          k += 1
          i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** The corpus' own spec-valid tables (JPEG files CARRY their Huffman
    * tables in DHT — nothing obliges Annex K's typical ones, and the
    * decoder builds whatever arrives). DC: 12 categories over mixed code
    * lengths (1×2 + 2×3 + 3×4 + 6×5 bits, Kraft 7/8 — the all-ones code
    * stays unused per C.2's reserved-pattern rule). AC: all 162 (run,size)
    * symbols at 8 bits (162/256, same reservation).
    */
  private val DcBits: Array[Int] = Array(0, 1, 2, 3, 6, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = Array.tabulate(12)(identity)
  private val AcBits: Array[Int] = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] = {
    val b = Array.newBuilder[Int]
    b += 0x00 // EOB
    b += 0xF0 // ZRL
    var run = 0
    while (run <= 15) {
      var size = 1
      while (size <= 10) { b += ((run << 4) | size); size += 1 }
      run += 1
    }
    b.result()
  }

  // ---------------------------------------------------------------------
  // Fixed-point IDCT
  // ---------------------------------------------------------------------

  /** Separable fixed-point 2-D inverse DCT: basis `B(u,x) = round(a(u)/2 ·
    * cos((2x+1)uπ/16) · 2^13)` (a(0)=1/√2 — 13-bit precision, libjpeg's
    * CONST_BITS choice, so table-quantization error stays well under the
    * final rounding for pixel-domain coefficient energies), pass 1 keeps
    * 4 fractional bits (`>> 9`), pass 2 descales the composed 2^17 scale
    * in one rounding — within ±1 of the double-precision reference on
    * coefficients of real (pixel-derived) blocks, the IEEE-1180-style
    * accuracy domain (JpegCodecSpec). The all-AC-zero block
    * short-circuits to the exact `(dc + 4) >> 3` flat fill — the standard
    * decoder fast path, and the reason the per-block-constant oracle
    * corpus decodes EXACTLY (with quant 8,
    * `((8·(v−128)) + 4) >> 3 + 128 == v` for every v).
    */
  private val IdctBasis: Array[Int] = {
    val t = new Array[Int](64)
    var u = 0
    while (u < 8) {
      val au = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) =
          math.round(au / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0) * 8192.0).toInt
        x += 1
      }
      u += 1
    }
    t
  }

  /** In-place IDCT of one natural-order dequantized block into 0..255
    * samples (level shift +128, clamped).
    */
  private[operators] def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var allZero = true
    var i = 1
    while (i < 64 && allZero) { if (coef(i) != 0) allZero = false; i += 1 }
    if (allZero) {
      val v = clamp8(((coef(0) + 4) >> 3) + 128)
      java.util.Arrays.fill(out, v)
      return
    }
    // pass 1 (rows of the coefficient matrix → spatial x), scale 2^4
    val tmp = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L
        var u = 0
        while (u < 8) {
          acc += coef(v * 8 + u).toLong * IdctBasis(u * 8 + x)
          u += 1
        }
        tmp(v * 8 + x) = ((acc + 256L) >> 9).toInt
        x += 1
      }
      v += 1
    }
    // pass 2 (columns → spatial y), composed scale 2^17, single rounding
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L
        var w = 0
        while (w < 8) {
          acc += tmp(w * 8 + x).toLong * IdctBasis(w * 8 + y)
          w += 1
        }
        out(y * 8 + x) = clamp8((((acc + 65536L) >> 17) + 128L).toInt)
        x += 1
      }
      y += 1
    }
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Integer JFIF YCbCr→RGB (BT.601 constants at 2^16 fixed point —
    * 1.402→91881, 0.344136→22554, 0.714136→46802, 1.772→116130; `>> 16`
    * is floor, which the q84 oracle replays as `floor(x / 65536.0)`).
    */
  private[operators] def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val cb0 = cb - 128
    val cr0 = cr - 128
    val r = y + ((91881 * cr0 + 32768) >> 16)
    val g = y + ((-22554 * cb0 - 46802 * cr0 + 32768) >> 16)
    val b = y + ((116130 * cb0 + 32768) >> 16)
    (clamp8(r), clamp8(g), clamp8(b))
  }

  // ---------------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------------

  /** Internal bail for any malformation past the point where returning
    * `None` inline gets unwieldy; caught at the `decodeJpeg` boundary.
    */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  /** Bit reader over the entropy-coded segment: MSB-first, 0xFF00
    * unstuffed; any other 0xFF-marker (or end of data) parks the reader —
    * a read past it bails (truncated stream), while `atRestart` lets the
    * MCU loop consume an expected RSTn and continue.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    private var parkedAtMarker = false

    private def fill(): Unit = {
      while (nBits <= 24 && !parkedAtMarker) {
        if (pos >= b.length) { parkedAtMarker = true }
        else {
          val v = b(pos) & 0xFF
          if (v == 0xFF) {
            if (pos + 1 >= b.length) { parkedAtMarker = true }
            else {
              val m = b(pos + 1) & 0xFF
              if (m == 0x00) { acc = (acc << 8) | 0xFF; nBits += 8; pos += 2 }
              else if (m == 0xFF) { pos += 1 } // fill byte before a marker
              else parkedAtMarker = true
            }
          } else { acc = (acc << 8) | v; nBits += 8; pos += 1 }
        }
      }
    }

    def readBit(): Int = {
      if (nBits == 0) fill()
      if (nBits == 0) bail()
      nBits -= 1
      (acc >>> nBits) & 1
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** Discard buffered bits (alignment padding), walk past any residual
      * padding/stuffed bytes (bounded — the encoder pads at most one byte,
      * stuffed to two if it lands on 0xFF), and consume the expected RSTn
      * marker; bails on anything else.
      */
    def consumeRestart(): Unit = {
      acc = 0; nBits = 0
      var guard = 0
      while (guard < 8) {
        if (pos + 1 >= b.length) bail()
        if ((b(pos) & 0xFF) == 0xFF) {
          val m = b(pos + 1) & 0xFF
          if (m >= 0xD0 && m <= 0xD7) { pos += 2; parkedAtMarker = false; return }
          else if (m == 0x00) pos += 2 // stuffed padding byte
          else if (m == 0xFF) pos += 1 // fill byte
          else bail()
        } else pos += 1 // unconsumed padding byte
        guard += 1
      }
      bail()
    }
  }

  /** T.81 F.2.2.3 Huffman DECODE + F.2.2.1 EXTEND. */
  private def huffDecode(br: BitReader, t: HuffTable): Int = {
    var code = br.readBit()
    var l = 1
    while (code > t.maxCode(l)) {
      l += 1
      if (l > 16) bail()
      code = (code << 1) | br.readBit()
    }
    val idx = t.valPtr(l) + code - t.minCode(l)
    if (idx < 0 || idx >= t.vals.length) bail()
    t.vals(idx) & 0xFF
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(
      id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0, var pred: Int = 0)

  /** Decode a baseline-sequential JPEG into the shared BGR top-down image
    * shape; `None` outside the supported envelope or on corruption (the
    * whole body is bail-guarded — corruption degrades, never throws).
    */
  def decodeJpeg(b: Array[Byte]): Option[BmpImage] =
    try decodeJpegImpl(b, wantCoeffs = false).map(_._1)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Spec hook: the dequant-input (post-entropy-decode, PRE-dequant)
    * coefficient blocks of the FIRST scan component in MCU order, natural
    * index order — pins exact Huffman/RLE/byte-stuffing/restart recovery
    * independently of the IDCT.
    */
  private[operators] def decodeJpegCoefficients(b: Array[Byte]): Option[Vector[Array[Int]]] =
    try decodeJpegImpl(b, wantCoeffs = true).map(_._2)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeJpegImpl(
      b: Array[Byte], wantCoeffs: Boolean): Option[(BmpImage, Vector[Array[Int]])] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var p = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var restartInterval = 0
    var comps: Array[Comp] = null
    var width = 0
    var height = 0
    // progressive (SOF2) state: accumulated natural-order coefficient
    // blocks per component, filled scan by scan, reconstructed at EOI
    var progressive = false
    var coefStore: Array[Array[Int]] = null
    var anyScan = false

    def u16(o: Int): Int = {
      if (o + 1 >= b.length) bail()
      ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    }

    // derived frame geometry, set once SOF arrives
    def hMax = comps.map(_.h).max
    def vMax = comps.map(_.v).max
    def mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    def mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // padded (whole-MCU) block-grid width, and the TRUE component block
    // grid a non-interleaved scan covers (T.81 A.2.2: ceil(comp dim / 8),
    // NOT the MCU-padded grid)
    def blocksW(ci: Int) = mcusX * comps(ci).h
    def compBlocksW(ci: Int) =
      ((width * comps(ci).h + hMax - 1) / hMax + 7) / 8
    def compBlocksH(ci: Int) =
      ((height * comps(ci).v + vMax - 1) / vMax + 7) / 8

    // p+2: EOI is a bare 2-byte marker at the very end of a progressive
    // stream (framed segments bounds-check their own lengths via u16)
    while (p + 2 <= b.length) {
      if ((b(p) & 0xFF) != 0xFF) return None
      var marker = b(p + 1) & 0xFF
      while (marker == 0xFF && p + 2 < b.length) { p += 1; marker = b(p + 1) & 0xFF }
      p += 2
      marker match {
        case 0xD9 => // EOI: progressive frames reconstruct here
          if (progressive && anyScan)
            return reconstructProgressive(
              comps, coefStore, quant, width, height, wantCoeffs)
          return None // EOI before any scan: no image
        case m if m >= 0xD0 && m <= 0xD7 => () // stray RST: skip
        case 0x01 => () // TEM, standalone
        case 0xDB => // DQT
          val len = u16(p)
          val end = p + len
          if (end > b.length || len < 2) return None
          var q = p + 2
          while (q < end) {
            val pq = (b(q) & 0xFF) >> 4
            val tq = b(q) & 0x0F
            if (pq != 0 || tq > 3 || q + 65 > end) return None // 8-bit tables only
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) { tab(ZigZag(k)) = b(q + 1 + k) & 0xFF; k += 1 }
            quant(tq) = tab
            q += 65
          }
          p = end
        case 0xC4 => // DHT
          val len = u16(p)
          val end = p + len
          if (end > b.length || len < 2) return None
          var q = p + 2
          while (q < end) {
            val tc = (b(q) & 0xFF) >> 4
            val th = b(q) & 0x0F
            if (tc > 1 || th > 3 || q + 17 > end) return None
            val bits = new Array[Int](16)
            var n = 0
            var k = 0
            while (k < 16) { bits(k) = b(q + 1 + k) & 0xFF; n += bits(k); k += 1 }
            if (n == 0 || n > 256 || q + 17 + n > end) return None
            val vals = new Array[Byte](n)
            System.arraycopy(b, q + 17, vals, 0, n)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            q += 17 + n
          }
          p = end
        case 0xDD => // DRI
          val len = u16(p)
          if (len != 4 || p + 4 > b.length) return None
          restartInterval = u16(p + 2)
          p += len
        case sof0 if sof0 == 0xC0 || sof0 == 0xC2 => // SOF0 baseline / SOF2 progressive
          if (comps != null) return None // second frame header
          progressive = sof0 == 0xC2
          val len = u16(p)
          if (p + len > b.length || len < 8) return None
          val prec = b(p + 2) & 0xFF
          height = u16(p + 3)
          width = u16(p + 5)
          val nf = b(p + 7) & 0xFF
          if (prec != 8 || width <= 0 || height <= 0 || (nf != 1 && nf != 3)) return None
          if (3L * width * height > MaxOutBytes) return None
          if (len != 8 + 3 * nf) return None
          comps = Array.tabulate(nf) { i =>
            val o = p + 8 + 3 * i
            val cid = b(o) & 0xFF
            val h = (b(o + 1) & 0xFF) >> 4
            val v = b(o + 1) & 0x0F
            val tq = b(o + 2) & 0xFF
            if (h < 1 || h > 2 || v < 1 || v > 2 || tq > 3) bail()
            Comp(cid, h, v, tq)
          }
          if (nf == 1 && (comps(0).h != 1 || comps(0).v != 1)) return None
          if (progressive) {
            // coefficient store is 4 bytes/sample (vs 1 for a decoded
            // plane): tighter hostile-dims cap before allocating
            coefStore = Array.tabulate(nf) { ci =>
              val n = blocksW(ci).toLong * (mcusY * comps(ci).v) * 64L
              if (n * 4 > MaxOutBytes) bail()
              new Array[Int](n.toInt)
            }
          }
          p += len
        case sof if sof == 0xC1 || sof == 0xC3 ||
            (sof >= 0xC5 && sof <= 0xC7) || (sof >= 0xC9 && sof <= 0xCF && sof != 0xCC) =>
          return None // extended/lossless/arithmetic: unsupported
        case 0xDA => // SOS — entropy-coded data follows
          if (comps == null) return None
          val len = u16(p)
          if (p + len > b.length || len < 3) return None
          val ns = b(p + 2) & 0xFF
          if (!progressive) {
            if (ns != comps.length || len != 6 + 2 * ns) return None
            var i = 0
            while (i < ns) {
              val cs = b(p + 3 + 2 * i) & 0xFF
              val c = comps.find(_.id == cs).getOrElse(bail())
              c.td = (b(p + 4 + 2 * i) & 0xFF) >> 4
              c.ta = b(p + 4 + 2 * i) & 0x0F
              if (c.td > 3 || c.ta > 3) return None
              i += 1
            }
            return decodeScan(
              b, p + len, comps, width, height, quant, dcTabs, acTabs,
              restartInterval, wantCoeffs)
          }
          // progressive scan: parse header (incl. spectral selection +
          // successive approximation), decode into the store, resume the
          // marker walk after the entropy data
          if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) return None
          val scanCis = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = b(p + 3 + 2 * i) & 0xFF
            val ci = comps.indexWhere(_.id == cs)
            if (ci < 0) return None
            comps(ci).td = (b(p + 4 + 2 * i) & 0xFF) >> 4
            comps(ci).ta = b(p + 4 + 2 * i) & 0x0F
            if (comps(ci).td > 3 || comps(ci).ta > 3) return None
            scanCis(i) = ci
            i += 1
          }
          val ss = b(p + 3 + 2 * ns) & 0xFF
          val se = b(p + 4 + 2 * ns) & 0xFF
          val ah = (b(p + 5 + 2 * ns) & 0xFF) >> 4
          val al = b(p + 5 + 2 * ns) & 0x0F
          // envelope: DC scans are (0,0); AC scans are single-component
          // bands inside 1..63; refinements move exactly one bit
          if (ss == 0) { if (se != 0) return None }
          else { if (ns != 1 || se < ss || se > 63) return None }
          if (al > 13 || (ah != 0 && ah != al + 1)) return None
          p = decodeProgScan(
            b, p + len, scanCis, comps, coefStore,
            Array.tabulate(comps.length)(blocksW),
            Array.tabulate(comps.length)(compBlocksW),
            Array.tabulate(comps.length)(compBlocksH),
            mcusX, mcusY, dcTabs, acTabs, restartInterval, ss, se, ah, al)
          anyScan = true
        case _ => // APPn / COM / anything segment-framed: skip by length
          val len = u16(p)
          if (len < 2 || p + len > b.length) return None
          p += len
      }
    }
    None
  }

  private def decodeScan(
      b: Array[Byte], dataStart: Int, comps: Array[Comp],
      width: Int, height: Int, quant: Array[Array[Int]],
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      restartInterval: Int, wantCoeffs: Boolean): Option[(BmpImage, Vector[Array[Int]])] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component planes at component resolution, padded to whole MCUs
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    for (ci <- comps.indices) {
      if (quant(comps(ci).tq) == null) bail()
      if (dcTabs(comps(ci).td) == null || acTabs(comps(ci).ta) == null) bail()
      if (planeW(ci).toLong * planeH(ci) > MaxOutBytes) bail()
    }
    val planes = Array.tabulate(comps.length)(ci => new Array[Byte](planeW(ci) * planeH(ci)))
    val br = new BitReader(b, dataStart)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    val coeffsOut = Vector.newBuilder[Array[Int]]
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.consumeRestart()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // entropy-decode one block (T.81 F.2.2.1/F.2.2.2)
            java.util.Arrays.fill(coef, 0)
            val t = huffDecode(br, dcTabs(c.td))
            if (t > 11) bail()
            val diff = extend(br.readBits(t), t)
            c.pred += diff
            coef(0) = c.pred
            var k = 1
            while (k < 64) {
              val rs = huffDecode(br, acTabs(c.ta))
              val r = rs >> 4
              val s = rs & 0x0F
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                if (k > 63 || s > 10) bail()
                coef(ZigZag(k)) = extend(br.readBits(s), s)
                k += 1
              }
            }
            if (wantCoeffs && ci == 0) coeffsOut += coef.clone()
            // dequant + IDCT into the component plane
            var i = 0
            while (i < 64) { coef(i) *= qt(i); i += 1 }
            idctBlock(coef, px)
            val x0 = (mx * c.h + bx) * 8
            val y0 = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((y0 + yy) * planeW(ci) + x0 + xx) = px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    Some((assemblePlanes(comps, planes, planeW, width, height, hMax, vMax),
      coeffsOut.result()))
  }

  /** Shared by the baseline and progressive paths: sample each component
    * plane at full resolution (nearest / sample-replication upsample via
    * the h/hMax ratio), convert color, emit the BGR top-down image.
    */
  private def assemblePlanes(
      comps: Array[Comp], planes: Array[Array[Byte]], planeW: Array[Int],
      width: Int, height: Int, hMax: Int, vMax: Int): BmpImage = {
    val out = new Array[Byte](width * height * 3)
    if (comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = planes(0)(y * pw + x)
          val o = (y * width + x) * 3
          out(o) = g; out(o + 1) = g; out(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val cY = comps(0); val cCb = comps(1); val cCr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = planes(0)((y * cY.v / vMax) * planeW(0) + (x * cY.h / hMax)) & 0xFF
          val cb = planes(1)((y * cCb.v / vMax) * planeW(1) + (x * cCb.h / hMax)) & 0xFF
          val cr = planes(2)((y * cCr.v / vMax) * planeW(2) + (x * cCr.h / hMax)) & 0xFF
          val (r, g, bb) = yccToRgb(yv, cb, cr)
          val o = (y * width + x) * 3
          out(o) = bb.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
          x += 1
        }
        y += 1
      }
    }
    BmpImage(width, height, 24, out)
  }

  // ---------------------------------------------------------------------
  // Progressive decoding (T.81 Annex G: spectral selection + successive
  // approximation over the same Huffman/IDCT machinery)
  // ---------------------------------------------------------------------

  /** Decode ONE progressive scan into the per-component natural-order
    * coefficient store; returns the offset of the next marker (the
    * caller's marker walk resumes there — DQT/DHT/DRI may interleave with
    * scans, and reconstruction waits for EOI). Scan kinds (G.1.1):
    *   - DC first (Ss=0, Ah=0): baseline DC prediction, coefficient
    *     enters at `diff << Al` — interleaved over whole MCUs when the
    *     scan names several components, block raster otherwise;
    *   - DC refine (Ss=0, Ah=Al+1): one raw bit per block ORs in 1<<Al;
    *   - AC first (Ss≥1, Ah=0, single component): baseline RLE plus the
    *     EOBn run codes — an EOB run of n covers n entirely-zero bands;
    *   - AC refine (Ss≥1, Ah=Al+1): the correction-bit walk — run
    *     lengths count ZERO-HISTORY positions, already-nonzero
    *     coefficients consume one correction bit each as the walk passes,
    *     new coefficients enter as ±1<<Al, and EOB-covered bands still
    *     read correction bits for their nonzero coefficients.
    * Restart markers reset DC predictors AND the EOB run (counted in
    * MCUs when interleaved, in blocks otherwise).
    */
  private def decodeProgScan(
      b: Array[Byte], dataStart: Int, scanCis: Array[Int], comps: Array[Comp],
      store: Array[Array[Int]], blocksW: Array[Int],
      compBlocksW: Array[Int], compBlocksH: Array[Int],
      mcusX: Int, mcusY: Int,
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      restartInterval: Int, ss: Int, se: Int, ah: Int, al: Int): Int = {
    // table presence: DC-first needs its DC table, AC scans their AC
    // table; DC refinement reads raw bits only
    var si = 0
    while (si < scanCis.length) {
      val c = comps(scanCis(si))
      if (ss == 0 && ah == 0 && dcTabs(c.td) == null) bail()
      if (ss > 0 && acTabs(c.ta) == null) bail()
      si += 1
    }
    val br = new BitReader(b, dataStart)
    comps.foreach(_.pred = 0)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al

    // correction bits for already-nonzero coefficients in [from, se] of
    // one block — the EOB-covered-band read (G.1.2.3)
    def refineTail(arr: Array[Int], blk: Int, from: Int): Unit = {
      var j = from
      while (j <= se) {
        val idx = blk + ZigZag(j)
        if (arr(idx) != 0) {
          if (br.readBit() == 1 && (arr(idx) & p1) == 0)
            arr(idx) += (if (arr(idx) > 0) p1 else m1)
        }
        j += 1
      }
    }

    def decodeBlock(ci: Int, blockRow: Int, blockCol: Int): Unit = {
      val c = comps(ci)
      val arr = store(ci)
      val blk = (blockRow * blocksW(ci) + blockCol) * 64
      if (ss == 0) {
        if (ah == 0) { // DC first
          val t = huffDecode(br, dcTabs(c.td))
          if (t > 11) bail()
          val diff = extend(br.readBits(t), t)
          c.pred += diff
          arr(blk) = c.pred << al
        } else { // DC refine
          if (br.readBit() == 1) arr(blk) |= p1
        }
      } else if (ah == 0) { // AC first
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        while (k <= se) {
          val rs = huffDecode(br, acTabs(c.ta))
          val r = rs >> 4
          val s = rs & 0x0F
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1 + (if (r > 0) br.readBits(r) else 0)
              k = se + 1 // band ends here
            } else k += 16 // ZRL
          } else {
            k += r
            if (k > se || s > 10) bail()
            arr(blk + ZigZag(k)) = extend(br.readBits(s), s) << al
            k += 1
          }
        }
      } else { // AC refine
        if (eobrun > 0) { eobrun -= 1; refineTail(arr, blk, ss); return }
        var k = ss
        while (k <= se) {
          val rs = huffDecode(br, acTabs(c.ta))
          var r = rs >> 4
          val s = rs & 0x0F
          var newCoef = 0
          var endOfBand = false
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1 + (if (r > 0) br.readBits(r) else 0)
              endOfBand = true
            } // r == 15: ZRL, the walk below advances 16 zero-history slots
          } else {
            if (s != 1) bail() // refinement moves one bit: new coefs are ±1
            newCoef = if (br.readBit() == 1) p1 else m1
          }
          if (endOfBand) {
            refineTail(arr, blk, k)
            k = se + 1
          } else {
            var done = false
            while (!done && k <= se) {
              val idx = blk + ZigZag(k)
              if (arr(idx) != 0) {
                if (br.readBit() == 1 && (arr(idx) & p1) == 0)
                  arr(idx) += (if (arr(idx) > 0) p1 else m1)
              } else {
                if (r == 0) {
                  if (s != 0) arr(idx) = newCoef
                  done = true
                } else r -= 1
              }
              k += 1
            }
            if (!done && s != 0) bail() // promised coefficient never landed
          }
        }
      }
    }

    if (ss == 0 && scanCis.length > 1) {
      // interleaved DC scan over whole MCUs (incl. the padding blocks —
      // T.81 interleave covers every h×v block of every MCU)
      val nMcus = mcusX * mcusY
      var mcu = 0
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.consumeRestart(); comps.foreach(_.pred = 0); eobrun = 0
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var i = 0
        while (i < scanCis.length) {
          val ci = scanCis(i)
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              decodeBlock(ci, my * c.v + by, mx * c.h + bx)
              bx += 1
            }
            by += 1
          }
          i += 1
        }
        mcu += 1
      }
    } else {
      // non-interleaved: the TRUE component block grid (never the
      // MCU-padded one), row-major
      val ci = scanCis(0)
      val bW = compBlocksW(ci)
      val bH = compBlocksH(ci)
      var blkNo = 0
      val total = bW * bH
      while (blkNo < total) {
        if (restartInterval > 0 && blkNo > 0 && blkNo % restartInterval == 0) {
          br.consumeRestart(); comps.foreach(_.pred = 0); eobrun = 0
        }
        decodeBlock(ci, blkNo / bW, blkNo % bW)
        blkNo += 1
      }
    }
    // resume the marker walk at the next real marker: skip residual
    // padding, stuffed bytes, fill bytes, and stray restarts
    var q = br.pos
    while (q + 1 < b.length) {
      if ((b(q) & 0xFF) == 0xFF) {
        val m = b(q + 1) & 0xFF
        if (m == 0x00) q += 2
        else if (m == 0xFF) q += 1
        else if (m >= 0xD0 && m <= 0xD7) q += 2
        else return q
      } else q += 1
    }
    bail()
  }

  /** EOI of a progressive frame: dequantize + IDCT the accumulated
    * coefficient store into component planes, then the shared assembly.
    * Only the true component block grid feeds visible pixels; padded MCU
    * blocks (written by interleaved DC scans) land in the plane's padding
    * and are never sampled.
    */
  private def reconstructProgressive(
      comps: Array[Comp], store: Array[Array[Int]],
      quant: Array[Array[Int]], width: Int, height: Int,
      wantCoeffs: Boolean): Option[(BmpImage, Vector[Array[Int]])] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    for (ci <- comps.indices) if (quant(comps(ci).tq) == null) bail()
    val planes = Array.tabulate(comps.length)(ci =>
      new Array[Byte](planeW(ci) * planeH(ci)))
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    val coeffsOut = Vector.newBuilder[Array[Int]]
    var ci = 0
    while (ci < comps.length) {
      val qt = quant(comps(ci).tq)
      val bW = planeW(ci) / 8
      val bH = planeH(ci) / 8
      var brow = 0
      while (brow < bH) {
        var bcol = 0
        while (bcol < bW) {
          val blk = (brow * bW + bcol) * 64
          var i = 0
          while (i < 64) { coef(i) = store(ci)(blk + i); i += 1 }
          if (wantCoeffs && ci == 0) coeffsOut += coef.clone()
          var j = 0
          while (j < 64) { coef(j) *= qt(j); j += 1 }
          idctBlock(coef, px)
          val x0 = bcol * 8
          val y0 = brow * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(ci)((y0 + yy) * planeW(ci) + x0 + xx) = px(yy * 8 + xx).toByte
              xx += 1
            }
            yy += 1
          }
          bcol += 1
        }
        brow += 1
      }
      ci += 1
    }
    Some((assemblePlanes(comps, planes, planeW, width, height, hMax, vMax),
      coeffsOut.result()))
  }

  // ---------------------------------------------------------------------
  // Corpus/spec encoder
  // ---------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Byte-align with 1-bits (T.81 F.1.2.3 pads with 1s before markers). */
    def align(): Unit = if (nBits > 0) write((1 << (8 - nBits)) - 1, 8 - nBits)
  }

  private def magnitudeCat(v: Int): Int = {
    var t = 0
    var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  /** Quant table with the given DC step and a flat AC step, zigzag order
    * for the DQT payload.
    */
  private def quantZigZag(dcStep: Int, acStep: Int): Array[Int] =
    Array.tabulate(64)(k => if (k == 0) dcStep else acStep)

  private def writeSegment(out: java.io.ByteArrayOutputStream, marker: Int, body: Array[Int]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    body.foreach(v => out.write(v & 0xFF))
  }

  private def dhtBody(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Array[Int] =
    Array((tc << 4) | th) ++ bits ++ vals

  private def dqtBody(tq: Int, zz: Array[Int]): Array[Int] = Array(tq) ++ zz

  /** Encode one block's coefficients (NATURAL order, quantized) with the
    * given encoders; returns the new DC predictor.
    */
  private def encodeBlock(
      bw: BitWriter, coefNatural: Array[Int], pred: Int,
      dc: HuffEncoder, ac: HuffEncoder): Int = {
    val diff = coefNatural(0) - pred
    val t = magnitudeCat(diff)
    bw.write(dc.codeOf(t), dc.lenOf(t))
    if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = coefNatural(ZigZag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { bw.write(ac.codeOf(0xF0), ac.lenOf(0xF0)); run -= 16 }
        val s = magnitudeCat(v)
        val rs = (run << 4) | s
        bw.write(ac.codeOf(rs), ac.lenOf(rs))
        bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.write(ac.codeOf(0x00), ac.lenOf(0x00)) // EOB
    coefNatural(0)
  }

  /** Grayscale baseline JPEG from DIRECT quantized coefficient blocks
    * (natural order, row-major block order), quant table in natural order.
    * The general spec path: arbitrary AC content, ZRL runs, restart
    * intervals — everything the decoder must recover exactly.
    */
  def encodeJpegCoeffsGray(
      wBlocks: Int, hBlocks: Int, blocks: Seq[Array[Int]],
      quantNatural: Array[Int], restartInterval: Int = 0): Array[Byte] =
    encodeJpegCoeffsGrayDims(
      wBlocks * 8, hBlocks * 8, wBlocks, hBlocks, blocks, quantNatural,
      restartInterval)

  /** As `encodeJpegCoeffsGray` but with TRUE image dims in the SOF (the
    * block grid covers ceil(dim/8); the decoder crops the padding).
    */
  private def encodeJpegCoeffsGrayDims(
      w: Int, h: Int, wBlocks: Int, hBlocks: Int, blocks: Seq[Array[Int]],
      quantNatural: Array[Int], restartInterval: Int = 0): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0 && blocks.length == wBlocks * hBlocks)
    require(w >= 1 && h >= 1 && wBlocks == (w + 7) / 8 && hBlocks == (h + 7) / 8)
    require(quantNatural.length == 64 && quantNatural.forall(q => q >= 1 && q <= 255))
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write(0xFF); out.write(0xD8) // SOI
    // APP0/JFIF (units 0, 1:1 aspect, no thumbnail) — realistic header walk
    writeSegment(out, 0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val zz = Array.tabulate(64)(k => quantNatural(ZigZag(k)))
    writeSegment(out, 0xDB, dqtBody(0, zz))
    writeSegment(out, 0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF,
      1, 1, 0x11, 0))
    writeSegment(out, 0xC4, dhtBody(0, 0, DcBits, DcVals))
    writeSegment(out, 0xC4, dhtBody(1, 0, AcBits, AcVals))
    if (restartInterval > 0)
      writeSegment(out, 0xDD, Array((restartInterval >> 8) & 0xFF, restartInterval & 0xFF))
    writeSegment(out, 0xDA, Array(1, 1, 0x00, 0, 63, 0))
    val dcEnc = new HuffEncoder(DcBits, DcVals)
    val acEnc = new HuffEncoder(AcBits, AcVals)
    val bw = new BitWriter(out)
    var pred = 0
    var i = 0
    var rst = 0
    while (i < blocks.length) {
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        bw.align()
        out.write(0xFF); out.write(0xD0 + rst)
        rst = (rst + 1) % 8
        pred = 0
      }
      pred = encodeBlock(bw, blocks(i), pred, dcEnc, acEnc)
      i += 1
    }
    bw.align()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // Progressive encoder (Annex G write path for the corpus/specs)
  // ---------------------------------------------------------------------

  /** The classic spectral-selection + successive-approximation scan
    * script (DC bit-split, two AC bands refined one bit at a time) —
    * every progressive decode arm gets exercised: DC first/refine,
    * AC first/refine, EOB runs, ZRL, correction bits.
    */
  val DefaultProgScans: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 0, 1), (0, 0, 1, 0),
    (1, 5, 0, 2), (6, 63, 0, 2),
    (1, 5, 2, 1), (6, 63, 2, 1),
    (1, 5, 1, 0), (6, 63, 1, 0))

  /** The baseline AC alphabet plus the fourteen EOBn symbols (run<<4,
    * size 0 for run 1..14) Annex G scans emit for EOB runs — 176 symbols
    * at 8 bits (Kraft 176/256, reservation rule intact). Baseline streams
    * keep the 162-symbol table; only progressive scans need EOBn.
    */
  private val AcBitsProg: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcValsProg: Array[Int] = AcVals ++ (1 to 14).map(_ << 4)

  /** One progressive scan's entropy encoder (T.81 G.1.2): DC point
    * transform is an arithmetic shift; AC first codes v/2^Al (toward
    * zero) with EOB-run accumulation; AC refine emits newly-significant
    * coefficients as (zero-history-run, ±1) with correction bits for
    * already-nonzero coefficients buffered and flushed AFTER each symbol
    * — the flush-before-buffering discipline at every nonzero position
    * keeps each correction bit inside the decoder walk that passes its
    * position (the G.7 subtlety; see the refine-parity spec).
    */
  private final class ProgScanEncoder(
      bw: BitWriter, acEnc: HuffEncoder, dcEnc: HuffEncoder,
      ss: Int, se: Int, ah: Int, al: Int) {
    private var eobrun = 0
    private val ebits = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val preds = new Array[Int](4)

    private def flushEob(): Unit = if (eobrun > 0) {
      val rb = 31 - Integer.numberOfLeadingZeros(eobrun)
      bw.write(acEnc.codeOf(rb << 4), acEnc.lenOf(rb << 4))
      if (rb > 0) bw.write(eobrun - (1 << rb), rb)
      ebits.foreach(bit => bw.write(bit, 1))
      ebits.clear()
      eobrun = 0
    }

    /** Before a restart marker: pending EOB run flushes, predictors reset
      * (the decoder resets both at RSTn).
      */
    def restartReset(): Unit = { flushEob(); java.util.Arrays.fill(preds, 0) }

    def block(coefN: Array[Int], compIdx: Int): Unit = {
      if (ss == 0) {
        if (ah == 0) { // DC first: arithmetic-shift point transform
          val v = coefN(0) >> al
          val diff = v - preds(compIdx)
          preds(compIdx) = v
          val t = magnitudeCat(diff)
          bw.write(dcEnc.codeOf(t), dcEnc.lenOf(t))
          if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        } else { // DC refine: the next lower bit
          bw.write((coefN(0) >> al) & 1, 1)
        }
      } else if (ah == 0) { // AC first
        var r = 0
        var k = ss
        while (k <= se) {
          val v0 = coefN(ZigZag(k))
          val t = if (v0 >= 0) v0 >> al else -((-v0) >> al) // toward zero
          if (t == 0) r += 1
          else {
            flushEob()
            while (r > 15) {
              bw.write(acEnc.codeOf(0xF0), acEnc.lenOf(0xF0)); r -= 16
            }
            val s = magnitudeCat(t)
            require(s <= 10, "progressive AC magnitude out of table range")
            bw.write(acEnc.codeOf((r << 4) | s), acEnc.lenOf((r << 4) | s))
            bw.write(if (t < 0) t + (1 << s) - 1 else t, s)
            r = 0
          }
          k += 1
        }
        if (r > 0) { eobrun += 1; if (eobrun == 0x7FFF) flushEob() }
      } else { // AC refine
        // last newly-significant position (|v|>>Al == 1): the walk's EOB
        var kEnd = ss - 1
        var k = ss
        while (k <= se) {
          if ((math.abs(coefN(ZigZag(k))) >> al) == 1) kEnd = k
          k += 1
        }
        if (kEnd < ss) {
          // whole band EOB-covered: its correction bits ride the EOB run
          eobrun += 1
          var j = ss
          while (j <= se) {
            val a = math.abs(coefN(ZigZag(j))) >> al
            if (a > 1) ebits += (a & 1)
            j += 1
          }
          if (eobrun == 0x7FFF) flushEob()
        } else {
          flushEob()
          val br = scala.collection.mutable.ArrayBuffer.empty[Int]
          var r = 0
          k = ss
          while (k <= kEnd) {
            val v0 = coefN(ZigZag(k))
            val a = math.abs(v0) >> al
            if (a == 0) r += 1
            else {
              // ZRL check BEFORE buffering: every bit buffered at r ≤ 15
              // lands inside the decoder walk that passes its position
              while (r > 15) {
                bw.write(acEnc.codeOf(0xF0), acEnc.lenOf(0xF0))
                br.foreach(bit => bw.write(bit, 1)); br.clear()
                r -= 16
              }
              if (a > 1) br += (a & 1) // history: correction bit
              else { // newly significant: (run, 1) + sign + buffered bits
                bw.write(acEnc.codeOf((r << 4) | 1), acEnc.lenOf((r << 4) | 1))
                bw.write(if (v0 > 0) 1 else 0, 1)
                br.foreach(bit => bw.write(bit, 1)); br.clear()
                r = 0
              }
            }
            k += 1
          }
          if (kEnd < se) { // tail of this block rides a fresh EOB run
            eobrun += 1
            var j = kEnd + 1
            while (j <= se) {
              val a = math.abs(coefN(ZigZag(j))) >> al
              if (a > 1) ebits += (a & 1)
              j += 1
            }
            if (eobrun == 0x7FFF) flushEob()
          }
        }
      }
    }

    def finish(): Unit = { flushEob(); bw.align() }
  }

  /** Grayscale PROGRESSIVE JPEG from DIRECT quantized coefficient blocks
    * (natural order, raster block order; true dims in SOF2, grid covers
    * ceil(dim/8)) — the Annex G write path over the same canonical
    * tables as the baseline encoder, so `decodeJpeg(progressive) ==
    * decodeJpeg(baseline)` on identical blocks is a pure decoder-path
    * parity statement (the spec's cross-check).
    */
  def encodeJpegProgGray(
      w: Int, h: Int, blocks: Seq[Array[Int]], quantNatural: Array[Int],
      scans: Seq[(Int, Int, Int, Int)] = DefaultProgScans,
      restartInterval: Int = 0): Array[Byte] = {
    val wB = (w + 7) / 8
    val hB = (h + 7) / 8
    require(w >= 1 && h >= 1 && blocks.length == wB * hB)
    require(quantNatural.length == 64 && quantNatural.forall(q => q >= 1 && q <= 255))
    require(scans.nonEmpty)
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write(0xFF); out.write(0xD8)
    writeSegment(out, 0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSegment(out, 0xDB, dqtBody(0, Array.tabulate(64)(k => quantNatural(ZigZag(k)))))
    writeSegment(out, 0xC2, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF,
      1, 1, 0x11, 0))
    writeSegment(out, 0xC4, dhtBody(0, 0, DcBits, DcVals))
    writeSegment(out, 0xC4, dhtBody(1, 0, AcBitsProg, AcValsProg))
    if (restartInterval > 0)
      writeSegment(out, 0xDD, Array((restartInterval >> 8) & 0xFF, restartInterval & 0xFF))
    val dcEnc = new HuffEncoder(DcBits, DcVals)
    val acEnc = new HuffEncoder(AcBitsProg, AcValsProg)
    for ((ss, se, ah, al) <- scans) {
      require(ss >= 0 && se >= ss && se <= 63 && (ss > 0 || se == 0))
      writeSegment(out, 0xDA, Array(1, 1, 0x00, ss, se, (ah << 4) | al))
      val bw = new BitWriter(out)
      val enc = new ProgScanEncoder(bw, acEnc, dcEnc, ss, se, ah, al)
      var rst = 0
      var i = 0
      while (i < blocks.length) {
        if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
          enc.restartReset()
          bw.align()
          out.write(0xFF); out.write(0xD0 + rst)
          rst = (rst + 1) % 8
        }
        enc.block(blocks(i), 0)
        i += 1
      }
      enc.finish()
    }
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  /** Color 4:2:0 per-MACROBLOCK-constant PROGRESSIVE JPEG — the Annex G
    * counterpart of `encodeJpeg420Mcus` (same DC-only flat macroblocks,
    * so decode is exact): an interleaved 3-component DC-first scan +
    * DC refine, then per-component AC band scans that are pure EOB-run
    * streams over the all-zero bands — the interleaved-DC walk,
    * subsampled non-interleaved block grids, and many-block EOB runs all
    * sit on the decode path.
    */
  def encodeJpegProg420Mcus(
      wMcus: Int, hMcus: Int, ycc: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(wMcus > 0 && hMcus > 0)
    // per-component DC values (all AC zero): Y at 2×2 blocks per MCU
    val yDc = new Array[Int](4 * wMcus * hMcus) // (2*wMcus) × (2*hMcus) raster
    val cbDc = new Array[Int](wMcus * hMcus)
    val crDc = new Array[Int](wMcus * hMcus)
    var my = 0
    while (my < hMcus) {
      var mx = 0
      while (mx < wMcus) {
        val (yv, cb, cr) = ycc(mx, my)
        require(yv >= 0 && yv <= 255 && cb >= 0 && cb <= 255 && cr >= 0 && cr <= 255)
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            yDc((my * 2 + by) * (wMcus * 2) + mx * 2 + bx) = yv - 128
            bx += 1
          }
          by += 1
        }
        cbDc(my * wMcus + mx) = cb - 128
        crDc(my * wMcus + mx) = cr - 128
        mx += 1
      }
      my += 1
    }
    val out = new java.io.ByteArrayOutputStream(2048)
    out.write(0xFF); out.write(0xD8)
    writeSegment(out, 0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSegment(out, 0xDB, dqtBody(0, quantZigZag(8, 16)))
    writeSegment(out, 0xDB, dqtBody(1, quantZigZag(8, 17)))
    val w = wMcus * 16
    val h = hMcus * 16
    writeSegment(out, 0xC2, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    writeSegment(out, 0xC4, dhtBody(0, 0, DcBits, DcVals))
    writeSegment(out, 0xC4, dhtBody(1, 0, AcBitsProg, AcValsProg))
    val dcEnc = new HuffEncoder(DcBits, DcVals)
    val acEnc = new HuffEncoder(AcBitsProg, AcValsProg)
    val blk = new Array[Int](64)
    def dcBlock(dc: Int): Array[Int] = {
      java.util.Arrays.fill(blk, 0); blk(0) = dc; blk
    }
    // scan 1+2: interleaved DC first (Al=1) then refine (Al=0)
    for ((ah, al) <- Seq((0, 1), (1, 0))) {
      writeSegment(out, 0xDA, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, (ah << 4) | al))
      val bw = new BitWriter(out)
      val enc = new ProgScanEncoder(bw, acEnc, dcEnc, 0, 0, ah, al)
      var m = 0
      while (m < wMcus * hMcus) {
        val mx = m % wMcus
        val myy = m / wMcus
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            enc.block(dcBlock(yDc((myy * 2 + by) * (wMcus * 2) + mx * 2 + bx)), 0)
            bx += 1
          }
          by += 1
        }
        enc.block(dcBlock(cbDc(m)), 1)
        enc.block(dcBlock(crDc(m)), 2)
        m += 1
      }
      enc.finish()
    }
    // per-component AC band scans (all-zero bands → pure EOB runs),
    // first pass at Al=1 then the one-bit refinement to Al=0
    for ((compId, n) <- Seq((1, 4 * wMcus * hMcus), (2, wMcus * hMcus), (3, wMcus * hMcus));
         (ah, al) <- Seq((0, 1), (1, 0))) {
      writeSegment(out, 0xDA, Array(1, compId, 0x00, 1, 63, (ah << 4) | al))
      val bw = new BitWriter(out)
      val enc = new ProgScanEncoder(bw, acEnc, dcEnc, 1, 63, ah, al)
      var i = 0
      while (i < n) { enc.block(dcBlock(0), 0); i += 1 }
      enc.finish()
    }
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  /** ITU T.81 Table K.1 luminance quantization matrix (natural order) —
    * the public spec's example table, scaled by `quality` with the
    * conventional 5000/q / 200−2q mapping.
    */
  private val QuantLumaK1: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Quality 1–100 → scaled K.1 table (each step clamped to 1..255). */
  def quantForQuality(quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, "quality must be 1..100")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    QuantLumaK1.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  /** Forward 8×8 DCT of level-shifted samples, double precision (the
    * encoder is the rare WRITE path; exact integer arithmetic matters on
    * the decode side, where every read replays it — here rounding to the
    * quantized integer absorbs the float tail: for a FLAT block the AC
    * sums cancel to ~1e-16 and the DC lands within 1e-12 of 8·(v−128), so
    * `round` recovers the exact coefficients and the q85 transcode corpus
    * stays oracle-exact through the GENERAL path, no flat fast path).
    */
  /** cos((2x+1)uπ/16) by (u, x) — hoisted out of the FDCT inner loop
    * (computing it inline cost ~8k transcendental calls PER BLOCK and
    * made q85 the bench's #2 query; the table makes the encoder a pure
    * multiply-add kernel).
    */
  private val FdctCos: Array[Double] = {
    val t = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  private def fdctQuantBlock(
      samples: Array[Int], quantNatural: Array[Int]): Array[Int] = {
    // separable: rows first (y fixed → sum over x), then columns — 2·8³
    // multiply-adds per block instead of the direct form's 8⁴
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          s += (samples(y * 8 + x) - 128) * FdctCos(u * 8 + x)
          x += 1
        }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var w = 0
        while (w < 8) {
          s += tmp(w * 8 + u) * FdctCos(v * 8 + w)
          w += 1
        }
        val au = if (u == 0) InvSqrt2 else 1.0
        val av = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = math.round(au * av / 4.0 * s / quantNatural(v * 8 + u)).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  /** REAL grayscale baseline JPEG encoder: arbitrary dims (edge-replicate
    * padding to whole blocks — the standard choice, keeps padded-region
    * energy out of high AC bins), forward DCT + quantization under the
    * given natural-order table (`quantForQuality(q)` for the conventional
    * quality knob), entropy-coded with the engine's spec-valid tables.
    * `decodeJpeg(encodeJpegGray(w, h, px, quantZigZag(8,16)))` is EXACT on
    * per-8×8-block-constant images (the q85 transcode loop) and within
    * quantization error otherwise (PSNR-gated in JpegCodecSpec).
    */
  def encodeJpegGray(
      width: Int, height: Int, samples: Array[Byte],
      quantNatural: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && samples.length == width * height,
      s"samples must be $width*$height bytes")
    require(quantNatural.length == 64 && quantNatural.forall(q => q >= 1 && q <= 255))
    val wB = (width + 7) / 8
    val hB = (height + 7) / 8
    val block = new Array[Int](64)
    val blocks = for (by <- 0 until hB; bx <- 0 until wB) yield {
      var y = 0
      while (y < 8) {
        val sy = math.min(height - 1, by * 8 + y)
        var x = 0
        while (x < 8) {
          val sx = math.min(width - 1, bx * 8 + x)
          block(y * 8 + x) = samples(sy * width + sx) & 0xFF
          x += 1
        }
        y += 1
      }
      fdctQuantBlock(block, quantNatural)
    }
    encodeJpegCoeffsGrayDims(width, height, wB, hB, blocks, quantNatural)
  }

  /** Grayscale per-block-CONSTANT JPEG: block (bx,by) decodes to the flat
    * value `value(bx,by)` EXACTLY (quant DC 8 → coefficient `v−128` is
    * lossless, DC-only IDCT is exact) — the q83 oracle corpus.
    */
  def encodeJpegGrayBlocks(
      wBlocks: Int, hBlocks: Int, value: (Int, Int) => Int,
      restartInterval: Int = 0): Array[Byte] = {
    val blocks = for (by <- 0 until hBlocks; bx <- 0 until wBlocks) yield {
      val v = value(bx, by)
      require(v >= 0 && v <= 255)
      val c = new Array[Int](64)
      c(0) = v - 128
      c
    }
    encodeJpegCoeffsGray(wBlocks, hBlocks, blocks, quantZigZag(8, 16), restartInterval)
  }

  /** Color 4:2:0 per-MACROBLOCK-constant JPEG: the 16×16 MCU at (mx,my)
    * carries flat `(Y,Cb,Cr) = ycc(mx,my)` — four Y blocks under quant
    * table 0, one Cb + one Cr under table 1, all DC-only and exact, so the
    * decoded RGB is `yccToRgb` of the formula values (the q84 oracle
    * corpus: chroma upsample by replication is exact on flat macroblocks).
    */
  def encodeJpeg420Mcus(
      wMcus: Int, hMcus: Int, ycc: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(wMcus > 0 && hMcus > 0)
    val out = new java.io.ByteArrayOutputStream(2048)
    out.write(0xFF); out.write(0xD8)
    writeSegment(out, 0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSegment(out, 0xDB, dqtBody(0, quantZigZag(8, 16)))
    writeSegment(out, 0xDB, dqtBody(1, quantZigZag(8, 17)))
    val w = wMcus * 16
    val h = hMcus * 16
    writeSegment(out, 0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    writeSegment(out, 0xC4, dhtBody(0, 0, DcBits, DcVals))
    writeSegment(out, 0xC4, dhtBody(1, 0, AcBits, AcVals))
    writeSegment(out, 0xDA, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val dcEnc = new HuffEncoder(DcBits, DcVals)
    val acEnc = new HuffEncoder(AcBits, AcVals)
    val bw = new BitWriter(out)
    val preds = new Array[Int](3)
    val block = new Array[Int](64)
    var my = 0
    while (my < hMcus) {
      var mx = 0
      while (mx < wMcus) {
        val (yv, cb, cr) = ycc(mx, my)
        require(yv >= 0 && yv <= 255 && cb >= 0 && cb <= 255 && cr >= 0 && cr <= 255)
        // 4 Y blocks, then Cb, then Cr — T.81 interleave order
        var i = 0
        while (i < 4) {
          java.util.Arrays.fill(block, 0)
          block(0) = yv - 128
          preds(0) = encodeBlock(bw, block, preds(0), dcEnc, acEnc)
          i += 1
        }
        java.util.Arrays.fill(block, 0)
        block(0) = cb - 128
        preds(1) = encodeBlock(bw, block, preds(1), dcEnc, acEnc)
        java.util.Arrays.fill(block, 0)
        block(0) = cr - 128
        preds(2) = encodeBlock(bw, block, preds(2), dcEnc, acEnc)
        mx += 1
      }
      my += 1
    }
    bw.align()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }
}
