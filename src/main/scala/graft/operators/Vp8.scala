package graft.operators

/** VP8 (lossy WebP) intra key-frame codec — RFC 6386. The majority of
  * real-crawl WebP payloads are lossy VP8. This implements the
  * key-frame decode pipeline:
  *
  *   boolean (range) decoder → uncompressed frame tag / start code /
  *   dimensions → compressed header (partition 1: segmentation with
  *   per-segment quantizer/filter features and the coded segment map,
  *   loop filter parameters incl. delta adjustments, token-partition
  *   layout (1/2/4/8 partitions), quantizers, probability updates,
  *   skip flag) → per-macroblock intra modes (keyframe trees,
  *   including `B_PRED` 4×4 sub-modes with [above][left] contexts) →
  *   token partition residue decode (token tree over coefficient
  *   bands with category extra bits) → dequantization (per-segment) →
  *   inverse WHT (Y2) and the 4×4 inverse DCT (20091/35468 multiplier
  *   form, RFC 6386 §14.3–4) → intra prediction (16×16 DC/V/H/TM, 8×8
  *   chroma, all ten 4×4 sub-modes with the reference decoder's
  *   above-right sourcing) → reconstruction → normal/simple LOOP
  *   FILTER (RFC 6386 §15: MB and subblock edges, filter masks, high
  *   edge variance, per-segment levels) → crop.
  *
  * DECLARED SUPPORT BOUNDARY (the D15 dead-letter discipline — each
  * unsupported shape returns None, never garbage): key frames only
  * (an interframe inside a WebP container is malformed anyway).
  *
  * TABLE PROVENANCE: the bulk constant tables (default coefficient
  * probabilities §13.5, update probabilities §13.4, keyframe B-mode
  * probabilities §11.4, dc/ac quantizer lookups §14.1) live in
  * [[Vp8Tables]], GENERATED from the system reference codec's .rodata
  * by `tools/gen_vp8_fixtures.py` (encoder/decoder copies verified
  * identical before emission) — the RFC's literal values, replacing
  * the round-15 deterministic stand-ins. Conformance is proven by
  * Vp8ConformanceSpec: FOREIGN streams produced by the reference
  * encoder (libwebp) must decode to libwebp's own YUV output
  * byte-exactly (fixtures under src/test/resources/vp8/).
  *
  * The q138 corpus is the q83 DC-exact trick in VP8 form: a horizontal
  * macroblock strip, every MB `DC_PRED` with ONLY its Y2 DC
  * coefficient set (some MBs skip-flagged), quantizer index 0 — so
  * `iWHT → DC-only iDCT` is exact integer arithmetic and each MB's
  * reconstructed value is a prefix sum the SQL oracle replays from
  * doc_id. q168 extends the strip with `B_PRED` all-TM macroblocks
  * carrying one DC residual in subblock (3,3); q169 runs a filtered
  * strip (nonzero loop-filter level) whose mb-edge filter deltas stay
  * closed-form. Scale shape: per-row byte decode via `mapPartitions`,
  * the image-operator norm.
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
    /** Flagged signed value: magnitude then sign (RFC header fields). */
    def signed(n: Int): Int = {
      val mag = literal(n)
      if (bool(128) == 1) -mag else mag
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

  // 4×4 sub-mode tree (RFC 6386 §11.4): leaves are B_DC=0, B_TM=1,
  // B_VE=2, B_HE=3, B_LD=4, B_RD=5, B_VR=6, B_VL=7, B_HD=8, B_HU=9
  private[operators] val BModeTree = Array(
    -0, 2, // B_DC_PRED
    -1, 4, // B_TM_PRED
    -2, 6, // B_VE_PRED
    8, 12,
    -3, 10, // B_HE_PRED
    -5, -6, // B_RD_PRED, B_VR_PRED
    -4, 14, // B_LD_PRED
    -7, 16, // B_VL_PRED
    -8, -9) // B_HD_PRED, B_HU_PRED
  // the 16×16 mode's equivalent sub-mode for [above][left] contexts
  private val YModeAsBMode = Array(0, 2, 3, 1) // DC→B_DC, V→B_VE, H→B_HE, TM→B_TM
  // segment-id tree (RFC 6386 §9.3; 3 probabilities)
  private val SegmentTree = Array(2, 4, -0, -1, -2, -3)

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

  /** RFC 6386 §13.5 default coefficient probabilities (4 block types ×
    * 8 bands × 3 contexts × 11 tree positions) — real spec values via
    * [[Vp8Tables]].
    */
  private[operators] val CoefProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (t, b, c, i) =>
      Vp8Tables.CoefProbsFlat(((t * 8 + b) * 3 + c) * 11 + i)
    }

  /** RFC 6386 §13.4 coefficient-update probabilities (same shape). */
  private[operators] val CoefUpdateProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (t, b, c, i) =>
      Vp8Tables.CoefUpdateProbsFlat(((t * 8 + b) * 3 + c) * 11 + i)
    }

  /** RFC 6386 §11.4 keyframe sub-mode probabilities
    * [above sub-mode][left sub-mode][9 tree nodes].
    */
  private[operators] val KfBModeProb: Array[Array[Array[Int]]] =
    Array.tabulate(10, 10, 9) { (a, l, i) =>
      Vp8Tables.KfBModeProbFlat((a * 10 + l) * 9 + i)
    }

  /** RFC 6386 §14.1 quantizer lookups (real spec values). */
  private[operators] def DcQLookup: Array[Int] = Vp8Tables.DcQLookup
  private[operators] def AcQLookup: Array[Int] = Vp8Tables.AcQLookup

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

  /** Per-segment dequant factors (RFC 6386 §9.6/§14.1, incl. the Y2
    * dc×2 / ac×155/100-min-8 scaling and the chroma-dc 132 cap).
    */
  private final case class Quant(
      yDc: Int, yAc: Int, y2Dc: Int, y2Ac: Int, uvDc: Int, uvAc: Int)

  private def quantFor(
      qi: Int, ydcD: Int, y2dcD: Int, y2acD: Int, uvdcD: Int,
      uvacD: Int): Quant = {
    def qc(x: Int) = if (x < 0) 0 else if (x > 127) 127 else x
    Quant(
      yDc = DcQLookup(qc(qi + ydcD)),
      yAc = AcQLookup(qc(qi)),
      y2Dc = DcQLookup(qc(qi + y2dcD)) * 2,
      y2Ac = math.max(8, (AcQLookup(qc(qi + y2acD)) * 155) / 100),
      uvDc = math.min(132, DcQLookup(qc(qi + uvdcD))),
      uvAc = AcQLookup(qc(qi + uvacD)))
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

    // ---- segmentation (RFC 6386 §9.3)
    val segEnabled = bd.literal(1) == 1
    var segUpdateMap = false
    var segAbsolute = false
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (segEnabled) {
      segUpdateMap = bd.literal(1) == 1
      val updateData = bd.literal(1) == 1
      if (updateData) {
        segAbsolute = bd.literal(1) == 1
        var i = 0
        while (i < 4) { if (bd.literal(1) == 1) segQ(i) = bd.signed(7); i += 1 }
        i = 0
        while (i < 4) { if (bd.literal(1) == 1) segLf(i) = bd.signed(6); i += 1 }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.literal(1) == 1) segTreeProbs(i) = bd.literal(8)
          i += 1
        }
      }
    }

    // ---- loop filter parameters (RFC 6386 §9.4)
    val simpleFilter = bd.literal(1) == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var refDelta0 = 0 // INTRA frame — the only reference in a keyframe
    var modeDelta0 = 0 // B_PRED — the only delta-carrying keyframe mode
    var lfDeltaEnabled = false
    if (bd.literal(1) == 1) { // loop filter adjustments enabled
      lfDeltaEnabled = true
      if (bd.literal(1) == 1) { // deltas update
        var i = 0
        while (i < 4) {
          val d = if (bd.literal(1) == 1) bd.signed(6) else Int.MinValue
          if (i == 0 && d != Int.MinValue) refDelta0 = d
          i += 1
        }
        i = 0
        while (i < 4) {
          val d = if (bd.literal(1) == 1) bd.signed(6) else Int.MinValue
          if (i == 0 && d != Int.MinValue) modeDelta0 = d
          i += 1
        }
      }
    }

    // ---- token partitions (RFC 6386 §9.5): 1/2/4/8, sizes as 3-byte
    // LE words between partition 1 and the first token partition
    val nParts = 1 << bd.literal(2)
    val partsBase = part1 + firstPartSize
    val sizesLen = 3 * (nParts - 1)
    if (partsBase + sizesLen > end) return None
    val partBounds = new Array[(Int, Int)](nParts)
    var pOff = partsBase + sizesLen
    var pi = 0
    while (pi < nParts) {
      val size =
        if (pi == nParts - 1) end - pOff
        else {
          val at = partsBase + 3 * pi
          (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) | ((b(at + 2) & 0xff) << 16)
        }
      if (size < 0 || pOff + size > end) return None
      partBounds(pi) = (pOff, pOff + size)
      pOff += size
      pi += 1
    }

    // ---- quantizers (per segment)
    val yacQi = bd.literal(7)
    def qDelta(): Int = if (bd.literal(1) == 1) bd.signed(4) else 0
    val ydcD = qDelta(); val y2dcD = qDelta(); val y2acD = qDelta()
    val uvdcD = qDelta(); val uvacD = qDelta()
    def qc127(x: Int) = if (x < 0) 0 else if (x > 127) 127 else x
    val quants: Array[Quant] =
      if (!segEnabled) Array(quantFor(yacQi, ydcD, y2dcD, y2acD, uvdcD, uvacD))
      else Array.tabulate(4) { s =>
        val qi = if (segAbsolute) qc127(segQ(s)) else qc127(yacQi + segQ(s))
        quantFor(qi, ydcD, y2dcD, y2acD, uvdcD, uvacD)
      }

    bd.literal(1) // refresh entropy probs (keyframe: ignored)
    // coefficient probability updates: flag per entry; an update writes
    // a new 8-bit probability (tables are per-frame state)
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
    val nMbs = mbCols * mbRows
    // ---- per-MB modes from partition 1
    val yModes = new Array[Int](nMbs)
    val uvModes = new Array[Int](nMbs)
    val skips = new Array[Boolean](nMbs)
    val segIds = new Array[Int](nMbs)
    // per-subblock modes (B_PRED sub-modes; 16×16 modes store their
    // B-mode equivalent for the [above][left] contexts)
    val subModes = Array.ofDim[Int](nMbs, 16)
    var mbRow = 0
    while (mbRow < mbRows) {
      var mbCol = 0
      while (mbCol < mbCols) {
        val mbi = mbRow * mbCols + mbCol
        if (segEnabled && segUpdateMap)
          segIds(mbi) = bd.tree(SegmentTree, segTreeProbs)
        if (skipEnabled) skips(mbi) = bd.bool(probSkipFalse) == 1
        val ym = bd.tree(KfYModeTree, KfYModeProb)
        if (!bd.ok) return None
        yModes(mbi) = ym
        if (ym == 4) { // B_PRED: 16 sub-modes with [above][left] contexts
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2; val c = sb & 3
            val above =
              if (r > 0) subModes(mbi)(sb - 4)
              else if (mbRow > 0) subModes(mbi - mbCols)(12 + c)
              else 0 // B_DC_PRED outside the frame
            val left =
              if (c > 0) subModes(mbi)(sb - 1)
              else if (mbCol > 0) subModes(mbi - 1)(r * 4 + 3)
              else 0
            subModes(mbi)(sb) = bd.tree(BModeTree, KfBModeProb(above)(left))
            sb += 1
          }
          if (!bd.ok) return None
        } else {
          java.util.Arrays.fill(subModes(mbi), YModeAsBMode(ym))
        }
        uvModes(mbi) = bd.tree(UvModeTree, KfUvModeProb)
        mbCol += 1
      }
      mbRow += 1
    }
    if (!bd.ok) return None

    // ---- token partitions: each MB row reads partition (row % nParts)
    val tds = partBounds.map { case (s, e) => new BoolDecoder(b, s, e) }
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
    // loop-filter inputs gathered during the token pass
    val hasCoeffs = new Array[Boolean](nMbs)

    mbRow = 0
    while (mbRow < mbRows) {
      val td = tds(mbRow % nParts)
      val leftY = new Array[Boolean](4)
      val leftU = new Array[Boolean](2)
      val leftV = new Array[Boolean](2)
      var leftY2 = false
      var mbCol = 0
      while (mbCol < mbCols) {
        val mbi = mbRow * mbCols + mbCol
        val bpred = yModes(mbi) == 4
        val q = quants(if (segEnabled) segIds(mbi) else 0)
        var eobTotal = 0
        if (skips(mbi)) {
          var i = 0
          while (i < 24) { java.util.Arrays.fill(blockCoeffs(i), 0); i += 1 }
          java.util.Arrays.fill(y2Out, 0)
          java.util.Arrays.fill(leftY, false); java.util.Arrays.fill(leftU, false)
          java.util.Arrays.fill(leftV, false)
          java.util.Arrays.fill(aboveY(mbCol), false)
          java.util.Arrays.fill(aboveU(mbCol), false)
          java.util.Arrays.fill(aboveV(mbCol), false)
          // Y2 context resets only for modes that HAVE a Y2 block
          // (libvpx vp8_reset_mb_tokens_context)
          if (!bpred) { aboveY2(mbCol) = false; leftY2 = false }
        } else {
          if (!bpred) {
            // Y2 block (16×16 modes carry one)
            val y2ctx = (if (aboveY2(mbCol)) 1 else 0) + (if (leftY2) 1 else 0)
            val eob2 = decodeCoeffs(td, probs, 1, 0, y2ctx, q.y2Dc, q.y2Ac, coeffs)
            if (eob2 < 0) return None
            eobTotal += eob2
            val nz2 = eob2 > 0
            aboveY2(mbCol) = nz2; leftY2 = nz2
            System.arraycopy(coeffs, 0, y2Out, 0, 16)
            iwht4x4(y2Out)
          }
          // 16 Y blocks: type 0 / first coeff 1 when a Y2 exists,
          // type 3 / first coeff 0 for B_PRED
          val yType = if (bpred) 3 else 0
          val yFirst = if (bpred) 0 else 1
          var sb = 0
          while (sb < 16) {
            val bx = sb & 3; val by = sb >> 2
            val ctx = (if (aboveY(mbCol)(bx)) 1 else 0) +
              (if (leftY(by)) 1 else 0)
            val eob = decodeCoeffs(td, probs, yType, yFirst, ctx, q.yDc, q.yAc,
              blockCoeffs(sb))
            if (eob < 0) return None
            eobTotal += eob - yFirst
            if (!bpred) blockCoeffs(sb)(0) = y2Out(sb)
            val nz = eob > yFirst
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
            val eob = decodeCoeffs(td, probs, 2, 0, ctx, q.uvDc, q.uvAc,
              blockCoeffs(16 + p))
            if (eob < 0) return None
            eobTotal += eob
            val nz = eob > 0
            a(bx) = nz; l(by) = nz
            p += 1
          }
        }
        hasCoeffs(mbi) = eobTotal > 0
        // reconstruct: intra-predict, inverse DCT, add residue
        reconstructMb(
          yPlane, uPlane, vPlane, yStride, uvStride, mbRow, mbCol, mbCols,
          yModes(mbi), uvModes(mbi), subModes(mbi), blockCoeffs, skips(mbi))
        mbCol += 1
      }
      mbRow += 1
    }

    // ---- loop filter (RFC 6386 §15) over the padded reconstruction
    if (filterLevel > 0) {
      val levels = new Array[Int](nMbs)
      val inner = new Array[Boolean](nMbs)
      var mbi = 0
      while (mbi < nMbs) {
        var fl =
          if (!segEnabled) filterLevel
          else if (segAbsolute) segLf(segIds(mbi))
          else filterLevel + segLf(segIds(mbi))
        if (lfDeltaEnabled) {
          fl += refDelta0
          if (yModes(mbi) == 4) fl += modeDelta0
        }
        levels(mbi) = if (fl < 0) 0 else if (fl > 63) 63 else fl
        // interior edges filter only when the MB has coefficients or
        // 4×4 modes (RFC 6386 §15.2)
        inner(mbi) = hasCoeffs(mbi) || yModes(mbi) == 4
        mbi += 1
      }
      loopFilterFrame(yPlane, uPlane, vPlane, yStride, uvStride,
        mbRows, mbCols, levels, inner, sharpness, simpleFilter)
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

  // ------------------------------------------------------ intra predict

  private def avg2(a: Int, b: Int) = (a + b + 1) >> 1
  private def avg3(a: Int, b: Int, c: Int) = (a + 2 * b + c + 2) >> 2

  /** One 4×4 sub-mode prediction (RFC 6386 §12.3). `A` carries the 4
    * above + 4 above-right context pixels, `L` the 4 left, `p` the
    * above-left.
    */
  private def predict4(
      plane: Array[Int], stride: Int, o: Int, mode: Int,
      A: Array[Int], L: Array[Int], p: Int): Unit = {
    @inline def set(r: Int, c: Int, v: Int): Unit = plane(o + r * stride + c) = v
    @inline def fill(f: (Int, Int) => Int): Unit = {
      var r = 0
      while (r < 4) { var c = 0; while (c < 4) { set(r, c, f(r, c)); c += 1 }; r += 1 }
    }
    mode match {
      case 0 => // B_DC_PRED
        val dc = (A(0) + A(1) + A(2) + A(3) + L(0) + L(1) + L(2) + L(3) + 4) >> 3
        fill((_, _) => dc)
      case 1 => // B_TM_PRED
        fill((r, c) => clamp8(L(r) + A(c) - p))
      case 2 => // B_VE_PRED
        val v0 = avg3(p, A(0), A(1)); val v1 = avg3(A(0), A(1), A(2))
        val v2 = avg3(A(1), A(2), A(3)); val v3 = avg3(A(2), A(3), A(4))
        fill((_, c) => c match { case 0 => v0; case 1 => v1; case 2 => v2; case _ => v3 })
      case 3 => // B_HE_PRED
        val h0 = avg3(p, L(0), L(1)); val h1 = avg3(L(0), L(1), L(2))
        val h2 = avg3(L(1), L(2), L(3)); val h3 = avg3(L(2), L(3), L(3))
        fill((r, _) => r match { case 0 => h0; case 1 => h1; case 2 => h2; case _ => h3 })
      case 4 => // B_LD_PRED
        val d = Array.tabulate(7)(k =>
          if (k < 6) avg3(A(k), A(k + 1), A(k + 2)) else avg3(A(6), A(7), A(7)))
        fill((r, c) => d(r + c))
      case 5 => // B_RD_PRED
        val e = Array(L(3), L(2), L(1), L(0), p, A(0), A(1), A(2), A(3))
        fill((r, c) => avg3(e(c - r + 3), e(c - r + 4), e(c - r + 5)))
      case 6 => // B_VR_PRED
        val e = Array(L(3), L(2), L(1), L(0), p, A(0), A(1), A(2), A(3))
        set(3, 0, avg3(e(1), e(2), e(3)))
        set(2, 0, avg3(e(2), e(3), e(4)))
        val v10 = avg3(e(3), e(4), e(5)); set(1, 0, v10); set(3, 1, v10)
        val v00 = avg2(e(4), e(5)); set(0, 0, v00); set(2, 1, v00)
        val v11 = avg3(e(4), e(5), e(6)); set(1, 1, v11); set(3, 2, v11)
        val v01 = avg2(e(5), e(6)); set(0, 1, v01); set(2, 2, v01)
        val v12 = avg3(e(5), e(6), e(7)); set(1, 2, v12); set(3, 3, v12)
        val v02 = avg2(e(6), e(7)); set(0, 2, v02); set(2, 3, v02)
        set(1, 3, avg3(e(6), e(7), e(8)))
        set(0, 3, avg2(e(7), e(8)))
      case 7 => // B_VL_PRED
        set(0, 0, avg2(A(0), A(1)))
        set(1, 0, avg3(A(0), A(1), A(2)))
        val v20 = avg2(A(1), A(2)); set(2, 0, v20); set(0, 1, v20)
        val v30 = avg3(A(1), A(2), A(3)); set(3, 0, v30); set(1, 1, v30)
        val v21 = avg2(A(2), A(3)); set(2, 1, v21); set(0, 2, v21)
        val v31 = avg3(A(2), A(3), A(4)); set(3, 1, v31); set(1, 2, v31)
        val v22 = avg2(A(3), A(4)); set(2, 2, v22); set(0, 3, v22)
        val v32 = avg3(A(3), A(4), A(5)); set(3, 2, v32); set(1, 3, v32)
        set(2, 3, avg3(A(4), A(5), A(6)))
        set(3, 3, avg3(A(5), A(6), A(7)))
      case 8 => // B_HD_PRED
        val e = Array(L(3), L(2), L(1), L(0), p, A(0), A(1), A(2))
        set(3, 0, avg2(e(0), e(1)))
        set(3, 1, avg3(e(0), e(1), e(2)))
        val v20 = avg2(e(1), e(2)); set(2, 0, v20); set(3, 2, v20)
        val v21 = avg3(e(1), e(2), e(3)); set(2, 1, v21); set(3, 3, v21)
        val v10 = avg2(e(2), e(3)); set(1, 0, v10); set(2, 2, v10)
        val v11 = avg3(e(2), e(3), e(4)); set(1, 1, v11); set(2, 3, v11)
        val v00 = avg2(e(3), e(4)); set(0, 0, v00); set(1, 2, v00)
        val v01 = avg3(e(3), e(4), e(5)); set(0, 1, v01); set(1, 3, v01)
        set(0, 2, avg3(e(4), e(5), e(6)))
        set(0, 3, avg3(e(5), e(6), e(7)))
      case _ => // B_HU_PRED
        set(0, 0, avg2(L(0), L(1)))
        set(0, 1, avg3(L(0), L(1), L(2)))
        val v02 = avg2(L(1), L(2)); set(0, 2, v02); set(1, 0, v02)
        val v03 = avg3(L(1), L(2), L(3)); set(0, 3, v03); set(1, 1, v03)
        val v12 = avg2(L(2), L(3)); set(1, 2, v12); set(2, 0, v12)
        val v13 = avg3(L(2), L(3), L(3)); set(1, 3, v13); set(2, 1, v13)
        set(2, 2, L(3)); set(2, 3, L(3))
        set(3, 0, L(3)); set(3, 1, L(3)); set(3, 2, L(3)); set(3, 3, L(3))
    }
  }

  /** Intra-predict and reconstruct one macroblock in place. Edge
    * conventions per the reference decoder: the row above the frame
    * reads 127 (including its above-left corner), the column left of
    * the frame reads 129 (including the top-left at `mbCol == 0`,
    * `mbRow > 0`); prediction always reads the UNFILTERED
    * reconstruction (the loop filter runs after the full frame).
    */
  private def reconstructMb(
      yPlane: Array[Int], uPlane: Array[Int], vPlane: Array[Int],
      yStride: Int, uvStride: Int, mbRow: Int, mbCol: Int, mbCols: Int,
      yMode: Int, uvMode: Int, subModes: Array[Int],
      blockCoeffs: Array[Array[Int]], skipped: Boolean): Unit = {
    val hasAbove = mbRow > 0
    val hasLeft = mbCol > 0
    val yo = mbRow * 16 * yStride + mbCol * 16

    def predPlane(
        plane: Array[Int], stride: Int, o: Int, size: Int, mode: Int): Unit = {
      def above(c: Int) = if (hasAbove) plane(o - stride + c) else 127
      def left(rr: Int) = if (hasLeft) plane(o + rr * stride - 1) else 129
      val al =
        if (!hasAbove) 127
        else if (!hasLeft) 129
        else plane(o - stride - 1)
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

    def addResidue(
        plane: Array[Int], stride: Int, o: Int, blk: Array[Int]): Unit = {
      idct4x4(blk)
      var rr = 0
      while (rr < 4) {
        var c = 0
        while (c < 4) {
          val idx = o + rr * stride + c
          plane(idx) = clamp8(plane(idx) + blk(rr * 4 + c))
          c += 1
        }
        rr += 1
      }
    }

    // ---- luma
    if (yMode == 4) {
      // B_PRED: per-subblock predict-then-reconstruct in raster order
      // (later subblocks read earlier reconstructed pixels)
      val A = new Array[Int](8)
      val L = new Array[Int](4)
      var sb = 0
      while (sb < 16) {
        val r = sb >> 2; val c = sb & 3
        val o = yo + r * 4 * yStride + c * 4
        var k = 0
        while (k < 4) {
          A(k) = if (r > 0 || hasAbove) yPlane(o - yStride + k) else 127
          L(k) = if (c > 0 || hasLeft) yPlane(o - 1 + k * yStride) else 129
          k += 1
        }
        // above-right: frozen per-MB for the right column (the true
        // neighbor is not yet reconstructed); the reference decoder
        // replicates the above row's last pixel past the frame edge
        k = 0
        while (k < 4) {
          A(4 + k) =
            if (c == 3) {
              if (!hasAbove) 127
              else if (mbCol < mbCols - 1) yPlane(yo - yStride + 16 + k)
              else yPlane(yo - yStride + 15)
            } else if (r == 0 && !hasAbove) 127
            else yPlane(o - yStride + 4 + k)
          k += 1
        }
        val p =
          if (r == 0 && !hasAbove) 127
          else if (c == 0 && !hasLeft) 129
          else yPlane(o - yStride - 1)
        predict4(yPlane, yStride, o, subModes(sb), A, L, p)
        if (!skipped) addResidue(yPlane, yStride, o, blockCoeffs(sb))
        sb += 1
      }
    } else {
      predPlane(yPlane, yStride, yo, 16, yMode)
      if (!skipped) {
        var sb = 0
        while (sb < 16) {
          val bx = (sb & 3) * 4; val by = (sb >> 2) * 4
          addResidue(yPlane, yStride, yo + by * yStride + bx, blockCoeffs(sb))
          sb += 1
        }
      }
    }
    // ---- chroma
    val uo = mbRow * 8 * uvStride + mbCol * 8
    predPlane(uPlane, uvStride, uo, 8, uvMode)
    predPlane(vPlane, uvStride, uo, 8, uvMode)
    if (!skipped) {
      var p = 0
      while (p < 8) {
        val plane = if (p < 4) uPlane else vPlane
        val sub = p & 3
        val bx = (sub & 1) * 4; val by = (sub >> 1) * 4
        addResidue(plane, uvStride, uo + by * uvStride + bx, blockCoeffs(16 + p))
        p += 1
      }
    }
  }

  // --------------------------------------------------------- loop filter

  // pixel <-> signed-domain helpers (RFC 6386 §15.3)
  @inline private def c128(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v
  @inline private def s2u(v: Int): Int = c128(v) + 128

  /** Filter one 8-pixel segment across an edge; `p(k)`/`set(k, v)`
    * address pixels at signed offsets -4..3 relative to the edge
    * (p3..p0 q0..q3 = offsets -4..-1, 0..3).
    */
  private def filterSegment(
      plane: Array[Int], base: Int, step: Int,
      interior: Int, edgeLimit: Int, hevT: Int, mbEdge: Boolean,
      simple: Boolean): Unit = {
    @inline def px(k: Int) = plane(base + k * step)
    @inline def st(k: Int, v: Int): Unit = plane(base + k * step) = v
    val p3 = px(-4); val p2 = px(-3); val p1 = px(-2); val p0 = px(-1)
    val q0 = px(0); val q1 = px(1); val q2 = px(2); val q3 = px(3)
    @inline def ab(x: Int) = if (x < 0) -x else x
    val maskEdge = ab(p0 - q0) * 2 + ab(p1 - q1) / 2 <= edgeLimit
    if (!maskEdge) return
    if (simple) {
      // simple filter: luma only, outer taps always on
      val a = c128(c128((p1 - 128) - (q1 - 128)) + 3 * ((q0 - 128) - (p0 - 128)))
      val f = c128(a + 4) >> 3
      val e = c128(a + 3) >> 3
      st(0, s2u((q0 - 128) - f))
      st(-1, s2u((p0 - 128) + e))
      return
    }
    val maskInt =
      ab(p3 - p2) <= interior && ab(p2 - p1) <= interior &&
        ab(p1 - p0) <= interior && ab(q1 - q0) <= interior &&
        ab(q2 - q1) <= interior && ab(q3 - q2) <= interior
    if (!maskInt) return
    val hev = ab(p1 - p0) > hevT || ab(q1 - q0) > hevT
    val ps1 = p1 - 128; val ps0 = p0 - 128
    val qs0 = q0 - 128; val qs1 = q1 - 128
    if (mbEdge && !hev) {
      // 6-tap macroblock-edge filter
      val ps2 = p2 - 128; val qs2 = q2 - 128
      val w = c128(c128(ps1 - qs1) + 3 * (qs0 - ps0))
      var a = c128((27 * w + 63) >> 7)
      st(0, s2u(qs0 - a)); st(-1, s2u(ps0 + a))
      a = c128((18 * w + 63) >> 7)
      st(1, s2u(qs1 - a)); st(-2, s2u(ps1 + a))
      a = c128((9 * w + 63) >> 7)
      st(2, s2u(qs2 - a)); st(-3, s2u(ps2 + a))
    } else {
      // common adjust (subblock edges; MB edges under high variance)
      val a0 = c128((if (hev) c128(ps1 - qs1) else 0) + 3 * (qs0 - ps0))
      val f = c128(a0 + 4) >> 3
      val e = c128(a0 + 3) >> 3
      st(0, s2u(qs0 - f)); st(-1, s2u(ps0 + e))
      if (!hev) {
        val a1 = (f + 1) >> 1
        st(1, s2u(qs1 - a1)); st(-2, s2u(ps1 + a1))
      }
    }
  }

  /** RFC 6386 §15 loop filter: per MB in raster order — left MB edge,
    * interior vertical edges, top MB edge, interior horizontal edges;
    * chroma only under the normal filter.
    */
  private def loopFilterFrame(
      yPlane: Array[Int], uPlane: Array[Int], vPlane: Array[Int],
      yStride: Int, uvStride: Int, mbRows: Int, mbCols: Int,
      levels: Array[Int], inner: Array[Boolean], sharpness: Int,
      simple: Boolean): Unit = {
    var mbRow = 0
    while (mbRow < mbRows) {
      var mbCol = 0
      while (mbCol < mbCols) {
        val mbi = mbRow * mbCols + mbCol
        val fl = levels(mbi)
        if (fl > 0) {
          var interior = fl
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            if (interior > 9 - sharpness) interior = 9 - sharpness
          }
          if (interior < 1) interior = 1
          val hevT = if (fl >= 40) 2 else if (fl >= 15) 1 else 0 // keyframe
          val mbE = (fl + 2) * 2 + interior
          val sbE = fl * 2 + interior
          val yo = mbRow * 16 * yStride + mbCol * 16
          val uo = mbRow * 8 * uvStride + mbCol * 8
          // left MB edge (vertical)
          if (mbCol > 0) {
            var r = 0
            while (r < 16) {
              filterSegment(yPlane, yo + r * yStride, 1, interior, mbE, hevT,
                mbEdge = true, simple)
              r += 1
            }
            if (!simple) {
              r = 0
              while (r < 8) {
                filterSegment(uPlane, uo + r * uvStride, 1, interior, mbE, hevT,
                  mbEdge = true, simple)
                filterSegment(vPlane, uo + r * uvStride, 1, interior, mbE, hevT,
                  mbEdge = true, simple)
                r += 1
              }
            }
          }
          // interior vertical edges
          if (inner(mbi)) {
            var x = 4
            while (x < 16) {
              var r = 0
              while (r < 16) {
                filterSegment(yPlane, yo + r * yStride + x, 1, interior, sbE,
                  hevT, mbEdge = false, simple)
                r += 1
              }
              x += 4
            }
            if (!simple) {
              var r = 0
              while (r < 8) {
                filterSegment(uPlane, uo + r * uvStride + 4, 1, interior, sbE,
                  hevT, mbEdge = false, simple)
                filterSegment(vPlane, uo + r * uvStride + 4, 1, interior, sbE,
                  hevT, mbEdge = false, simple)
                r += 1
              }
            }
          }
          // top MB edge (horizontal)
          if (mbRow > 0) {
            var c = 0
            while (c < 16) {
              filterSegment(yPlane, yo + c, yStride, interior, mbE, hevT,
                mbEdge = true, simple)
              c += 1
            }
            if (!simple) {
              c = 0
              while (c < 8) {
                filterSegment(uPlane, uo + c, uvStride, interior, mbE, hevT,
                  mbEdge = true, simple)
                filterSegment(vPlane, uo + c, uvStride, interior, mbE, hevT,
                  mbEdge = true, simple)
                c += 1
              }
            }
          }
          // interior horizontal edges
          if (inner(mbi)) {
            var yy = 4
            while (yy < 16) {
              var c = 0
              while (c < 16) {
                filterSegment(yPlane, yo + yy * yStride + c, yStride, interior,
                  sbE, hevT, mbEdge = false, simple)
                c += 1
              }
              yy += 4
            }
            if (!simple) {
              var c = 0
              while (c < 8) {
                filterSegment(uPlane, uo + 4 * uvStride + c, uvStride, interior,
                  sbE, hevT, mbEdge = false, simple)
                filterSegment(vPlane, uo + 4 * uvStride + c, uvStride, interior,
                  sbE, hevT, mbEdge = false, simple)
                c += 1
              }
            }
          }
        }
        mbCol += 1
      }
      mbRow += 1
    }
  }

  // ------------------------------------------------------------- encode

  /** One macroblock of the synthetic horizontal strip. */
  private[operators] sealed trait StripMb
  /** DC_PRED carrying only a Y2 DC coefficient (pre-quant integer). */
  private[operators] final case class DcMb(y2dc: Int) extends StripMb
  /** DC_PRED, skip-flagged (all residue zero). */
  private[operators] case object SkipMb extends StripMb
  /** B_PRED, all sub-modes B_TM_PRED, one DC residual (pre-quant
    * integer) in subblock (3,3) — exercises the 4×4 sub-mode trees,
    * the type-3 token path, and TM sub-block prediction chaining.
    */
  private[operators] final case class BPredTmMb(dc33: Int) extends StripMb

  /** Encode a one-MB-row key frame from `mbs` at quantizer index 0
    * with loop-filter level `filterLevel` (0 disables). Exercises:
    * bool coder, keyframe mode trees (incl. B_PRED sub-modes), skip
    * flags, Y2/WHT path, the type-0/type-3 token paths, token
    * categories (through CAT6 for |coeff| ≥ 67), EOB/zero contexts,
    * DC/TM prediction chaining, and (when `filterLevel > 0`) the
    * normal loop filter.
    */
  private[operators] def encodeStrip(
      mbs: Array[StripMb], filterLevel: Int = 0): Array[Byte] = {
    val k = mbs.length
    require(k >= 1 && filterLevel >= 0 && filterLevel <= 63)
    val w = 16 * k; val h = 16

    // partition 1: header + modes
    val hd = new BoolEncoder
    hd.literal(0, 1) // color space
    hd.literal(0, 1) // clamping
    hd.literal(0, 1) // segmentation off
    hd.literal(0, 1) // filter type: normal
    hd.literal(filterLevel, 6)
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
    // per-MB: skip flag, modes (sub-mode contexts track the decoder's)
    val leftSub = new Array[Int](4) // column-3 sub-modes of the left MB
    i = 0
    while (i < k) {
      hd.bool(if (mbs(i) == SkipMb) 1 else 0, probSkip)
      mbs(i) match {
        case BPredTmMb(_) =>
          hd.treeWrite(KfYModeTree, KfYModeProb, 4)
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2; val c = sb & 3
            // strip: no above MB row → above context B_DC (0) for r == 0
            val above = if (r > 0) 1 else 0 // our sub-modes are all TM (1)
            val left =
              if (c > 0) 1
              else if (i > 0) leftSub(r)
              else 0
            hd.treeWrite(BModeTree, KfBModeProb(above)(left), 1) // B_TM
            sb += 1
          }
          java.util.Arrays.fill(leftSub, 1)
        case _ =>
          hd.treeWrite(KfYModeTree, KfYModeProb, 0) // DC_PRED
          java.util.Arrays.fill(leftSub, 0) // context equivalent B_DC
      }
      hd.treeWrite(UvModeTree, KfUvModeProb, 0) // uv DC
      i += 1
    }
    val part1 = hd.bytes

    // token partition
    val tk = new BoolEncoder
    val aboveY2 = new Array[Boolean](k)
    var leftY2 = false
    val aboveY = Array.ofDim[Boolean](k, 4)
    val aboveU = Array.ofDim[Boolean](k, 2)
    val aboveV = Array.ofDim[Boolean](k, 2)
    val leftY = new Array[Boolean](4)
    val leftU = new Array[Boolean](2)
    val leftV = new Array[Boolean](2)
    def writeToken(blockType: Int, band: Int, ctx: Int, tok: Int): Unit =
      tk.treeWrite(TokenTree, CoefProbs(blockType)(band)(ctx), tok)
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
      writeToken(blockType, band, ctx, tok)
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
    def writeUvEobs(i: Int): Unit = {
      var p = 0
      while (p < 8) {
        val isU = p < 4
        val sub = p & 3
        val bx = sub & 1; val by = sub >> 1
        val a = if (isU) aboveU(i) else aboveV(i)
        val l = if (isU) leftU else leftV
        val ctx = (if (a(bx)) 1 else 0) + (if (l(by)) 1 else 0)
        writeToken(2, CoefBands(0), ctx, 11)
        a(bx) = false; l(by) = false
        p += 1
      }
    }
    i = 0
    while (i < k) {
      mbs(i) match {
        case SkipMb =>
          java.util.Arrays.fill(leftY, false); java.util.Arrays.fill(leftU, false)
          java.util.Arrays.fill(leftV, false)
          java.util.Arrays.fill(aboveY(i), false)
          java.util.Arrays.fill(aboveU(i), false)
          java.util.Arrays.fill(aboveV(i), false)
          // skipped DC_PRED MBs reset the Y2 context too (the decoder's
          // reset_mb_tokens_context semantics for modes WITH a Y2)
          aboveY2(i) = false; leftY2 = false
        case DcMb(d) =>
          // Y2: DC value then EOB (or immediate EOB when zero)
          val y2ctx = (if (aboveY2(i)) 1 else 0) + (if (leftY2) 1 else 0)
          if (d == 0) {
            writeToken(1, CoefBands(0), y2ctx, 11)
            aboveY2(i) = false; leftY2 = false
          } else {
            writeValueToken(1, CoefBands(0), y2ctx, d)
            val nextCtx = if (d == 1 || d == -1) 1 else 2
            writeToken(1, CoefBands(1), nextCtx, 11)
            aboveY2(i) = true; leftY2 = true
          }
          // 16 Y blocks (type 0): all-zero => immediate EOB at coeff 1
          var sb = 0
          while (sb < 16) {
            val bx = sb & 3; val by = sb >> 2
            val ctx = (if (aboveY(i)(bx)) 1 else 0) + (if (leftY(by)) 1 else 0)
            writeToken(0, CoefBands(1), ctx, 11)
            aboveY(i)(bx) = false; leftY(by) = false
            sb += 1
          }
          writeUvEobs(i)
        case BPredTmMb(d33) =>
          // no Y2; 16 Y blocks type 3 from coeff 0 — subblock 15 carries
          // a DC residual, the rest are immediate EOBs
          var sb = 0
          while (sb < 16) {
            val bx = sb & 3; val by = sb >> 2
            val ctx = (if (aboveY(i)(bx)) 1 else 0) + (if (leftY(by)) 1 else 0)
            if (sb == 15 && d33 != 0) {
              writeValueToken(3, CoefBands(0), ctx, d33)
              val nextCtx = if (d33 == 1 || d33 == -1) 1 else 2
              writeToken(3, CoefBands(1), nextCtx, 11)
              aboveY(i)(bx) = true; leftY(by) = true
            } else {
              writeToken(3, CoefBands(0), ctx, 11)
              aboveY(i)(bx) = false; leftY(by) = false
            }
            sb += 1
          }
          writeUvEobs(i)
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

  /** The q138 corpus shape (round-15 signature, kept for the oracle and
    * the round-trip pins): DC strip, optional skips, filter level 0.
    */
  private[operators] def encodeVp8Strip(
      y2dc: Array[Int], skip: Array[Boolean]): Array[Byte] = {
    require(y2dc.length == skip.length)
    encodeStrip(Array.tabulate[StripMb](y2dc.length)(i =>
      if (skip(i)) SkipMb else DcMb(y2dc(i))))
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
