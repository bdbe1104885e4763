package graft.operators

import graft.operators.MultimodalOps.BmpImage

/** WebP VP8L (lossless) codec — the second-most-common image format in
  * modern web crawls after JPEG; without it a crawl-ingest pipeline
  * dead-letters a large slice of its image payloads. Derived from the
  * public "WebP Lossless Bitstream Specification" (RFC 9649 §3–§5):
  * RIFF container → VP8L chunk → LSB-first bitstream carrying an
  * optional transform chain (predictor / color / subtract-green /
  * color-indexing) over an LZ77 + canonical-prefix-coded ARGB image
  * with an optional color cache and optional meta-prefix partitioning.
  *
  * Decode follows the same contracts as `Jpeg`/`Gif`:
  *   - error-as-value: every malformed/truncated/oversubscribed stream
  *     returns `None`, never throws (fuzz-pinned);
  *   - hostile-header allocation bound: pixel count capped (the GIF
  *     256-frame-cap discipline) so a forged 16383×16383 header cannot
  *     allocate gigabytes before the first bounds check fails;
  *   - output lands in the shared `BmpImage` BGR normal form so every
  *     downstream operator (features, perceptual hashes, resize,
  *     cross-container dedup) works unchanged.
  *
  * The encoder exists for corpus construction and round-trip specs (the
  * `encodePng` role): it emits spec-conformant streams — balanced
  * canonical prefix codes via the full code-length-code machinery,
  * simple codes where a channel is constant, optional subtract-green,
  * and row-grain LZ77 backward references — so the decoder's prefix,
  * transform, AND copy paths are all exercised by the oracle corpus.
  */
object Webp {

  /** Hostile-header bound: decoded ARGB pixel budget (16 MiPixels). */
  private val MaxPixels = 1L << 24

  // ---------------------------------------------------------------- bits

  /** LSB-first bit reader over a byte slice (the VP8L bit order).
    * Truncation sets `ok = false` and yields zeros — callers check `ok`
    * once per bounded loop instead of paying a branch per bit.
    */
  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    var ok = true
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) { ok = false; return 0 }
        v |= ((b(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  // ------------------------------------------------------- prefix codes

  /** Canonical prefix code (RFC 9649 §3.5.1 — DEFLATE-style canonical
    * assignment, max length 15). `single >= 0` is the spec's
    * zero-bit single-symbol form. Decode walks the code MSB-first via
    * the standard (count, first, index) canonical scan.
    */
  private final class PrefixCode(
      val single: Int,
      counts: Array[Int],      // symbols per length, index 1..15
      sorted: Array[Int]) {    // symbols in canonical (length, symbol) order
    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= 15) {
        code = (code << 1) | br.readBits(1)
        val cnt = counts(len)
        if (code - first < cnt) return sorted(index + code - first)
        index += cnt
        first = (first + cnt) << 1
        len += 1
      }
      br.ok = false
      0
    }
  }

  /** Build a canonical code from per-symbol lengths; `null` when the
    * code is incomplete or oversubscribed (the spec demands exactly
    * complete codes; a lying stream must die here, not mis-decode).
    */
  private def buildPrefix(lengths: Array[Int]): PrefixCode = {
    var used = 0
    var lastSym = -1
    var kraft = 0L
    val counts = new Array[Int](16)
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l < 0 || l > 15) return null
      if (l > 0) {
        used += 1; lastSym = i; counts(l) += 1
        kraft += 1L << (15 - l)
      }
      i += 1
    }
    if (used == 0) return null
    if (used == 1) return new PrefixCode(lastSym, counts, null)
    if (kraft != (1L << 15)) return null
    val sorted = new Array[Int](used)
    var idx = 0
    var len = 1
    while (len <= 15) {
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) == len) { sorted(idx) = s; idx += 1 }
        s += 1
      }
      len += 1
    }
    new PrefixCode(-1, counts, sorted)
  }

  /** Symbol order of the code-length code (RFC 9649 §3.5.2). */
  private val ClcOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code: the simple two-symbol form or the normal
    * code-length-coded form with 16/17/18 repeats and the optional
    * max-symbol early stop.
    */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    if (br.readBits(1) == 1) { // simple
      val numSymbols = br.readBits(1) + 1
      val first8 = br.readBits(1) == 1
      val s0 = br.readBits(if (first8) 8 else 1)
      val lengths = new Array[Int](alphabetSize)
      if (s0 >= alphabetSize) return null
      if (numSymbols == 1) { lengths(s0) = 1; return buildPrefix(lengths) }
      val s1 = br.readBits(8)
      if (s1 >= alphabetSize || s1 == s0) return null
      lengths(s0) = 1; lengths(s1) = 1
      buildPrefix(lengths)
    } else { // normal
      val numClc = 4 + br.readBits(4)
      val clcLengths = new Array[Int](19)
      var i = 0
      while (i < numClc) { clcLengths(ClcOrder(i)) = br.readBits(3); i += 1 }
      if (!br.ok) return null
      val clc = buildPrefix(clcLengths)
      if (clc == null) return null
      var maxSymbol =
        if (br.readBits(1) == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nbits)
        } else alphabetSize
      val lengths = new Array[Int](alphabetSize)
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && br.ok) {
        if (maxSymbol == 0) symbol = alphabetSize // early stop
        else {
          maxSymbol -= 1
          val s = clc.read(br)
          if (s < 16) {
            lengths(symbol) = s; symbol += 1
            if (s != 0) prevLen = s
          } else {
            val (repeatVal, n) = s match {
              case 16 => (prevLen, 3 + br.readBits(2))
              case 17 => (0, 3 + br.readBits(3))
              case _  => (0, 11 + br.readBits(7))
            }
            if (symbol + n > alphabetSize) return null
            var j = 0
            while (j < n) { lengths(symbol) = repeatVal; symbol += 1; j += 1 }
          }
        }
      }
      if (!br.ok) return null
      buildPrefix(lengths)
    }
  }

  // ------------------------------------------------- entropy-coded image

  /** Decode the LZ77 prefix-coded integer for symbol `sym` (length and
    * distance share the scheme, RFC 9649 §3.6.2.2).
    */
  private def lz77Value(br: BitReader, sym: Int): Int =
    if (sym < 4) sym + 1
    else {
      val extraBits = (sym - 2) >> 1
      val offset = (2 + (sym & 1)) << extraBits
      offset + br.readBits(extraBits) + 1
    }

  /** The 120-entry close-neighbor distance map (dx in [-8, 7], dy in
    * [0, 7], ordered by the spec's table).
    */
  private val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def mapDistance(code: Int, w: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistanceMap(code - 1)
      math.max(1, dy * w + dx)
    }

  /** One group of the five prefix codes. */
  private final class CodeGroup(
      val green: PrefixCode, val red: PrefixCode, val blue: PrefixCode,
      val alpha: PrefixCode, val dist: PrefixCode)

  private def readCodeGroup(br: BitReader, cacheSize: Int): CodeGroup = {
    val g = readPrefixCode(br, 256 + 24 + cacheSize)
    if (g == null) return null
    val r = readPrefixCode(br, 256); if (r == null) return null
    val b = readPrefixCode(br, 256); if (b == null) return null
    val a = readPrefixCode(br, 256); if (a == null) return null
    val d = readPrefixCode(br, 40); if (d == null) return null
    new CodeGroup(g, r, b, a, d)
  }

  /** Decode one entropy-coded ARGB image of `w`×`h`. Only the MAIN image
    * may carry the meta-prefix partitioning (`isMain`); transform data,
    * entropy images, and palettes are single-group (§3.7.2). Returns
    * null on any malformation.
    */
  private def readEntropyImage(
      br: BitReader, w: Int, h: Int, isMain: Boolean): Array[Int] = {
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
    val cacheBits = if (br.readBits(1) == 1) br.readBits(4) else 0
    if (cacheBits > 11) return null
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta prefix (main image only): an entropy sub-image whose
    // (red<<8|green) picks the code group per block
    var metaSb = 0
    var meta: Array[Int] = null
    var nGroups = 1
    if (isMain && br.readBits(1) == 1) {
      metaSb = br.readBits(3) + 2
      val mw = divUp(w, 1 << metaSb)
      val mh = divUp(h, 1 << metaSb)
      meta = readEntropyImage(br, mw, mh, isMain = false)
      if (meta == null) return null
      var i = 0
      while (i < meta.length) {
        val ix = ((meta(i) >> 8) & 0xffff) + 1
        if (ix > nGroups) nGroups = ix
        i += 1
      }
      if (nGroups > 1024) return null // sanity bound on group count
    }
    val groups = new Array[CodeGroup](nGroups)
    var gi = 0
    while (gi < nGroups) {
      groups(gi) = readCodeGroup(br, cacheSize)
      if (groups(gi) == null) return null
      gi += 1
    }
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def insert(px: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
    val out = new Array[Int](w * h)
    val mw = if (meta != null) divUp(w, 1 << metaSb) else 0
    var pos = 0
    val n = out.length
    while (pos < n && br.ok) {
      val grp =
        if (meta == null) groups(0)
        else {
          val x = pos % w; val y = pos / w
          val mp = meta((y >> metaSb) * mw + (x >> metaSb))
          groups((mp >> 8) & 0xffff)
        }
      val s = grp.green.read(br)
      if (s < 256) {
        val red = grp.red.read(br)
        val blue = grp.blue.read(br)
        val alpha = grp.alpha.read(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px; insert(px); pos += 1
      } else if (s < 280) {
        val length = lz77Value(br, s - 256)
        val dCode = lz77Value(br, grp.dist.read(br))
        if (dCode < 1 || dCode > 120 + MaxPixels) return null
        val dist = mapDistance(dCode, w)
        if (dist > pos || pos + length > n) return null
        var j = 0
        while (j < length) { // overlap-friendly sequential copy
          val px = out(pos - dist); out(pos) = px; insert(px); pos += 1; j += 1
        }
      } else {
        if (cache == null) return null
        val idx = s - 280
        if (idx >= cacheSize) return null
        out(pos) = cache(idx); pos += 1
      }
    }
    if (!br.ok || pos < n) return null
    out
  }

  private def divUp(a: Int, b: Int): Int = (a + b - 1) / b

  // --------------------------------------------------- inverse transforms

  private def aOf(p: Int) = (p >>> 24) & 0xff
  private def rOf(p: Int) = (p >>> 16) & 0xff
  private def gOf(p: Int) = (p >>> 8) & 0xff
  private def bOf(p: Int) = p & 0xff
  private def argb(a: Int, r: Int, g: Int, b: Int): Int =
    ((a & 0xff) << 24) | ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)

  /** Componentwise modular add (the transform algebra's group op). */
  private def addPx(p: Int, q: Int): Int =
    argb(aOf(p) + aOf(q), rOf(p) + rOf(q), gOf(p) + gOf(q), bOf(p) + bOf(q))

  private def avg2(p: Int, q: Int): Int =
    argb((aOf(p) + aOf(q)) / 2, (rOf(p) + rOf(q)) / 2,
      (gOf(p) + gOf(q)) / 2, (bOf(p) + bOf(q)) / 2)

  private def clamp255(x: Int): Int = if (x < 0) 0 else if (x > 255) 255 else x

  /** Predictor modes 0–13 (RFC 9649 §4.2.2). `l`/`t`/`tl`/`tr` are the
    * neighbor pixels already reconstructed.
    */
  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => // Select: the gradient chooser
        val pa = aOf(l) + aOf(t) - aOf(tl)
        val pr = rOf(l) + rOf(t) - rOf(tl)
        val pg = gOf(l) + gOf(t) - gOf(tl)
        val pb = bOf(l) + bOf(t) - bOf(tl)
        val pLeft = math.abs(pa - aOf(l)) + math.abs(pr - rOf(l)) +
          math.abs(pg - gOf(l)) + math.abs(pb - bOf(l))
        val pTop = math.abs(pa - aOf(t)) + math.abs(pr - rOf(t)) +
          math.abs(pg - gOf(t)) + math.abs(pb - bOf(t))
        if (pLeft < pTop) l else t
      case 12 => // ClampAddSubtractFull
        argb(clamp255(aOf(l) + aOf(t) - aOf(tl)),
          clamp255(rOf(l) + rOf(t) - rOf(tl)),
          clamp255(gOf(l) + gOf(t) - gOf(tl)),
          clamp255(bOf(l) + bOf(t) - bOf(tl)))
      case 13 => // ClampAddSubtractHalf over Average2(L, T) and TL
        def half(a: Int, b: Int): Int = clamp255(a + (a - b) / 2)
        val av = avg2(l, t)
        argb(half(aOf(av), aOf(tl)), half(rOf(av), rOf(tl)),
          half(gOf(av), gOf(tl)), half(bOf(av), bOf(tl)))
      case _ => 0xff000000
    }

  private def inversePredictor(
      px: Array[Int], w: Int, h: Int, sb: Int, data: Array[Int]): Boolean = {
    val bw = divUp(w, 1 << sb)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1)             // first row: Left
          else if (x == 0) px(i - w)             // first column: Top
          else {
            val mode = gOf(data((y >> sb) * bw + (x >> sb)))
            if (mode > 13) return false
            val tr = if (x + 1 < w) px(i - w + 1) else px(i - w)
            predict(mode, px(i - 1), px(i - w), px(i - w - 1), tr)
          }
        px(i) = addPx(px(i), pred)
        x += 1
      }
      y += 1
    }
    true
  }

  /** Color-transform delta: signed-8-bit multiply, arithmetic shift 5
    * (§4.2.3); decode ADDS the delta back.
    */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  private def inverseColorTransform(
      px: Array[Int], w: Int, h: Int, sb: Int, data: Array[Int]): Unit = {
    val bw = divUp(w, 1 << sb)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val cte = data((y >> sb) * bw + (x >> sb))
        val g2r = bOf(cte); val g2b = gOf(cte); val r2b = rOf(cte)
        val p = px(i)
        val g = gOf(p)
        val r = (rOf(p) + ctDelta(g2r, g)) & 0xff
        val b = (bOf(p) + ctDelta(g2b, g) + ctDelta(r2b, r)) & 0xff
        px(i) = argb(aOf(p), r, g, b)
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = gOf(p)
      px(i) = argb(aOf(p), rOf(p) + g, g, bOf(p) + g)
      i += 1
    }
  }

  /** Index-bundling width: how many pixels pack into one green byte. */
  private def paletteWidthBits(n: Int): Int =
    if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0

  /** Unbundle + palette-lookup: packed (width `pw`) image → full width.
    * Out-of-range indexes are transparent black (§4.2.4).
    */
  private def inverseColorIndex(
      packed: Array[Int], pw: Int, w: Int, h: Int,
      palette: Array[Int]): Array[Int] = {
    val wb = paletteWidthBits(palette.length)
    val perByte = 1 << wb
    val bits = 8 >> wb
    val mask = (1 << bits) - 1
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val packedPx = packed(y * pw + (x >> wb))
        val idx = (gOf(packedPx) >> ((x & (perByte - 1)) * bits)) & mask
        out(y * w + x) = if (idx < palette.length) palette(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------- decode

  private final case class Transform(kind: Int, sb: Int, data: Array[Int])

  /** Decode a VP8L payload (after the RIFF/chunk framing) to ARGB. */
  private[operators] def decodeVp8l(
      b: Array[Byte], off: Int, len: Int): Option[(Int, Int, Array[Int])] = {
    val br = new BitReader(b, off, math.min(off + len, b.length))
    if (br.readBits(8) != 0x2f) return None
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    br.readBits(1) // alpha hint
    if (br.readBits(3) != 0 || !br.ok) return None
    if (w.toLong * h > MaxPixels) return None
    // transform chain (each type at most once); color-indexing narrows
    // the coded width for everything read after it
    var xsize = w
    var palette: Array[Int] = null
    var transforms = List.empty[Transform]
    var seen = 0
    var more = br.readBits(1) == 1
    while (more && br.ok) {
      val t = br.readBits(2)
      if ((seen & (1 << t)) != 0) return None
      seen |= 1 << t
      t match {
        case 0 | 1 =>
          val sb = br.readBits(3) + 2
          val data = readEntropyImage(
            br, divUp(xsize, 1 << sb), divUp(h, 1 << sb), isMain = false)
          if (data == null) return None
          transforms ::= Transform(t, sb, data)
        case 2 =>
          transforms ::= Transform(2, 0, null)
        case _ =>
          val n = br.readBits(8) + 1
          val raw = readEntropyImage(br, n, 1, isMain = false)
          if (raw == null) return None
          // palette entries are componentwise deltas off the previous
          var i = 1
          while (i < n) { raw(i) = addPx(raw(i), raw(i - 1)); i += 1 }
          palette = raw
          xsize = divUp(w, 1 << paletteWidthBits(n))
          transforms ::= Transform(3, 0, null)
      }
      more = br.readBits(1) == 1
    }
    if (!br.ok) return None
    var px = readEntropyImage(br, xsize, h, isMain = true)
    if (px == null) return None
    var curW = xsize
    // inverse transforms in reverse order of appearance (transforms list
    // is already reversed by the :: prepends)
    for (tr <- transforms) tr.kind match {
      case 0 => if (!inversePredictor(px, curW, h, tr.sb, tr.data)) return None
      case 1 => inverseColorTransform(px, curW, h, tr.sb, tr.data)
      case 2 => inverseSubtractGreen(px)
      case _ =>
        px = inverseColorIndex(px, curW, w, h, palette)
        curW = w
    }
    if (curW != w) return None
    Some((w, h, px))
  }

  /** Decode a WebP container to the shared `BmpImage` BGR form. The
    * chunk scan skips metadata chunks (VP8X/ICCP/EXIF…) and decodes the
    * first image chunk found: `VP8L` through the lossless path here,
    * `VP8 ` (lossy key frame) through `Vp8.decodeVp8` with 4:2:0
    * chroma upsampled by sample replication and the SAME integer JFIF
    * YCbCr→RGB the JPEG decoder uses (one converter contract across
    * codecs — neutral chroma is exactly grayscale). As of round 16 the
    * lossy path carries the full key-frame feature set (real RFC 6386
    * tables, segmentation, B_PRED, loop filter, multiple token
    * partitions — conformance-proven against the reference codec's own
    * fixtures); interframes and malformed streams still dead-letter
    * with None (the D15 discipline).
    */
  def decodeWebp(b: Array[Byte]): Option[BmpImage] =
    try {
      if (b == null || b.length < 20) return None
      if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return None
      // chunk scan from offset 12: fourcc + le32 size (+ pad to even)
      var o = 12
      while (o + 8 <= b.length) {
        val size = (b(o + 4) & 0xff) | ((b(o + 5) & 0xff) << 8) |
          ((b(o + 6) & 0xff) << 16) | ((b(o + 7) & 0xff) << 24)
        if (size < 0 || o + 8 + size > b.length) return None
        if (b(o) == 'V' && b(o + 1) == 'P' && b(o + 2) == '8' && b(o + 3) == 'L')
          return decodeVp8l(b, o + 8, size).map { case (w, h, px) =>
            val bgr = new Array[Byte](w * h * 3)
            var i = 0
            while (i < px.length) {
              val p = px(i)
              bgr(i * 3) = bOf(p).toByte
              bgr(i * 3 + 1) = gOf(p).toByte
              bgr(i * 3 + 2) = rOf(p).toByte
              i += 1
            }
            BmpImage(w, h, 24, bgr)
          }
        if (b(o) == 'V' && b(o + 1) == 'P' && b(o + 2) == '8' && b(o + 3) == ' ')
          return Vp8.decodeVp8(b, o + 8, size).map { f =>
            val bgr = new Array[Byte](f.width * f.height * 3)
            val uvW = (f.width + 1) / 2
            var y = 0
            while (y < f.height) {
              var x = 0
              while (x < f.width) {
                val yy = f.y(y * f.width + x)
                val cb = f.u((y / 2) * uvW + x / 2)
                val cr = f.v((y / 2) * uvW + x / 2)
                val (r, g, bb2) = Jpeg.yccToRgb(yy, cb, cr)
                val i = (y * f.width + x) * 3
                bgr(i) = bb2.toByte; bgr(i + 1) = g.toByte; bgr(i + 2) = r.toByte
                x += 1
              }
              y += 1
            }
            BmpImage(f.width, f.height, 24, bgr)
          }
        o += 8 + size + (size & 1)
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------- encode

  /** LSB-first bit writer (the encoder twin of `BitReader`). */
  private[operators] final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i += 1
      }
    }
    /** Prefix-code bits go MSB-of-code first into the LSB-first stream. */
    def writeCodeMsb(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      if (nbits > 0) { buf += cur.toByte; cur = 0; nbits = 0 }
      buf.toArray
    }
  }

  /** Balanced complete code lengths over `used` (sorted distinct
    * symbols): with k symbols and L = ceil(log2 k), the first 2^L − k
    * get length L−1 and the rest L — Kraft-complete by construction.
    */
  private[operators] def balancedLengths(used: Array[Int], alphabetSize: Int): Array[Int] = {
    val lengths = new Array[Int](alphabetSize)
    val k = used.length
    if (k == 1) { lengths(used(0)) = 1; return lengths }
    var l = 1
    while ((1 << l) < k) l += 1
    val nShort = (1 << l) - k
    var i = 0
    while (i < k) {
      lengths(used(i)) = if (i < nShort && l > 1) l - 1 else l
      i += 1
    }
    lengths
  }

  /** Canonical (code, len) table from lengths — the encoder-side twin of
    * `buildPrefix`'s assignment.
    */
  private[operators] def canonicalCodes(lengths: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](lengths.length)
    var code = 0
    var len = 1
    while (len <= 15) {
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) == len) { out(s) = (code, len); code += 1 }
        s += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  /** Emit one prefix code: the simple form for ≤ 2 symbols, else the
    * normal form — code lengths streamed through a balanced
    * code-length code (no 16/17/18 repeats; compactness is not the
    * encoder's job, conformance is). Returns the symbol→(code,len)
    * table for the data pass.
    */
  private[operators] def writePrefixCode(
      bw: BitWriter, used: Array[Int], alphabetSize: Int): Array[(Int, Int)] = {
    if (used.length <= 2 && used.forall(_ < 256)) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(used.length - 1, 1)
      if (used.length == 1) {
        if (used(0) <= 1) { bw.writeBits(0, 1); bw.writeBits(used(0), 1) }
        else { bw.writeBits(1, 1); bw.writeBits(used(0), 8) }
        val t = new Array[(Int, Int)](alphabetSize)
        t(used(0)) = (0, 0)
        t
      } else {
        bw.writeBits(1, 1); bw.writeBits(used(0), 8)
        bw.writeBits(used(1), 8)
        val t = new Array[(Int, Int)](alphabetSize)
        t(used(0)) = (0, 1); t(used(1)) = (1, 1)
        t
      }
    } else {
      bw.writeBits(0, 1) // normal
      val lengths = balancedLengths(used, alphabetSize)
      // a single used symbol (only reachable when it's >= 256, e.g. a
      // lengths-only green code) decodes as the spec's ZERO-BIT form —
      // the emit table must agree or every later read desyncs
      val zeroBitSingle = used.length == 1
      var clcUsed = lengths.distinct.sorted
      if (clcUsed.length == 1) // force a complete 2-symbol clc
        clcUsed = (clcUsed :+ (if (clcUsed(0) == 0) 1 else 0)).sorted
      val clcLengths = balancedLengths(clcUsed, 19)
      val clcCodes = canonicalCodes(clcLengths)
      val numClc = (0 until 19).filter(i => clcLengths(ClcOrder(i)) > 0)
        .foldLeft(4)((m, i) => math.max(m, i + 1))
      bw.writeBits(numClc - 4, 4)
      var i = 0
      while (i < numClc) { bw.writeBits(clcLengths(ClcOrder(i)), 3); i += 1 }
      bw.writeBits(0, 1) // no max-symbol shortcut
      var s = 0
      while (s < alphabetSize) {
        val (c, l) = clcCodes(lengths(s))
        bw.writeCodeMsb(c, l)
        s += 1
      }
      if (zeroBitSingle) {
        val t = new Array[(Int, Int)](alphabetSize)
        t(used(0)) = (0, 0)
        t
      } else canonicalCodes(lengths)
    }
  }

  /** LZ77 prefix encoding of value `v` ≥ 1: (symbol, extraBits,
    * extraValue) — the encoder twin of `lz77Value`.
    */
  private[operators] def lz77Sym(v: Int): (Int, Int, Int) = {
    val x = v - 1
    if (x < 4) (x, 0, 0)
    else {
      val hi = 31 - Integer.numberOfLeadingZeros(x)
      val eb = hi - 1
      val second = (x >> eb) & 1
      val sym = 2 + 2 * eb + second
      val offset = (2 + second) << eb
      (sym, eb, x - offset)
    }
  }

  /** Encode RGB (R,G,B triplets, row-major top-down) as a lossless VP8L
    * WebP. `subtractGreen` exercises the transform path; `lz77Rows`
    * emits a (length = w, distance = w) backward reference for every row
    * equal to its predecessor — so column-gradient corpora exercise the
    * copy machinery, not just literals.
    */
  def encodeWebpLossless(
      w: Int, h: Int, rgb: Array[Byte],
      subtractGreen: Boolean = true, lz77Rows: Boolean = true): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384 && rgb.length == w * h * 3)
    // forward transform + channel planes
    val gs = new Array[Int](w * h); val rs = new Array[Int](w * h)
    val bs = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      gs(i) = g
      rs(i) = if (subtractGreen) (r - g) & 0xff else r
      bs(i) = if (subtractGreen) (b - g) & 0xff else b
      i += 1
    }
    // tokenize: per row, literal run or copy-previous-row reference
    val rowIsCopy = new Array[Boolean](h)
    if (lz77Rows && h > 1) {
      var y = 1
      while (y < h) {
        var same = true
        var x = 0
        while (same && x < w) {
          val a = y * w + x; val p = a - w
          if (gs(a) != gs(p) || rs(a) != rs(p) || bs(a) != bs(p)) same = false
          x += 1
        }
        rowIsCopy(y) = same
        y += 1
      }
    }
    // used-symbol sets
    val (lenSym, lenEb, lenEv) = lz77Sym(w)
    val (dSym, dEb, dEv) = lz77Sym(w + 120)
    val greenUsed = scala.collection.mutable.SortedSet.empty[Int]
    val redUsed = scala.collection.mutable.SortedSet.empty[Int]
    val blueUsed = scala.collection.mutable.SortedSet.empty[Int]
    var anyCopy = false
    var y = 0
    while (y < h) {
      if (rowIsCopy(y)) anyCopy = true
      else {
        var x = 0
        while (x < w) {
          val p = y * w + x
          greenUsed += gs(p); redUsed += rs(p); blueUsed += bs(p)
          x += 1
        }
      }
      y += 1
    }
    if (anyCopy) greenUsed += 256 + lenSym

    val bw = new BitWriter
    bw.writeBits(0x2f, 8)
    bw.writeBits(w - 1, 14); bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1) // no alpha
    bw.writeBits(0, 3) // version
    if (subtractGreen) { bw.writeBits(1, 1); bw.writeBits(2, 2) }
    bw.writeBits(0, 1) // end of transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta prefix
    val greenT = writePrefixCode(bw, greenUsed.toArray, 280)
    val redT = writePrefixCode(bw, redUsed.toArray, 256)
    val blueT = writePrefixCode(bw, blueUsed.toArray, 256)
    val alphaT = writePrefixCode(bw, Array(255), 256)
    val distT = writePrefixCode(bw, Array(dSym), 40)
    def emit(t: Array[(Int, Int)], s: Int): Unit = {
      val (c, l) = t(s); bw.writeCodeMsb(c, l)
    }
    y = 0
    while (y < h) {
      if (rowIsCopy(y)) {
        emit(greenT, 256 + lenSym); bw.writeBits(lenEv, lenEb)
        emit(distT, dSym); bw.writeBits(dEv, dEb)
      } else {
        var x = 0
        while (x < w) {
          val p = y * w + x
          emit(greenT, gs(p)); emit(redT, rs(p)); emit(blueT, bs(p))
          emit(alphaT, 255)
          x += 1
        }
      }
      y += 1
    }
    val payload = bw.bytes
    // RIFF framing: RIFF <size> WEBP VP8L <size> payload [pad]
    val chunkLen = payload.length
    val padded = chunkLen + (chunkLen & 1)
    val riffLen = 4 + 8 + padded
    val out = new Array[Byte](8 + riffLen)
    def put4(o: Int, s: String): Unit = { var k = 0; while (k < 4) { out(o + k) = s.charAt(k).toByte; k += 1 } }
    def putLe32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    put4(0, "RIFF"); putLe32(4, riffLen); put4(8, "WEBP"); put4(12, "VP8L")
    putLe32(16, chunkLen)
    System.arraycopy(payload, 0, out, 20, chunkLen)
    out
  }
}
