package graft.operators

/** Dependency-free GIF87a/89a still-image codec (public spec layout), the
  * PNG/JPEG discipline applied to the LZW compression family: signature +
  * logical-screen walk, block-framed extensions skipped, first image
  * descriptor decoded (animation = first frame), variable-width LSB-first
  * LZW with CLEAR/EOI handling and the deferred +1 code case, palette
  * mapping into the shared `MultimodalOps.BmpImage` BGR shape.
  * Error-as-value everywhere: interlaced or local-palette-less streams
  * outside the envelope, truncation, corrupt codes, oversized dims all
  * return `None` and never throw (fuzz-pinned).
  *
  * The encoder exists for the oracle corpus: a spec-valid literal-code LZW
  * stream (CLEAR re-emitted before the dictionary can force a width
  * change) over the engine's arithmetic palette — GIF is lossless, so the
  * q86 gradient corpus decodes EXACTLY and the oracle replays every
  * channel sum as doc_id arithmetic, the PNG q69 trick for the LZW path.
  */
object Gif {
  import MultimodalOps.BmpImage

  private val MaxOutBytes = 64L << 20

  // ---------------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------------

  /** Decode the FIRST image of a GIF87a/89a stream: global or local
    * palette, non-interlaced, any min-code-size. `None` outside the
    * envelope or on corruption.
    */
  def decodeGif(b: Array[Byte]): Option[BmpImage] =
    try decodeImpl(b)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(b: Array[Byte]): Option[BmpImage] = {
    if (b == null || b.length < 13) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    var p = 6
    p += 4 // logical screen dims (per-image descriptor dims are authoritative)
    val packed = b(p) & 0xFF
    p += 3 // packed, bg index, aspect
    var globalPal: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 0x07)
      if (p + 3 * n > b.length) return None
      globalPal = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
      p += 3 * n
    }
    // block walk to the first image descriptor
    while (p < b.length) {
      (b(p) & 0xFF) match {
        case 0x21 => // extension: label + sub-blocks
          p += 2
          var len = if (p < b.length) b(p) & 0xFF else return None
          while (len != 0) {
            p += 1 + len
            if (p >= b.length) return None
            len = b(p) & 0xFF
          }
          p += 1 // block terminator
        case 0x2C => // image descriptor
          if (p + 10 > b.length) return None
          val w = u16(p + 5)
          val h = u16(p + 7)
          val ipacked = b(p + 9) & 0xFF
          p += 10
          if (w <= 0 || h <= 0 || 3L * w * h > MaxOutBytes) return None
          if ((ipacked & 0x40) != 0) return None // interlaced: out of envelope
          var pal = globalPal
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 0x07)
            if (p + 3 * n > b.length) return None
            pal = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
            p += 3 * n
          }
          if (pal == null) return None
          if (p >= b.length) return None
          val minCode = b(p) & 0xFF
          p += 1
          if (minCode < 2 || minCode > 8) return None
          return lzwDecode(b, p, minCode, w, h).map { idx =>
            val out = new Array[Byte](w * h * 3)
            val nPal = pal.length / 3
            var i = 0
            while (i < w * h) {
              val ci = idx(i) & 0xFF
              if (ci >= nPal) return None // index past the palette: corrupt
              out(i * 3) = pal(ci * 3 + 2) // B
              out(i * 3 + 1) = pal(ci * 3 + 1) // G
              out(i * 3 + 2) = pal(ci * 3) // R
              i += 1
            }
            BmpImage(w, h, 24, out)
          }
        case 0x3B => return None // trailer before any image
        case _ => return None // unknown block type: corrupt
      }
    }
    None
  }

  /** Variable-width LSB-first LZW over GIF's length-framed sub-blocks:
    * standard dictionary build (prefix/suffix chains), CLEAR resets, EOI
    * stops, the `code == next` deferred case handled, width grows when the
    * table reaches `1 << width` (max 12). Returns exactly `w*h` indices or
    * `None`.
    */
  private def lzwDecode(
      b: Array[Byte], start: Int, minCode: Int, w: Int, h: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    var next = eoi + 1
    var width = minCode + 1
    val out = new Array[Byte](w * h)
    var outPos = 0
    var prev = -1
    var acc = 0
    var nBits = 0
    var p = start
    var blockLeft = 0
    val stack = new Array[Byte](4096)

    def emit(code: Int): Boolean = { // write string(code); false on overflow walk
      var sp = 0
      var c = code
      while (c >= 0) {
        if (sp >= stack.length) return false // cycle guard
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      while (sp > 0 && outPos < out.length) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      true
    }
    def firstChar(code: Int): Byte = {
      var c = code
      while (prefix(c) >= 0) c = prefix(c)
      suffix(c)
    }

    while (outPos < out.length) {
      // refill bits (crossing sub-block frames as needed)
      while (nBits < width) {
        if (blockLeft == 0) {
          if (p >= b.length) return None
          blockLeft = b(p) & 0xFF
          p += 1
          if (blockLeft == 0) return None // terminator before the image filled
        }
        if (p >= b.length) return None
        acc |= (b(p) & 0xFF) << nBits
        nBits += 8
        p += 1
        blockLeft -= 1
      }
      val code = acc & ((1 << width) - 1)
      acc >>>= width
      nBits -= width
      if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return None // EOI before the image filled
      } else if (code < next && code != eoi) {
        if (!emit(code)) return None
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = firstChar(code); next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else if (code == next && prev >= 0 && next < 4096) {
        // the deferred KwK case: entry = string(prev) + firstChar(prev)
        prefix(next) = prev; suffix(next) = firstChar(prev); next += 1
        if (!emit(next - 1)) return None
        if (next == (1 << width) && width < 12) width += 1
        prev = code
      } else {
        return None // code past the table: corrupt stream
      }
    }
    Some(out)
  }

  // ---------------------------------------------------------------------
  // Corpus encoder
  // ---------------------------------------------------------------------

  /** Spec-valid GIF87a writer over an explicit 256-entry RGB palette and
    * 8-bit indices: literal-code LZW (min code size 8, width fixed at 9 by
    * re-emitting CLEAR before the dictionary could reach the width
    * boundary — the classic "uncompressed GIF" construction, byte-exact
    * decodable by ANY conforming reader), LSB-first packing, ≤255-byte
    * sub-block framing.
    */
  def encodeGif(
      width: Int, height: Int, palette: Array[Byte], indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && indices.length == width * height)
    require(palette.length == 768, "palette must be 256 RGB entries")
    val out = new java.io.ByteArrayOutputStream(indices.length * 2 + 800)
    out.write("GIF87a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(width); le16(height)
    out.write(0xF7) // GCT present, 8-bit resolution, 256 entries
    out.write(0) // background index
    out.write(0) // aspect
    out.write(palette, 0, 768)
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(width); le16(height)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW min code size
    // literal 9-bit codes, CLEAR every 250 literals (dictionary stays
    // < 508 entries, safely under the 512 width boundary)
    val codes = new java.io.ByteArrayOutputStream(indices.length * 2)
    var acc = 0
    var nBits = 0
    def putCode(c: Int): Unit = {
      acc |= c << nBits
      nBits += 9
      while (nBits >= 8) { codes.write(acc & 0xFF); acc >>>= 8; nBits -= 8 }
    }
    putCode(256) // CLEAR
    var i = 0
    while (i < indices.length) {
      if (i > 0 && i % 250 == 0) putCode(256)
      putCode(indices(i) & 0xFF)
      i += 1
    }
    putCode(257) // EOI
    if (nBits > 0) codes.write(acc & 0xFF)
    val data = codes.toByteArray
    var o = 0
    while (o < data.length) {
      val n = math.min(255, data.length - o)
      out.write(n)
      out.write(data, o, n)
      o += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }
}
