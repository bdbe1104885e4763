package graft.operators

/** Dependency-free GIF87a/89a codec (public spec layout), the PNG/JPEG
  * discipline applied to the LZW compression family: signature +
  * logical-screen walk, Graphic Control Extensions parsed (delay,
  * disposal, transparency), EVERY image descriptor decoded and composited
  * onto the logical-screen canvas (multi-frame animations surface each
  * composited frame, AVI's per-frame shape), 4-pass row interlace
  * de-passed, variable-width LSB-first LZW with CLEAR/EOI handling and
  * the deferred +1 code case, palette mapping into the shared
  * `MultimodalOps.BmpImage` BGR shape. Error-as-value everywhere:
  * truncation, corrupt codes, oversized dims, frames outside the screen
  * all return `None` and never throw (fuzz-pinned).
  *
  * Compositing model (the common-decoder choice, documented because
  * BmpImage carries no alpha): the canvas starts as the background color
  * (global palette's bg entry; black without one), transparent pixels
  * leave the canvas untouched, disposal 2 restores the frame rect to the
  * background color, disposal 3 restores the pre-frame canvas.
  *
  * The encoder exists for the oracle corpus: a spec-valid literal-code LZW
  * stream (CLEAR re-emitted before the dictionary can force a width
  * change) over the engine's arithmetic palette — GIF is lossless, so the
  * q86/q114 gradient corpora decode EXACTLY and the oracle replays every
  * channel sum as doc_id arithmetic, the PNG q69 trick for the LZW path.
  */
object Gif {
  import MultimodalOps.BmpImage

  private val MaxOutBytes = 64L << 20

  /** Hostile-stream frame cap: a 13-byte header can promise unbounded
    * descriptors; decoding stops (successfully) at this many frames.
    */
  private val MaxFrames = 256

  /** One composited animation frame: the full logical-screen canvas after
    * this frame's draw, plus its GCE delay (centiseconds; 0 without one).
    */
  final case class GifFrame(image: BmpImage, delayCs: Int)

  // ---------------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------------

  /** Decode the FIRST composited frame of a GIF87a/89a stream. */
  def decodeGif(b: Array[Byte]): Option[BmpImage] =
    try decodeImpl(b, maxFrames = 1).map(_.head.image)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Decode ALL frames (composited canvases, up to `MaxFrames`). */
  def decodeGifFrames(b: Array[Byte]): Option[Vector[GifFrame]] =
    try decodeImpl(b, maxFrames = MaxFrames)
    catch { case scala.util.control.NonFatal(_) => None }

  /** GIF's 4-pass row interlace (spec appendix E): stored row → actual
    * row, passes (0,8), (4,8), (2,4), (1,2).
    */
  private[operators] def interlaceRowMap(h: Int): Array[Int] = {
    val m = new Array[Int](h)
    var sr = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) { m(sr) = y; sr += 1; y += step }
    }
    m
  }

  private def decodeImpl(
      b: Array[Byte], maxFrames: Int): Option[Vector[GifFrame]] = {
    if (b == null || b.length < 13) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    val sw = u16(6)
    val sh = u16(8)
    if (sw <= 0 || sh <= 0 || 3L * sw * sh > MaxOutBytes) return None
    val packed = b(10) & 0xFF
    val bgIndex = b(11) & 0xFF
    var p = 13
    var globalPal: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 0x07)
      if (p + 3 * n > b.length) return None
      globalPal = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
      p += 3 * n
    }
    // canvas starts as the background color (black without a usable one)
    val canvas = new Array[Byte](sw * sh * 3)
    val (bgB, bgG, bgR) =
      if (globalPal != null && bgIndex < globalPal.length / 3)
        (globalPal(bgIndex * 3 + 2), globalPal(bgIndex * 3 + 1), globalPal(bgIndex * 3))
      else (0.toByte, 0.toByte, 0.toByte)
    locally {
      var i = 0
      while (i < sw * sh) {
        canvas(i * 3) = bgB; canvas(i * 3 + 1) = bgG; canvas(i * 3 + 2) = bgR
        i += 1
      }
    }
    val frames = Vector.newBuilder[GifFrame]
    var nFrames = 0
    // pending Graphic Control Extension state (applies to the next image)
    var disposal = 0
    var transIdx = -1
    var delayCs = 0
    while (p < b.length) {
      (b(p) & 0xFF) match {
        case 0x21 => // extension: label + sub-blocks
          if (p + 2 >= b.length) return None
          val label = b(p + 1) & 0xFF
          // GCE: 4-byte payload (packed, delay lo/hi, transparent index)
          if (label == 0xF9 && p + 7 < b.length && (b(p + 2) & 0xFF) >= 4) {
            val gp = b(p + 3) & 0xFF
            disposal = (gp >> 2) & 0x07
            delayCs = u16(p + 4)
            transIdx = if ((gp & 0x01) != 0) b(p + 6) & 0xFF else -1
          }
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
          val left = u16(p + 1)
          val top = u16(p + 3)
          val w = u16(p + 5)
          val h = u16(p + 7)
          val ipacked = b(p + 9) & 0xFF
          p += 10
          if (w <= 0 || h <= 0) return None
          if (left + w > sw || top + h > sh) return None // off-canvas frame
          val interlaced = (ipacked & 0x40) != 0
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
          val decoded = lzwDecodeAt(b, p, minCode, w, h)
          if (decoded.isEmpty) return None
          val (idx, after) = decoded.get
          p = after
          val nPal = pal.length / 3
          val rowMap = if (interlaced) interlaceRowMap(h) else null
          // disposal 3 restores the canvas as it was BEFORE this frame
          val prev = if (disposal == 3) canvas.clone() else null
          var sr = 0
          while (sr < h) {
            val y = top + (if (rowMap != null) rowMap(sr) else sr)
            var x = 0
            while (x < w) {
              val ci = idx(sr * w + x) & 0xFF
              if (ci >= nPal) return None // index past the palette: corrupt
              if (ci != transIdx) {
                val o = (y * sw + left + x) * 3
                canvas(o) = pal(ci * 3 + 2) // B
                canvas(o + 1) = pal(ci * 3 + 1) // G
                canvas(o + 2) = pal(ci * 3) // R
              }
              x += 1
            }
            sr += 1
          }
          frames += GifFrame(BmpImage(sw, sh, 24, canvas.clone()), delayCs)
          nFrames += 1
          if (nFrames >= maxFrames) return Some(frames.result())
          disposal match {
            case 2 => // restore the frame rect to the background color
              var y = top
              while (y < top + h) {
                var x = left
                while (x < left + w) {
                  val o = (y * sw + x) * 3
                  canvas(o) = bgB; canvas(o + 1) = bgG; canvas(o + 2) = bgR
                  x += 1
                }
                y += 1
              }
            case 3 => System.arraycopy(prev, 0, canvas, 0, canvas.length)
            case _ => () // 0/1: leave as drawn
          }
          disposal = 0; transIdx = -1; delayCs = 0
        case 0x3B => // trailer
          val out = frames.result()
          return if (out.nonEmpty) Some(out) else None
        case _ => return None // unknown block type: corrupt
      }
    }
    // missing trailer: tolerate if at least one frame decoded (truncated
    // tail after a complete frame — the common crawl artifact)
    val out = frames.result()
    if (out.nonEmpty) Some(out) else None
  }

  /** Variable-width LSB-first LZW over GIF's length-framed sub-blocks:
    * standard dictionary build (prefix/suffix chains), CLEAR resets, EOI
    * stops, the `code == next` deferred case handled, width grows when the
    * table reaches `1 << width` (max 12). Returns exactly `w*h` indices
    * plus the offset just past the image data's block terminator (the
    * multi-frame walk resumes there), or `None`.
    */
  private def lzwDecodeAt(
      b: Array[Byte], start: Int, minCode: Int,
      w: Int, h: Int): Option[(Array[Byte], Int)] = {
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
    // image filled: skip the rest of the entropy sub-blocks (trailing
    // bits, the EOI code, padding) up to and past the block terminator
    p += blockLeft
    while (p < b.length && (b(p) & 0xFF) != 0) p += 1 + (b(p) & 0xFF)
    if (p >= b.length) return None // terminator missing
    Some((out, p + 1))
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
    writeLzwLiteral(out, indices)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Literal 9-bit LZW codes (CLEAR every 250 literals keeps the
    * dictionary under the 512 width boundary — the classic "uncompressed
    * GIF" construction), LSB-first, ≤255-byte sub-block framed, min code
    * size byte included.
    */
  private def writeLzwLiteral(
      out: java.io.ByteArrayOutputStream, indices: Array[Byte]): Unit = {
    out.write(8) // LZW min code size
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
  }

  /** One frame of the GIF89a writer: a sub-rect of 8-bit palette indices
    * at (left, top), with its Graphic Control Extension fields. Disposal:
    * 1 = leave, 2 = restore-to-background, 3 = restore-to-previous.
    * `transIdx` ≥ 0 marks that index transparent. `interlaced` stores the
    * rows in the spec's 4-pass order.
    */
  final case class GifFrameData(
      left: Int, top: Int, w: Int, h: Int, indices: Array[Byte],
      delayCs: Int = 0, disposal: Int = 1, transIdx: Int = -1,
      interlaced: Boolean = false)

  /** Spec-valid GIF89a animation writer over an explicit 256-entry RGB
    * palette: a GCE + image descriptor per frame, optional interlace
    * (rows permuted into pass order at write time), sub-rect frames,
    * transparency and disposal — everything the compositing decoder must
    * handle, over the same literal-code LZW as `encodeGif`.
    */
  def encodeGif89(
      screenW: Int, screenH: Int, palette: Array[Byte], bgIndex: Int,
      frames: Seq[GifFrameData]): Array[Byte] = {
    require(screenW > 0 && screenH > 0 && frames.nonEmpty)
    require(palette.length == 768, "palette must be 256 RGB entries")
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(screenW); le16(screenH)
    out.write(0xF7) // GCT present, 8-bit resolution, 256 entries
    out.write(bgIndex)
    out.write(0) // aspect
    out.write(palette, 0, 768)
    for (f <- frames) {
      require(f.w > 0 && f.h > 0 && f.indices.length == f.w * f.h)
      require(f.left + f.w <= screenW && f.top + f.h <= screenH)
      require(f.disposal >= 0 && f.disposal <= 3)
      // Graphic Control Extension
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write((f.disposal << 2) | (if (f.transIdx >= 0) 1 else 0))
      le16(f.delayCs)
      out.write(math.max(f.transIdx, 0))
      out.write(0) // terminator
      // image descriptor
      out.write(0x2C)
      le16(f.left); le16(f.top); le16(f.w); le16(f.h)
      out.write(if (f.interlaced) 0x40 else 0x00)
      val stored =
        if (!f.interlaced) f.indices
        else {
          val m = interlaceRowMap(f.h) // stored row sr holds actual row m(sr)
          val s = new Array[Byte](f.indices.length)
          var sr = 0
          while (sr < f.h) {
            System.arraycopy(f.indices, m(sr) * f.w, s, sr * f.w, f.w)
            sr += 1
          }
          s
        }
      writeLzwLiteral(out, stored)
    }
    out.write(0x3B)
    out.toByteArray
  }
}
