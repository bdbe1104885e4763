package graft.operators

/** LZ4 frame format (the dataset-shard / archive-ecosystem codec:
  * `.jsonl.lz4`, `.tar.lz4`, Kafka/Parquet internals).
  *
  * DECODER: the full public frame spec — magic, FLG/BD descriptor
  * with xxh32 header checksum, optional content size / dict id,
  * LINKED or independent blocks (matches reach across linked-block
  * boundaries), per-block and content xxh32 checksums, skippable
  * frames, concatenated frames. Block bodies through the LZ4 block
  * format (token nibbles, 255-run extensions, 16-bit offsets,
  * overlapping copies). Verified byte-exact against FOREIGN liblz4
  * fixtures (`tools/gen_lz4_fixtures.py` — LZ4F_compressFrame with
  * default LINKED blocks and explicit variants).
  *
  * ENCODER: a conforming frame writer (corpus construction):
  * independent 64 KiB blocks, greedy hash-table matcher honoring the
  * spec's end-of-block rules (last 5 bytes literal, no match starting
  * within 12 of the end), content checksum on. FOREIGN liblz4
  * decompresses its output byte-exact (`tools/verify_lz4_encoder.py`,
  * run per-test by Lz4Spec).
  *
  * Every buffer is bounded by `maxOut` BEFORE allocation-heavy work —
  * the bomb-cap discipline.
  */
object Lz4 {

  private final case class Bail(reason: String)
      extends RuntimeException(null, null, false, false)

  // ---------------------------------------------------------------- xxh32

  private[graft] def xxh32(b: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    val P1 = 0x9E3779B1; val P2 = 0x85EBCA77; val P3 = 0xC2B2AE3D
    val P4 = 0x27D4EB2F; val P5 = 0x165667B1
    @inline def rotl(x: Int, r: Int): Int = (x << r) | (x >>> (32 - r))
    @inline def le32(at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
        ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
    var p = off
    val end = off + len
    var h =
      if (len >= 16) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        val limit = end - 16
        while (p <= limit) {
          v1 = rotl(v1 + le32(p) * P2, 13) * P1
          v2 = rotl(v2 + le32(p + 4) * P2, 13) * P1
          v3 = rotl(v3 + le32(p + 8) * P2, 13) * P1
          v4 = rotl(v4 + le32(p + 12) * P2, 13) * P1
          p += 16
        }
        rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      } else seed + P5
    h += len
    while (p + 4 <= end) {
      h = rotl(h + le32(p) * P3, 17) * P4
      p += 4
    }
    while (p < end) {
      h = rotl(h + (b(p) & 0xff) * P5, 11) * P1
      p += 1
    }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  // --------------------------------------------------------------- decode

  private val FrameMagic = 0x184D2204L

  /** Decode a complete LZ4 input (data frames, skippable frames,
    * concatenation). Left(reason) on anything malformed, any checksum
    * mismatch, or past `maxOut`.
    */
  def decode(b: Array[Byte], maxOut: Int = 1 << 26): Either[String, Array[Byte]] =
    try Right(decodeOrThrow(b, maxOut))
    catch {
      case x: Bail => Left(x.reason)
      case _: ArrayIndexOutOfBoundsException => Left("malformed")
      case _: NegativeArraySizeException => Left("malformed")
    }

  private def decodeOrThrow(b: Array[Byte], maxOut: Int): Array[Byte] = {
    var out = new Array[Byte](math.min(maxOut.toLong, 1 << 16).toInt)
    var op = 0
    def ensure(extra: Long): Unit = {
      if (op + extra > maxOut) throw Bail("output-cap")
      if (op + extra > out.length) {
        var cap = out.length.toLong
        while (cap < op + extra) cap *= 2
        out = java.util.Arrays.copyOf(out, math.min(cap, maxOut.toLong).toInt)
      }
    }
    var ip = 0
    def le32(at: Int): Long = {
      if (at + 4 > b.length) throw Bail("truncated")
      (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
        ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
    }
    var frames = 0
    while (ip < b.length) {
      val magic = le32(ip)
      ip += 4
      if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) {
        val sz = le32(ip)
        ip += 4
        if (sz > b.length.toLong - ip) throw Bail("truncated")
        ip += sz.toInt // skippable frame: ignored
      } else if (magic == FrameMagic) {
        frames += 1
        val frameStart = op
        // descriptor
        val descOff = ip
        if (ip >= b.length) throw Bail("truncated")
        val flg = b(ip) & 0xff; ip += 1
        if ((flg >> 6) != 1) throw Bail("frame-version")
        if ((flg & 2) != 0) throw Bail("reserved-bit")
        val blockIndep = (flg & 0x20) != 0
        val blockChecksum = (flg & 0x10) != 0
        val hasContentSize = (flg & 0x08) != 0
        val contentChecksum = (flg & 0x04) != 0
        val hasDictId = (flg & 0x01) != 0
        if (ip >= b.length) throw Bail("truncated")
        val bd = b(ip) & 0xff; ip += 1
        if ((bd & 0x8F) != 0) throw Bail("reserved-bd")
        val bmax = (bd >> 4) & 7
        if (bmax < 4) throw Bail("block-max-size")
        val blockCap = 1 << (8 + 2 * bmax) // 4→64K … 7→4M
        var contentSize = -1L
        if (hasContentSize) {
          contentSize = le32(ip) | (le32(ip + 4) << 32)
          ip += 8
        }
        if (hasDictId) ip += 4 // id noted; raw window prefix unsupported
        if (ip >= b.length) throw Bail("truncated")
        val hc = b(ip) & 0xff; ip += 1
        val want = (xxh32(b, descOff, ip - 1 - descOff, 0) >>> 8) & 0xff
        if (hc != want) throw Bail("header-checksum")
        if (contentSize > maxOut.toLong - op) throw Bail("output-cap")
        // blocks
        var go = true
        while (go) {
          val bsz = le32(ip)
          ip += 4
          if (bsz == 0) go = false
          else {
            val stored = (bsz & 0x80000000L) != 0
            val len = (bsz & 0x7FFFFFFFL).toInt
            if (len > blockCap) throw Bail("block-oversize")
            if (ip + len > b.length) throw Bail("truncated")
            if (blockChecksum) {
              val bc = le32(ip + len)
              if ((xxh32(b, ip, len, 0) & 0xFFFFFFFFL) != bc)
                throw Bail("block-checksum")
            }
            if (stored) {
              ensure(len)
              System.arraycopy(b, ip, out, op, len)
              op += len
            } else {
              // LZ4 block: window floor is the frame start for linked
              // blocks, the block's own start for independent ones
              val floor = if (blockIndep) op else frameStart
              var p = ip
              val end = ip + len
              var done = false
              while (!done) {
                if (p >= end) throw Bail("block-truncated")
                val token = b(p) & 0xff; p += 1
                var ll = token >> 4
                if (ll == 15) {
                  var x = 255
                  while (x == 255) {
                    if (p >= end) throw Bail("block-truncated")
                    x = b(p) & 0xff; p += 1
                    ll += x
                    if (ll > blockCap + 255) throw Bail("literal-run")
                  }
                }
                if (p + ll > end) throw Bail("block-truncated")
                ensure(ll)
                System.arraycopy(b, p, out, op, ll)
                p += ll; op += ll
                if (p == end) done = true // last sequence: literals only
                else {
                  if (p + 2 > end) throw Bail("block-truncated")
                  val offset = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
                  p += 2
                  if (offset == 0) throw Bail("zero-offset")
                  var ml = (token & 15) + 4
                  if ((token & 15) == 15) {
                    var x = 255
                    while (x == 255) {
                      if (p >= end) throw Bail("block-truncated")
                      x = b(p) & 0xff; p += 1
                      ml += x
                      if (ml > blockCap + 255 + 4) throw Bail("match-run")
                    }
                  }
                  if (offset > op - floor) throw Bail("offset-too-far")
                  ensure(ml)
                  var k = 0
                  val src = op - offset
                  while (k < ml) { out(op + k) = out(src + k); k += 1 }
                  op += ml
                }
              }
            }
            ip += len + (if (blockChecksum) 4 else 0)
          }
        }
        if (contentSize >= 0 && op - frameStart != contentSize)
          throw Bail("content-size-mismatch")
        if (contentChecksum) {
          val cc = le32(ip)
          ip += 4
          if ((xxh32(out, frameStart, op - frameStart, 0) & 0xFFFFFFFFL) != cc)
            throw Bail("content-checksum")
        }
      } else throw Bail("frame-magic")
    }
    if (frames == 0) throw Bail("no-data-frame")
    java.util.Arrays.copyOf(out, op)
  }

  // --------------------------------------------------------------- encode

  private val EncBlock = 1 << 16 // independent 64 KiB blocks (BD code 4)

  /** One LZ4 BLOCK, greedy hash-table matcher; returns null when the
    * block doesn't shrink (caller stores it raw). End-of-block rules
    * honored (matches end ≥ 5 from the end, none start within 12).
    */
  private def encodeBlock(src: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val n = until - from
    val out = new java.io.ByteArrayOutputStream(n)
    val hashLog = 13
    val head = new Array[Int](1 << hashLog)
    java.util.Arrays.fill(head, -1)
    @inline def hash(p: Int): Int = {
      val v = (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8) |
        ((src(p + 2) & 0xff) << 16) | ((src(p + 3) & 0xff) << 24)
      (v * 0x9E3779B1) >>> (32 - hashLog)
    }
    def writeRun(v0: Int): Unit = {
      var v = v0
      while (v >= 255) { out.write(255); v -= 255 }
      out.write(v)
    }
    def emit(litFrom: Int, litLen: Int, offset: Int, matchLen: Int): Unit = {
      val mlTok = if (matchLen < 0) 0 else matchLen - 4
      val token = (math.min(litLen, 15) << 4) |
        (if (matchLen < 0) 0 else math.min(mlTok, 15))
      out.write(token)
      if (litLen >= 15) writeRun(litLen - 15)
      out.write(src, litFrom, litLen)
      if (matchLen >= 0) {
        out.write(offset & 0xff); out.write((offset >> 8) & 0xff)
        if (mlTok >= 15) writeRun(mlTok - 15)
      }
    }
    var anchor = from
    var p = from
    val matchEnd = until - 5 // last 5 bytes stay literal
    val searchEnd = until - 12 // no match may START past here
    while (p < searchEnd) {
      val h = hash(p)
      val cand = head(h)
      head(h) = p
      if (cand >= from && p - cand <= 65535 &&
        src(cand) == src(p) && src(cand + 1) == src(p + 1) &&
        src(cand + 2) == src(p + 2) && src(cand + 3) == src(p + 3)) {
        var l = 4
        while (p + l < matchEnd && src(cand + l) == src(p + l)) l += 1
        emit(anchor, p - anchor, p - cand, l)
        p += l
        anchor = p
      } else p += 1
    }
    emit(anchor, until - anchor, 0, -1) // final literals-only sequence
    val bytes = out.toByteArray
    if (bytes.length < n) bytes else null
  }

  /** A complete LZ4 frame: independent 64 KiB blocks, content size and
    * content checksum present (so truncation and corruption are both
    * detectable), no dictionary.
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    require(data.length <= (1 << 26), "encode input exceeds 64 MiB cap")
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    def le32w(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    le32w(FrameMagic)
    val flg = (1 << 6) | 0x20 | 0x08 | 0x04 // v1, indep, size, checksum
    val bd = 4 << 4 // 64 KiB max block
    bos.write(flg); bos.write(bd)
    le32w(data.length.toLong)
    le32w(data.length.toLong >>> 32)
    val desc = bos.toByteArray
    bos.write((xxh32(desc, 4, desc.length - 4, 0) >>> 8) & 0xff)
    var off = 0
    while (off < data.length) {
      val end = math.min(off + EncBlock, data.length)
      val blk = if (end - off >= 13) encodeBlock(data, off, end) else null
      if (blk == null) {
        le32w((end - off).toLong | 0x80000000L) // stored
        bos.write(data, off, end - off)
      } else {
        le32w(blk.length.toLong)
        bos.write(blk)
      }
      off = end
    }
    le32w(0L) // EndMark
    le32w(xxh32(data, 0, data.length, 0).toLong & 0xFFFFFFFFL)
    bos.toByteArray
  }
}
