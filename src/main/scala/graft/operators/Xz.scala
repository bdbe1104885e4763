package graft.operators

/** XZ container + LZMA2/LZMA decoder (the remaining compression
  * container an LLM-corpus pipeline meets: kernel/source tarballs,
  * dump mirrors, `.tar.xz` / `.jsonl.xz` shards — alongside the
  * repo's gzip, brotli, zstd(+dict), bzip2, and LZ4 doors).
  *
  * DECODER only (xz is an archival INPUT shape here): stream
  * header/footer with CRC32-protected flags, block headers with
  * filter lists (LZMA2 only — delta/BCJ filters are typed errors),
  * LZMA2 chunk layer (uncompressed chunks, state/props/dict reset
  * modes), the full LZMA core (range decoder, 12-state machine,
  * literal/match/rep contexts, position slots + aligned distance
  * bits), block checks in all four standard kinds (None, CRC32,
  * CRC64, SHA-256), index + footer verification, and CONCATENATED
  * streams with padding. Verified byte-exact against FOREIGN liblzma
  * fixtures (`tools/gen_xz_fixtures.py` — presets 0/6/9e, every check
  * kind, multi-block, multistream).
  *
  * Allocation discipline: output bounded by `maxOut` BEFORE any
  * chunk decodes; the LZMA window is the output buffer itself.
  */
object Xz {

  private final case class Bail(reason: String)
      extends RuntimeException(null, null, false, false)

  // ---------------------------------------------------------- checksums

  private val Crc32Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) {
      c = if ((c & 1) != 0) (c >>> 1) ^ 0xEDB88320 else c >>> 1
      k += 1
    }
    c
  }

  private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xFFFFFFFF
    var i = 0
    while (i < len) {
      c = (c >>> 8) ^ Crc32Table((c ^ b(off + i)) & 0xff)
      i += 1
    }
    c ^ 0xFFFFFFFF
  }

  /** CRC-64/XZ (ECMA-182 reflected, init/xorout ~0). */
  private val Crc64Table: Array[Long] = Array.tabulate(256) { i =>
    var c = i.toLong
    var k = 0
    while (k < 8) {
      c = if ((c & 1L) != 0) (c >>> 1) ^ 0xC96C5795D7870F42L else c >>> 1
      k += 1
    }
    c
  }

  private def crc64(b: Array[Byte], off: Int, len: Int): Long = {
    var c = -1L
    var i = 0
    while (i < len) {
      c = (c >>> 8) ^ Crc64Table(((c ^ b(off + i)) & 0xff).toInt)
      i += 1
    }
    ~c
  }

  // -------------------------------------------------------------- LZMA

  /** LZMA core over one LZMA2 chunk: decodes exactly `unpackLen`
    * bytes into `out` at `outPos`, with the window reaching back into
    * everything already in `out` down to `dictStart`. Probability
    * state lives in `LzmaState` so chunks without a state reset
    * continue seamlessly.
    */
  private final class LzmaState(var lc: Int, var lp: Int, var pb: Int) {
    var state = 0
    val reps = Array(0, 0, 0, 0)
    var lit: Array[Short] = _
    val isMatch = new Array[Short](12 << 4)
    val isRep = new Array[Short](12)
    val isRepG0 = new Array[Short](12)
    val isRepG1 = new Array[Short](12)
    val isRepG2 = new Array[Short](12)
    val isRep0Long = new Array[Short](12 << 4)
    val posSlot = Array.fill(4)(new Array[Short](64))
    val specPos = new Array[Short](115)
    val align = new Array[Short](16)
    // length coders: choice, choice2, low[16][8], mid[16][8], high[256]
    val lenChoice = new Array[Short](2)
    val lenLow = Array.fill(16)(new Array[Short](8))
    val lenMid = Array.fill(16)(new Array[Short](8))
    val lenHigh = new Array[Short](256)
    val repChoice = new Array[Short](2)
    val repLow = Array.fill(16)(new Array[Short](8))
    val repMid = Array.fill(16)(new Array[Short](8))
    val repHigh = new Array[Short](256)
    def resetProbs(): Unit = {
      def f(a: Array[Short]): Unit = java.util.Arrays.fill(a, 1024.toShort)
      lit = new Array[Short](0x300 << (lc + lp))
      f(lit); f(isMatch); f(isRep); f(isRepG0); f(isRepG1); f(isRepG2)
      f(isRep0Long); posSlot.foreach(f); f(specPos); f(align)
      f(lenChoice); lenLow.foreach(f); lenMid.foreach(f); f(lenHigh)
      f(repChoice); repLow.foreach(f); repMid.foreach(f); f(repHigh)
      state = 0
      reps(0) = 0; reps(1) = 0; reps(2) = 0; reps(3) = 0
    }
    resetProbs()
  }

  private final class RangeDec(b: Array[Byte], var pos: Int, val end: Int) {
    var range: Int = -1 // 0xFFFFFFFF
    var code: Int = 0
    // init: one ignored byte then 4 BE code bytes
    if (pos + 5 > end) throw Bail("truncated")
    if (b(pos) != 0) throw Bail("lzma-rc-init")
    pos += 1
    var i0 = 0
    while (i0 < 4) { code = (code << 8) | (b(pos) & 0xff); pos += 1; i0 += 1 }
    @inline private def normalize(): Unit =
      if ((range & 0xFF000000) == 0) {
        if (pos >= end) throw Bail("truncated")
        range <<= 8
        code = (code << 8) | (b(pos) & 0xff)
        pos += 1
      }
    def decodeBit(probs: Array[Short], idx: Int): Int = {
      val p = probs(idx) & 0xffff
      // unsigned compare via Long: range/code are full 32-bit values
      val bound = ((range >>> 11).toLong * p).toInt
      val r =
        if ((code.toLong & 0xFFFFFFFFL) < (bound.toLong & 0xFFFFFFFFL)) {
          range = bound
          probs(idx) = (p + ((2048 - p) >>> 5)).toShort
          0
        } else {
          code -= bound
          range -= bound
          probs(idx) = (p - (p >>> 5)).toShort
          1
        }
      normalize()
      r
    }
    def decodeDirect(n: Int): Int = {
      var res = 0
      var i = 0
      while (i < n) {
        range = range >>> 1
        code -= range
        val t = 0 - (code >>> 31) // 0 if code >= 0 unsigned-wise…
        code += range & t
        if (code == range) throw Bail("lzma-rc-corrupt")
        res = (res << 1) + t + 1
        normalize()
        i += 1
      }
      res
    }
    def bittree(probs: Array[Short], bits: Int): Int = {
      var m = 1
      var i = 0
      while (i < bits) { m = (m << 1) | decodeBit(probs, m); i += 1 }
      m - (1 << bits)
    }
    def bittreeRev(probs: Array[Short], off: Int, bits: Int): Int = {
      var m = 1
      var sym = 0
      var i = 0
      while (i < bits) {
        val bit = decodeBit(probs, off + m)
        m = (m << 1) | bit
        sym |= bit << i
        i += 1
      }
      sym
    }
    def finishedExactly: Boolean = code == 0
  }

  private def decodeLen(
      rc: RangeDec, choice: Array[Short], low: Array[Array[Short]],
      mid: Array[Array[Short]], high: Array[Short], posState: Int): Int =
    if (rc.decodeBit(choice, 0) == 0) 2 + rc.bittree(low(posState), 3)
    else if (rc.decodeBit(choice, 1) == 0) 10 + rc.bittree(mid(posState), 3)
    else 18 + rc.bittree(high, 8)

  /** One LZMA2 LZMA chunk: `packLen` input bytes decode to exactly
    * `unpackLen` output bytes. Returns nothing; throws Bail on any
    * corruption.
    */
  private def lzmaChunk(
      b: Array[Byte], inPos: Int, packLen: Int, out: Array[Byte],
      outPos0: Int, unpackLen: Int, dictStart: Int, st: LzmaState): Unit = {
    val rc = new RangeDec(b, inPos, inPos + packLen)
    var outPos = outPos0
    val outEnd = outPos0 + unpackLen
    val pbMask = (1 << st.pb) - 1
    val lpMask = (1 << st.lp) - 1
    while (outPos < outEnd) {
      // positions in the pos-state/literal contexts are DICTIONARY
      // positions (reset with the dict, continuous across chunks)
      val dictPos = outPos - dictStart
      val posState = dictPos & pbMask
      if (rc.decodeBit(st.isMatch, (st.state << 4) | posState) == 0) {
        // literal
        val prev = if (outPos > dictStart) out(outPos - 1) & 0xff else 0
        val litState =
          (((dictPos & lpMask) << st.lc) + (prev >>> (8 - st.lc))) * 0x300
        var sym = 1
        if (st.state >= 7) {
          // matched literal: fold in the byte at rep0 distance
          var matchByte =
            if (outPos - st.reps(0) - 1 >= dictStart)
              out(outPos - st.reps(0) - 1) & 0xff
            else throw Bail("lzma-window")
          var break = false
          while (!break && sym < 0x100) {
            matchByte <<= 1
            val matchBit = matchByte & 0x100
            val bit = rc.decodeBit(st.lit,
              litState + 0x100 + matchBit + sym)
            sym = (sym << 1) | bit
            if (matchBit != (bit << 8)) break = true
          }
        }
        while (sym < 0x100)
          sym = (sym << 1) | rc.decodeBit(st.lit, litState + sym)
        out(outPos) = sym.toByte
        outPos += 1
        st.state = if (st.state < 4) 0 else if (st.state < 10) st.state - 3
          else st.state - 6
      } else {
        var len = 0
        if (rc.decodeBit(st.isRep, st.state) == 0) {
          // new match: length then distance
          len = decodeLen(rc, st.lenChoice, st.lenLow, st.lenMid,
            st.lenHigh, posState)
          val lenToPos = math.min(len - 2, 3)
          val slot = rc.bittree(st.posSlot(lenToPos), 6)
          var dist = slot
          if (slot >= 4) {
            val direct = (slot >> 1) - 1
            dist = (2 | (slot & 1)) << direct
            if (slot < 14)
              dist += rc.bittreeRev(st.specPos, dist - slot - 1, direct)
            else {
              dist += rc.decodeDirect(direct - 4) << 4
              dist += rc.bittreeRev(st.align, 0, 4)
            }
          }
          if (dist == -1)
            // 0xFFFFFFFF end marker: LZMA2 chunk sizes are exact, so
            // markers never appear inside chunks
            throw Bail("lzma2-end-marker")
          st.reps(3) = st.reps(2); st.reps(2) = st.reps(1)
          st.reps(1) = st.reps(0); st.reps(0) = dist
          st.state = if (st.state < 7) 7 else 10
        } else {
          // rep match
          if (rc.decodeBit(st.isRepG0, st.state) == 0) {
            if (rc.decodeBit(st.isRep0Long, (st.state << 4) | posState) == 0) {
              // short rep: one byte at rep0
              st.state = if (st.state < 7) 9 else 11
              if (outPos - st.reps(0) - 1 < dictStart)
                throw Bail("lzma-window")
              out(outPos) = out(outPos - st.reps(0) - 1)
              outPos += 1
              len = -1 // handled
            }
          } else {
            val dist =
              if (rc.decodeBit(st.isRepG1, st.state) == 0) st.reps(1)
              else if (rc.decodeBit(st.isRepG2, st.state) == 0) {
                val d = st.reps(2)
                st.reps(2) = st.reps(1)
                d
              } else {
                val d = st.reps(3)
                st.reps(3) = st.reps(2); st.reps(2) = st.reps(1)
                d
              }
            st.reps(1) = st.reps(0); st.reps(0) = dist
          }
          if (len == 0) {
            len = decodeLen(rc, st.repChoice, st.repLow, st.repMid,
              st.repHigh, posState)
            st.state = if (st.state < 7) 8 else 11
          }
        }
        if (len > 0) {
          if (outPos + len > outEnd) throw Bail("lzma-overrun")
          val dist = st.reps(0)
          if (outPos - dist - 1 < dictStart) throw Bail("lzma-window")
          var k = 0
          while (k < len) {
            out(outPos + k) = out(outPos + k - dist - 1)
            k += 1
          }
          outPos += len
        }
      }
    }
    // chunk sizes are exact in LZMA2: the range coder must land on
    // precisely packLen consumed bytes with a clean flush
    if (rc.pos != inPos + packLen || !rc.finishedExactly)
      throw Bail("lzma-chunk-size")
  }

  // -------------------------------------------------------------- LZMA2

  /** LZMA2 chunk layer: control bytes, reset modes, uncompressed
    * chunks. Decodes into a growing buffer; returns (bytes, next input
    * position).
    */
  private def lzma2(
      b: Array[Byte], from: Int, end: Int,
      maxOut: Int): (Array[Byte], Int) = {
    var out = new Array[Byte](1 << 12)
    var op = 0
    def ensure(extra: Int): Unit = {
      if (op.toLong + extra > maxOut) throw Bail("output-cap")
      if (op + extra > out.length) {
        var cap = out.length.toLong
        while (cap < op + extra) cap *= 2
        out = java.util.Arrays.copyOf(out, math.min(cap, maxOut.toLong).toInt)
      }
    }
    var ip = from
    var st: LzmaState = null
    var needReset = true // the first LZMA chunk must carry props
    var dictStart = 0
    var go = true
    while (go) {
      if (ip >= end) throw Bail("truncated")
      val ctl = b(ip) & 0xff
      ip += 1
      if (ctl == 0) go = false
      else if (ctl <= 2) {
        // uncompressed chunk; 0x01 also resets the dictionary
        if (ip + 2 > end) throw Bail("truncated")
        val size = (((b(ip) & 0xff) << 8) | (b(ip + 1) & 0xff)) + 1
        ip += 2
        if (ip + size > end) throw Bail("truncated")
        if (ctl == 1) dictStart = op
        ensure(size)
        System.arraycopy(b, ip, out, op, size)
        op += size
        ip += size
        // spec: the next LZMA chunk after an uncompressed chunk must
        // carry a state reset (props may be retained)
        needReset = true
      } else if (ctl >= 0x80) {
        val unpack = (((ctl & 0x1F) << 16) |
          ((b(ip) & 0xff) << 8) | (b(ip + 1) & 0xff)) + 1
        val pack = (((b(ip + 2) & 0xff) << 8) | (b(ip + 3) & 0xff)) + 1
        ip += 4
        val reset = (ctl >> 5) & 3
        if (needReset && reset == 0) throw Bail("lzma2-missing-reset")
        if (reset >= 2) {
          if (ip >= end) throw Bail("truncated")
          val props = b(ip) & 0xff
          ip += 1
          if (props >= 225) throw Bail("lzma2-props")
          val lc = props % 9
          val lp = (props / 9) % 5
          val pb = props / 45
          if (lc + lp > 4) throw Bail("lzma2-props")
          st = new LzmaState(lc, lp, pb)
        } else if (st == null) throw Bail("lzma2-no-props")
        else if (reset == 1) st.resetProbs()
        if (reset == 3) dictStart = op
        needReset = false
        if (ip + pack > end) throw Bail("truncated")
        ensure(unpack)
        lzmaChunk(b, ip, pack, out, op, unpack, dictStart, st)
        op += unpack
        ip += pack
      } else throw Bail("lzma2-control")
    }
    (java.util.Arrays.copyOf(out, op), ip)
  }

  // ----------------------------------------------------------- container

  private def varint(b: Array[Byte], at: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    var p = at
    while (i < 9) {
      if (p >= b.length) throw Bail("truncated")
      val x = b(p) & 0xff
      v |= (x & 0x7FL) << (7 * i)
      p += 1
      if ((x & 0x80) == 0) {
        if (x == 0 && i > 0) throw Bail("varint-pad")
        return (v, p)
      }
      i += 1
    }
    throw Bail("varint-overflow")
  }

  private val Magic = Array[Int](0xFD, '7', 'z', 'X', 'Z', 0x00)

  /** Decode a complete `.xz` input (concatenated streams + stream
    * padding). Left(reason) on anything malformed, any CRC/check
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
    val outAll = new java.io.ByteArrayOutputStream()
    var ip = 0
    var streams = 0
    while (ip < b.length) {
      // stream padding between streams: 4-byte-aligned zero runs
      if (b(ip) == 0) {
        val start = ip
        while (ip < b.length && b(ip) == 0) ip += 1
        if ((ip - start) % 4 != 0) throw Bail("stream-padding")
        if (ip >= b.length) return { // trailing padding: done
          if (streams == 0) throw Bail("no-stream")
          outAll.toByteArray
        }
      }
      if (ip + 12 > b.length) throw Bail("truncated")
      var i = 0
      while (i < 6) {
        if ((b(ip + i) & 0xff) != Magic(i)) throw Bail("stream-magic")
        i += 1
      }
      if (b(ip + 6) != 0) throw Bail("stream-flags")
      val checkType = b(ip + 7) & 0xff
      if (checkType != 0 && checkType != 1 && checkType != 4 && checkType != 10)
        throw Bail("unsupported-check")
      val hdrCrc = le32(b, ip + 8)
      if ((crc32(b, ip + 6, 2).toLong & 0xFFFFFFFFL) != hdrCrc)
        throw Bail("stream-header-crc")
      ip += 12
      // blocks until the index indicator (0x00)
      val records = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var inBlocks = true
      while (inBlocks) {
        if (ip >= b.length) throw Bail("truncated")
        val first = b(ip) & 0xff
        if (first == 0) { inBlocks = false }
        else {
          val blockStart = ip
          val hdrSize = (first + 1) * 4
          if (ip + hdrSize > b.length) throw Bail("truncated")
          val want = le32(b, ip + hdrSize - 4)
          if ((crc32(b, ip, hdrSize - 4).toLong & 0xFFFFFFFFL) != want)
            throw Bail("block-header-crc")
          val flags = b(ip + 1) & 0xff
          if ((flags & 0x3C) != 0) throw Bail("block-flags-reserved")
          val nFilters = (flags & 3) + 1
          var p = ip + 2
          var compSize = -1L
          var uncompSize = -1L
          if ((flags & 0x40) != 0) { val (v, np) = varint(b, p); compSize = v; p = np }
          if ((flags & 0x80) != 0) { val (v, np) = varint(b, p); uncompSize = v; p = np }
          // filter chain, encode order (LZMA2 must be LAST; delta and
          // BCJ x86 are the supported pre-filters — round 20; anything
          // else stays a typed error)
          var f = 0
          val preFilters = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Array[Byte])]
          while (f < nFilters) {
            val (fid, np) = varint(b, p)
            val (propLen, np2) = varint(b, np)
            if (np2 + propLen > b.length) throw Bail("truncated")
            val last = f == nFilters - 1
            fid match {
              case 0x21 =>
                if (!last) throw Bail("lzma2-not-last")
                if (propLen != 1) throw Bail("filter-props")
                // LZMA2 dict-size property: size hint only — the
                // window here is the whole decoded block
              case 0x03 => // delta: dist-1 in one prop byte
                if (last) throw Bail("delta-as-last-filter")
                if (propLen != 1) throw Bail("filter-props")
                preFilters += ((fid,
                  Array(b(np2.toInt))))
              case 0x04 => // BCJ x86: no props, or 4-byte start offset
                if (last) throw Bail("bcj-as-last-filter")
                if (propLen != 0 && propLen != 4) throw Bail("filter-props")
                preFilters += ((fid,
                  java.util.Arrays.copyOfRange(b, np2.toInt,
                    (np2 + propLen).toInt)))
              case _ => throw Bail("unsupported-filter")
            }
            p = np2 + propLen.toInt
            f += 1
          }
          // remaining header bytes to the CRC must be zero padding
          while (p < blockStart + hdrSize - 4) {
            if (b(p) != 0) throw Bail("block-header-pad")
            p += 1
          }
          ip = blockStart + hdrSize
          val (lzOut, next) = lzma2(b, ip, b.length,
            maxOut - outAll.size())
          // decode-side filter application is REVERSE encode order;
          // both transforms are 1:1 in-place over the block output
          var data = lzOut
          preFilters.reverseIterator.foreach {
            case (0x03, props) =>
              data = deltaDecode(data, (props(0) & 0xff) + 1)
            case (0x04, props) =>
              val startOff =
                if (props.length == 4) le32(props, 0) else 0L
              data = bcjX86(data, startOff, encoding = false)
            case _ => throw Bail("unsupported-filter")
          }
          if (uncompSize >= 0 && data.length.toLong != uncompSize)
            throw Bail("uncompressed-size-mismatch")
          val rawCompressed = next - ip
          if (compSize >= 0 && rawCompressed.toLong != compSize)
            throw Bail("compressed-size-mismatch")
          ip = next
          // block padding to 4 bytes (covers header+data)
          val unpadded0 = hdrSize.toLong + rawCompressed
          while (((ip - blockStart) & 3) != 0) {
            if (ip >= b.length || b(ip) != 0) throw Bail("block-pad")
            ip += 1
          }
          // check field
          val checkLen = checkType match {
            case 0 => 0; case 1 => 4; case 4 => 8; case _ => 32
          }
          if (ip + checkLen > b.length) throw Bail("truncated")
          checkType match {
            case 1 =>
              if ((crc32(data, 0, data.length).toLong & 0xFFFFFFFFL) !=
                le32(b, ip)) throw Bail("block-check")
            case 4 =>
              if (crc64(data, 0, data.length) != le64(b, ip))
                throw Bail("block-check")
            case 10 =>
              val md = java.security.MessageDigest.getInstance("SHA-256")
              val got = md.digest(data)
              var k = 0
              while (k < 32) {
                if (got(k) != b(ip + k)) throw Bail("block-check")
                k += 1
              }
            case _ => ()
          }
          ip += checkLen
          records += ((unpadded0 + checkLen, data.length.toLong))
          outAll.write(data)
        }
      }
      // index: indicator already seen at b(ip) == 0
      val idxStart = ip
      ip += 1
      val (cnt, p1) = varint(b, ip)
      if (cnt != records.length) throw Bail("index-count")
      ip = p1
      var r = 0
      while (r < records.length) {
        val (u, p2) = varint(b, ip)
        val (s, p3) = varint(b, p2)
        if (u != records(r)._1 || s != records(r)._2)
          throw Bail("index-record")
        ip = p3
        r += 1
      }
      while (((ip - idxStart) & 3) != 0) {
        if (b(ip) != 0) throw Bail("index-pad")
        ip += 1
      }
      val idxCrc = le32(b, ip)
      if ((crc32(b, idxStart, ip - idxStart).toLong & 0xFFFFFFFFL) != idxCrc)
        throw Bail("index-crc")
      ip += 4
      // footer: crc32(backward size + flags), backward size, flags, YZ
      if (ip + 12 > b.length) throw Bail("truncated")
      val ftCrc = le32(b, ip)
      if ((crc32(b, ip + 4, 6).toLong & 0xFFFFFFFFL) != ftCrc)
        throw Bail("footer-crc")
      // ip already sits past the index CRC: backward size = the whole
      // index field including its CRC32
      val backward = (le32(b, ip + 4) + 1) * 4
      if (backward != (ip - idxStart)) throw Bail("backward-size")
      if (b(ip + 8) != 0 || (b(ip + 9) & 0xff) != checkType)
        throw Bail("footer-flags")
      if (b(ip + 10) != 'Y' || b(ip + 11) != 'Z') throw Bail("footer-magic")
      ip += 12
      streams += 1
    }
    if (streams == 0) throw Bail("no-stream")
    outAll.toByteArray
  }

  private def le32(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  private def le64(b: Array[Byte], at: Int): Long =
    le32(b, at) | (le32(b, at + 4) << 32)

  // --------------------------------------------------------------- encode

  /** Delta filter (xz filter id 0x03), decode direction: each byte
    * adds the DECODED byte `dist` positions back (history before the
    * block start is zero). In place, 1:1.
    */
  private[graft] def deltaDecode(data: Array[Byte], dist: Int): Array[Byte] = {
    var i = dist
    while (i < data.length) {
      data(i) = (data(i) + data(i - dist)).toByte
      i += 1
    }
    data
  }

  /** Delta filter, encode direction: each byte minus the RAW byte
    * `dist` back — iterate backward so the subtrahend is still raw.
    */
  private[graft] def deltaEncode(data: Array[Byte], dist: Int): Array[Byte] = {
    var i = data.length - 1
    while (i >= dist) {
      data(i) = (data(i) - data(i - dist)).toByte
      i -= 1
    }
    data
  }

  /** BCJ x86 filter (xz filter id 0x04): converts the 32-bit relative
    * displacement of near CALL/JMP opcodes (0xE8/0xE9) to absolute
    * (encode) or back (decode) so repeated call targets become
    * repeated bytes for the compressor. This is the branch-converter
    * published with the LZMA SDK (Bra86 `x86_Convert`, public domain)
    * and specified by xz-file-format §5.3.2: a displacement is only
    * converted when its most-significant byte is 0x00 or 0xFF (the
    * "allowed status"), with a 3-bit sliding `mask` of recently seen
    * E8/E9 positions deciding whether a candidate inside the previous
    * instruction's displacement window is re-checked against the
    * masked byte or skipped, and a post-conversion fixup XORs the
    * below-MSB bits when the converted displacement's masked byte
    * still looks like a boundary byte. One call per block (`ip0` is
    * the filter's start-offset property, default 0); state never
    * crosses blocks because each xz block filters independently.
    * In place, 1:1. Foreign-pinned byte-exact against liblzma
    * fixtures in XzSpec (decode) and per-test via
    * `tools/verify_xz_encoder.py` (encode).
    */
  private[graft] def bcjX86(
      data: Array[Byte], ip0: Long, encoding: Boolean): Array[Byte] = {
    def msb(b: Int): Boolean = b == 0 || b == 0xff
    val size = data.length
    if (size < 5) return data
    val lim = size - 4
    val ip = (ip0 + 5) & 0xFFFFFFFFL
    var pos = 0
    var mask = 0
    var done = false
    while (!done) {
      var pp = pos
      while (pp < lim && (data(pp) & 0xFE) != 0xE8) pp += 1
      val gap = pp - pos
      pos = pp
      if (pp >= lim) done = true
      else {
        var continueScan = false
        if (gap > 2) mask = 0
        else {
          mask >>= gap
          if (mask != 0 && (mask > 4 || mask == 3 ||
              msb(data(pos + (mask >> 1) + 1) & 0xff))) {
            mask = (mask >> 1) | 4
            pos += 1
            continueScan = true
          }
        }
        if (!continueScan) {
          if (msb(data(pos + 4) & 0xff)) {
            var v = ((data(pos + 4) & 0xffL) << 24) |
              ((data(pos + 3) & 0xffL) << 16) |
              ((data(pos + 2) & 0xffL) << 8) |
              (data(pos + 1) & 0xffL)
            val cur = (ip + pos) & 0xFFFFFFFFL
            pos += 5
            v = (if (encoding) v + cur else v - cur) & 0xFFFFFFFFL
            if (mask != 0) {
              val sh = (mask & 6) << 2
              if (msb(((v >> sh) & 0xff).toInt)) {
                v ^= (0x100L << sh) - 1
                v = (if (encoding) v + cur else v - cur) & 0xFFFFFFFFL
              }
              mask = 0
            }
            data(pos - 4) = (v & 0xff).toByte
            data(pos - 3) = ((v >> 8) & 0xff).toByte
            data(pos - 2) = ((v >> 16) & 0xff).toByte
            data(pos - 1) = (if (((v >> 24) & 1) != 0) 0xff else 0x00).toByte
          } else {
            mask = (mask >> 1) | 4
            pos += 1
          }
        }
      }
    }
    data
  }

  // ------------------------------------------------------ LZMA encode
  // Round-20 stretch item: the write path grows a REAL LZMA encoder —
  // the decoder's probability model inverted. Every context (isMatch/
  // isRep/length/posSlot/specPos/align/literal incl. matched-literal
  // mode) reuses `LzmaState`, so the encoder cannot drift from the
  // decoder's model: they share the arrays and the update rule.
  // Foreign-verified per-test by liblzma (`tools/verify_xz_encoder
  // .py`) and round-tripped by this file's own decoder.

  /** Range ENCODER — the arithmetic-coding inverse of `RangeDec`:
    * 32-bit range, 33-bit low with carry propagation through a
    * cache/cacheSize pair (the LZMA-SDK construction), normalizing on
    * the same `top byte zero` condition the decoder uses.
    */
  private final class RangeEnc(bos: java.io.ByteArrayOutputStream) {
    private var low = 0L // 33 bits live: bit 32 is the pending carry
    private var range = -1 // 0xFFFFFFFF
    private var cache = 0
    private var cacheSize = 1L
    private def shiftLow(): Unit = {
      if ((low & 0xFFFFFFFFL) < 0xFF000000L || (low >>> 32) != 0) {
        // carry resolved: flush the cached byte + any 0xFF run,
        // propagating the carry bit into each
        val carry = (low >>> 32).toInt
        var temp = cache
        var n = cacheSize
        while (n != 0) {
          bos.write((temp + carry) & 0xff)
          temp = 0xFF
          n -= 1
        }
        cacheSize = 0
        cache = ((low >>> 24) & 0xff).toInt
      }
      // else: byte is 0xFF with carry still unknown — extend the run
      cacheSize += 1
      low = (low << 8) & 0xFFFFFFFFL
    }
    def encodeBit(probs: Array[Short], idx: Int, bit: Int): Unit = {
      val p = probs(idx) & 0xffff
      val bound = ((range >>> 11).toLong * p).toInt
      if (bit == 0) {
        range = bound
        probs(idx) = (p + ((2048 - p) >>> 5)).toShort
      } else {
        low += bound.toLong & 0xFFFFFFFFL
        range -= bound
        probs(idx) = (p - (p >>> 5)).toShort
      }
      // SINGLE conditional shift — the decoder normalizes once per
      // bit, and encoder/decoder must hold identical range values
      if ((range & 0xFF000000) == 0) { range <<= 8; shiftLow() }
    }
    def encodeDirect(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        range = range >>> 1
        if (((v >>> i) & 1) == 1) low += range.toLong & 0xFFFFFFFFL
        if ((range & 0xFF000000) == 0) { range <<= 8; shiftLow() }
        i -= 1
      }
    }
    def flush(): Unit = { var i = 0; while (i < 5) { shiftLow(); i += 1 } }
  }

  private def bittreeEnc(
      rc: RangeEnc, probs: Array[Short], bits: Int, sym: Int): Unit = {
    var m = 1
    var i = bits - 1
    while (i >= 0) {
      val bit = (sym >>> i) & 1
      rc.encodeBit(probs, m, bit)
      m = (m << 1) | bit
      i -= 1
    }
  }

  private def bittreeRevEnc(
      rc: RangeEnc, probs: Array[Short], off: Int, bits: Int,
      sym: Int): Unit = {
    var m = 1
    var i = 0
    while (i < bits) {
      val bit = (sym >>> i) & 1
      rc.encodeBit(probs, off + m, bit)
      m = (m << 1) | bit
      i += 1
    }
  }

  private def encodeLen(
      rc: RangeEnc, choice: Array[Short], low: Array[Array[Short]],
      mid: Array[Array[Short]], high: Array[Short], posState: Int,
      len: Int): Unit =
    if (len <= 9) {
      rc.encodeBit(choice, 0, 0)
      bittreeEnc(rc, low(posState), 3, len - 2)
    } else if (len <= 17) {
      rc.encodeBit(choice, 0, 1)
      rc.encodeBit(choice, 1, 0)
      bittreeEnc(rc, mid(posState), 3, len - 10)
    } else {
      rc.encodeBit(choice, 0, 1)
      rc.encodeBit(choice, 1, 1)
      bittreeEnc(rc, high, 8, len - 18)
    }

  /** Encode one LZMA chunk: `data[from, until)` with the match window
    * reaching back to `data[0]` (LZMA2 dict continuity — the chunk
    * carries a state reset, never a dict reset). Greedy hash-chain
    * parse with rep0 reuse: literals, normal matches, and rep0
    * matches (the decoder's short-rep and rep0-long paths).
    */
  private def encodeLzmaChunk(
      data: Array[Byte], from: Int, until: Int, st: LzmaState,
      head: Array[Int], prev: Array[Int],
      bos: java.io.ByteArrayOutputStream): Unit = {
    val rc = new RangeEnc(bos)
    val pbMask = (1 << st.pb) - 1
    val lpMask = (1 << st.lp) - 1
    val MaxLen = 273
    val Depth = 48
    val hashShift = 32 - (31 - java.lang.Integer
      .numberOfLeadingZeros(head.length)) // table length is a power of 2
    def hash4(p: Int): Int =
      (((data(p) & 0xff) | ((data(p + 1) & 0xff) << 8) |
        ((data(p + 2) & 0xff) << 16) | ((data(p + 3) & 0xff) << 24)) *
        0x9E3779B1) >>> hashShift
    def matchLen(a: Int, b0: Int, cap: Int): Int = {
      var l = 0
      while (l < cap && data(a + l) == data(b0 + l)) l += 1
      l
    }
    var pos = from
    while (pos < until) {
      val dictPos = pos // dictStart is 0 for the whole stream
      val posState = dictPos & pbMask
      val capLen = math.min(MaxLen, until - pos)
      // candidate: rep0 match (cheap to encode, no distance bits)
      var repLen = 0
      if (st.reps(0) < pos && capLen >= 2) {
        val src = pos - st.reps(0) - 1
        if (src >= 0) repLen = matchLen(src, pos, capLen)
      }
      // candidate: best hash-chain match. Distances are capped at the
      // 1 MiB dict size the stream header DECLARES (prop byte 16 in
      // encodeXz): without the cap an input past 1 MiB could emit a
      // farther match that conformant decoders (liblzma) reject as
      // LZMA_DATA_ERROR while our prop-as-hint decoder round-trips it
      // (r20 ADVICE). Chains walk most-recent-first, so the first
      // over-distance candidate ends the walk; rep distances inherit
      // the cap because every rep was once a capped new match.
      var bestLen = 0
      var bestDist = 0
      if (capLen >= 4) {
        var cand = head(hash4(pos))
        var d = 0
        while (cand >= 0 && d < Depth && pos - cand <= (1 << 20)) {
          val l = matchLen(cand, pos, capLen)
          if (l > bestLen ||
            (l == bestLen && pos - cand - 1 < bestDist)) {
            bestLen = l; bestDist = pos - cand - 1
          }
          cand = prev(cand)
          d += 1
        }
      }
      // selection: prefer rep0 when close in length (it costs no
      // distance bits); require new matches to clear a dist-scaled bar
      val useRep = (repLen >= 2 && (repLen + 1 >= bestLen || repLen >= MaxLen)) ||
        (repLen == 1 && bestLen < 2) // short rep beats a literal
      val useNew = !useRep && bestLen >= 4 ||
        (!useRep && bestLen == 3 && bestDist < (1 << 15)) ||
        (!useRep && bestLen == 2 && bestDist < 512)
      if (useRep) {
        rc.encodeBit(st.isMatch, (st.state << 4) | posState, 1)
        rc.encodeBit(st.isRep, st.state, 1)
        rc.encodeBit(st.isRepG0, st.state, 0)
        if (repLen == 1) {
          // short rep
          rc.encodeBit(st.isRep0Long, (st.state << 4) | posState, 0)
          st.state = if (st.state < 7) 9 else 11
        } else {
          rc.encodeBit(st.isRep0Long, (st.state << 4) | posState, 1)
          encodeLen(rc, st.repChoice, st.repLow, st.repMid, st.repHigh,
            posState, repLen)
          st.state = if (st.state < 7) 8 else 11
        }
        var k = pos
        val stop = pos + math.max(repLen, 1)
        while (k < stop) {
          if (k + 4 <= data.length) {
            val h = hash4(k); prev(k) = head(h); head(h) = k
          }
          k += 1
        }
        pos = stop
      } else if (useNew) {
        rc.encodeBit(st.isMatch, (st.state << 4) | posState, 1)
        rc.encodeBit(st.isRep, st.state, 0)
        encodeLen(rc, st.lenChoice, st.lenLow, st.lenMid, st.lenHigh,
          posState, bestLen)
        val dval = bestDist
        val slot =
          if (dval < 4) dval
          else {
            val nb = 32 - java.lang.Integer.numberOfLeadingZeros(dval)
            ((nb - 1) << 1) | ((dval >>> (nb - 2)) & 1)
          }
        bittreeEnc(rc, st.posSlot(math.min(bestLen - 2, 3)), 6, slot)
        if (slot >= 4) {
          val direct = (slot >> 1) - 1
          val base = (2 | (slot & 1)) << direct
          val rem = dval - base
          if (slot < 14)
            bittreeRevEnc(rc, st.specPos, base - slot - 1, direct, rem)
          else {
            rc.encodeDirect(rem >>> 4, direct - 4)
            bittreeRevEnc(rc, st.align, 0, 4, rem & 15)
          }
        }
        st.reps(3) = st.reps(2); st.reps(2) = st.reps(1)
        st.reps(1) = st.reps(0); st.reps(0) = dval
        st.state = if (st.state < 7) 7 else 10
        var k = pos
        while (k < pos + bestLen) {
          if (k + 4 <= data.length) {
            val h = hash4(k); prev(k) = head(h); head(h) = k
          }
          k += 1
        }
        pos += bestLen
      } else {
        // literal
        rc.encodeBit(st.isMatch, (st.state << 4) | posState, 0)
        val prevB = if (pos > 0) data(pos - 1) & 0xff else 0
        val litState =
          (((dictPos & lpMask) << st.lc) + (prevB >>> (8 - st.lc))) * 0x300
        val c = data(pos) & 0xff
        var sym = 1
        if (st.state >= 7) {
          var matchByte = data(pos - st.reps(0) - 1) & 0xff
          var matched = true
          var i = 7
          while (i >= 0) {
            val bit = (c >>> i) & 1
            if (matched) {
              matchByte <<= 1
              val matchBit = matchByte & 0x100
              rc.encodeBit(st.lit, litState + 0x100 + matchBit + sym, bit)
              if (matchBit != (bit << 8)) matched = false
            } else rc.encodeBit(st.lit, litState + sym, bit)
            sym = (sym << 1) | bit
            i -= 1
          }
        } else {
          var i = 7
          while (i >= 0) {
            val bit = (c >>> i) & 1
            rc.encodeBit(st.lit, litState + sym, bit)
            sym = (sym << 1) | bit
            i -= 1
          }
        }
        st.state = if (st.state < 4) 0 else if (st.state < 10) st.state - 3
          else st.state - 6
        if (pos + 4 <= data.length) {
          val h = hash4(pos); prev(pos) = head(h); head(h) = pos
        }
        pos += 1
      }
    }
    rc.flush()
  }

  /** LZMA2-compress `data`: compressed chunks of ≤ 48 KiB unpacked
    * each (fresh probability state per chunk — reset 3 first, reset 2
    * after — with the DICTIONARY continuous so matches reach across
    * chunk boundaries); any chunk that fails to shrink ships as an
    * uncompressed chunk instead. Returns the LZMA2 byte stream
    * INCLUDING the terminator.
    */
  private[graft] def lzma2Compress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val ChunkMax = 48 * 1024
    // hash table sized to the input (floor 256, cap 64 Ki): a 4 KiB
    // tar must not pay a 256 KiB table fill per row
    val hashBits = math.max(8, math.min(16,
      32 - java.lang.Integer.numberOfLeadingZeros(math.max(1, data.length))))
    val head = new Array[Int](1 << hashBits)
    java.util.Arrays.fill(head, -1)
    val prev = new Array[Int](math.max(1, data.length))
    var off = 0
    var first = true
    while (off < data.length) {
      val n = math.min(ChunkMax, data.length - off)
      val st = new LzmaState(3, 0, 2)
      val body = new java.io.ByteArrayOutputStream(n / 2 + 32)
      // snapshot the chain heads: a discarded chunk must not leave
      // phantom insertions (prev[] entries are position-keyed, safe)
      val headSnap = head.clone()
      encodeLzmaChunk(data, off, off + n, st, head, prev, body)
      val packed = body.toByteArray
      if (packed.length < n) {
        val ctl = 0x80 | ((if (first) 3 else 2) << 5) | ((n - 1) >> 16)
        out.write(ctl)
        out.write(((n - 1) >> 8) & 0xff); out.write((n - 1) & 0xff)
        out.write((packed.length - 1) >> 8); out.write((packed.length - 1) & 0xff)
        out.write(93) // props byte: (2*5 + 0)*9 + 3 = pb 2, lp 0, lc 3
        out.write(packed, 0, packed.length)
      } else {
        // incompressible segment: stored chunk (dict retained); the
        // next compressed chunk's reset>=2 satisfies the spec's
        // state-reset-after-uncompressed rule. Chain heads roll back
        // so the stored bytes re-insert cleanly below.
        System.arraycopy(headSnap, 0, head, 0, head.length)
        var k = off
        while (k < off + n) {
          if (k + 4 <= data.length) {
            val h = (((data(k) & 0xff) | ((data(k + 1) & 0xff) << 8) |
              ((data(k + 2) & 0xff) << 16) | ((data(k + 3) & 0xff) << 24)) *
              0x9E3779B1) >>> (32 - hashBits)
            prev(k) = head(h); head(h) = k
          }
          k += 1
        }
        // ctl 1 on the stream's first chunk (the spec's initial dict
        // reset), 2 after (dict retained)
        out.write(if (first) 1 else 2)
        out.write((n - 1) >> 8); out.write((n - 1) & 0xff)
        out.write(data, off, n)
      }
      off += n
      first = false
    }
    out.write(0) // LZMA2 terminator
    out.toByteArray
  }

  /** Conformant `.xz` WRITER using uncompressed LZMA2 chunks (the
    * stored-block form — xz is an archival INPUT shape here, so the
    * writer exists for corpus construction; the LZMA core is
    * exercised decode-side by the liblzma fixtures): stream header,
    * one block (LZMA2 filter, 64 KiB uncompressed chunks, CRC64
    * check), index, footer — every CRC real, so liblzma/xz decode the
    * output byte-exact (`tools/verify_xz_encoder.py`, run per-test by
    * XzSpec).
    */
  def encodeStored(data: Array[Byte]): Array[Byte] =
    encodeStored(data, bcj = false, deltaDist = 0)

  /** COMPRESSING `.xz` writer (round 20 stretch): the real LZMA
    * encoder behind the same container/filter framing as
    * `encodeStored`. Foreign-verified by liblzma per-test
    * (`tools/verify_xz_encoder.py`) and round-tripped by this file's
    * own decoder across the spec matrix.
    */
  def encode(
      data: Array[Byte], bcj: Boolean = false,
      deltaDist: Int = 0): Array[Byte] =
    encodeXz(data, bcj, deltaDist, compress = true)

  /** Stored writer with optional pre-filters (round 20): `deltaDist`
    * > 0 prepends a delta filter, `bcj` an x86 BCJ filter, applied in
    * encode order delta → x86 → LZMA2 — so the stream exercises the
    * reader's filter chain with real (liblzma-accepted) headers. The
    * payload travels in uncompressed LZMA2 chunks.
    */
  def encodeStored(
      data: Array[Byte], bcj: Boolean, deltaDist: Int): Array[Byte] =
    encodeXz(data, bcj, deltaDist, compress = false)

  private def encodeXz(
      data: Array[Byte], bcj: Boolean, deltaDist: Int,
      compress: Boolean): Array[Byte] = {
    require(data.length <= (1 << 26), "encode input exceeds 64 MiB cap")
    require(deltaDist >= 0 && deltaDist <= 256, "delta dist 1..256")
    val bos = new java.io.ByteArrayOutputStream(data.length + 256)
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    // stream header: magic | flags (00, check = CRC64) | CRC32(flags)
    Magic.foreach(bos.write)
    bos.write(0); bos.write(4)
    w32(crc32(Array[Byte](0, 4), 0, 2).toLong & 0xFFFFFFFFL)
    if (data.length == 0) {
      // empty stream: no blocks — an index with zero records, footer
      val idx = Array[Byte](0, 0, 0, 0) // indicator, count 0, 2 pad
      bos.write(idx, 0, 4)
      w32(crc32(idx, 0, 4).toLong & 0xFFFFFFFFL)
      val ft = Array[Byte](1, 0, 0, 0, 0, 4) // backward = (1+1)*4 = idx+crc
      w32(crc32(ft, 0, 6).toLong & 0xFFFFFFFFL)
      bos.write(ft, 0, 6)
      bos.write('Y'); bos.write('Z')
      return bos.toByteArray
    }
    // what travels in the LZMA2 chunks is the FILTERED byte stream
    // (encode order delta -> x86); the check and index still describe
    // the ORIGINAL data, which is what a decoder re-produces
    val filtered = {
      var d = data
      if (deltaDist > 0) d = deltaEncode(d.clone(), deltaDist)
      if (bcj) d = bcjX86(if (d eq data) d.clone() else d, 0L,
        encoding = true)
      d
    }
    // block header: size byte, flags (nFilters-1), filter list
    // ([delta][x86] then LZMA2 with its dict-size prop), zero padding
    // to a 4-byte boundary, CRC32
    val fl = new java.io.ByteArrayOutputStream()
    if (deltaDist > 0) { fl.write(0x03); fl.write(1); fl.write(deltaDist - 1) }
    if (bcj) { fl.write(0x04); fl.write(0) }
    fl.write(0x21); fl.write(1); fl.write(16)
    val nFilters = 1 + (if (deltaDist > 0) 1 else 0) + (if (bcj) 1 else 0)
    val hdrSize = ((2 + fl.size + 4 + 3) / 4) * 4
    val bh = new Array[Byte](hdrSize - 4)
    bh(0) = (hdrSize / 4 - 1).toByte
    bh(1) = (nFilters - 1).toByte
    System.arraycopy(fl.toByteArray, 0, bh, 2, fl.size)
    bos.write(bh, 0, bh.length)
    w32(crc32(bh, 0, bh.length).toLong & 0xFFFFFFFFL)
    // LZMA2 payload: real compression or uncompressed chunks (the
    // first chunk resets the dict either way)
    var lzma2Len = 0L
    if (compress) {
      val payload = lzma2Compress(filtered)
      bos.write(payload, 0, payload.length)
      lzma2Len = payload.length.toLong
    } else {
      var off = 0
      var first = true
      while (off < filtered.length) {
        val n = math.min(1 << 16, filtered.length - off)
        bos.write(if (first) 1 else 2)
        bos.write((n - 1) >> 8); bos.write((n - 1) & 0xff)
        bos.write(filtered, off, n)
        lzma2Len += 3L + n
        off += n
        first = false
      }
      bos.write(0) // LZMA2 end
      lzma2Len += 1
    }
    val unpadded = hdrSize + lzma2Len + 8 // header + data + CRC64 check
    var padding = 0
    while (((hdrSize + lzma2Len + padding) & 3) != 0) { bos.write(0); padding += 1 }
    val c64 = crc64(data, 0, data.length)
    w32(c64 & 0xFFFFFFFFL); w32((c64 >>> 32) & 0xFFFFFFFFL)
    // index: indicator, count 1, (unpadded, uncompressed), pad, CRC32
    val idx = new java.io.ByteArrayOutputStream()
    idx.write(0)
    def vint(v0: Long): Unit = {
      var v = v0
      while (v >= 0x80) { idx.write(((v & 0x7F) | 0x80).toInt); v >>= 7 }
      idx.write(v.toInt)
    }
    vint(1L)
    vint(unpadded)
    vint(data.length.toLong)
    while ((idx.size() & 3) != 0) idx.write(0)
    val idxBytes = idx.toByteArray
    bos.write(idxBytes)
    w32(crc32(idxBytes, 0, idxBytes.length).toLong & 0xFFFFFFFFL)
    // footer
    val backward = (idxBytes.length + 4) / 4 - 1
    val ft = new Array[Byte](6)
    ft(0) = (backward & 0xff).toByte
    ft(1) = ((backward >> 8) & 0xff).toByte
    ft(2) = ((backward >> 16) & 0xff).toByte
    ft(3) = ((backward >>> 24) & 0xff).toByte
    ft(4) = 0; ft(5) = 4
    w32(crc32(ft, 0, 6).toLong & 0xFFFFFFFFL)
    bos.write(ft, 0, 6)
    bos.write('Y'); bos.write('Z')
    bos.toByteArray
  }
}
