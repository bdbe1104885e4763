package graft.operators

/** Brotli (RFC 7932) decoder — the third leg of the HTTP content-coding
  * triad next to gzip and deflate (`WarcOps`): `br` responses are a
  * large share of the modern web, and a crawl pipeline that dead-letters
  * them loses the documents. Dependency-free implementation of the
  * complete bit format:
  *
  *   - stream header window bits (§9.1), meta-block headers with
  *     uncompressed / metadata / last-empty forms (§9.2);
  *   - prefix codes in both the simple (1–4 symbols, tree-select) and
  *     complex (code-length code with the fixed 4-bit pre-code, repeat
  *     codes 16/17, 32768-space accounting) forms (§3);
  *   - block-type switching for the three categories with the
  *     second-to-last/increment semantics and the 26-symbol block-count
  *     code (§6), context modes LSB6/MSB6/UTF8/Signed and RLE+IMTF
  *     context maps (§7);
  *   - the 704-symbol insert©-length code (§5), distance ring buffer
  *     with the 16 short codes, NPOSTFIX/NDIRECT parameterized extra-bit
  *     distances (§4);
  *   - the STATIC DICTIONARY (Appendix A) with all 121 word transforms
  *     (Appendix B) — ferment (uppercase) semantics included.
  *
  * The dictionary bytes, transform table, and context lookup table are
  * the RFC's published constants, extracted byte-exactly from the
  * system brotli library by `tools/gen_brotli_fixtures.py` (the
  * `Vp8Tables` .rodata discipline; the transform table is additionally
  * cross-checked against `BrotliTransformDictionaryWord` on 1452
  * cases). Conformance: `BrotliSpec` decodes foreign libbrotlienc
  * streams (qualities 0–11, window 18/22, text/html/UTF-8/random/runs/
  * dictionary-dense inputs) byte-exactly.
  *
  * Error-as-value: `decode` returns Left(reason) on any malformed,
  * truncated, or bomb-exceeding stream — never a throw, never partial
  * garbage. Scale shape: called per record inside `mapPartitions`
  * walkers; allocation bounded by `maxOut` BEFORE trusting any header
  * field.
  */
object Brotli {

  // ------------------------------------------------------------ resources

  private def resourceBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/brotli/$name")
    require(in != null, s"missing resource $name")
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  /** Static dictionary data (Appendix A): 122784 bytes. */
  private lazy val Dict: Array[Byte] = resourceBytes("dictionary.bin")

  /** Words-per-length size bits and cumulative offsets (Appendix A). */
  private lazy val sizeBitsAndOffsets: (Array[Int], Array[Int]) = {
    val lines = new String(resourceBytes("size_bits.txt"), "US-ASCII")
      .split("\n")
    (lines(0).trim.split(" ").map(_.toInt),
      lines(1).trim.split(" ").map(_.toInt))
  }
  private def SizeBits: Array[Int] = sizeBitsAndOffsets._1
  private def DictOffsets: Array[Int] = sizeBitsAndOffsets._2

  /** The 121 transforms (Appendix B): (prefix, type, suffix). */
  private lazy val Transforms: Array[(Array[Byte], Int, Array[Byte])] =
    new String(resourceBytes("transforms.txt"), "US-ASCII").split("\n")
      .filter(_.nonEmpty).map { line =>
        val parts = line.split("\t", -1)
        def un(h: String): Array[Byte] =
          h.grouped(2).filter(_.nonEmpty)
            .map(x => Integer.parseInt(x, 16).toByte).toArray
        (un(parts(0)), parts(1).toInt, un(parts(2)))
      }

  /** Context lookup table (Appendix C): 4 modes × (lut0 ++ lut1). */
  private lazy val ContextLut: Array[Byte] = resourceBytes("context_lut.bin")

  // ------------------------------------------------------------ constants

  /** Code-length-code symbol order (§3.5). */
  private val ClcOrder =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** The fixed pre-code for code-length-code lengths (§3.5): index by
    * the next 4 stream bits; (bits consumed, value).
    */
  private val ClcPreLen = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClcPreVal = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)

  /** Insert/copy length codes (§5). */
  private val InsOff = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50,
    66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsBits = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
    6, 7, 8, 9, 10, 12, 14, 24)
  private val CopyOff = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30,
    38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CopyBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 24)

  /** Insert/copy code bases per 64-symbol cell of the 704 code (§5). */
  private val CellIns = Array(0, 0, 0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CellCopy = Array(0, 8, 0, 8, 0, 8, 16, 0, 16, 8, 16)

  /** Block-count code ranges (§6), 26 symbols: (offset, extra bits) —
    * the `_kBrotliPrefixCodeRanges` values, which are the RFC's table.
    */
  private val BlkOff = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97,
    113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337, 8433,
    16625)
  private val BlkBits = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5,
    5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  // ------------------------------------------------------------- machinery

  private final case class Bail(reason: String)
      extends RuntimeException(null, null, false, false)

  private final class BitReader(b: Array[Byte]) {
    private var bytePos = 0
    private var bitPos = 0
    def readBit(): Int = {
      if (bytePos >= b.length) throw Bail("truncated")
      val v = (b(bytePos) >> bitPos) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
    /** Byte-align; the skipped pad bits must be zero (§9.2). */
    def align(): Unit =
      while (bitPos != 0) if (readBit() != 0) throw Bail("nonzero-pad")
    def readByte(): Int = {
      if (bitPos != 0) throw Bail("unaligned-byte-read")
      if (bytePos >= b.length) throw Bail("truncated")
      val v = b(bytePos) & 0xff
      bytePos += 1
      v
    }
  }

  /** Canonical prefix decoder: lengths → per-length first code +
    * symbol list (shorter first; equal lengths by symbol order).
    * `singleSym >= 0` (or exactly one non-zero length) = the zero-bit
    * single-symbol code: `read` consumes nothing.
    */
  private final class Prefix(lengths: Array[Int], singleSym: Int = -1) {
    private val maxLen = lengths.max
    val single: Int =
      if (singleSym >= 0) singleSym
      else if (lengths.count(_ > 0) == 1) lengths.indexWhere(_ > 0)
      else -1
    private val (firstCode, firstIdx, syms) = {
      val counts = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) counts(l) += 1)
      val fc = new Array[Int](maxLen + 2)
      val fi = new Array[Int](maxLen + 2)
      var code = 0
      var idx = 0
      for (l <- 1 to maxLen) {
        fc(l) = code; fi(l) = idx
        code = (code + counts(l)) << 1
        idx += counts(l)
      }
      val ss = new Array[Int](idx)
      var p = 0
      for (l <- 1 to maxLen; s <- lengths.indices if lengths(s) == l) {
        ss(p) = s; p = p + 1
      }
      (fc, fi, ss)
    }
    private val countsAt: Array[Int] = {
      val c = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) c(l) += 1)
      c
    }
    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.readBit()
        len += 1
        if (len <= maxLen && countsAt(len) > 0) {
          val d = code - firstCode(len)
          if (d >= 0 && d < countsAt(len)) return syms(firstIdx(len) + d)
        }
      }
      throw Bail("bad-prefix-read")
    }
  }

  /** One prefix code from the stream (§3.4/§3.5) over `alphabet`. */
  private def readPrefixCode(br: BitReader, alphabet: Int): Prefix = {
    val hskip = br.readBits(2)
    if (hskip == 1) {
      // simple: 1-4 explicit symbols
      val nsym = br.readBits(2) + 1
      val abits = {
        var b = 0
        while ((1 << b) < alphabet) b += 1
        b
      }
      val syms = Array.fill(nsym)(br.readBits(abits))
      if (syms.exists(_ >= alphabet)) throw Bail("bad-symbol")
      if (syms.distinct.length != nsym) throw Bail("dup-symbol")
      val lengths = new Array[Int](alphabet)
      nsym match {
        case 1 => // zero-bit code
        case 2 =>
          lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case _ =>
          if (br.readBit() == 0) syms.foreach(s => lengths(s) = 2)
          else {
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          }
      }
      if (nsym == 1) new Prefix(lengths, singleSym = syms(0))
      else new Prefix(lengths)
    } else {
      // complex: code-length code, then the main lengths
      val clcLens = new Array[Int](18)
      var space = 32
      var numClc = 0
      var i = hskip
      while (i < 18 && space > 0) {
        val idx = {
          // peek 4 bits without a hard EOF at the tail: lengths ride
          // the fixed pre-code of 2-4 bits
          var v = 0
          var got = 0
          var done = false
          var len = 0
          var value = 0
          while (!done) {
            v |= br.readBit() << got
            got += 1
            if (got >= 2) {
              val probe = v & 15
              val l = ClcPreLen(probe)
              if (l == got) { len = l; value = ClcPreVal(probe); done = true }
              else if (got == 4) { len = 4; value = ClcPreVal(probe); done = true }
            }
          }
          value
        }
        val len = idx
        if (len != 0) {
          clcLens(ClcOrder(i)) = len
          space -= 32 >> len
          numClc += 1
        }
        i += 1
      }
      if (space < 0) throw Bail("clc-oversubscribed")
      if (space > 0 && numClc != 1) throw Bail("clc-underfilled")
      val clc = new Prefix(clcLens)
      // main code lengths with repeat codes (§3.5)
      val lengths = new Array[Int](alphabet)
      var mainSpace = 32768
      var sym = 0
      var prevLen = 8 // initial repeated code length
      var repLen = 0 // repeat state: last repeat code's emitted length
      var repeat = 0
      var prevRepCode = -1
      while (sym < alphabet && mainSpace > 0) {
        val c = clc.read(br)
        if (c < 16) {
          prevRepCode = -1; repeat = 0
          lengths(sym) = c
          sym += 1
          if (c != 0) { prevLen = c; mainSpace -= 32768 >> c }
        } else {
          val extraBits = if (c == 16) 2 else 3
          val newLen = if (c == 16) prevLen else 0
          if (prevRepCode != c) { repeat = 0; repLen = newLen }
          prevRepCode = c
          val old = repeat
          repeat = (if (repeat > 0) (repeat - 2) << extraBits else 0) +
            3 + br.readBits(extraBits)
          val delta = repeat - old
          if (sym + delta > alphabet) throw Bail("repeat-overflow")
          var k = 0
          while (k < delta) {
            lengths(sym) = repLen
            sym += 1
            k += 1
          }
          if (repLen != 0) mainSpace -= delta * (32768 >> repLen)
        }
      }
      if (mainSpace < 0) throw Bail("main-oversubscribed")
      if (mainSpace > 0) {
        if (lengths.count(_ > 0) != 1) throw Bail("main-underfilled")
      }
      new Prefix(lengths)
    }
  }

  /** Block-type-count encoding (§9.2): 1..256. */
  private def readBlockTypeCount(br: BitReader): Int =
    if (br.readBit() == 0) 1
    else {
      val k = br.readBits(3)
      if (k == 0) 2 else (1 << k) + 1 + br.readBits(k)
    }

  /** Context map (§7.3): NTREES values over `size` entries. */
  private def readContextMap(br: BitReader, size: Int, ntrees: Int): Array[Int] = {
    val map = new Array[Int](size)
    if (ntrees == 1) return map
    val rleMax = if (br.readBit() == 1) br.readBits(4) + 1 else 0
    val code = readPrefixCode(br, ntrees + rleMax)
    var i = 0
    while (i < size) {
      val s = code.read(br)
      if (s == 0) { map(i) = 0; i += 1 }
      else if (s <= rleMax) {
        val reps = (1 << s) + br.readBits(s)
        if (i + reps > size) throw Bail("cmap-run-overflow")
        i += reps // zeros
      } else { map(i) = s - rleMax; i += 1 }
    }
    if (br.readBit() == 1) {
      // inverse move-to-front
      val mtf = Array.tabulate(256)(identity)
      var j = 0
      while (j < size) {
        val idx = map(j)
        val v = mtf(idx)
        var k = idx
        while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
        mtf(0) = v
        map(j) = v
        j += 1
      }
    }
    if (map.exists(_ >= ntrees)) throw Bail("cmap-value")
    map
  }

  /** One block category's switching state. */
  private final class Blocks(
      val n: Int, typeCode: Prefix, countCode: Prefix, first: Int) {
    var btype = 0
    var count: Int = first
    private var last = 0
    private var secondLast = 1
    def switchIfNeeded(br: BitReader): Unit = {
      if (count == 0) {
        val s = typeCode.read(br)
        val nt =
          if (s == 0) secondLast
          else if (s == 1) (last + 1) % n
          else s - 2
        secondLast = last
        last = nt
        btype = nt
        val cs = countCode.read(br)
        count = BlkOff(cs) + br.readBits(BlkBits(cs))
      }
      count -= 1
    }
  }

  private def readBlocks(br: BitReader): Blocks = {
    val n = readBlockTypeCount(br)
    if (n == 1) new Blocks(1, null, null, Int.MaxValue)
    else {
      val tc = readPrefixCode(br, n + 2)
      val cc = readPrefixCode(br, 26)
      val cs = cc.read(br)
      val first = BlkOff(cs) + br.readBits(BlkBits(cs))
      new Blocks(n, tc, cc, first)
    }
  }

  /** Apply transform `idx` to a dictionary word (Appendix B). */
  private def transformWord(
      word: Array[Byte], idx: Int, out: java.io.ByteArrayOutputStream): Int = {
    val (pre, typ, suf) = Transforms(idx)
    var w = word
    if (typ >= 12 && typ <= 20) w = w.drop(typ - 11) // OmitFirst1..9
    else if (typ >= 1 && typ <= 9) w = w.dropRight(typ) // OmitLast1..9
    val body = w.clone()
    if (typ == 10 || typ == 11) { // UppercaseFirst / UppercaseAll
      var i = 0
      var go = true
      while (go && i < body.length) {
        val b = body(i) & 0xff
        if (b < 192) {
          if (b >= 97 && b <= 122) body(i) = (b ^ 32).toByte
          i += 1
        } else if (b < 224) {
          if (i + 1 < body.length) body(i + 1) = (body(i + 1) ^ 32).toByte
          i += 2
        } else {
          if (i + 2 < body.length) body(i + 2) = (body(i + 2) ^ 5).toByte
          i += 3
        }
        if (typ == 10) go = false
      }
    }
    out.write(pre, 0, pre.length)
    out.write(body, 0, body.length)
    out.write(suf, 0, suf.length)
    pre.length + body.length + suf.length
  }

  // --------------------------------------------------------------- decode

  /** Decode a complete brotli stream; Left(reason) on anything
    * malformed or past `maxOut` (bomb cap).
    */
  def decode(input: Array[Byte], maxOut: Int = 1 << 26): Either[String, Array[Byte]] =
    try Right(decodeOrThrow(input, maxOut))
    catch {
      case b: Bail => Left(b.reason)
      case _: ArrayIndexOutOfBoundsException => Left("malformed")
      case _: NegativeArraySizeException => Left("malformed")
    }

  private def decodeOrThrow(input: Array[Byte], maxOut: Int): Array[Byte] = {
    val br = new BitReader(input)
    // window bits (§9.1)
    val wbits =
      if (br.readBit() == 0) 16
      else {
        val n = br.readBits(3)
        if (n != 0) 17 + n
        else {
          val m = br.readBits(3)
          if (m == 0) 17
          else if (m == 1) throw Bail("reserved-wbits")
          else 8 + m
        }
      }
    val window = (1 << wbits) - 16
    var outArr: Array[Byte] = new Array[Byte](1 << 16)
    var pos = 0
    def ensure(extra: Int): Unit = {
      if (pos + extra > maxOut) throw Bail("output-cap")
      while (pos + extra > outArr.length)
        outArr = java.util.Arrays.copyOf(outArr, outArr.length * 2)
    }
    def emit(b: Byte): Unit = { ensure(1); outArr(pos) = b; pos += 1 }

    val ring = Array(16, 15, 11, 4)
    var ringIdx = 4 // next write slot; last = ring((ringIdx-1)&3)

    var isLast = false
    while (!isLast) {
      isLast = br.readBit() == 1
      if (isLast && br.readBit() == 1) {
        // ISLASTEMPTY
        return java.util.Arrays.copyOf(outArr, pos)
      }
      val mnibbles = br.readBits(2) match {
        case 3 => 0
        case v => v + 4
      }
      if (mnibbles == 0) {
        // metadata block (§9.2): skip
        if (br.readBit() != 0) throw Bail("metadata-reserved")
        val skipBytes = br.readBits(2)
        var skipLen = 0
        var i = 0
        while (i < skipBytes) {
          val b = br.readBits(8)
          if (i + 1 == skipBytes && skipBytes > 1 && b == 0)
            throw Bail("metadata-length-pad")
          skipLen |= b << (8 * i)
          i += 1
        }
        br.align()
        // §9.2: MSKIPLEN is the metadata length MINUS ONE when
        // MSKIPBYTES > 0 (zero metadata bytes when MSKIPBYTES == 0),
        // so skip skipLen+1 bytes — matching libbrotlidec.
        val actualSkip = if (skipBytes > 0) skipLen + 1 else 0
        var k = 0
        while (k < actualSkip) { br.readByte(); k += 1 }
      } else {
        var mlen = br.readBits(4 * mnibbles) + 1
        if (mnibbles > 4 && (mlen - 1) >> (4 * (mnibbles - 1)) == 0)
          throw Bail("mlen-pad")
        val uncompressed = !isLast && br.readBit() == 1
        if (uncompressed) {
          br.align()
          ensure(mlen)
          var k = 0
          while (k < mlen) { outArr(pos) = br.readByte().toByte; pos += 1; k += 1 }
        } else {
          // §9.3 compressed meta-block
          val lBlocks = readBlocks(br)
          val iBlocks = readBlocks(br)
          val dBlocks = readBlocks(br)
          val npostfix = br.readBits(2)
          val ndirect = br.readBits(4) << npostfix
          val contextModes = Array.fill(lBlocks.n)(br.readBits(2))
          val ntreesL = readBlockTypeCount(br)
          val cmapL = readContextMap(br, 64 * lBlocks.n, ntreesL)
          val ntreesD = readBlockTypeCount(br)
          val cmapD = readContextMap(br, 4 * dBlocks.n, ntreesD)
          val litCodes = Array.fill(ntreesL)(readPrefixCode(br, 256))
          val cmdCodes = Array.fill(iBlocks.n)(readPrefixCode(br, 704))
          val distAlphabet = 16 + ndirect + (48 << npostfix)
          val distCodes = Array.fill(ntreesD)(readPrefixCode(br, distAlphabet))
          val postfixMask = (1 << npostfix) - 1

          while (mlen > 0) {
            iBlocks.switchIfNeeded(br)
            val cmd = cmdCodes(iBlocks.btype).read(br)
            val cell = cmd >> 6
            val insCode = CellIns(cell) + ((cmd >> 3) & 7)
            val copyCode = CellCopy(cell) + (cmd & 7)
            val implicitD0 = cmd < 128
            val insert = InsOff(insCode) + br.readBits(InsBits(insCode))
            val copy = CopyOff(copyCode) + br.readBits(CopyBits(copyCode))
            // an INSERT count past the remaining MLEN is malformed
            // (reference brotli errors EXUBERANT block length); never
            // emit partial garbage past the declared block length
            if (insert > mlen) throw Bail("insert-past-mlen")
            var j = 0
            while (j < insert) {
              lBlocks.switchIfNeeded(br)
              val mode = contextModes(lBlocks.btype)
              val p1 = if (pos > 0) outArr(pos - 1) & 0xff else 0
              val p2 = if (pos > 1) outArr(pos - 2) & 0xff else 0
              val ctx = (ContextLut((mode << 9) + p1) |
                ContextLut((mode << 9) + 256 + p2)) & 0xff
              val tree = cmapL(64 * lBlocks.btype + ctx)
              emit(litCodes(tree).read(br).toByte)
              mlen -= 1
              j += 1
            }
            if (mlen > 0) {
              var distance = 0
              var push = false
              if (implicitD0) {
                distance = ring((ringIdx - 1) & 3)
              } else {
                dBlocks.switchIfNeeded(br)
                val ctx = if (copy > 4) 3 else copy - 2
                val tree = cmapD(4 * dBlocks.btype + ctx)
                val dsym = distCodes(tree).read(br)
                if (dsym < 16) {
                  val d1 = ring((ringIdx - 1) & 3)
                  val d2 = ring((ringIdx - 2) & 3)
                  distance = dsym match {
                    case 0 => d1
                    case 1 => d2
                    case 2 => ring((ringIdx - 3) & 3)
                    case 3 => ring((ringIdx - 4) & 3)
                    case 4 => d1 - 1
                    case 5 => d1 + 1
                    case 6 => d1 - 2
                    case 7 => d1 + 2
                    case 8 => d1 - 3
                    case 9 => d1 + 3
                    case 10 => d2 - 1
                    case 11 => d2 + 1
                    case 12 => d2 - 2
                    case 13 => d2 + 2
                    case 14 => d2 - 3
                    case _ => d2 + 3
                  }
                  if (distance <= 0) throw Bail("bad-ring-distance")
                  push = dsym != 0
                } else if (dsym < 16 + ndirect) {
                  distance = dsym - 16 + 1
                  push = true
                } else {
                  val x = dsym - ndirect - 16
                  val ndistbits = 1 + (x >> (npostfix + 1))
                  if (ndistbits > 24) throw Bail("bad-distance-bits")
                  val extra = br.readBits(ndistbits)
                  val hcode = x >> npostfix
                  val lcode = x & postfixMask
                  val offset = ((2 + (hcode & 1)) << ndistbits) - 4
                  distance = ((offset + extra) << npostfix) + lcode + ndirect + 1
                  push = true
                }
              }
              val maxDist = math.min(pos, window)
              if (distance <= maxDist) {
                if (push) { ring(ringIdx & 3) = distance; ringIdx += 1 }
                if (copy > mlen) throw Bail("copy-past-mlen")
                ensure(copy)
                var k = 0
                while (k < copy) {
                  outArr(pos) = outArr(pos - distance)
                  pos += 1
                  k += 1
                }
                mlen -= copy
              } else {
                // static dictionary reference (§8); never pushes
                if (copy < 4 || copy > 24 || SizeBits(copy) == 0)
                  throw Bail("bad-dict-length")
                val addr = distance - maxDist - 1
                val nb = SizeBits(copy)
                val widx = addr & ((1 << nb) - 1)
                val tidx = addr >> nb
                if (tidx >= Transforms.length) throw Bail("bad-transform")
                val woff = DictOffsets(copy) + copy * widx
                val word = java.util.Arrays.copyOfRange(Dict, woff, woff + copy)
                val tmp = new java.io.ByteArrayOutputStream()
                val tlen = transformWord(word, tidx, tmp)
                if (tlen > mlen) throw Bail("dict-past-mlen")
                ensure(tlen)
                val tb = tmp.toByteArray
                System.arraycopy(tb, 0, outArr, pos, tlen)
                pos += tlen
                mlen -= tlen
              }
            }
            // mlen hit zero during the insert: the pending copy part
            // is absent by construction (§9.3) — the loop exits
          }
        }
      }
    }
    java.util.Arrays.copyOf(outArr, pos)
  }

  // --------------------------------------------------------------- encode

  /** Minimal conforming ENCODER: uncompressed meta-blocks only (the
    * brotli analogue of deflate's stored blocks) — enough to plant
    * real `br` bodies in synthetic corpora; libbrotlidec accepts its
    * output (spec-pinned via our own decoder + the conformance suite's
    * cross-checks).
    */
  def encodeUncompressed(data: Array[Byte]): Array[Byte] = {
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0
    var nbits = 0
    def putBit(b: Int): Unit = {
      cur |= (b & 1) << nbits
      nbits += 1
      if (nbits == 8) { bits.write(cur); cur = 0; nbits = 0 }
    }
    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { putBit((v >> i) & 1); i += 1 }
    }
    def alignZero(): Unit = while (nbits != 0) putBit(0)
    putBit(0) // WBITS = 16
    var off = 0
    while (off < data.length) {
      val chunk = math.min(1 << 16, data.length - off)
      putBit(0) // ISLAST = 0
      putBits(0, 2) // MNIBBLES code 0 → 4 nibbles
      putBits(chunk - 1, 16)
      putBit(1) // ISUNCOMPRESSED
      alignZero()
      bits.write(data, off, chunk)
      off += chunk
    }
    putBit(1) // ISLAST
    putBit(1) // ISLASTEMPTY
    alignZero()
    bits.toByteArray
  }
}
