package graft.operators

/** bzip2 (the classic LLM-corpus container: Wikipedia/Wikidata dumps,
  * old Common Crawl, Gutenberg mirrors ship `.xml.bz2` / `.tar.bz2`).
  *
  * DECODER: the full public format — stream header, per-block
  * RLE1 → BWT → MTF → RUNA/RUNB zero-runs → selector-switched Huffman
  * groups, block and stream CRCs verified, CONCATENATED streams
  * walked (the Wikipedia *multistream* dump shape, one stream per
  * article batch). Verified byte-exact against FOREIGN libbz2
  * fixtures (`tools/gen_bzip2_fixtures.py`, the libpng/libtiff
  * discipline). The deprecated `randomized` bit is a typed error —
  * no modern writer emits it.
  *
  * ENCODER: a conforming writer (corpus construction, the
  * Jpeg/Gif/Flac precedent): RLE1, BWT by prefix-doubling rotation
  * sort, MTF, bijective-base-2 zero runs, two identical Huffman
  * groups (the format's minimum), depth-limited canonical lengths.
  * Its output is decoded byte-exact by FOREIGN libbz2 via ctypes in
  * `Bzip2Spec` (`tools/verify_bzip2_encoder.py`) — so the pair is
  * not self-certifying.
  *
  * Allocation discipline: the block size declared in the header caps
  * every buffer BEFORE trusting any count field; `decode` takes a
  * `maxOut` bomb cap.
  */
object Bzip2 {

  private final case class Bail(reason: String)
      extends RuntimeException(null, null, false, false)

  // CRC-32/BZIP2: poly 0x04C11DB7, init/xorout 0xFFFFFFFF, MSB-first
  private val CrcTable: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 24
    var k = 0
    while (k < 8) {
      c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04C11DB7 else c << 1
      k += 1
    }
    c
  }

  private final class BitIn(b: Array[Byte]) {
    var bytePos = 0
    private var bitPos = 0
    def readBit(): Int = {
      if (bytePos >= b.length) throw Bail("truncated")
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def read(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def moreBytes: Boolean = bytePos < b.length
  }

  private final class BitOut {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { bos.write(cur); cur = 0; nBits = 0 }
    }
    def write(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      while (nBits != 0) writeBit(0)
      bos.toByteArray
    }
  }

  private val BlockMagic = 0x314159265359L
  private val EosMagic = 0x177245385090L

  // ---------------------------------------------------------------- decode

  /** Decode a complete `.bz2` input (concatenated streams supported —
    * the multistream dump shape). Left(reason) on anything malformed,
    * any CRC mismatch, or past `maxOut`.
    */
  def decode(b: Array[Byte], maxOut: Int = 1 << 26): Either[String, Array[Byte]] =
    decodeStreams(b, maxOut).map { parts =>
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach(out.write)
      out.toByteArray
    }

  /** Per-STREAM decode of a (possibly concatenated) `.bz2` input — the
    * Wikipedia *multistream* dump walk, where each stream is an
    * independently-seekable article batch and the boundaries carry
    * meaning.
    */
  def decodeStreams(
      b: Array[Byte], maxOut: Int = 1 << 26): Either[String, Seq[Array[Byte]]] =
    try Right(decodeOrThrow(b, maxOut))
    catch {
      case x: Bail => Left(x.reason)
      case _: ArrayIndexOutOfBoundsException => Left("malformed")
      case _: NegativeArraySizeException => Left("malformed")
    }

  private def decodeOrThrow(b: Array[Byte], maxOut: Int): Seq[Array[Byte]] = {
    val parts = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val in = new BitIn(b)
    var total = 0L
    while (in.moreBytes) {
      val out = new java.io.ByteArrayOutputStream()
      if (in.read(8) != 'B' || in.read(8) != 'Z' || in.read(8) != 'h')
        throw Bail("stream-magic")
      val level = in.read(8).toInt - '0'
      if (level < 1 || level > 9) throw Bail("block-size-digit")
      val blockMax = level * 100000
      var combined = 0
      var go = true
      while (go) {
        val magic = (in.read(24) << 24) | in.read(24)
        if (magic == EosMagic) {
          val streamCrc = in.read(32).toInt
          if (streamCrc != combined) throw Bail("stream-crc")
          go = false
        } else if (magic == BlockMagic) {
          val crc = decodeBlock(in, blockMax, out, maxOut, total)
          combined = ((combined << 1) | (combined >>> 31)) ^ crc
        } else throw Bail("block-magic")
      }
      in.alignByte()
      total += out.size()
      parts += out.toByteArray
    }
    if (parts.isEmpty) throw Bail("empty-input")
    parts.toSeq
  }

  /** One block: entropy stage → BWT inverse → RLE1; returns the
    * verified block CRC.
    */
  private def decodeBlock(
      in: BitIn, blockMax: Int, out: java.io.ByteArrayOutputStream,
      maxOut: Int, emittedBefore: Long): Int = {
    val wantCrc = in.read(32).toInt
    if (in.readBit() == 1) throw Bail("randomized-deprecated")
    val origPtr = in.read(24).toInt
    // symbol map: 16 range bits, then a 16-bit map per set range
    val ranges = in.read(16).toInt
    val used = new scala.collection.mutable.ArrayBuffer[Int](256)
    var r = 0
    while (r < 16) {
      if (((ranges >> (15 - r)) & 1) != 0) {
        val m = in.read(16).toInt
        var k = 0
        while (k < 16) {
          if (((m >> (15 - k)) & 1) != 0) used += r * 16 + k
          k += 1
        }
      }
      r += 1
    }
    if (used.isEmpty) throw Bail("empty-symbol-map")
    val alphaSize = used.length + 2
    val nGroups = in.read(3).toInt
    if (nGroups < 2 || nGroups > 6) throw Bail("group-count")
    val nSels = in.read(15).toInt
    if (nSels < 1) throw Bail("selector-count")
    // selectors, MTF-coded over the group list
    val selMtf = Array.tabulate(nGroups)(identity)
    val selectors = new Array[Int](nSels)
    var i = 0
    while (i < nSels) {
      var j = 0
      while (in.readBit() == 1) {
        j += 1
        if (j >= nGroups) throw Bail("selector-overflow")
      }
      val v = selMtf(j)
      while (j > 0) { selMtf(j) = selMtf(j - 1); j -= 1 }
      selMtf(0) = v
      selectors(i) = v
      i += 1
    }
    // per-group delta-coded lengths → canonical decode tables
    val lens = Array.ofDim[Int](nGroups, alphaSize)
    var g = 0
    while (g < nGroups) {
      var cur = in.read(5).toInt
      var s = 0
      while (s < alphaSize) {
        var adjusting = true
        while (adjusting) {
          if (cur < 1 || cur > 20) throw Bail("code-length")
          if (in.readBit() == 0) adjusting = false
          else if (in.readBit() == 0) cur += 1
          else cur -= 1
        }
        lens(g)(s) = cur
        s += 1
      }
      g += 1
    }
    // canonical tables: firstCode/limit per length + symbol perm
    // (codes assigned in (length asc, symbol asc) order — the classic
    // construction both libbz2 and this file's encoder use)
    final class Table(ls: Array[Int]) {
      val minLen: Int = ls.min
      val maxLen: Int = ls.max
      val perm = new Array[Int](alphaSize)
      val firstCode = new Array[Int](maxLen + 1)
      val limit = new Array[Int](maxLen + 1)
      val permBase = new Array[Int](maxLen + 1)
      locally {
        var pp = 0
        var code = 0
        var l = minLen
        while (l <= maxLen) {
          permBase(l) = pp
          var s = 0
          while (s < alphaSize) {
            if (ls(s) == l) { perm(pp) = s; pp += 1 }
            s += 1
          }
          firstCode(l) = code
          val cnt = pp - permBase(l)
          limit(l) = code + cnt - 1 // = code-1 when no codes at l
          code = (code + cnt) << 1
          l += 1
        }
      }
      def next(in: BitIn): Int = {
        var l = minLen
        var v = in.read(minLen).toInt
        while (v > limit(l)) {
          l += 1
          if (l > maxLen) throw Bail("huffman-code")
          v = (v << 1) | in.readBit()
        }
        val idx = permBase(l) + (v - firstCode(l))
        if (idx < 0 || idx >= alphaSize) throw Bail("huffman-code")
        perm(idx)
      }
    }
    val tables = Array.tabulate(nGroups)(g2 => new Table(lens(g2)))
    // entropy stage: RUNA/RUNB runs + MTF symbols until EOB
    val bwt = new Array[Byte](blockMax)
    var bwtLen = 0
    val mtf = used.toArray // byte-value MTF list
    val eob = alphaSize - 1
    var runLen = 0L
    var runBit = 0
    var groupPos = 0
    var selIdx = -1
    var table: Table = null
    var done = false
    while (!done) {
      if (groupPos == 0) {
        selIdx += 1
        if (selIdx >= nSels) throw Bail("selector-underrun")
        table = tables(selectors(selIdx))
        groupPos = 50
      }
      groupPos -= 1
      val s = table.next(in)
      if (s <= 1) {
        runLen += (s + 1).toLong << runBit
        runBit += 1
        if (runLen > blockMax.toLong) throw Bail("run-overflow")
      } else {
        if (runLen > 0) {
          if (bwtLen + runLen > blockMax) throw Bail("block-overflow")
          java.util.Arrays.fill(bwt, bwtLen, bwtLen + runLen.toInt,
            mtf(0).toByte)
          bwtLen += runLen.toInt
          runLen = 0; runBit = 0
        }
        if (s == eob) done = true
        else {
          var j = s - 1
          if (j >= mtf.length) throw Bail("mtf-index")
          val v = mtf(j)
          while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
          mtf(0) = v
          if (bwtLen >= blockMax) throw Bail("block-overflow")
          bwt(bwtLen) = v.toByte
          bwtLen += 1
        }
      }
    }
    if (bwtLen == 0) throw Bail("empty-block")
    if (origPtr >= bwtLen) throw Bail("orig-ptr")
    // BWT inverse (bzlib's tt construction): tt(j) enumerates rows in
    // first-column order; following it from origPtr replays the text
    val cftab = new Array[Int](257)
    var p = 0
    while (p < bwtLen) { cftab((bwt(p) & 0xff) + 1) += 1; p += 1 }
    p = 1
    while (p <= 256) { cftab(p) += cftab(p - 1); p += 1 }
    val tt = new Array[Int](bwtLen)
    p = 0
    while (p < bwtLen) {
      val ch = bwt(p) & 0xff
      tt(cftab(ch)) = p
      cftab(ch) += 1
      p += 1
    }
    // RLE1 decode fused over the BWT-inverse byte walk, CRC as we go
    var crc = 0xFFFFFFFF
    var pos = tt(origPtr)
    var emitted = 0
    var runByte = -1
    var runCount = 0
    var decodedInBlock = 0L
    def emit(byte: Int, times: Int): Unit = {
      if (emittedBefore + out.size().toLong + times > maxOut)
        throw Bail("output-cap")
      var t = 0
      while (t < times) {
        out.write(byte)
        crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ byte) & 0xff)
        t += 1
      }
      decodedInBlock += times
    }
    while (emitted < bwtLen) {
      val byte = bwt(pos) & 0xff
      pos = tt(pos)
      emitted += 1
      if (runCount == 4) {
        // the byte after 4 equals is the extra-repeat count
        emit(runByte, byte)
        runCount = 0; runByte = -1
      } else {
        if (byte == runByte) runCount += 1
        else { runByte = byte; runCount = 1 }
        emit(byte, 1)
      }
    }
    if (runCount == 4) throw Bail("rle1-truncated")
    val got = crc ^ 0xFFFFFFFF
    if (got != wantCrc) throw Bail("block-crc")
    wantCrc
  }

  // ---------------------------------------------------------------- encode

  /** Huffman code lengths capped at 20 bits (freq-0 symbols get
    * weight 1 so every alphabet symbol has a code — the format reads
    * a length per symbol).
    */
  private def huffLens20(freq0: Array[Int]): Array[Int] = {
    val m = freq0.length
    val freq = freq0.map(f => math.max(f, 1))
    if (m == 1) return Array(1)
    val order = (0 until m).sortBy(s => (freq(s), s)).toArray
    val weight = new Array[Long](2 * m - 1)
    val parent = new Array[Int](2 * m - 1)
    var i = 0
    while (i < m) { weight(i) = freq(order(i)).toLong; i += 1 }
    var leafHead = 0
    var nodeHead = m
    var nodeTail = m
    var made = 0
    while (made < m - 1) {
      def takeMin(): Int =
        if (leafHead < m &&
          (nodeHead >= nodeTail || weight(leafHead) <= weight(nodeHead))) {
          leafHead += 1; leafHead - 1
        } else { nodeHead += 1; nodeHead - 1 }
      val a = takeMin(); val b = takeMin()
      weight(nodeTail) = weight(a) + weight(b)
      parent(a) = nodeTail; parent(b) = nodeTail
      nodeTail += 1; made += 1
    }
    val lens = new Array[Int](m)
    i = 0
    while (i < m) {
      var d = 0
      var u = i
      while (u != 2 * m - 2) { u = parent(u); d += 1 }
      lens(order(i)) = d
      i += 1
    }
    val cap = 20
    val blCount = new Array[Int](cap + 2)
    lens.foreach(l => blCount(math.min(l, cap)) += 1)
    var kraft = 0L
    for (l <- 1 to cap) kraft += blCount(l).toLong << (cap - l)
    val full = 1L << cap
    while (kraft > full) {
      var l = cap - 1
      while (l > 0 && blCount(l) == 0) l -= 1
      blCount(l) -= 1
      blCount(l + 1) += 2
      blCount(cap) -= 1
      kraft -= 1
    }
    val byFreq = (0 until m).sortBy(s => (-freq(s).toLong, s))
    var idx = 0
    for (l <- 1 to cap; _ <- 0 until blCount(l)) {
      lens(byFreq(idx)) = l
      idx += 1
    }
    lens
  }

  /** BWT of one block by prefix-doubling ROTATION sort (ranks compared
    * modulo n, so this sorts rotations, not suffixes): O(n log n) with
    * counting sorts, no comparator boxing. Returns (last column,
    * origPtr).
    */
  private def bwtEncode(s: Array[Byte], n: Int): (Array[Byte], Int) = {
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = s(i) & 0xff; i += 1 }
    var sa = new Array[Int](n)
    var tmp = new Array[Int](n)
    var cnt = new Array[Int](math.max(257, n + 1))
    // initial counting sort by first byte
    java.util.Arrays.fill(cnt, 0, 257, 0)
    i = 0
    while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
    i = 1
    while (i <= 256) { cnt(i) += cnt(i - 1); i += 1 }
    i = 0
    while (i < n) { sa(cnt(rank(i))) = i; cnt(rank(i)) += 1; i += 1 }
    var k = 1
    var distinct = false
    val rank2 = new Array[Int](n)
    // compact ranks to [0, n) so every later counting pass is bounded
    // by n+1 (the first loop round would otherwise index by raw bytes)
    locally {
      rank2(sa(0)) = 0
      var rmax = 0
      i = 1
      while (i < n) {
        if (rank(sa(i)) != rank(sa(i - 1))) rmax += 1
        rank2(sa(i)) = rmax
        i += 1
      }
      System.arraycopy(rank2, 0, rank, 0, n)
      distinct = rmax == n - 1
    }
    while (k < n && !distinct) {
      // sort by (rank(i), rank(i+k mod n)): two stable counting passes
      val maxR = n + 1
      java.util.Arrays.fill(cnt, 0, maxR, 0)
      i = 0
      while (i < n) { cnt(rank((i + k) % n) + 1) += 1; i += 1 }
      i = 1
      while (i < maxR) { cnt(i) += cnt(i - 1); i += 1 }
      // pass 1: stable sort all positions by second key
      i = 0
      while (i < n) { tmp(cnt(rank((i + k) % n))) = i; cnt(rank((i + k) % n)) += 1; i += 1 }
      // pass 2: stable sort tmp by first key
      java.util.Arrays.fill(cnt, 0, maxR, 0)
      i = 0
      while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
      i = 1
      while (i < maxR) { cnt(i) += cnt(i - 1); i += 1 }
      i = 0
      while (i < n) {
        val pos = tmp(i)
        sa(cnt(rank(pos))) = pos
        cnt(rank(pos)) += 1
        i += 1
      }
      // re-rank
      rank2(sa(0)) = 0
      var rmax = 0
      i = 1
      while (i < n) {
        val a = sa(i - 1); val b = sa(i)
        val same = rank(a) == rank(b) &&
          rank((a + k) % n) == rank((b + k) % n)
        rmax = if (same) rmax else rmax + 1
        rank2(b) = rmax
        i += 1
      }
      System.arraycopy(rank2, 0, rank, 0, n)
      distinct = rmax == n - 1
      k <<= 1
    }
    val bwt = new Array[Byte](n)
    var orig = -1
    i = 0
    while (i < n) {
      val p = sa(i)
      if (p == 0) orig = i
      bwt(i) = s((p + n - 1) % n)
      i += 1
    }
    (bwt, orig)
  }

  private val EncBlockInput = 400000 // RLE1 may expand 5/4 → < 900k

  /** Conforming bzip2 ENCODER (level 9 blocks, two identical Huffman
    * groups — the format minimum — selectors all zero). Corpus
    * construction; foreign libbz2 decodes its output byte-exact
    * (ctypes harness, run per-test by Bzip2Spec).
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new BitOut
    out.write('B', 8); out.write('Z', 8); out.write('h', 8)
    out.write('9', 8)
    var combined = 0
    var off = 0
    while (off < data.length) {
      val end = math.min(off + EncBlockInput, data.length)
      combined = encodeBlock(data, off, end, out, combined)
      off = end
    }
    out.write(EosMagic >>> 24, 24); out.write(EosMagic & 0xFFFFFF, 24)
    out.write(combined.toLong & 0xFFFFFFFFL, 32)
    out.toBytes
  }

  private def encodeBlock(
      data: Array[Byte], from: Int, until: Int, out: BitOut,
      combinedIn: Int): Int = {
    // CRC over the ORIGINAL bytes of this block
    var crc = 0xFFFFFFFF
    var i = from
    while (i < until) {
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ (data(i) & 0xff)) & 0xff)
      i += 1
    }
    val blockCrc = crc ^ 0xFFFFFFFF
    // RLE1: runs of 4..255 identical bytes → 4 bytes + extra count
    val rle = new java.io.ByteArrayOutputStream()
    i = from
    while (i < until) {
      var j = i + 1
      while (j < until && j - i < 259 && data(j) == data(i)) j += 1
      val run = j - i
      if (run >= 4) {
        var t = 0
        while (t < 4) { rle.write(data(i) & 0xff); t += 1 }
        rle.write(run - 4)
      } else {
        var t = 0
        while (t < run) { rle.write(data(i) & 0xff); t += 1 }
      }
      i = j
    }
    val block = rle.toByteArray
    val n = block.length
    val (bwt, origPtr) = bwtEncode(block, n)
    // symbol map
    val usedFlag = new Array[Boolean](256)
    i = 0
    while (i < n) { usedFlag(bwt(i) & 0xff) = true; i += 1 }
    val used = (0 until 256).filter(usedFlag).toArray
    val alphaSize = used.length + 2
    val eob = alphaSize - 1
    // MTF + RUNA/RUNB
    val mtf = used.clone()
    val syms = new scala.collection.mutable.ArrayBuffer[Int](n / 2 + 8)
    var runLen = 0L
    def flushRun(): Unit = {
      var r2 = runLen
      while (r2 > 0) {
        if ((r2 & 1) == 1) { syms += 0; r2 = (r2 - 1) >> 1 } // RUNA
        else { syms += 1; r2 = (r2 - 2) >> 1 } // RUNB
      }
      runLen = 0
    }
    i = 0
    while (i < n) {
      val v = bwt(i) & 0xff
      var j = 0
      while (mtf(j) != v) j += 1
      if (j == 0) runLen += 1
      else {
        flushRun()
        syms += j + 1
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
      }
      i += 1
    }
    flushRun()
    syms += eob
    // Huffman lengths (two identical groups, the format's minimum)
    val freq = new Array[Int](alphaSize)
    syms.foreach(freq(_) += 1)
    val lens = huffLens20(freq)
    // canonical codes consistent with the decoder's table construction
    val code = new Array[Int](alphaSize)
    val maxLen = lens.max
    val minLen = lens.min
    var c = 0
    var l = minLen
    while (l <= maxLen) {
      for (s <- 0 until alphaSize if lens(s) == l) { code(s) = c; c += 1 }
      c <<= 1
      l += 1
    }
    // ---- emit the block
    out.write(BlockMagic >>> 24, 24); out.write(BlockMagic & 0xFFFFFF, 24)
    out.write(blockCrc.toLong & 0xFFFFFFFFL, 32)
    out.writeBit(0) // not randomized
    out.write(origPtr.toLong, 24)
    var ranges = 0
    used.foreach(u => ranges |= 1 << (15 - (u >> 4)))
    out.write(ranges.toLong, 16)
    var r2 = 0
    while (r2 < 16) {
      if (((ranges >> (15 - r2)) & 1) != 0) {
        var m = 0
        used.foreach { u =>
          if ((u >> 4) == r2) m |= 1 << (15 - (u & 15))
        }
        out.write(m.toLong, 16)
      }
      r2 += 1
    }
    out.write(2, 3) // nGroups = 2
    val nSels = (syms.length + 49) / 50
    out.write(nSels.toLong, 15)
    var t = 0
    while (t < nSels) { out.writeBit(0); t += 1 } // all group 0 (MTF j=0)
    var g = 0
    while (g < 2) {
      var cur = lens(0)
      out.write(cur.toLong, 5)
      var s = 0
      while (s < alphaSize) {
        while (cur < lens(s)) { out.writeBit(1); out.writeBit(0); cur += 1 }
        while (cur > lens(s)) { out.writeBit(1); out.writeBit(1); cur -= 1 }
        out.writeBit(0)
        s += 1
      }
      g += 1
    }
    syms.foreach(s => out.write(code(s).toLong, lens(s)))
    ((combinedIn << 1) | (combinedIn >>> 31)) ^ blockCrc
  }
}
