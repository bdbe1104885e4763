package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** XZ/LZMA2 decoder against FOREIGN liblzma fixtures: presets 0/6/9e,
  * every check kind, uncompressed LZMA2 chunks, multi-block and
  * concatenated streams; malformed-stream typing; bomb cap.
  */
class XzSpec extends AnyFunSuite {

  private val res = "src/test/resources/xz"

  private def fixture(name: String, ext: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$res/fixture_$name.$ext"))

  private val fixtureNames = Seq("empty", "tiny", "text6", "text0",
    "text9e", "check_none", "check_crc32", "check_sha256", "binary",
    "zeros", "multistream", "multiblock")

  test("12 FOREIGN liblzma/xz fixtures decode byte-exact: presets " +
    "0/6/9e, checks none/CRC32/CRC64/SHA-256, uncompressed chunks, " +
    "200k zero runs, multi-block (64 KiB), concatenated streams") {
    for (name <- fixtureNames) {
      val want = fixture(name, "bin")
      Xz.decode(fixture(name, "xz")) match {
        case Right(got) =>
          assert(java.util.Arrays.equals(got, want), s"$name mismatch")
        case Left(r) => fail(s"$name: $r")
      }
    }
  }

  test("FOREIGN filter-chain fixtures decode byte-exact: BCJ x86 " +
    "(single + multi-block independent state), delta dist 1/4/256, " +
    "and a delta+x86+LZMA2 three-filter chain") {
    for (name <- Seq("bcj_x86", "bcj_x86_small", "delta1", "delta4",
        "delta256", "delta_x86_chain", "bcj_multiblock")) {
      val want = fixture(name, "bin")
      Xz.decode(fixture(name, "xz")) match {
        case Right(got) =>
          assert(java.util.Arrays.equals(got, want), s"$name mismatch")
        case Left(r) => fail(s"$name: $r")
      }
    }
  }

  test("filter transforms are exact inverses on adversarial byte " +
    "streams (E8/E9 soup, boundary MSBytes, every delta distance)") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 40) {
      val n = 5 + rnd.nextInt(3000)
      val raw = new Array[Byte](n)
      rnd.nextBytes(raw)
      // salt with heavy E8/E9 + 00/FF MSBytes to hit conversion paths
      for (_ <- 0 until n / 8) {
        val i = rnd.nextInt(n)
        raw(i) = (if (rnd.nextBoolean()) 0xE8 else 0xE9).toByte
        if (i + 4 < n && rnd.nextBoolean())
          raw(i + 4) = (if (rnd.nextBoolean()) 0 else 0xFF).toByte
      }
      val viaX86 = Xz.bcjX86(
        Xz.bcjX86(raw.clone(), 0L, encoding = true), 0L, encoding = false)
      assert(java.util.Arrays.equals(viaX86, raw), s"x86 trial $trial")
      val dist = 1 + rnd.nextInt(256)
      val viaDelta = Xz.deltaDecode(
        Xz.deltaEncode(raw.clone(), dist), dist)
      assert(java.util.Arrays.equals(viaDelta, raw),
        s"delta($dist) trial $trial")
    }
  }

  test("filtered-stream fuzz stays typed: bit flips over the BCJ and " +
    "delta fixtures never throw") {
    for (name <- Seq("bcj_x86_small", "delta4")) {
      val good = fixture(name, "xz")
      for (i <- 6 until good.length by 3) {
        val bad = good.clone()
        bad(i) = (bad(i) ^ 0x5A).toByte
        Xz.decode(bad) match {
          case Left(reason) => assert(reason.nonEmpty, s"$name flip $i")
          case Right(out) => assert(out.length <= 60000)
        }
      }
    }
    // an unsupported pre-filter id must still be a typed refusal:
    // patch the delta fixture's filter id 0x03 -> 0x05 in the block
    // header (and fix the header CRC so the id gate is what fires)
    val good = fixture("delta4", "xz")
    val hdrOff = 12 // stream header is 12 bytes; block header follows
    val hdrSize = ((good(hdrOff) & 0xff) + 1) * 4
    val idx = (hdrOff + 2 until hdrOff + hdrSize - 4)
      .find(i => good(i) == 0x03).get
    val bad = good.clone()
    bad(idx) = 0x05
    val crc = {
      val c = new java.util.zip.CRC32()
      c.update(bad, hdrOff, hdrSize - 4)
      c.getValue
    }
    for (k <- 0 until 4)
      bad(hdrOff + hdrSize - 4 + k) = ((crc >> (8 * k)) & 0xff).toByte
    assert(Xz.decode(bad) == Left("unsupported-filter"))
  }

  test("malformed streams are typed errors: flag/CRC flips, " +
    "truncation, bad magic, index lies — never throws or garbage") {
    val good = fixture("text6", "xz")
    assert(Xz.decode("definitely not xz".getBytes).isLeft)
    assert(Xz.decode(Array.emptyByteArray).isLeft)
    for (cut <- Seq(3, 11, 20, good.length / 2, good.length - 3))
      assert(Xz.decode(good.take(cut)).isLeft, s"cut $cut")
    for (i <- 6 until good.length by 5) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x21).toByte
      Xz.decode(bad) match {
        case Left(reason) => assert(reason.nonEmpty, s"flip $i")
        case Right(out) => assert(out.length <= 60000) // lucky flip
      }
    }
    // a wrong footer check-type must fail the footer-flags gate
    val bad = good.clone()
    bad(bad.length - 3) = 1 // CRC64 stream claims CRC32 in the footer
    assert(Xz.decode(bad).isLeft)
  }

  test("bomb cap: the zeros fixture under a small maxOut is refused " +
    "before allocating through") {
    assert(Xz.decode(fixture("zeros", "xz"), maxOut = 1000) ==
      Left("output-cap"))
  }

  private def det(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed
    var i = 0
    while (i < n) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      out(i) = (z ^ (z >>> 31)).toByte
      i += 1
    }
    out
  }

  test("stored-chunk writer round-trips through our own decoder: " +
    "empty, tiny, multi-chunk (> 64 KiB), binary") {
    for (c <- Seq[Array[Byte]](Array.emptyByteArray, "abc".getBytes,
      ("line of text " * 2000).getBytes, det(200000, 5))) {
      Xz.decode(Xz.encodeStored(c)) match {
        case Right(got) =>
          assert(java.util.Arrays.equals(got, c), s"len ${c.length}")
        case Left(r) => fail(s"len ${c.length}: $r")
      }
    }
    // filtered writer -> our reader: the full chain both directions
    for ((bcj, dd) <- Seq((true, 0), (false, 4), (true, 2))) {
      val c = det(70000, 12)
      Xz.decode(Xz.encodeStored(c, bcj = bcj, deltaDist = dd)) match {
        case Right(got) =>
          assert(java.util.Arrays.equals(got, c), s"bcj=$bcj dd=$dd")
        case Left(r) => fail(s"bcj=$bcj dd=$dd: $r")
      }
    }
  }

  test("LZMA encoder round-trips through our own decoder: literals, " +
    "matched-literal mode, rep0/short-rep, cross-chunk matches, " +
    "stored-chunk fallback — and genuinely compresses") {
    val text = ("the quick brown fox jumps over the lazy dog. " * 3000)
      .getBytes
    val cases: Seq[(String, Array[Byte])] = Seq(
      ("empty", Array.emptyByteArray),
      ("one", Array[Byte](42)),
      ("tiny", "abc".getBytes),
      ("text", text), // 135 KB: matches cross the 48 KiB chunk seam
      ("zeros", new Array[Byte](150000)), // rep0 runs, max match len
      ("binary", det(120000, 7)), // stored-chunk fallback path
      ("mixed", det(20000, 5) ++ ("hello world " * 5000).getBytes ++
        det(20000, 6)),
      ("alternating", Array.tabulate[Byte](60000)(i =>
        if ((i / 7) % 2 == 0) 'a'.toByte else det(1, i.toLong)(0))))
    for ((name, d) <- cases) {
      val enc = Xz.encode(d)
      Xz.decode(enc) match {
        case Right(got) =>
          assert(java.util.Arrays.equals(got, d), s"$name mismatch")
        case Left(r) => fail(s"$name: $r")
      }
      // never expands beyond chunk framing + container (~3 B / 48 KiB
      // chunk + ~90 B container)
      assert(enc.length <= d.length + d.length / 1000 + 200, name)
    }
    assert(Xz.encode(text).length < text.length / 20,
      "repetitive text must compress below 0.05")
    // compression composes with the pre-filters
    for ((bcj, dd) <- Seq((true, 0), (false, 4), (true, 2))) {
      val c = det(9000, 13)
      Xz.decode(Xz.encode(c, bcj = bcj, deltaDist = dd)) match {
        case Right(got) =>
          assert(java.util.Arrays.equals(got, c), s"bcj=$bcj dd=$dd")
        case Left(r) => fail(s"bcj=$bcj dd=$dd: $r")
      }
    }
  }

  test("LZMA-compressed stream fuzz: bit flips are typed errors, " +
    "never throws or oversized output") {
    val good = Xz.encode(("lorem ipsum dolor sit amet " * 400).getBytes)
    for (i <- 6 until good.length by 3) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x35).toByte
      Xz.decode(bad) match {
        case Left(reason) => assert(reason.nonEmpty, s"flip $i")
        case Right(out) => assert(out.length <= 60000)
      }
    }
  }

  test("FOREIGN verification: liblzma (via ctypes) decodes our " +
    "stored-chunk streams byte-exact") {
    val py = Seq("/usr/bin/python3", "/root/.pyenv/versions/3.11.7/bin/python3")
      .find(p => new java.io.File(p).exists())
    assume(py.nonEmpty, "python3 not present")
    val dir = java.nio.file.Files.createTempDirectory("graft_xz_enc")
    def put(name: String, b: Array[Byte]): Unit = {
      java.nio.file.Files.write(dir.resolve(name + ".bin"), b)
      java.nio.file.Files.write(dir.resolve(name + ".xz"), Xz.encodeStored(b))
      ()
    }
    put("empty", Array.emptyByteArray)
    put("tiny", "abc".getBytes)
    put("text", ("the quick brown fox " * 400).getBytes)
    put("multichunk", det(200000, 6))
    put("tar", ("ustar member content\u0000".getBytes ++ det(3000, 7)))
    // filtered writer shapes: liblzma must accept OUR filter-chain
    // headers and reverse OUR encode-side transforms
    def putF(name: String, b: Array[Byte], bcj: Boolean, dd: Int): Unit = {
      java.nio.file.Files.write(dir.resolve(name + ".bin"), b)
      java.nio.file.Files.write(dir.resolve(name + ".xz"),
        Xz.encodeStored(b, bcj = bcj, deltaDist = dd))
      ()
    }
    putF("bcjtar", det(8000, 9), bcj = true, dd = 0)
    putF("delta", det(8000, 10), bcj = false, dd = 4)
    putF("deltabcj", det(8000, 11), bcj = true, dd = 2)
    // LZMA-COMPRESSED writer shapes: liblzma must decode the real
    // encoder's output byte-exact (round-20 stretch)
    def putC(name: String, b: Array[Byte], bcj: Boolean, dd: Int): Unit = {
      java.nio.file.Files.write(dir.resolve(name + ".bin"), b)
      java.nio.file.Files.write(dir.resolve(name + ".xz"),
        Xz.encode(b, bcj = bcj, deltaDist = dd))
      ()
    }
    putC("lzma_text",
      ("the quick brown fox jumps over the lazy dog. " * 3000).getBytes,
      bcj = false, dd = 0)
    putC("lzma_zeros", new Array[Byte](150000), bcj = false, dd = 0)
    putC("lzma_binary", det(120000, 12), bcj = false, dd = 0) // stored fallback
    putC("lzma_mixed", det(20000, 5) ++ ("hello world " * 5000).getBytes ++
      det(20000, 6), bcj = false, dd = 0)
    putC("lzma_bcj", det(9000, 13), bcj = true, dd = 0)
    putC("lzma_delta", det(9000, 14), bcj = false, dd = 4)
    // >1 MiB long-range repeat (r20 ADVICE): a 64 KiB block recurs
    // ~1.3 MiB later, so the only hash-chain candidates sit PAST the
    // 1 MiB dict size the header declares — an uncapped match search
    // emits distances liblzma rejects as LZMA_DATA_ERROR while our
    // prop-as-hint decoder round-trips them. Foreign decode is the gate.
    putC("lzma_far", {
      def lines(seed: Int, n: Int) =
        (0 until n).map(i => s"line $seed-$i of the corpus\n").mkString.getBytes
      val a = lines(1, 2600) // ~64 KiB
      a ++ lines(2, 52000) ++ a // ~1.3 MiB between the copies
    }, bcj = false, dd = 0)
    val proc = new ProcessBuilder(py.get, "tools/verify_xz_encoder.py",
      dir.toString).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    assert(rc == 0 && out.contains("ALL OK"), s"foreign verify:\n$out")
  }

  test("stream padding: trailing and inter-stream zero padding is " +
    "legal in 4-byte units, anything else types out") {
    val a = fixture("tiny", "xz")
    val pad4 = a ++ Array[Byte](0, 0, 0, 0) ++ a
    assert(Xz.decode(pad4).exists(_.sameElements("abcabc".getBytes)))
    val pad2 = a ++ Array[Byte](0, 0)
    assert(Xz.decode(pad2).isLeft)
  }
}
