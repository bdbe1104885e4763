package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** bzip2 codec: the DECODER against foreign libbz2 fixtures
  * (byte-exact, `tools/gen_bzip2_fixtures.py`), the ENCODER against
  * foreign libbz2 decompression (ctypes harness run per-test), plus
  * cross round-trips, malformed-stream typing, and the bomb cap.
  */
class Bzip2Spec extends AnyFunSuite {

  private val res = "src/test/resources/bzip2"

  private def fixture(name: String, ext: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$res/fixture_$name.$ext"))

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

  private val fixtureNames = Seq("empty", "tiny", "text", "rle_runs",
    "allbytes", "zeros", "binary", "skewed", "multiblock", "multistream")

  test("FOREIGN fixtures: libbz2-compressed streams decode byte-exact " +
    "(RLE1 runs, RUNA/RUNB, full symbol map, multi-block, multistream)") {
    for (name <- fixtureNames) {
      val want = fixture(name, "bin")
      Bzip2.decode(fixture(name, "bz2")) match {
        case Right(got) =>
          assert(java.util.Arrays.equals(got, want), s"$name mismatch")
        case Left(r) => fail(s"$name: $r")
      }
    }
  }

  test("own round-trips: encode → decode across the shape matrix " +
    "(two independent implementations of the entropy stage)") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      "a".getBytes,
      "abcabcabcabc".getBytes,
      Array.fill[Byte](4)(9), // run of exactly 4 (count byte 0)
      Array.fill[Byte](259)(9), // max single RLE1 group
      Array.fill[Byte](260)(9), // group + fresh run of 1
      Array.fill[Byte](100000)(7),
      ("<page><title>X</title><text>word salad " * 500).getBytes,
      det(1000, 3),
      det(500000, 4), // multi-block (400k encoder blocks)
      (0 until 256).map(_.toByte).toArray)
    for (c <- cases) {
      Bzip2.decode(Bzip2.encode(c)) match {
        case Right(got) =>
          assert(java.util.Arrays.equals(got, c), s"len ${c.length}")
        case Left(r) => fail(s"len ${c.length}: $r")
      }
    }
  }

  test("FOREIGN verification: libbz2 (via ctypes) decompresses our " +
    "encoder's streams byte-exact") {
    val py = Seq("/usr/bin/python3", "/root/.pyenv/versions/3.11.7/bin/python3")
      .find(p => new java.io.File(p).exists())
    assume(py.nonEmpty, "python3 not present")
    val dir = java.nio.file.Files.createTempDirectory("graft_bzip2_enc")
    def put(name: String, b: Array[Byte]): Unit = {
      java.nio.file.Files.write(dir.resolve(name + ".bin"), b)
      java.nio.file.Files.write(dir.resolve(name + ".bz2"), Bzip2.encode(b))
      ()
    }
    put("empty", Array.emptyByteArray)
    put("tiny", "abc".getBytes)
    put("text", ("the quick brown fox " * 200).getBytes)
    put("runs", Array.fill[Byte](4)(1) ++ Array.fill[Byte](300)(2) ++
      "tail".getBytes)
    put("xml", ("<page><title>Article 7</title><text>{{cite}} body" +
      "</text></page>\n" * 300).getBytes)
    put("binary", det(60000, 5))
    put("multiblock", det(450000, 6))
    put("allbytes", (0 until 256).map(_.toByte).toArray)
    val proc = new ProcessBuilder(py.get, "tools/verify_bzip2_encoder.py",
      dir.toString).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    assert(rc == 0 && out.contains("ALL OK"), s"foreign verify:\n$out")
  }

  test("malformed streams are typed errors: CRC flips, truncation, " +
    "bad magics, the deprecated randomized bit") {
    val good = Bzip2.encode(("some block content " * 100).getBytes)
    assert(Bzip2.decode(Array.emptyByteArray) == Left("truncated") ||
      Bzip2.decode(Array.emptyByteArray).isLeft)
    assert(Bzip2.decode("BZx1234".getBytes).isLeft)
    for (cut <- Seq(3, 10, good.length / 2, good.length - 2))
      assert(Bzip2.decode(good.take(cut)).isLeft, s"cut $cut")
    for (i <- 4 until good.length by 7) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x10).toByte
      Bzip2.decode(bad) match {
        case Left(reason) => assert(reason.nonEmpty)
        case Right(out) => assert(out.length <= 4000) // lucky flip
      }
    }
    // randomized bit: flip it on (bit follows the 32-bit block CRC)
    val fx = fixture("text", "bz2").clone()
    // block magic starts at byte 4; CRC is bits 80..111; randomized is
    // bit 112 = byte 14 bit 0 (MSB)
    fx(14) = (fx(14) | 0x80).toByte
    assert(Bzip2.decode(fx) == Left("randomized-deprecated") ||
      Bzip2.decode(fx).isLeft)
  }

  test("bomb cap: zeros fixture under a small maxOut is refused, " +
    "never allocated through") {
    assert(Bzip2.decode(fixture("zeros", "bz2"), maxOut = 1000) ==
      Left("output-cap"))
  }

  test("cross check: our encoder's streams decode through our decoder " +
    "with the libbz2 fixtures' payloads (same bytes both ways)") {
    for (name <- fixtureNames) {
      val payload = fixture(name, "bin")
      val ours = Bzip2.encode(payload)
      assert(Bzip2.decode(ours).exists(java.util.Arrays.equals(_, payload)),
        name)
    }
  }
}
