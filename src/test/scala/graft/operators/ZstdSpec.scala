package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Zstd decoder conformance: FOREIGN streams (encoded by the reference
  * libzstd at levels 1/3/9/19 over nine input kinds, plus checksummed
  * and no-content-size variants) must decode byte-exactly — reference
  * conformance, not self-consistency. Plus corruption/truncation fuzz
  * (typed error, never a throw) and the bomb cap.
  */
class ZstdSpec extends AnyFunSuite {

  private def fixture(name: String): (Array[Byte], Array[Byte]) = {
    def read(suffix: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/zstd/fixture_$name.$suffix")
      assert(in != null, s"missing fixture $name.$suffix")
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    }
    (read("raw"), read("zst"))
  }

  private val names = (for {
    kind <- Seq("text", "html", "rand", "runs", "utf8", "words", "big",
      "tiny", "empty")
    lv <- Seq(1, 3, 9, 19)
  } yield s"${kind}_l$lv") ++ Seq("text_l3_ck", "text_l3_nosize")

  test("38 foreign libzstd streams decode byte-exactly (incl. the " +
    "multi-block, checksummed, and no-content-size variants)") {
    var checked = 0
    for (nm <- names) {
      val (raw, zst) = fixture(nm)
      Zstd.decode(zst, maxOut = raw.length + 64) match {
        case Right(got) =>
          assert(got.length == raw.length, s"$nm: ${got.length} vs ${raw.length}")
          assert(java.util.Arrays.equals(got, raw), s"$nm: bytes differ")
          checked += 1
        case Left(reason) => fail(s"$nm: $reason")
      }
    }
    assert(checked == names.length)
  }

  test("own-encoder round trip: raw blocks in a single-segment frame " +
    "(libzstd-accepted layout)") {
    for (n <- Seq(0, 1, 255, 256, 65536, 65537, 200000)) {
      val data = Array.tabulate[Byte](n)(i => ((i * 31 + 7) & 0xff).toByte)
      val enc = Zstd.encodeRaw(data)
      Zstd.decode(enc, n + 64) match {
        case Right(got) => assert(java.util.Arrays.equals(got, data), s"n=$n")
        case Left(r) => fail(s"n=$n: $r")
      }
    }
  }

  test("concatenated frames decode in order; a skippable frame between " +
    "them is skipped") {
    val a = "first frame body ".getBytes("UTF-8")
    val c = "second frame body".getBytes("UTF-8")
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, // 0x184D2A50 LE
      4, 0, 0, 0, 1, 2, 3, 4) // 4-byte payload
    val cat = Zstd.encodeRaw(a) ++ skip ++ Zstd.encodeRaw(c)
    assert(Zstd.decode(cat, 256) == Right(a ++ c) ||
      Zstd.decode(cat, 256).toOption.exists(_.sameElements(a ++ c)))
    // a truncated skippable frame is typed
    assert(Zstd.decode((Zstd.encodeRaw(a) ++ skip.take(10)), 256).isLeft)
    // a skippable frame declaring a 4 GB payload must type out, not
    // wrap the cursor
    val lie = Array[Byte](0x50, 0x2A, 0x4D, 0x18,
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    assert(Zstd.decode(Zstd.encodeRaw(a) ++ lie, 256) == Left("truncated"))
  }

  test("a flipped checksum is a typed checksum-mismatch") {
    val (raw, zst) = fixture("text_l3_ck")
    val bad = zst.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x01).toByte
    assert(Zstd.decode(bad, raw.length + 64) == Left("checksum-mismatch"))
  }

  test("truncation fuzz: every prefix is a typed error or a clean " +
    "decode, never a throw") {
    for (nm <- Seq("text_l3", "big_l19", "runs_l1")) {
      val (raw, zst) = fixture(nm)
      for (cut <- 0 until zst.length by math.max(1, zst.length / 97)) {
        Zstd.decode(zst.take(cut), raw.length + 64) match {
          case Right(_) =>
          case Left(reason) => assert(reason.nonEmpty)
        }
      }
    }
  }

  test("corruption fuzz: single-byte flips are typed errors or decodes, " +
    "never throws; the output cap is honored") {
    val (raw, zst) = fixture("text_l9")
    for (i <- 0 until zst.length by math.max(1, zst.length / 127);
         x <- Seq(0x01, 0x80)) {
      val bad = zst.clone()
      bad(i) = (bad(i) ^ x).toByte
      Zstd.decode(bad, raw.length + 64) match {
        case Right(got) => assert(got.length <= raw.length + 64)
        case Left(reason) => assert(reason.nonEmpty)
      }
    }
    assert(Zstd.decode(zst, maxOut = 16) == Left("output-cap"))
  }
}
