package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Brotli decoder conformance: FOREIGN streams (encoded by the
  * reference libbrotlienc at qualities 0/1/5/9/11 and windows 18/22
  * over text, HTML, UTF-8, random, run, tiny, empty, and
  * dictionary-dense inputs) must decode byte-exactly — reference
  * conformance, not self-consistency. Plus the own-encoder round trip
  * and corruption/truncation fuzz (typed error, never a throw).
  */
class BrotliSpec extends AnyFunSuite {

  private def fixture(name: String): (Array[Byte], Array[Byte]) = {
    def read(suffix: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/brotli/fixture_$name.$suffix")
      assert(in != null, s"missing fixture $name.$suffix")
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    }
    (read("raw"), read("br"))
  }

  private val names = for {
    kind <- Seq("text", "html", "rand", "runs", "utf8", "tiny", "empty", "words")
    qw <- Seq("q0_w18", "q1_w22", "q5_w18", "q9_w22", "q11_w18", "q11_w22")
  } yield s"${kind}_$qw"

  test("48 foreign libbrotlienc streams decode byte-exactly") {
    var checked = 0
    for (nm <- names) {
      val (raw, br) = fixture(nm)
      Brotli.decode(br, maxOut = raw.length + 64) match {
        case Right(got) =>
          assert(got.length == raw.length, s"$nm: ${got.length} vs ${raw.length}")
          assert(java.util.Arrays.equals(got, raw), s"$nm: bytes differ")
          checked += 1
        case Left(reason) => fail(s"$nm: $reason")
      }
    }
    assert(checked == names.length)
  }

  test("the dictionary-dense fixture actually exercises the static " +
    "dictionary (it outgrows every window copy)") {
    val (raw, br) = fixture("words_q11_w22")
    // 499 unique bytes compressed to <200: only the static dictionary
    // can explain that on non-repeating text
    assert(raw.length > 3 * br.length, s"${raw.length} vs ${br.length}")
    assert(Brotli.decode(br, raw.length + 64).toOption.get.sameElements(raw))
  }

  test("own-encoder round trip: uncompressed meta-blocks") {
    for (n <- Seq(0, 1, 7, 255, 65536, 65537, 200000)) {
      val data = Array.tabulate[Byte](n)(i => ((i * 31 + 7) & 0xff).toByte)
      val enc = Brotli.encodeUncompressed(data)
      Brotli.decode(enc, n + 64) match {
        case Right(got) => assert(java.util.Arrays.equals(got, data), s"n=$n")
        case Left(r) => fail(s"n=$n: $r")
      }
    }
  }

  test("metadata meta-blocks skip cleanly (hand-assembled §9.2 form)") {
    // WBITS=16 ('0'), metadata block (ISLAST=0, MNIBBLES code 3,
    // reserved 0, MSKIPBYTES=1, MSKIPLEN=3 → skip MSKIPLEN+1 = 4
    // byte-aligned metadata bytes), then ISLAST+ISLASTEMPTY.
    // Pinned against libbrotlidec: BrotliDecoderDecompress accepts
    // exactly this 4-skip-byte form (rc=1, empty output) and REJECTS
    // the 3-skip-byte reading of the same header (rc=0).
    val stream = Array[Byte](0xAC.toByte, 0x01,
      0xAA.toByte, 0xBB.toByte, 0xCC.toByte, 0xDD.toByte, 0x03)
    assert(Brotli.decode(stream, 64).toOption.exists(_.isEmpty))
    // the MSKIPLEN-without-+1 mis-reading desyncs → typed error
    val wrong = Array[Byte](0xAC.toByte, 0x01,
      0xAA.toByte, 0xBB.toByte, 0xCC.toByte, 0x03)
    assert(Brotli.decode(wrong, 64).isLeft)
    // truncated inside the skipped bytes: typed
    assert(Brotli.decode(stream.take(4), 64).isLeft)
  }

  test("truncation fuzz: every prefix of every fixture is a typed " +
    "error or a clean decode, never a throw") {
    for (nm <- Seq("text_q5_w18", "words_q11_w22", "runs_q1_w22")) {
      val (raw, br) = fixture(nm)
      for (cut <- 0 until br.length by math.max(1, br.length / 97)) {
        Brotli.decode(br.take(cut), raw.length + 64) match {
          case Right(_) => // a prefix can be a complete stream only by luck
          case Left(reason) => assert(reason.nonEmpty)
        }
      }
    }
  }

  test("corruption fuzz: single-byte flips are typed errors or decodes, " +
    "never throws; the output cap is honored") {
    val (raw, br) = fixture("text_q9_w22")
    for (i <- 0 until br.length by math.max(1, br.length / 127); x <- Seq(0x01, 0x80)) {
      val bad = br.clone()
      bad(i) = (bad(i) ^ x).toByte
      Brotli.decode(bad, raw.length + 64) match {
        case Right(got) => assert(got.length <= raw.length + 64)
        case Left(reason) => assert(reason.nonEmpty)
      }
    }
    // bomb cap: the real stream against a tiny cap dies typed
    assert(Brotli.decode(br, maxOut = 16) == Left("output-cap"))
  }
}
