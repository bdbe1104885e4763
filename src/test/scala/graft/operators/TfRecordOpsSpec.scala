package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TFRecord framing: masked-CRC32C known answers, round trip, the
  * two-tier CRC semantics (payload mismatch drops the record, length
  * mismatch ends the walk), truncation and bit-flip fuzz.
  */
class TfRecordOpsSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("crc32c known answer and mask arithmetic") {
    // public check value: CRC32C("123456789") = 0xE3069283
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes(utf8))
    assert(c.getValue == 0xe3069283L)
    // mask = rotr(crc,15) + 0xa282ead8 (mod 2^32), and it round-trips
    val m = TfRecordOps.mask(0xe3069283L)
    assert(m == ((((0xe3069283L >>> 15) | (0xe3069283L << 17)) + 0xa282ead8L) & 0xffffffffL))
  }

  test("round trip: multi-record shard walks back exactly") {
    val recs = Seq("first", "second record", "naïve № three", "")
      .map(_.getBytes(utf8))
    val (st, corrupt, out) = TfRecordOps.parseShard(TfRecordOps.buildShard(recs))
    assert(st == "ok")
    assert(corrupt == 0)
    assert(out.map(new String(_, utf8)) == Seq("first", "second record", "naïve № three", ""))
  }

  test("doc shard arithmetic matches the oracle replay") {
    val info = TfRecordOps.extractShard(5L,
      TfRecordOps.buildDocShard(5L, "a b c d e f g"))
    // k = 2 + 5%3 = 4 parts + marker
    assert(info.status == "ok")
    assert(info.n_records == 5)
    assert(info.text == "a e\nb f\nc g\nd\nTFR № 5")
    assert(info.n_bytes == "a e".length + "b f".length + "c g".length +
      "d".length + TfRecordOps.markerText(5L).getBytes(utf8).length)
  }

  test("payload-crc mismatch drops that record; walk continues") {
    val shard = TfRecordOps.buildShard(
      Seq("alpha", "beta", "gamma").map(_.getBytes(utf8)))
    // flip a byte inside "beta"'s payload (record 2 data starts at 12+5+4+12)
    val bad = shard.clone()
    val betaOff = 12 + 5 + 4 + 12
    bad(betaOff) = 'X'.toByte
    val (st, corrupt, out) = TfRecordOps.parseShard(bad)
    assert(st == "ok")
    assert(corrupt == 1)
    assert(out.map(new String(_, utf8)) == Seq("alpha", "gamma"))
  }

  test("length-crc mismatch ends the walk with prior records kept") {
    val shard = TfRecordOps.buildShard(
      Seq("alpha", "beta").map(_.getBytes(utf8)))
    val bad = shard.clone()
    bad(12 + 5 + 4) = (bad(12 + 5 + 4) ^ 0x01).toByte // record 2's length field
    val (st, _, out) = TfRecordOps.parseShard(bad)
    assert(st == "bad-length-crc")
    assert(out.map(new String(_, utf8)) == Seq("alpha"))
  }

  test("truncation fuzz: every byte prefix never throws; full shard is ok") {
    val full = TfRecordOps.buildDocShard(3L, "words for the fuzz corpus")
    val (_, _, all) = TfRecordOps.parseShard(full)
    var p = 0
    while (p <= full.length) {
      val (st, _, recs) = TfRecordOps.parseShard(java.util.Arrays.copyOfRange(full, 0, p))
      if (p == full.length) { assert(st == "ok"); assert(recs.length == all.length) }
      // a cut exactly on a record boundary is a legitimately shorter
      // shard (no trailer exists to distinguish); mid-record cuts are
      // truncated — either way the walk never throws
      else assert(st != "ok" || recs.length < all.length)
      p += 1
    }
  }

  test("bit-flip fuzz: every single-byte corruption is a value, never a throw") {
    val full = TfRecordOps.buildDocShard(4L, "flip all of me")
    for (i <- full.indices) {
      val bad = full.clone()
      bad(i) = (bad(i) ^ 0x80).toByte
      TfRecordOps.parseShard(bad)
    }
  }
}
