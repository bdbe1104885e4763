package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property round trips for the session-2 codecs: random content
  * through each writer/reader pair must come back byte- or
  * text-identical — the deterministic fuzz suites pin specific
  * failure modes; these pin the general contract.
  */
class SessionRoundTripPropertySpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  // printable-ish text plus hostile characters the formats must carry
  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    (8, Gen.alphaNumChar),
    (2, Gen.oneOf(' ', '.', '=', '"', '&', '<', '>', '\n', '\t')),
    (1, Gen.oneOf('№', 'é', '漢', 'д')))).map(_.mkString)

  test("quoted-printable: decode(encode(s)) == s for arbitrary text") {
    check(Prop.forAll(textGen) { s =>
      EmailOps.qpDecode(EmailOps.qpEncode(s)) == s
    })
  }

  test("mboxrd: unquote(quote(s)) == s, including pre-quoted From lines") {
    val lineGen = Gen.oneOf(
      textGen,
      textGen.map("From " + _),
      textGen.map(">From " + _),
      textGen.map(">>From " + _))
    check(Prop.forAll(Gen.listOf(lineGen).map(_.mkString("\n"))) { s =>
      EmailOps.mboxUnquote(EmailOps.mboxQuote(s)) == s
    })
  }

  test("tfrecord: parse(build(records)) == records for arbitrary payloads") {
    val recGen = Gen.listOf(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray))
    check(Prop.forAll(recGen) { recs =>
      val (st, corrupt, out) = TfRecordOps.parseShard(TfRecordOps.buildShard(recs))
      st == "ok" && corrupt == 0 &&
        out.map(_.toSeq) == recs.map(_.toSeq)
    })
  }

  test("tar: members round-trip names and bytes through both containers") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(40))
    val memberGen = for {
      n <- nameGen
      deep <- Gen.oneOf(true, false)
      data <- Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    } yield ((if (deep) TarOps.DeepDir + "/" else "") + n, '0', data)
    check(Prop.forAll(Gen.listOf(memberGen), Gen.oneOf(true, false)) { (ms0, gz) =>
      // unique names keep the comparison well-defined
      val ms = ms0.distinctBy(_._1)
      val tar = TarOps.buildTar(ms)
      val bytes = if (gz) WarcOps.gzipBytes(tar) else tar
      val (_, st, out) = TarOps.parseTarAuto(bytes)
      st == "ok" && out.map(m => (m.name, m.data.toSeq)) ==
        ms.map(m => (m._1, m._3.toSeq))
    })
  }

  test("wet: records round-trip through the gzip-member layout") {
    val recGen = Gen.listOf(for {
      id <- Gen.chooseNum(0L, 1000000L)
      t <- textGen
    } yield (id, "u" + id, t))
    check(Prop.forAll(recGen) { recs =>
      val out = WetOps.parseWetAuto(WetOps.buildWet(recs))
      out.map(r => (r.doc_id, r.url, r.text)) == recs
    })
  }

  test("unidiff: apply(render(old, new)) reconstructs new for arbitrary edits") {
    val fileGen = Gen.listOf(Gen.listOf(Gen.alphaNumChar).map(_.mkString))
      .map(_.toVector)
    check(Prop.forAll(fileGen, fileGen) { (old, neu) =>
      val out = UnidiffOps.applyUnified(1L, old,
        UnidiffOps.renderUnified(old, neu))
      out.status == "ok" && out.new_text == neu.mkString("\n")
    })
  }
}
