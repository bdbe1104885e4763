package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** EML/MIME parsing: round trip, header unfolding, encoded-word
  * subjects, QP and base64 decodes, boundary lookalike immunity,
  * part selection, dead letters, hostile inputs.
  */
class EmailOpsSpec extends AnyFunSuite {

  private def roundTrip(id: Long, text: String) =
    EmailOps.parseEml(id, EmailOps.buildEml(id, text))

  test("round trip: both subject forms decode to the same arithmetic") {
    for (id <- Seq(4L, 7L)) {
      val out = roundTrip(id, "hello world body text")
      assert(out.status == "ok")
      assert(out.subject == EmailOps.subjectOf(id))
      assert(out.from_name == "Sender " + (id % 20))
      assert(out.n_parts == 2)
      assert(out.text.startsWith("hello world body text café № " + id))
      assert(out.text.endsWith("--b" + id + " look\r\nend " + id))
      assert(!out.text.contains("HTML alternative"), "html part must be ignored")
    }
  }

  test("quoted-printable: soft breaks vanish, =XX bytes decode, '=' round-trips") {
    val s = "equals = sign, naïve café № ünïcode, and a long run " + "x" * 200
    assert(EmailOps.qpDecode(EmailOps.qpEncode(s)) == s)
    // every wire line respects the length cap
    EmailOps.qpEncode(s).split("\r\n").foreach(l => assert(l.length <= 73))
    assert(EmailOps.qpDecode("a=3Db") == "a=b")
    assert(EmailOps.qpDecode("a=\r\nb") == "ab")
    assert(EmailOps.qpDecode("broken =Z tail =") == "broken =Z tail =") // literals
  }

  test("rfc 2047 encoded words: B and Q forms, malformed stays literal") {
    assert(EmailOps.decodeWords("=?UTF-8?B?UmU6IOKEliA3?=") == "Re: № 7")
    assert(EmailOps.decodeWords("=?utf-8?q?a_b=43?=") == "a bC")
    assert(EmailOps.decodeWords("plain stays") == "plain stays")
    assert(EmailOps.decodeWords("=?UTF-8?B?!!!not-base64!!!?=") ==
      "=?UTF-8?B?!!!not-base64!!!?=")
  }

  test("folded headers unfold; first occurrence wins") {
    val h = EmailOps.parseHeaders(
      "To: a@x,\r\n b@x\r\nSubject: one\r\nSubject: two")
    assert(h("to") == "a@x, b@x")
    assert(h("subject") == "one")
  }

  test("RFC 5322 unfolding keeps the WSP run (tab / multi-space folds)") {
    val h = EmailOps.parseHeaders(
      "Subject: a\r\n\tb\r\nX-K: c\r\n   d")
    assert(h("subject") == "a\tb")
    assert(h("x-k") == "c   d")
  }

  test("boundary lookalike inside a part never splits it") {
    val out = roundTrip(3L, "short")
    // the planted lookalike tail survived INSIDE the text part
    assert(out.text.contains("--b3 look"))
    assert(out.n_parts == 2)
  }

  test("dead letters: unknown encoding, corrupt base64, missing text part") {
    val base = EmailOps.buildEml(2L, "x")
    val badEnc = base.replace("Content-Transfer-Encoding: quoted-printable",
      "Content-Transfer-Encoding: uuencode")
    assert(EmailOps.parseEml(2L, badEnc).status == "bad-encoding")
    val noPlain = base.replace("Content-Type: text/plain; charset=utf-8",
      "Content-Type: text/x-other")
    assert(EmailOps.parseEml(2L, noPlain).status == "no-text-part")
    assert(EmailOps.parseEml(2L, "no blank line anywhere").status == "no-body")
    // a non-multipart empty body is a VALID empty message…
    assert(EmailOps.parseEml(2L, "A: b\r\n\r\n").status == "ok")
    // …but a multipart envelope with no delimited parts is not
    assert(EmailOps.parseEml(2L, "Content-Type: multipart/alternative; " +
      "boundary=\"z\"\r\n\r\n").status == "no-parts")
  }

  test("mbox: quoting round-trips, splits only on unquoted From lines") {
    val msgs = Seq(
      (5L, "first body\nFrom here a trap\n>From pre-quoted"),
      (6L, "second"))
    val parsed = EmailOps.parseMbox(EmailOps.buildMbox(msgs))
    assert(parsed.map(_.doc_id) == Seq(5L, 6L))
    assert(parsed.head.body == EmailOps.mboxBody(5L, msgs.head._2))
    assert(parsed.head.from_env == "s5@example.test")
    assert(parsed.head.subject == "msg 5")
    assert(parsed(1).body == EmailOps.mboxBody(6L, "second"))
    // mboxrd: one '>' added and removed, pre-quoted lines preserved
    assert(EmailOps.mboxUnquote(EmailOps.mboxQuote(">From x\nFrom y\n>>From z"))
      == ">From x\nFrom y\n>>From z")
    assert(EmailOps.mboxQuote("From y") == ">From y")
  }

  test("mbox: a message without the id header drops alone") {
    val good = EmailOps.buildMbox(Seq((1L, "kept")))
    val anon = "From anon@x Thu Jan  1 00:00:00 2026\nSubject: no id\n\nlost\n\n"
    val parsed = EmailOps.parseMbox(good + anon + EmailOps.buildMbox(Seq((2L, "also"))))
    assert(parsed.map(_.doc_id) == Seq(1L, 2L))
  }

  test("hostile inputs never throw") {
    for (junk <- Seq("", "\r\n\r\n", "Content-Type: multipart/alternative; " +
        "boundary=\"b\"\r\n\r\n--b\r\nbroken", "=?UTF-8?B??=" * 50))
      EmailOps.parseEml(1L, junk)
  }
}
