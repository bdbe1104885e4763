package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII scrub: detector-by-detector hand cases, the Luhn gate (valid
  * cards count + redact, invalid 16-digit runs survive untouched),
  * redaction exactness, and q130 invariants on real data.
  */
class PiiOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def scrub(text: String) = {
    import spark.implicits._
    PiiOps.piiScrub(Seq((1L, text)).toDF("doc_id", "text")).collect().head
  }

  test("every detector fires once on a kitchen-sink line; redaction is exact") {
    // 4111111111111111 is the canonical Luhn-valid test PAN
    val r = scrub("write to a.b+c@sub.example.org or 555-867-5309; " +
      "ssn 078-05-1120 host 192.168.001.1 pan 4111111111111111 done")
    assert(r.getAs[Long]("n_emails") == 1)
    assert(r.getAs[Long]("n_phones") == 1)
    assert(r.getAs[Long]("n_ssns") == 1)
    assert(r.getAs[Long]("n_ips") == 1)
    assert(r.getAs[Long]("n_cards_total") == 1)
    assert(r.getAs[Long]("n_cards_valid") == 1)
    assert(r.getAs[String]("redacted") ==
      "write to [EMAIL] or [PHONE]; ssn [SSN] host [IP] pan [CARD] done")
  }

  test("Luhn gate: an invalid 16-digit run counts as candidate but never redacts") {
    val r = scrub("numbers 4111111111111112 and 4111111111111111 here")
    assert(r.getAs[Long]("n_cards_total") == 2)
    assert(r.getAs[Long]("n_cards_valid") == 1)
    assert(r.getAs[String]("redacted") ==
      "numbers 4111111111111112 and [CARD] here")
  }

  test("shape discrimination: SSN is not a phone, 15/17-digit runs are not cards") {
    val r = scrub("a 123-45-6789 b 123-456-7890 c 123456789012345 d 12345678901234567")
    assert(r.getAs[Long]("n_ssns") == 1)
    assert(r.getAs[Long]("n_phones") == 1)
    assert(r.getAs[Long]("n_cards_total") == 0)
    assert(r.getAs[String]("redacted") ==
      "a [SSN] b [PHONE] c 123456789012345 d 12345678901234567")
  }

  test("clean text passes through byte-identical with zero counts") {
    val r = scrub("nothing sensitive in this perfectly ordinary sentence")
    for (c <- Seq("n_emails", "n_phones", "n_ssns", "n_ips", "n_cards_total",
      "n_cards_valid")) assert(r.getAs[Long](c) == 0, c)
    assert(r.getAs[String]("redacted") ==
      "nothing sensitive in this perfectly ordinary sentence")
  }

  test("redaction shares the counts' boundary semantics: an embedded valid " +
    "16-digit substring neither counts nor redacts") {
    // 20-digit run whose digits 3..18 are the Luhn-valid 4111111111111111:
    // \b-anchored counting sees no card — boundary-anchored redaction
    // must leave it untouched too (no partial [CARD] splice)
    val embedded = "99411111111111111199"
    val r = scrub(s"ref $embedded and a real pan 4111111111111111 end")
    assert(r.getAs[Long]("n_cards_total") == 1)
    assert(r.getAs[Long]("n_cards_valid") == 1)
    val red = r.getAs[String]("redacted")
    assert(red.contains(embedded),
      s"embedded digit run must survive untouched: $red")
    assert(red.contains("pan [CARD] end"), s"standalone pan must redact: $red")
    // repeats of the same valid pan all redact
    val r2 = scrub("a 4111111111111111 b 4111111111111111 c")
    assert(r2.getAs[String]("redacted") == "a [CARD] b [CARD] c")
  }

  test("q130 on sf0.001: planted counts follow the doc_id arithmetic; shas stable") {
    val rows = PiiOps.q130PiiScrub(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 2 == 0) 1 else 0), s"emails @$id")
      assert(r.getLong(2) == (if (id % 3 == 0) 1 else 0), s"phones @$id")
      assert(r.getLong(3) == (if (id % 5 == 0) 1 else 0), s"ssns @$id")
      assert(r.getLong(4) == (if (id % 4 == 0) 1 else 0), s"ips @$id")
      assert(r.getLong(5) == 1, s"card candidate @$id")
      assert(r.getLong(6) == (if (id % 2 == 0) 1 else 0), s"luhn @$id")
    }
  }
}
