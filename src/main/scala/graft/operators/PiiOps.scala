package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the cleaning stage every public
  * training-data pipeline runs (the C4/Gopher-era scrub): structured
  * identifiers are found by deterministic detectors, counted per
  * document, and REDACTED to typed placeholders. Detector family:
  *
  *   - email: `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`
  *   - NANP phone `\d{3}-\d{3}-\d{4}` and SSN `\d{3}-\d{2}-\d{4}`
  *     (disjoint shapes — middle-group widths differ)
  *   - IPv4 dotted quad
  *   - payment-card candidates: 16-digit runs VALIDATED by the Luhn
  *     checksum — the canonical example of a detector a regex alone
  *     cannot express: only Luhn-valid runs count as cards and only
  *     they redact (a random 16-digit number survives untouched).
  *
  * Everything is per-row codegen: regex extraction in the Java/RE2
  * common dialect; the Luhn sum is an integer fold over the digit
  * positions (double every second digit from the right, subtract 9
  * over 9 — arithmetic both engines replay exactly); redaction is a
  * regexp-replace chain plus a fold of exact replaces over the
  * Luhn-valid candidates. No UDF, no shuffle.
  */
object PiiOps {

  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private[graft] val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  private[graft] val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private[graft] val CardRe = "\\b\\d{16}\\b"

  /** Regex as a Spark-SQL single-quoted literal (the parser consumes one
    * level of backslashes).
    */
  private def rex(re: String) = re.replace("\\", "\\\\")

  /** Luhn validity of digit-string `c` as a SQL boolean expression:
    * Σ f(d_i) ≡ 0 (mod 10) with every second digit from the right
    * doubled and 9-folded.
    */
  private def luhnSql(c: String): String =
    s"aggregate(sequence(1, length($c)), 0L, (acc, i) -> acc + " +
      s"CASE WHEN (length($c) - i) % 2 = 1 THEN " +
      s"CASE WHEN 2 * (ascii(substr($c, i, 1)) - 48) > 9 " +
      s"THEN 2 * (ascii(substr($c, i, 1)) - 48) - 9 " +
      s"ELSE 2 * (ascii(substr($c, i, 1)) - 48) END " +
      s"ELSE ascii(substr($c, i, 1)) - 48 END) % 10 = 0"

  /** Detect + count + redact over `textCol`. Adds per-type counts and
    * `redacted` to `docs`.
    */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    def cnt(re: String): Column =
      expr(s"size(regexp_extract_all($textCol, '${rex(re)}', 0))").cast("long")
    val redactBase = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "[EMAIL]"),
          SsnRe, "[SSN]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")
    docs
      .withColumn("pii_cards_valid", expr(
        s"filter(regexp_extract_all($textCol, '${rex(CardRe)}', 0), " +
          s"c -> ${luhnSql("c")})"))
      .withColumn("n_emails", cnt(EmailRe))
      .withColumn("n_phones", cnt(PhoneRe))
      .withColumn("n_ssns", cnt(SsnRe))
      .withColumn("n_ips", cnt(Ipv4Re))
      .withColumn("n_cards_total", cnt(CardRe))
      .withColumn("n_cards_valid", size(col("pii_cards_valid")).cast("long"))
      .withColumn("pii_redact_base", redactBase)
      // boundary-anchored per-candidate redaction — the SAME \b match
      // semantics the counts use: a Luhn-valid 16-digit SUBSTRING of a
      // longer digit run is neither counted nor redacted (a bare
      // replace() would partially redact it while the count said zero)
      .withColumn("redacted", expr(
        "aggregate(pii_cards_valid, pii_redact_base, " +
          "(acc, c) -> regexp_replace(acc, concat('\\\\b', c, '\\\\b'), '[CARD]'))"))
      .drop("pii_cards_valid", "pii_redact_base")
  }

  /** Deterministic planted-PII corpus over `documents`: per doc_id
    * arithmetic, an email (id%2=0), a phone (id%3=0), an SSN (id%5=0),
    * an IPv4 (id%4=0), and ALWAYS one 16-digit card whose Luhn check
    * digit is CORRECT exactly when id%2=0 — so valid and invalid cards
    * interleave and the Luhn gate is hash-visible (a detector that
    * counts every 16-digit run, or redacts invalid ones, breaks the
    * counts and the redacted sha).
    */
  private[graft] def syntheticPii(docs: DataFrame): DataFrame = {
    val base15 = "repeat(lpad(cast(doc_id % 100000 AS string), 5, '0'), 3)"
    def fold(d: String) =
      s"CASE WHEN 2 * ($d) > 9 THEN 2 * ($d) - 9 ELSE 2 * ($d) END"
    val digit = s"ascii(substr($base15, j, 1)) - 48"
    val sBase = s"aggregate(sequence(1, 15), 0L, (acc, j) -> acc + " +
      s"CASE WHEN j % 2 = 1 THEN ${fold(digit)} ELSE $digit END)"
    val valid = s"(10 - $sBase % 10) % 10"
    val check = s"CASE WHEN doc_id % 2 = 0 THEN $valid ELSE ($valid + 5) % 10 END"
    docs.select(col("doc_id"), expr(
      "concat(text," +
        " CASE WHEN doc_id % 2 = 0 THEN concat(' contact user', cast(doc_id AS string), '@example.com') ELSE '' END," +
        " CASE WHEN doc_id % 3 = 0 THEN concat(' call 555-', lpad(cast(doc_id % 1000 AS string), 3, '0'), '-', lpad(cast(doc_id % 10000 AS string), 4, '0')) ELSE '' END," +
        " CASE WHEN doc_id % 5 = 0 THEN concat(' ssn ', lpad(cast(doc_id % 900 + 100 AS string), 3, '0'), '-', lpad(cast(doc_id % 89 + 10 AS string), 2, '0'), '-', lpad(cast(doc_id % 9000 + 1000 AS string), 4, '0')) ELSE '' END," +
        " CASE WHEN doc_id % 4 = 0 THEN concat(' ip 10.', cast(doc_id % 256 AS string), '.', cast((doc_id * 3) % 256 AS string), '.', cast((doc_id * 7) % 256 AS string)) ELSE '' END," +
        s" ' card ', $base15, cast($check AS string))").as("text"))
  }

  /** q130: the PII scrub over the planted corpus — per-type counts,
    * the Luhn-gated card counts, and the redacted-text sha, every
    * column replayed by the oracle (which rebuilds the same corpus and
    * the same redaction directly from doc_id arithmetic).
    */
  def q130PiiScrub(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    piiScrub(syntheticPii(graft.Tables.documents(spark, dir)))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ssns"),
        col("n_ips"), col("n_cards_total"), col("n_cards_valid"),
        sha2(col("redacted"), 256).as("redacted_sha"))
      .orderBy(col("doc_id"))
}
