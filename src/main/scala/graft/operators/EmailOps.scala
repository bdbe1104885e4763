package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Email (RFC 5322 + MIME) extraction — mailing-list archives are a
  * classic conversational-text corpus (decades of threaded technical
  * discussion), and they arrive as EML/mbox: folded headers, RFC 2047
  * encoded-word subjects, multipart/alternative bodies where the
  * text/plain part is the one a text pipeline wants, and
  * quoted-printable / base64 transfer encodings around it.
  *
  * Parse rules (each pinned by spec + oracle):
  *   - header section ends at the first blank line; FOLDED headers
  *     (continuation lines starting with space/tab) unfold with a
  *     single space (the corpus folds `To:` on every message);
  *   - RFC 2047 encoded-words in Subject decode (`=?UTF-8?B?…?=`
  *     base64 and `=?UTF-8?Q?…?=` quoted-printable-ish with `_` as
  *     space); malformed words stay literal;
  *   - multipart bodies split on the `boundary` parameter's
  *     `--boundary` lines (never on content — the corpus plants a
  *     lookalike line inside a part); the FIRST `text/plain` part is
  *     selected, the `text/html` alternative ignored;
  *   - `Content-Transfer-Encoding` decodes: quoted-printable (`=XX`
  *     hex bytes, soft `=\n` line breaks, UTF-8 re-decode) and base64;
  *     7bit/8bit pass through; an unknown encoding dead-letters the
  *     message, not the walk.
  *
  * The q159 corpus builds one multipart message per document — body =
  * the document's text plus a non-ASCII marker, quoted-printable with
  * soft breaks at 72 so EVERY message exercises the soft-break path;
  * subject plain ASCII on even ids and an encoded-word on odd, both
  * decoding to arithmetic the oracle replays; the date is the q149
  * RFC 822 form with its weekday skipped.
  *
  * Scale shape (100 TB): per-row text walk via `mapPartitions`, zero
  * shuffle before the output sort.
  */
object EmailOps {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  final case class EmlInfo(
      doc_id: Long, status: String, subject: String, from_name: String,
      sent_day: Long, n_parts: Int, text: String)

  // --------------------------------------------------------------- encode

  /** Quoted-printable: `=XX` for non-printables, '=', and non-ASCII
    * bytes; soft breaks keep wire lines ≤ 72 + the trailing `=`.
    */
  private[graft] def qpEncode(s: String): String = {
    val out = new java.lang.StringBuilder
    var lineLen = 0
    s.getBytes(Utf8).foreach { b =>
      val v = b & 0xff
      val tok =
        if (v == '='.toInt || v < 32 || v > 126) f"=$v%02X"
        else v.toChar.toString
      if (lineLen + tok.length > 72) { out.append("=\r\n"); lineLen = 0 }
      out.append(tok)
      lineLen += tok.length
    }
    out.toString
  }

  private[graft] def markerBody(id: Long, text: String): String =
    text + " café № " + id

  private[graft] def subjectOf(id: Long): String =
    if (id % 2 == 0) "Re: msg " + id else "Re: № " + id

  /** One multipart/alternative message per document. */
  private[graft] def buildEml(id: Long, text: String): String = {
    val b = "b" + id
    val subjRaw = subjectOf(id)
    val subj =
      if (id % 2 == 0) subjRaw
      else "=?UTF-8?B?" + java.util.Base64.getEncoder.encodeToString(
        subjRaw.getBytes(Utf8)) + "?="
    val (mm, dd, hh) = ((1 + id % 12).toInt, (1 + id % 28).toInt, (id % 24).toInt)
    val wd = java.time.LocalDate.of(2026, mm, dd).getDayOfWeek.getDisplayName(
      java.time.format.TextStyle.SHORT, java.util.Locale.US)
    val months = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
    val html = java.util.Base64.getMimeEncoder.encodeToString(
      ("<p>HTML alternative " + id + "</p>").getBytes(Utf8))
    "From: \"Sender " + (id % 20) + "\" <s" + (id % 20) + "@example.test>\r\n" +
      "To: list@example.test,\r\n other-list@example.test\r\n" + // folded
      "Subject: " + subj + "\r\n" +
      f"Date: $wd, $dd%02d ${months(mm - 1)} 2026 $hh%02d:00:00 GMT\r\n" +
      "Message-ID: <m" + id + "@example.test>\r\n" +
      "MIME-Version: 1.0\r\n" +
      "Content-Type: multipart/alternative; boundary=\"" + b + "\"\r\n\r\n" +
      "--" + b + "\r\n" +
      "Content-Type: text/plain; charset=utf-8\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
      // the hard-CRLF lines after the QP text put a boundary LOOKALIKE
      // at wire line start — a delimiter regex without the EOL
      // requirement splits the part here and loses the tail
      qpEncode(markerBody(id, text)) +
      "\r\n--" + b + " look\r\nend " + id +
      "\r\n--" + b + "\r\n" +
      "Content-Type: text/html\r\n" +
      "Content-Transfer-Encoding: base64\r\n\r\n" +
      html + "\r\n--" + b + "--\r\n"
  }

  // ----------------------------------------------------------------- walk

  /** Unfolded `name -> value` headers (first occurrence wins). */
  private[graft] def parseHeaders(block: String): Map[String, String] = {
    // RFC 5322 §2.2.3 unfolding removes ONLY the CRLF and keeps the
    // leading WSP run (tab- or multi-space folds stay intact).
    val unfolded = block.replaceAll("\r?\n(?=[ \t])", "")
    unfolded.split("\r?\n").foldLeft(Map.empty[String, String]) { (m, line) =>
      val c = line.indexOf(':')
      if (c <= 0) m
      else {
        val k = line.substring(0, c).trim.toLowerCase
        if (m.contains(k)) m else m + (k -> line.substring(c + 1).trim)
      }
    }
  }

  private[graft] def qpDecode(s: String): String = {
    val soft = s.replaceAll("=\r?\n", "")
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < soft.length) {
      val c = soft.charAt(i)
      if (c == '=' && i + 3 <= soft.length) {
        try {
          bos.write(Integer.parseInt(soft.substring(i + 1, i + 3), 16))
          i += 3
        } catch {
          case _: NumberFormatException => bos.write(c.toInt); i += 1
        }
      } else { bos.write(c.toInt & 0xff); i += 1 }
    }
    new String(bos.toByteArray, Utf8)
  }

  /** RFC 2047 encoded-words; malformed words stay literal. */
  private[graft] def decodeWords(s: String): String =
    "=\\?[Uu][Tt][Ff]-8\\?([BbQq])\\?([^?]*)\\?=".r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        try {
          if (m.group(1).equalsIgnoreCase("B"))
            new String(java.util.Base64.getMimeDecoder.decode(m.group(2)), Utf8)
          else qpDecode(m.group(2).replace('_', ' '))
        } catch { case _: IllegalArgumentException => m.matched }))

  private[graft] def parseEml(docId: Long, raw: String): EmlInfo = {
    def dead(status: String) = EmlInfo(docId, status, "", "", -1L, 0, "")
    val headerEnd = raw.indexOf("\r\n\r\n")
    if (headerEnd < 0) return dead("no-body")
    val headers = parseHeaders(raw.substring(0, headerEnd))
    val body = raw.substring(headerEnd + 4)
    val subject = decodeWords(headers.getOrElse("subject", ""))
    val fromName = "\"([^\"]*)\"".r.findFirstMatchIn(headers.getOrElse("from", ""))
      .map(_.group(1)).getOrElse("")
    val sentDay = headers.get("date").map(FeedOps.rfc822).map(_._1).getOrElse(-1L)
    val ct = headers.getOrElse("content-type", "text/plain")
    val boundary = "boundary=\"([^\"]+)\"".r.findFirstMatchIn(ct).map(_.group(1))
    val parts: Seq[(Map[String, String], String)] = boundary match {
      case None => Seq((Map("content-type" -> ct), body))
      case Some(b) =>
        // split on boundary LINES only: `--boundary` (or the `--`-closed
        // final form) + optional WSP + EOL-or-end — a content line that
        // merely STARTS with the boundary (the planted lookalike) does
        // not split
        body.split("(?m)^--" + java.util.regex.Pattern.quote(b) +
          "(--)?[ \t]*(\r?\n|$)")
          .toSeq.drop(1).filter(_.nonEmpty)
          .flatMap { part =>
            val he = part.indexOf("\r\n\r\n")
            if (he < 0) None
            else Some((parseHeaders(part.substring(0, he)),
              part.substring(he + 4).stripSuffix("\r\n")))
          }
    }
    if (parts.isEmpty) return dead("no-parts")
    parts.find(_._1.getOrElse("content-type", "").startsWith("text/plain")) match {
      case None => dead("no-text-part")
      case Some((ph, pbody)) =>
        val enc = ph.getOrElse("content-transfer-encoding", "7bit").toLowerCase
        val text = enc match {
          case "quoted-printable" => qpDecode(pbody)
          case "base64" =>
            try new String(
              java.util.Base64.getMimeDecoder.decode(pbody.trim), Utf8)
            catch { case _: IllegalArgumentException => return dead("bad-base64") }
          case "7bit" | "8bit" | "binary" => pbody
          case _ => return dead("bad-encoding")
        }
        EmlInfo(docId, "ok", subject, fromName, sentDay, parts.length, text)
    }
  }

  // ----------------------------------------------------------------- q159

  // ------------------------------------------------------------------ mbox

  /** mboxrd quoting: one `>` prepended to any `^>*From ` line, so the
    * transformation round-trips ALL content (mboxo's quote-only-`From `
    * corrupts pre-quoted lines — the known wart mboxrd fixes).
    */
  private[graft] def mboxQuote(body: String): String =
    body.split("\n", -1).map { l =>
      if (l.matches("^>*From .*")) ">" + l else l
    }.mkString("\n")

  private[graft] def mboxUnquote(body: String): String =
    body.split("\n", -1).map { l =>
      if (l.matches("^>+From .*")) l.substring(1) else l
    }.mkString("\n")

  private[graft] def mboxBody(id: Long, text: String): String =
    text + "\nFrom here on " + id

  /** One mbox file per group: singlepart 7bit messages whose bodies
    * CONTAIN `From `-leading lines (the quoting exercise), `\n` line
    * endings, a blank line closing each message.
    */
  private[graft] def buildMbox(msgs: Seq[(Long, String)]): String =
    msgs.map { case (id, text) =>
      "From s" + (id % 20) + "@example.test Thu Jan  1 00:00:00 2026\n" +
        "X-Doc-Id: " + id + "\n" +
        "Subject: msg " + id + "\n\n" +
        mboxQuote(mboxBody(id, text)) + "\n\n"
    }.mkString

  final case class MboxMsg(
      doc_id: Long, from_env: String, subject: String, n_lines: Int,
      body: String)

  /** Split on UNQUOTED `From ` envelope lines, unquote bodies, drop
    * the message-closing blank line; a message without the planted id
    * header drops alone.
    */
  private[graft] def parseMbox(raw: String): Seq[MboxMsg] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[MboxMsg]
    val lines = raw.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      if (lines(i).startsWith("From ")) {
        val fromEnv = lines(i).substring(5).takeWhile(_ != ' ')
        i += 1
        var docId = -1L
        var subject = ""
        while (i < lines.length && lines(i).nonEmpty) {
          val c = lines(i).indexOf(':')
          if (c > 0) {
            val k = lines(i).substring(0, c).toLowerCase
            val v = lines(i).substring(c + 1).trim
            if (k == "x-doc-id") docId = v.toLongOption.getOrElse(-1L)
            else if (k == "subject") subject = v
          }
          i += 1
        }
        if (i < lines.length) i += 1 // the blank line after headers
        val body = scala.collection.mutable.ArrayBuffer.empty[String]
        while (i < lines.length && !lines(i).startsWith("From ")) {
          body += lines(i)
          i += 1
        }
        // writer closes each message with a blank line (+ the final
        // split artifact at EOF)
        while (body.nonEmpty && body.last.isEmpty) body.remove(body.length - 1)
        val text = mboxUnquote(body.mkString("\n"))
        if (docId >= 0)
          out += MboxMsg(docId, fromEnv, subject, body.length, text)
      } else i += 1
    }
    out.toSeq
  }

  /** q164: the mbox container end to end — group documents into 8 mbox
    * files (messages in doc order), bodies carrying `From `-leading
    * lines the writer must quote and the reader must unquote (mboxrd);
    * sender, subject, line count, and the body sha replayed by the
    * oracle from (doc_id, text) arithmetic.
    */
  def q164MboxExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select((col("doc_id") % 8).as("gid"),
        struct(col("doc_id"), col("text")).as("s"))
      .groupBy(col("gid"))
      .agg(array_sort(collect_list(col("s"))).as("msgs"))
      .as[(Long, Seq[(Long, String)])]
      .mapPartitions(_.flatMap { case (_, msgs) => parseMbox(buildMbox(msgs)) })
      .toDF()
      .select(col("doc_id"), col("from_env"), col("subject"),
        col("n_lines").cast("long").as("n_lines"),
        sha2(col("body"), 256).as("body_sha"))
      .orderBy(col("doc_id"))
  }

  /** q159: EML end to end — build each document's multipart message,
    * parse it back (unfold, encoded words, boundary walk, QP decode);
    * subject, sender, epoch day, part count, and the body sha replayed
    * by the oracle from (doc_id, text) arithmetic.
    */
  def q159EmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => parseEml(id, buildEml(id, t)) })
      .toDF()
      .select(col("doc_id"), col("status"), col("subject"), col("from_name"),
        col("sent_day"),
        col("n_parts").cast("long").as("n_parts"),
        sha2(col("text"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
