package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subtitle extraction (SRT / WebVTT) — video transcripts are one of
  * the larger conversational-text sources a crawl yields (every video
  * platform exposes them), and they arrive in exactly two dominant
  * formats: SubRip (numbered cues, comma millisecond separator) and
  * WebVTT (the `WEBVTT` header, dot separator, optional cue ids,
  * NOTE blocks). A pipeline that can't read cue timing can't segment,
  * align, or dedup transcript text.
  *
  * Parse rules (pinned by spec + oracle):
  *   - cues split on blank lines; an optional leading numeric-id line
  *     is skipped (SRT always has one, VTT sometimes);
  *   - the timing line `HH:MM:SS,mmm --> HH:MM:SS,mmm` (comma OR dot)
  *     yields start/end milliseconds; a cue whose timing line doesn't
  *     parse drops alone (error-as-value);
  *   - VTT's `WEBVTT` header block and `NOTE` comment blocks drop;
  *   - inline styling tags (`<i>`, `<b>`, `<u>`, VTT `<c.class>`,
  *     `</c>`) strip from cue text; multi-line cue text joins with a
  *     newline.
  *
  * The q155 corpus builds each document's transcript from its words
  * (3-word cues on a 2500 ms grid with a per-doc phase, a styled
  * multi-byte marker cue last) — even ids as SRT, odd as WebVTT with
  * a NOTE decoy — and the oracle replays cue count, total cue time,
  * first start, and the text sha from pure (doc_id, text) arithmetic.
  *
  * Scale shape (100 TB): per-row text parse via `mapPartitions`, zero
  * shuffle before the output sort.
  */
object SubtitleOps {

  final case class Cue(start_ms: Long, end_ms: Long, text: String)

  final case class SubInfo(
      doc_id: Long, fmt: String, n_cues: Int, first_start_ms: Long,
      total_ms: Long, text: String)

  private val Timing =
    "(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3})\\s*-->\\s*(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3})".r

  // --------------------------------------------------------------- encode

  private def ts(ms: Long, sep: Char): String = {
    val h = ms / 3600000; val m = ms / 60000 % 60
    val s = ms / 1000 % 60; val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d$sep$f%03d"
  }

  /** 3-word cues (the q143 grouping shape) + the styled marker cue. */
  private[graft] def cuesOf(id: Long, text: String): Seq[String] = {
    val ws = text.split("[ \t\r\n]+").filter(_.nonEmpty)
    ws.grouped(3).map(_.mkString(" ")).toSeq :+ ("Sub № " + id)
  }

  private[graft] def startOf(id: Long, i: Int): Long = i * 2500L + (id % 7) * 100L

  /** Even ids: SRT (numbered cues, comma). Odd: WebVTT (header, NOTE
    * decoy, dot, unnumbered). The marker cue carries `<i>`/`<c.x>`
    * styling that must strip.
    */
  private[graft] def buildSubtitle(id: Long, text: String): String = {
    val cues = cuesOf(id, text)
    val vtt = id % 2 == 1
    val sep = if (vtt) '.' else ','
    val body = cues.zipWithIndex.map { case (cRaw, i) =>
      val c = escapeCue(cRaw)
      val styled =
        if (i == cues.length - 1)
          (if (vtt) "<c.loud>" + c + "</c>" else "<i>" + c + "</i>")
        else c
      val idLine = if (vtt) "" else (i + 1).toString + "\n"
      idLine + ts(startOf(id, i), sep) + " --> " +
        ts(startOf(id, i) + 2000L, sep) + "\n" + styled
    }.mkString("\n\n")
    if (vtt) "WEBVTT\n\nNOTE decoy comment " + id + "\n\n" + body + "\n"
    else body + "\n"
  }

  // ----------------------------------------------------------------- walk

  private def parseTs(h: String, m: String, s: String, f: String): Long =
    h.toLong * 3600000L + m.toLong * 60000L + s.toLong * 1000L + f.toLong

  private def stripTags(s: String): String =
    s.replaceAll("</?[ibuc](?:\\.[\\w.]+)?>", "")

  /** Writer-side escaping makes the round trip self-protecting (the
    * q159 QP discipline): a corpus word that LOOKS like a styling tag
    * (`<i>`, `</c>`) survives `stripTags` because the writer
    * entity-escaped it; the parser unescapes after stripping. `&`
    * first so the mapping stays bijective.
    */
  private[graft] def escapeCue(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;")
  private[graft] def unescapeCue(s: String): String =
    s.replace("&lt;", "<").replace("&amp;", "&")

  /** Blank-line cue split; header/NOTE blocks and unparseable cues
    * drop alone.
    */
  private[graft] def parseSubtitle(raw: String): (String, Seq[Cue]) = {
    val fmt = if (raw.startsWith("WEBVTT")) "vtt" else "srt"
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    raw.split("\r?\n\r?\n").foreach { block =>
      val lines = block.split("\r?\n").dropWhile(_.isEmpty)
      if (lines.nonEmpty && !lines.head.startsWith("WEBVTT") &&
          !lines.head.startsWith("NOTE")) {
        // optional numeric-id line before the timing line
        val tIdx = lines.indexWhere(l => Timing.findFirstIn(l).isDefined)
        if (tIdx >= 0 && (tIdx == 0 || (tIdx == 1 && lines(0).forall(_.isDigit)))) {
          Timing.findFirstMatchIn(lines(tIdx)).foreach { m =>
            val start = parseTs(m.group(1), m.group(2), m.group(3), m.group(4))
            val end = parseTs(m.group(5), m.group(6), m.group(7), m.group(8))
            val text =
              lines.drop(tIdx + 1).map(l => unescapeCue(stripTags(l)))
                .mkString("\n").trim
            if (end >= start && text.nonEmpty) out += Cue(start, end, text)
          }
        }
      }
    }
    (fmt, out.toSeq)
  }

  // ----------------------------------------------------------------- q155

  private[graft] def extract(id: Long, raw: String): SubInfo = {
    val (fmt, cues) = parseSubtitle(raw)
    SubInfo(id, fmt, cues.length,
      cues.headOption.map(_.start_ms).getOrElse(-1L),
      cues.map(c => c.end_ms - c.start_ms).sum,
      cues.map(_.text).mkString("\n"))
  }

  /** q155: subtitles end to end — build each document's SRT/WebVTT
    * transcript, parse it back with tags stripped and decoys dropped;
    * cue count, first start, total cue time, and the text sha replayed
    * by the oracle from (doc_id, text) word arithmetic.
    */
  def q155SubtitleExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => extract(id, buildSubtitle(id, t)) })
      .toDF()
      .select(col("doc_id"), col("fmt"),
        col("n_cues").cast("long").as("n_cues"),
        col("first_start_ms"), col("total_ms"),
        sha2(col("text"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
