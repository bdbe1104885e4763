package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Subtitle parsing: SRT and VTT round trips, tag stripping, NOTE and
  * header decoys, malformed-cue drop, hostile inputs.
  */
class SubtitleOpsSpec extends AnyFunSuite {

  test("srt round trip: numbered cues, comma separator, marker styled") {
    val info = SubtitleOps.extract(4L,
      SubtitleOps.buildSubtitle(4L, "one two three four five six seven"))
    assert(info.fmt == "srt")
    assert(info.n_cues == 4) // 3 word-cues + marker
    assert(info.first_start_ms == (4 % 7) * 100L)
    assert(info.total_ms == 4 * 2000L)
    assert(info.text == "one two three\nfour five six\nseven\nSub № 4")
  }

  test("vtt round trip: header + NOTE decoy drop, dot separator, <c> strips") {
    val info = SubtitleOps.extract(7L,
      SubtitleOps.buildSubtitle(7L, "a b c d"))
    assert(info.fmt == "vtt")
    assert(info.n_cues == 3) // "a b c", "d", marker
    assert(info.text == "a b c\nd\nSub № 7")
    assert(!info.text.contains("decoy"))
    assert(!info.text.contains("<c"))
  }

  test("tag-lookalike corpus words survive the round trip (writer escapes)") {
    // A document containing literal <i>, </c>, & tokens: the writer
    // entity-escapes them so stripTags can't eat them on re-parse.
    val hostile = "<i> keep </c> me &amp; raw <c.loud> too"
    val info = SubtitleOps.extract(2L, SubtitleOps.buildSubtitle(2L, hostile))
    val words = hostile.split(" ").toSeq
    val expected = (words.grouped(3).map(_.mkString(" ")).toSeq :+ "Sub № 2")
      .mkString("\n")
    assert(info.text == expected)
  }

  test("timing arithmetic: hours/minutes/seconds/millis compose") {
    val raw = "1\n01:02:03,456 --> 01:02:05,456\nhello\n"
    val (_, cues) = SubtitleOps.parseSubtitle(raw)
    assert(cues.head.start_ms == 3723456L)
    assert(cues.head.end_ms == 3725456L)
  }

  test("malformed cues drop alone") {
    val raw = "1\n00:00:00,000 --> 00:00:02,000\ngood one\n\n" +
      "2\nnot a timing line\nlost\n\n" +
      "3\n00:00:05,000 --> 00:00:04,000\nend before start\n\n" +
      "4\n00:00:06,000 --> 00:00:08,000\nsurvives\n"
    val (_, cues) = SubtitleOps.parseSubtitle(raw)
    assert(cues.map(_.text) == Seq("good one", "survives"))
  }

  test("multi-line cue text joins with newline; empty never throws") {
    val raw = "1\n00:00:00,000 --> 00:00:02,000\nline one\nline two\n"
    assert(SubtitleOps.parseSubtitle(raw)._2.head.text == "line one\nline two")
    assert(SubtitleOps.parseSubtitle("")._2.isEmpty)
    assert(SubtitleOps.parseSubtitle("WEBVTT\n\nNOTE x\n")._2.isEmpty)
    assert(SubtitleOps.parseSubtitle("random text\nno cues here\n")._2.isEmpty)
  }
}
