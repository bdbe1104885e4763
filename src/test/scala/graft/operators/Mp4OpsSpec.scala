package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MP4 / ISO-BMFF walk: encode→decode round trip, box skipping,
  * dead-letter reasons (truncation, lying sizes/offsets), truncation
  * fuzz, and the opaque-sample feed into the q133 signature machinery.
  */
class Mp4OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("round trip: sample tables resolve every sample byte-exactly") {
    val id = 42L
    val out = Mp4Ops.extractMp4(id, Mp4Ops.buildMp4(id))
    assert(out.status == "ok")
    assert(out.n_tracks == 1 && out.handler == "vide")
    assert(out.n_samples == Mp4Ops.sampleCount(id))
    assert(out.n_chunks == 2)
    val expect = (0 until Mp4Ops.sampleCount(id))
      .flatMap(i => Mp4Ops.sampleBytes(id, i).toSeq)
    assert(out.payload.toSeq == expect, "payload must re-assemble exactly")
    assert(out.sum_sizes == expect.length.toLong)
    assert(out.duration == Mp4Ops.sampleCount(id) * 100L)
    // odd ids write co64 (64-bit offsets): same samples, same walk
    val odd = 43L
    val wide = Mp4Ops.extractMp4(odd, Mp4Ops.buildMp4(odd))
    assert(new String(Mp4Ops.buildMp4(odd),
      java.nio.charset.StandardCharsets.ISO_8859_1).contains("co64"))
    assert(wide.status == "ok")
    assert(wide.payload.toSeq == (0 until Mp4Ops.sampleCount(odd))
      .flatMap(i => Mp4Ops.sampleBytes(odd, i).toSeq))
  }

  test("unknown boxes skip by size; trailing junk is ignored") {
    val good = Mp4Ops.buildMp4(7L)
    // a well-formed unknown box appended after mdat
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes ++ Array[Byte](1, 2, 3, 4)
    assert(Mp4Ops.extractMp4(7L, good ++ free).status == "ok")
    // garbage tail that is not even a box header: the box walk ends at
    // the lie, moov/mdat already parsed
    assert(Mp4Ops.extractMp4(7L, good ++ Array[Byte](9, 9)).status == "ok")
  }

  test("dead letters: not-mp4, no-moov, lying stsz, truncation fuzz never throws") {
    assert(Mp4Ops.extractMp4(1L, "random".getBytes).status == "not-mp4")
    assert(Mp4Ops.extractMp4(1L, Array.empty[Byte]).status == "not-mp4")
    val good = Mp4Ops.buildMp4(13L)
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    // lying stsz: blow up the first sample size so offsets overrun
    val szOff = s.indexOf("stsz") + 4 + 8 // version/flags + uniform(0) + count
    val lie = good.clone()
    lie(szOff + 4) = 0x7f // first size entry high byte
    assert(Mp4Ops.extractMp4(13L, lie).status == "bad-sample-table")
    val statuses = Set("ok", "not-mp4", "no-moov", "no-trak", "bad-sample-table", "payload-bomb")
    for (cut <- 0 to good.length by 5) {
      val r = Mp4Ops.extractMp4(13L, good.take(cut))
      assert(statuses.contains(r.status), s"cut=$cut gave ${r.status}")
    }
    assert(Mp4Ops.extractMp4(13L, good).status == "ok")
  }

  test("opaque samples feed the q133 shingle machinery: shared prefixes pair") {
    import spark.implicits._
    // two containers sharing their first 4 samples (the planted intro),
    // diverging after — the content-ID wiring without any codec
    def mk(tailSeed: Int) = Mp4Ops.buildMp4From(
      (0 until 6).map { i =>
        if (i < 4) Array.tabulate(20)(j => ((i * 31 + j) % 256).toByte)
        else Array.tabulate(20)(j => ((tailSeed * 97 + i * 31 + j) % 256).toByte)
      })
    val vids = Seq((1L, mk(1)), (2L, mk(2)), (3L, mk(1)))
    val sigs = vids.flatMap { case (vid, bytes) =>
      Mp4Ops.sampleSlices(bytes).get.zipWithIndex.map { case (smp, i) =>
        (vid, i, smp.map(_ & 0xff).sum / smp.length) // byte-mean signature
      }
    }.toDF("asset_id", "frame_idx", "sig")
    val k = 3
    val sh = sigs.groupBy(col("asset_id"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(frame_idx, sig))), x -> cast(x.sig AS string))")
        .as("seq"))
      .select(col("asset_id"), explode(expr(
        s"transform(sequence(1, size(seq) - $k + 1), " +
          s"i -> md5(cast(concat_ws('|', slice(seq, i, $k)) AS binary)))")).as("sh"))
    val pairs = sh.as("a").join(sh.as("b"),
      col("a.sh") === col("b.sh") && col("a.asset_id") < col("b.asset_id"))
      .groupBy(col("a.asset_id"), col("b.asset_id"))
      .agg(count(lit(1)).as("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // videos 1 and 3 share ALL samples (same tail seed) -> 4 shingles;
    // 1-2 and 2-3 share only the 4-sample intro -> 2 shingles
    assert(pairs((1L, 3L)) == 4L)
    assert(pairs((1L, 2L)) == 2L && pairs((2L, 3L)) == 2L)
  }

  test("q171 on sf0.001: same-group containers pair on the planted 5-sample " +
    "run; stco/co64 forms dedup identically") {
    import spark.implicits._
    val pairs = Mp4Ops.q171Mp4NearDup(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, n) =>
      assert(a - a % 21 == b - b % 21, s"cross-group pair ($a,$b)")
      assert(n >= 2L)
      assert(a % 3 == 1 && b % 3 == 1)
    }
    // every group with >= 2 members pairs completely on the shared run
    // (3 shingles at k=3 over samples 0-4) — and groups MIX stco (even
    // id) and co64 (odd id) members, so the pairing proves offset-form
    // independence
    val byGroup = pairs.groupBy(t => t._1 - t._1 % 21)
    assert(byGroup.values.exists(_.exists(t => t._1 % 2 != t._2 % 2)),
      "at least one pair must mix stco and co64 members")
    byGroup.foreach { case (_, ps) =>
      assert(ps.forall(_._3 == 3L), s"shared-run pairs must carry 3 shingles: $ps")
    }
  }

  test("q137 on sf0.001: every document walks ok with the arithmetic geometry") {
    val rows = Mp4Ops.q137Mp4Extract(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "ok")
      assert(r.getLong(4) == Mp4Ops.sampleCount(id).toLong)
      assert(r.getLong(6) ==
        (0 until Mp4Ops.sampleCount(id)).map(Mp4Ops.sampleSize(id, _).toLong).sum)
    }
  }
}
