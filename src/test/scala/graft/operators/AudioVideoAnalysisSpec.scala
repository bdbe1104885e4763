package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Windowed audio features (q118) and shot-boundary detection (q119):
  * hand-computed reference semantics plus the corpus-formula invariants
  * the sf oracles hash-check at scale.
  */
class AudioVideoAnalysisSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q118 window features match a reference loop on the decoded corpus") {
    val rows = MultimodalOps.q118AudioWindows(spark, sf).collect()
    assert(rows.nonEmpty)
    // replay the corpus formula per (asset, window) — the oracle's exact
    // arithmetic, independently in Scala
    for (r <- rows.take(200)) {
      val (id, w) = (r.getLong(0), r.getLong(1))
      val n = 64 + id % 128
      val from = w * 16
      val until = math.min(from + 16, n)
      def s(i: Long): Long = ((id * 31 + i * 7) % 65536) - 32768
      val expEnergy = (from until until).map(i => s(i) * s(i)).sum
      val expZc = (from + 1 until until)
        .count(i => (s(i) >= 0) != (s(i - 1) >= 0)).toLong
      val expPeak = (from until until).map(i => math.abs(s(i))).max
      assert(r.getLong(2) == until - from, s"($id,$w) n_samples")
      assert(r.getLong(3) == expEnergy, s"($id,$w) energy")
      assert(r.getLong(4) == expZc, s"($id,$w) zcr")
      assert(r.getLong(5) == expPeak, s"($id,$w) peak")
    }
    // windows tile each asset: count = ceil(n/16), last may be partial
    val byAsset = rows.groupBy(_.getLong(0))
    for ((id, ws) <- byAsset) {
      val n = 64 + id % 128
      assert(ws.length == (n + 15) / 16, s"asset $id window count")
      assert(ws.map(_.getLong(2)).sum == n, s"asset $id samples don't tile")
    }
  }

  test("q119 shot detection: exact diffs and threshold on a hand-built AVI") {
    import org.apache.spark.sql.Encoders
    // frames: (10,10,10) -> (12,11,10) small change -> (200,10,10) cut
    val w = 4; val h = 3
    val avi = MultimodalOps.encodeAviConst(w, h,
      Seq((10, 10, 10), (12, 11, 10), (200, 10, 10)))
    val np = w * h
    val v = MultimodalOps.decodeAvi(avi).get
    assert(v.frames.length == 3)
    // reuse the registered operator's arithmetic through a 1-row corpus:
    // decode + diff manually against the known fills
    val sums = v.frames.map { f =>
      var b = 0L; var g = 0L; var r = 0L
      var i = 0
      while (i < f.length) { b += f(i) & 0xFF; g += f(i + 1) & 0xFF; r += f(i + 2) & 0xFF; i += 3 }
      (b, g, r)
    }
    assert(sums(0) == ((10L * np, 10L * np, 10L * np)))
    val d1 = (sums(1)._1 - sums(0)._1, sums(1)._2 - sums(0)._2, sums(1)._3 - sums(0)._3)
    assert(d1 == ((2L * np, 1L * np, 0L)))
    // transition 1: avg change (2+1+0)/3 < 30 -> not a shot;
    // transition 2: |200-12| = 188 alone crosses 90 -> shot
    assert(d1._1 + d1._2 + d1._3 < 90L * np)
    val d2 = math.abs(sums(2)._1 - sums(1)._1) + math.abs(sums(2)._2 - sums(1)._2) +
      math.abs(sums(2)._3 - sums(1)._3)
    assert(d2 >= 90L * np)
  }

  test("q119 on sf0.001: every transition row replays the fill formulas") {
    val rows = MultimodalOps.q119ShotDetect(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (id, fi) = (r.getLong(0), r.getLong(1))
      val np = (8 + id % 8) * (6 + (id * 3) % 8)
      def fill(f: Long) =
        ((id + 11 * f) % 256, (id * 7 + 17 * f) % 256, (id * 13 + 23 * f) % 256)
      val (b1, g1, r1) = fill(fi - 1)
      val (b2, g2, r2) = fill(fi)
      assert(r.getLong(2) == np)
      assert(r.getLong(3) == math.abs(b2 - b1) * np, s"($id,$fi) diff_b")
      assert(r.getLong(4) == math.abs(g2 - g1) * np, s"($id,$fi) diff_g")
      assert(r.getLong(5) == math.abs(r2 - r1) * np, s"($id,$fi) diff_r")
      val want = if ((math.abs(b2 - b1) + math.abs(g2 - g1) + math.abs(r2 - r1)) * np
        >= 90L * np) 1 else 0
      assert(r.getInt(6) == want, s"($id,$fi) is_shot")
    }
    // the corpus populates both verdicts
    assert(rows.exists(_.getInt(6) == 1) && rows.exists(_.getInt(6) == 0),
      "threshold does not discriminate on this corpus")
  }
}
