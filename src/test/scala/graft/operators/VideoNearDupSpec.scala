package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Video near-dup (q133): planted shared segments pair with exact
  * shingle counts, signatures are DIMENSION-independent (a re-scaled
  * copy of the same content still matches), unrelated videos never
  * pair, and the pair plan is a digest equi-join.
  */
class VideoNearDupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def avi(id: Long, w: Int, h: Int, fills: Seq[Int]) =
    MultimodalOps.DecodableAsset(id, "video",
      MultimodalOps.encodeAviConst(w, h, fills.map(v => (v, v, v))))

  test("shared segments pair with exact counts; scaled copies match; unrelated don't") {
    import spark.implicits._
    // videos 1 and 2: same 6-frame content at DIFFERENT dimensions
    // (mean is dimension-free); video 3 shares only frames 0-2 with
    // them (one k=3 shingle -> below minShared); video 4 is unrelated
    val shared = Seq(10, 20, 30, 40, 50, 60)
    val assets = Seq(
      avi(1L, 8, 6, shared),
      avi(2L, 16, 10, shared),
      avi(3L, 8, 6, Seq(10, 20, 30, 99, 98, 97)),
      avi(4L, 8, 6, Seq(201, 202, 203, 204, 205, 206))).toDF()
    val pairs = MultimodalOps.videoNearDup(assets)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 2L)).contains(4L),
      s"identical content at different dims must share all 4 shingles: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "a single shared shingle is below minShared")
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L), "unrelated video paired")
  }

  test("q133 on sf0.001: pairs are exactly the same-group relation with 3 shared shingles") {
    val rows = MultimodalOps.q133VideoNearDup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a - a % 21 == b - b % 21, s"cross-group pair ($a, $b)")
      assert(n == 3L, s"pair ($a, $b): $n shared shingles, expected the 3 intro windows")
    }
  }

  test("pair plan is a digest equi-join — no cartesian/BNLJ") {
    import spark.implicits._
    val assets = Seq(avi(1L, 8, 6, Seq(1, 2, 3, 4))).toDF()
    val plan = graft.SparkTestSession.finalPlan(MultimodalOps.videoNearDup(assets))
    val bad = plan.collect {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bad.isEmpty, s"pairing must be an equi-join:\n$plan")
  }
}
