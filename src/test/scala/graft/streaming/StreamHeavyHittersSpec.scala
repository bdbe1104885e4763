package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Continuous heavy hitters: bounded state over an unbounded vocabulary,
  * streamed counters identical to the batch sketch, and exact top-k
  * recovery on the skewed streams the operator exists for.
  */
class StreamHeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def feedDocs(base: String, batches: Seq[Seq[(String, String)]]): Unit = {
    import spark.implicits._
    batches.zipWithIndex.foreach { case (docs, i) =>
      docs.toDF("lang", "text")
        .coalesce(1).write.parquet(s"$base/feed/f$i")
      val d = new java.io.File(s"$base/feed/f$i")
      (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
  }

  test("skewed stream: recovered top-k == exact top-k; counters == batch sketch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_shh_").toString
    // Zipf-ish: token t_j appears (40 - j) times total, spread over 3
    // batches, plus a long tail of once-tokens — top-5 is unambiguous
    val all = (1 to 30).flatMap(j => Seq.fill(40 - j)(s"tok$j")) ++
      (1 to 200).map(i => s"rare$i")
    val chunks = all.grouped((all.length + 2) / 3).toSeq
    feedDocs(base, chunks.map(c => Seq("en" -> c.mkString(" "))))

    val q = StreamHeavyHitters.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/hh", k = 5)
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")

    val got = StreamHeavyHitters.readHeavyHitters(spark, s"$base/hh")
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
    // exact counts: tok1=39 .. tok5=35; estimates are >= exact (one-sided)
    assert(got.map(_._2).toSeq == (1 to 5).map(j => s"tok$j"),
      s"top-5 diverged: ${got.toSeq}")
    got.foreach { case (rank, tok, est) =>
      val exact = 40L - tok.stripPrefix("tok").toLong
      assert(est >= exact, s"$tok est $est under exact $exact")
    }

    // the standing counters equal the batch CMS of everything fed — the
    // sketch leg is exact regardless of the candidate heuristic
    val lastState = StreamHeavyHitters.advance(
      StreamHeavyHitters.HhState(Array.emptyLongArray, Map.empty),
      all, k = 5).counters
    val batchRegs = all.toDF("v")
      .agg(graft.functions.CmsSketch(col("v")).as("regs"))
      .head().getSeq[Long](0)
    assert(batchRegs.toSeq == lastState.toSeq)
  }

  test("per-language isolation and deterministic tie-break") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_shh2_").toString
    feedDocs(base, Seq(
      Seq("en" -> "a a a b b c", "fr" -> "x x y"),
      Seq("en" -> "b c c", "fr" -> "y z")))
    val q = StreamHeavyHitters.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/hh", k = 3)
    q.awaitTermination(120000L)
    assert(!q.isActive)
    val got = StreamHeavyHitters.readHeavyHitters(spark, s"$base/hh")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    // en: a=3, b=3 (tie -> token order), c=3 — all tie at 3: a, b, c
    assert(got("en") == Seq(("a", 3L), ("b", 3L), ("c", 3L)), got("en").toString)
    // fr: x=2, y=2, z=1 — languages never bleed into each other
    assert(got("fr") == Seq(("x", 2L), ("y", 2L), ("z", 1L)), got("fr").toString)
  }
}
