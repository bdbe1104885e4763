package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The portable Bloom aggregate: word-exact parity with a plain-Scala
  * reference, the no-false-negative contract, and OR-merge partitioning
  * invariance. Value-level oracle parity is q101's gate.
  */
class BloomSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def referenceWords(values: Seq[String]): Array[Int] = {
    val words = new Array[Int](BloomSketch.Words)
    for (v <- values; i <- 0 until BloomSketch.Probes) {
      val p = BloomSketch.bitPos(i, v.getBytes("UTF-8"))
      words(p / BloomSketch.WordBits) |= 1 << (p % BloomSketch.WordBits)
    }
    words
  }

  private def refContains(words: Array[Int], v: String): Boolean =
    (0 until BloomSketch.Probes).forall { i =>
      val p = BloomSketch.bitPos(i, v.getBytes("UTF-8"))
      (words(p / BloomSketch.WordBits) >> (p % BloomSketch.WordBits) & 1) == 1
    }

  test("words match the reference implementation; 16-bit packing holds") {
    import spark.implicits._
    val values = (1 to 300).map(i => s"member-$i")
    val got = values.toDF("v")
      .agg(BloomSketch(col("v")).as("words"))
      .head().getSeq[Int](0).toArray
    assert(got.toSeq == referenceWords(values).toSeq)
    assert(got.forall(w => w >= 0 && w <= 0xffff))
  }

  test("no false negatives: every inserted value probes present") {
    import spark.implicits._
    val values = (1 to 400).map(i => s"item-$i")
    val df = values.toDF("v").withColumn("k", lit(1))
    val out = graft.operators.SkewOps
      .bloomMembership(df, "k", "v", values.take(50))
      .collect()
    assert(out.length == 50 && out.forall(_.getBoolean(2)))
  }

  test("absent probes match the reference verdict; filter fill is sane") {
    import spark.implicits._
    val values = (1 to 100).map(i => s"present-$i")
    val absent = (1 to 100).map(i => s"absent-$i")
    val ref = referenceWords(values)
    val out = graft.operators.SkewOps
      .bloomMembership(values.toDF("v").withColumn("k", lit(1)), "k", "v", absent)
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    // deterministic: the engine's verdicts equal the reference's (false
    // positives included, if the corpus produces any)
    for (p <- absent) assert(out(p) == refContains(ref, p), s"probe $p")
    // 100 values x 4 probes set at most 400 of 2048 bits: a fill that low
    // makes mostly-false verdicts a structural certainty
    assert(out.values.count(_ == false) > 90)
  }

  test("filter is partitioning-invariant (OR-merge contract)") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i % 4, s"v${i % 271}")).toDF("k", "v")
    def wordsOf(parts: Int) =
      df.repartition(parts).groupBy(col("k"))
        .agg(BloomSketch(col("v")).as("words"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(wordsOf(1) == wordsOf(9))
  }
}
