package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RollingHash parity: every window hash must equal
  * `xxhash64(substr(text, i+1, k))` for ASCII text, across all XXH64
  * input-size paths (byte tail, 4-byte chunk, 8-byte chunks, 32-byte
  * stripes).
  */
class RollingHashSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def builtin(k: Int) =
    expr(s"transform(sequence(0, greatest(length(t) - $k, 0)), " +
      s"i -> xxhash64(substr(t, i + 1, $k)))")

  test("parity with xxhash64(substr) across window sizes and string lengths") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val strings = Seq("", "a", "abcd", "hello world") ++
      Seq.fill(50)(rnd.alphanumeric.take(rnd.nextInt(120) + 1).mkString)
    for (k <- Seq(1, 3, 5, 8, 13, 40)) { // 40 > 32 exercises the stripe path
      val df = strings.toDF("t")
      val native = df.select(RollingHash(col("t"), k)).collect().map(_.getSeq[Long](0))
      val ref = df.select(builtin(k)).collect().map(_.getSeq[Long](0))
      assert(native.toSeq == ref.toSeq, s"mismatch at k=$k")
    }
  }

  test("null input yields null") {
    import spark.implicits._
    val rows = Seq(Some("abc"), None).toDF("t")
      .select(RollingHash(col("t"), 2)).collect()
    assert(rows(0).getSeq[Long](0).nonEmpty && rows(1).isNullAt(0))
  }
}
