package graft.functions

import graft.SparkTestSession
import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashSignatureSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("XxHash64Long matches Spark's xxhash64 over a single bigint") {
    import spark.implicits._
    val values = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L, 0xDEADBEEFL)
    val viaSpark = values.toDF("v")
      .select(xxhash64(col("v")).as("h")).collect().map(_.getLong(0))
    val viaLocal = values.map(XxHash64Long.hash(_, 42L))
    assert(viaSpark.toSeq == viaLocal)
  }

  test("native signature == pure-builtin signature (chained-seed parity)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(100)(Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong()))
    val df = data.toDF("hs")
    val native = df.select(MinHashSignature(col("hs"), 48).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val builtin = df.select(DedupOps.minhashSignatureBuiltins(col("hs"), 48).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(native.toSeq == builtin.toSeq)
  }

  test("interpreted eval agrees with codegen and handles empty arrays") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val expr = MinHashSignature(
      Literal.create(ArrayData.toArrayData(Array(7L, -3L)), ArrayType(LongType)), 4)
    val out = expr.eval(null).asInstanceOf[ArrayData].toLongArray()
    val seeds = MinHashSignature.seeds(4)
    val expected = seeds.map(s => math.min(XxHash64Long.hash(7L, s), XxHash64Long.hash(-3L, s)))
    assert(out.toSeq == expected.toSeq)
    // empty array → all Long.MaxValue sentinels (no elements to min over)
    val empty = MinHashSignature(
      Literal.create(ArrayData.toArrayData(Array.empty[Long]), ArrayType(LongType)), 2)
    assert(empty.eval(null).asInstanceOf[ArrayData].toLongArray().forall(_ == Long.MaxValue))
  }
}
