package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native expression must agree bit-for-bit with an independent Scala
  * reference fold, in both codegen and interpreted (eval) paths.
  */
class SimHash64Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def referenceFold(hashes: Seq[Long]): Long = {
    val votes = new Array[Int](64)
    for (h <- hashes; b <- 0 until 64)
      votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
    (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
  }

  test("codegen result matches the reference fold on random arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(200)(Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong()))
    val got = data.toDF("hs")
      .select(SimHash64(col("hs")).as("fp"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == data.map(referenceFold))
  }

  test("empty array folds to 0; null array yields null") {
    import spark.implicits._
    val df = Seq(Some(Seq.empty[Long]), None).toDF("hs")
      .select(SimHash64(col("hs")).as("fp"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 0L)
    assert(rows(1).isNullAt(0))
  }

  test("interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val hashes = Seq(3L, -9L, 1L << 40, 7L)
    val expr = SimHash64(Literal.create(
      ArrayData.toArrayData(hashes.toArray), ArrayType(LongType)))
    assert(expr.eval(null) == referenceFold(hashes))
  }
}
