package graft.functions

import graft.SparkTestSession
import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity of the r21 native integer-vector kernels (QuantizedDot,
  * QuantizeInt8, PqCodes) against the pure-builtin forms they replaced —
  * on the real embeddings corpus and on crafted edge rows. The builtin
  * forms stay in SimilarityOps as `*Builtins` precisely to anchor these
  * gates: the optimization's contract is BIT-IDENTICAL output, so every
  * oracle hash downstream (q62/q68/q115/q120) is provably unchanged.
  */
class QuantizedVecSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def corpus = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("QuantizeInt8 == builtin projection on the sf0.001 corpus, bit-exact") {
    val native = SimilarityOps.quantizeInt8(corpus, "v")
      .select(col("vec_id"), col("qscale"), col("qv"), col("qs2"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2), r.getLong(3)))
    val builtin = SimilarityOps.quantizeInt8Builtins(corpus, "v")
      .select(col("vec_id"), col("qscale"), col("qv"), col("qs2"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2), r.getLong(3)))
    assert(native.toSeq == builtin.toSeq)
  }

  test("QuantizeInt8 degenerate vectors: all-zero and empty") {
    import spark.implicits._
    val df = Seq(Seq(0.0, 0.0, 0.0), Seq.empty[Double]).toDF("v")
    val native = SimilarityOps.quantizeInt8(df, "v")
      .select(col("qscale"), col("qv"), col("qs2"))
      .collect().map(r => (r.getDouble(0), r.getSeq[Int](1), r.getLong(2)))
    assert(native(0) == ((0.0, Seq(0, 0, 0), 0L)))
    assert(native(1) == ((0.0, Seq.empty[Int], 0L)))
  }

  test("NormalizeVec == builtin sqrt(dot)+divide chain, bit-exact; zero vector throws like ANSI") {
    import spark.implicits._
    val rows = corpus.select(col("vec_id"), col("v"))
    def run(f: (org.apache.spark.sql.DataFrame, String, String) => org.apache.spark.sql.DataFrame) =
      f(rows, "v", "nv").select(col("vec_id"), col("nv"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).map(d =>
          java.lang.Double.doubleToRawLongBits(d)))
        .sortBy(_._1).toSeq
    val nat = run((d, v, o) => d.select(col("vec_id"),
      graft.functions.NormalizeVec(col(v)).as(o)))
    val bi = run(SimilarityOps.normalizedBuiltins)
    assert(nat == bi)
    // under ANSI the builtin division by a zero norm THROWS; the native
    // kernel mirrors the loudness rather than minting NaNs
    val zero = Seq((-1L, Seq(0.0, 0.0))).toDF("vec_id", "v")
    intercept[Exception] {
      zero.select(graft.functions.NormalizeVec(col("v"))).collect()
    }
    ()
  }

  test("QuantizedDot == builtin zip_with+aggregate over corpus codes") {
    val qc = SimilarityOps.quantizeInt8(corpus, "v")
      .select(col("vec_id"), col("qv")).persist()
    val pairs = qc.select(col("vec_id").as("ida"), col("qv").as("a"))
      .crossJoin(qc.filter(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("idb"), col("qv").as("b")))
    val native = pairs
      .select(col("ida"), col("idb"), SimilarityOps.quantizedDot(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    val builtin = pairs
      .select(col("ida"), col("idb"), SimilarityOps.quantizedDotBuiltins(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    qc.unpersist()
    assert(native.toSeq == builtin.toSeq)
  }

  test("QuantizedDot degenerate inputs: ragged and null element → null; int×long mix") {
    import spark.implicits._
    val df = Seq(
      (Seq(Some(1)), Seq(Some(1L), Some(2L))),             // ragged → null
      (Seq(Some(1), None), Seq(Some(2L), Some(3L))),       // null element → null
      (Seq(Some(2), Some(3)), Seq(Some(4L), Some(5L))))    // 2·4+3·5 = 23
      .toDF("a", "b")
    val out = df.select(SimilarityOps.quantizedDot(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && out(2).getLong(0) == 23L)
  }

  test("PqCodes == builtin argmin encode on the sf0.001 corpus, ties to first") {
    val qc = SimilarityOps.quantizeInt8(corpus, "v").select(col("vec_id"), col("qv"))
    val cb = SimilarityOps.trainPqCodebooks(qc, m = 8, ksub = 16)
    val native = SimilarityOps.pqEncode(qc, cb)
      .select(col("vec_id"), col("codes"), col("rs2"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2)))
    val builtin = SimilarityOps.pqEncodeBuiltins(qc, cb)
      .select(col("vec_id"), col("codes"), col("rs2"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2)))
    assert(native.toSeq == builtin.toSeq)
    // tie-break pin: a codebook with two identical sub-centroids must
    // assign the FIRST index (array_position takes the first minimum)
    import spark.implicits._
    val tieCb: Array[Array[Array[Long]]] =
      Array(Array(Array(3L, 3L), Array(3L, 3L), Array(9L, 9L)))
    val tied = Seq(Seq(3, 3)).toDF("qv")
    val code = tied.select(PqCodes(col("qv"), tieCb)).collect()(0).getSeq[Int](0)
    assert(code == Seq(0))
  }
}
