package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NB quality classifier: hand-model exactness (contr values from the
  * declared ilog2 formula), palindrome neutrality, OOV-contributes-0,
  * and full held-out separation on real data.
  */
class ClassifyOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("contr is the exact integer log-ratio; palindromes are neutral; OOV is 0") {
    import spark.implicits._
    // pos: 'good' x7, 'a' x3; neg: 'doog' x7, 'a' x3 (reversal twin)
    val pos = Seq((1L, "good good good good good good good a a a")).toDF("doc_id", "text")
    val neg = Seq((2L, "doog doog doog doog doog doog doog a a a")).toDF("doc_id", "text")
    val model = ClassifyOps.nbTrain(pos, neg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(model("good") == 3L, "ilog2(8) - ilog2(1) = 3")
    assert(model("doog") == -3L)
    assert(model("a") == 0L, "palindrome symmetry must cancel")
    val scored = ClassifyOps.nbScore(
      Seq((9L, "good unknown a")).toDF("doc_id", "text"), model.toSeq.toDF("word", "contr"))
      .collect().head
    assert(scored.getLong(1) == 3L, "token count")
    assert(scored.getLong(2) == 3L, "good=3, unknown=0, a=0")
    assert(scored.getBoolean(3))
  }

  test("q131 separates held-out clean from reversed perfectly on sf0.001") {
    val rows = ClassifyOps.q131NbQuality(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4) == r.getBoolean(1),
        s"doc ${r.getLong(0)}: pred ${r.getBoolean(4)} != truth ${r.getBoolean(1)} " +
          s"(score ${r.getLong(3)})")
    }
    // both classes present in the eval set
    assert(rows.count(_.getBoolean(1)) > 0 && rows.count(!_.getBoolean(1)) > 0)
    // the 1024-bucket hashing-trick model (the 100 TB path) tracks the
    // exact model closely: collisions merge counts, so allow a small
    // bias, but the bulk of verdicts must agree with truth
    val hAcc = rows.count(r => r.getBoolean(6) == r.getBoolean(1)).toDouble / rows.length
    assert(hAcc >= 0.9, s"hashed-model accuracy $hAcc")
  }

  test("the hashed model is bucket-bounded and collision-merging is deterministic") {
    import spark.implicits._
    val pos = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val neg = Seq((2L, "ahpla ateb ammag atled")).toDF("doc_id", "text")
    val m1 = ClassifyOps.nbTrainHashed(pos, neg, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m2 = ClassifyOps.nbTrainHashed(pos, neg, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == m2, "bucketing must be deterministic")
    assert(m1.size <= 16, "model must be bounded by nBuckets")
    assert(m1.keys.forall(b => b >= 0 && b < 16))
  }
}
