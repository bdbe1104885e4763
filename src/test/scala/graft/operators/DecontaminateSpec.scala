package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("a copied passage is flagged; clean and short docs are kept") {
    import spark.implicits._
    val evalSet = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val train = Seq(
      // shares the 5-gram "beta gamma delta epsilon zeta" (case-insensitive)
      (1L, "intro Beta Gamma Delta Epsilon Zeta outro words here"),
      // same words, different order: no shared 5-gram
      (2L, "zeta epsilon delta gamma beta alpha theta eta more words"),
      // shorter than 5 words: zero shingles, trivially kept
      (3L, "tiny doc"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta exact copy plus")).toDF("doc_id", "text")
    val out = DedupOps.decontaminate(train, evalSet).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out(0) == ((1L, 1L, false)))
    assert(out(1) == ((2L, 0L, true)))
    assert(out(2) == ((3L, 0L, true)))
    assert(out(3)._1 == 4L && out(3)._2 == 4L && !out(3)._3) // 4 shared 5-grams
  }

  test("the eval shingle set is broadcast: no shuffle of train shingles for the semi-join") {
    val plan = DedupOps.q40Decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"contamination probe is not a broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q40 on the corpus: every flagged doc really shares a 5-gram (spot exactness)") {
    val out = DedupOps.q40Decontaminate(spark, sf)
    val flagged = out.filter(!col("keep")).collect().map(_.getLong(0))
    assert(flagged.nonEmpty, "corpus contains near-dups of eval docs; none flagged")
    // brute-force recheck of one flagged doc against the whole eval slice
    val docs = graft.Tables.documents(spark, sf)
    val g = (t: org.apache.spark.sql.Column) => DedupOps.shingles(t, 5)
    val one = flagged.head
    val trainSh = docs.filter(col("doc_id") === one)
      .select(explode(g(col("text"))).as("s"))
    val evalSh = docs.filter(col("doc_id") % 20 === 0)
      .select(explode(g(col("text"))).as("s")).distinct()
    assert(trainSh.join(evalSh, Seq("s")).count() > 0)
    // and a keep=true doc shares none
    val kept = out.filter(col("keep")).orderBy(col("doc_id")).limit(1)
      .collect().head.getLong(0)
    val keptSh = docs.filter(col("doc_id") === kept)
      .select(explode(g(col("text"))).as("s"))
    assert(keptSh.join(evalSh, Seq("s")).count() == 0)
  }

  test("bloom two-phase path is bit-identical to the broadcast path") {
    val broadcastRows = DedupOps.q40Decontaminate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val bloomRows = DedupOps.q63DecontaminateBloom(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(broadcastRows == bloomRows)
  }

  test("bloom path plan: might_contain prune on the scan, shuffled (not broadcast) confirm join") {
    // inspect the lazy (pre-materialization) plan via the primed path —
    // the public decontaminateBloom now checkpoint-materializes its
    // result (r22: the eval-shingle pin must release before return), so
    // its returned frame no longer exposes the decontamination plan
    val docs = graft.Tables.documents(spark, sf)
    val evalSh = DedupOps.evalShingles(docs.filter(col("doc_id") % 20 === 0))
    val out = DedupOps.decontaminateBloomPrimed(
      docs.filter(col("doc_id") % 20 =!= 0),
      evalSh, DedupOps.buildShingleBloom(evalSh))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // the confirm join must be the shuffle shape (the eval set is
    // by-assumption too big to broadcast); the only broadcast allowed is
    // the final slim doc_id left-join
    val joinLines = plan.linesIterator.filter(_.contains("Join")).mkString("\n")
    assert(joinLines.contains("ShuffledHashJoin"), joinLines)
    assert(!joinLines.contains("BroadcastHashJoin [s"), joinLines)
  }

  test("bloom prune is selective: candidates are a fraction of corpus shingles") {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    val docs = graft.Tables.documents(spark, sf)
    // an eval set DISJOINT from the corpus: every surviving shingle is a
    // bloom false positive, so the survivor rate measures the FPR directly
    val fake = spark.range(2000).selectExpr(
      "concat('zz', id, ' yy', id, ' xx', id, ' ww', id, ' vv', id) AS s")
    val blob = fake.agg(ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("s"))), 2000L * 10L)
        .toAggregateExpression()).as("bf")).head.getAs[Array[Byte]]("bf")
    val corpusSh = docs
      .select(explode(DedupOps.shingles(col("text"), 5)).as("s"))
    val total = corpusSh.count()
    val survivors = corpusSh.filter(ColumnBridge.column(
      BloomFilterMightContain(
        Literal.create(blob, BinaryType),
        ColumnBridge.expression(xxhash64(col("s")))))).count()
    assert(total > 1000L)
    // 10 bits/item ≈ 1% FPR; allow generous slack
    assert(survivors.toDouble / total < 0.05,
      s"bloom passed $survivors of $total disjoint shingles")
  }
}
