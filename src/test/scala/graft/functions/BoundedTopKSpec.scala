package graft.functions

import graft.SparkTestSession
import graft.operators.RelationalOps
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

class BoundedTopKSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q58 equals the window-rank reference on the corpus (ties included)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .select(
        col("lang"), col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val expected = docs
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang", "source")
          .orderBy(col("n_tokens").desc, col("doc_id").desc)))
      .filter(col("rank") <= 3)
      .select(col("lang"), col("source"), col("rank").cast("long"),
        col("n_tokens"), col("doc_id"))
      .orderBy("lang", "source", "rank")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val got = RelationalOps.q58TopKPerGroup(spark, sf)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("partial aggregation: two ObjectHashAggregate stages, k rows per map task max") {
    val plan = RelationalOps.q58TopKPerGroup(spark, sf)
      .queryExecution.executedPlan.toString
    // partial + final — the map-side combine that caps the exchange at
    // O(groups × k) is what distinguishes this from the window shape
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("heap semantics: exact top-k under duplicates, shuffles, and small groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    // heavy duplication (values 0..9) forces tie-breaks through the id
    val rows = (1L to 2000L).map(id => (id % 7, rnd.nextInt(10).toLong, id))
    val df = rows.toDF("g", "v", "id").repartition(13)
    val got = df
      .groupBy("g")
      .agg(BoundedTopK(struct(col("v"), col("id")), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.v"), col("col.id"))
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    val expected = rows.groupBy(_._1).view.mapValues {
      _.map(t => (t._2, t._3)).sortBy(t => (-t._1, -t._2)).take(5).toSeq
    }.toMap
    assert(got == expected)
    // a group smaller than k returns the whole group, still descending
    val tiny = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("g", "v", "id")
      .groupBy("g").agg(BoundedTopK(struct(col("v"), col("id")), 5).as("top"))
      .select(explode(col("top"))).select(col("col.v"))
      .as[Long].collect().toSeq
    assert(tiny == Seq(20L, 10L))
  }

  test("nulls are ignored; all-null group yields an empty array") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (1L, None), (2L, None))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(BoundedTopK(col("v"), 3).as("top"))
      .select(col("g"), col("top"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(5L))
    assert(out(2L) == Seq.empty)
  }

  test("string payloads survive buffer reuse: heap values must not alias input rows") {
    import spark.implicits._
    // many rows per partition with distinct strings: if update() kept a
    // reference into the scanner's reused UnsafeRow buffer instead of
    // copying, retained values would be overwritten by later rows and the
    // winners would come back corrupted
    val rows = (1L to 5000L).map(id => (id % 3, f"payload_$id%05d", id))
    val df = rows.toDF("g", "s", "id").repartition(7)
    val got = df.groupBy("g")
      .agg(BoundedTopK(struct(col("s"), col("id")), 4).as("top"))
      .select(col("g"), explode(col("top")))
      .select(col("g"), col("col.s"), col("col.id"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val expected = rows.groupBy(_._1).view.mapValues {
      _.map(t => (t._2, t._3)).sortBy(t => (t._1, t._2)).reverse.take(4).toSeq
    }.toMap
    assert(got == expected)
  }

  test("serialize/deserialize round-trips the heap (unit, long payload)") {
    val agg = BoundedTopK(BoundReference(0, LongType, nullable = true), 3)
    val buf = agg.createAggregationBuffer()
    Seq(7L, 1L, 9L, 3L, 8L).foreach { v =>
      agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(v))
    }
    val restored = agg.deserialize(agg.serialize(buf))
    // merge with a second heap exercises the eviction path post-restore
    val other = agg.createAggregationBuffer()
    Seq(10L, 2L).foreach { v =>
      agg.update(other, org.apache.spark.sql.catalyst.InternalRow(v))
    }
    val merged = agg.merge(restored, other)
    val out = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    assert(out == Seq(10L, 9L, 8L))
  }
}
