package graft.sources

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LookupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("point lookup pushes equality filters into the parquet scan") {
    val df = Lookup.pointLookup(
      Tables.events(spark, sf), Map("user_id" -> 13L, "event_type" -> "error"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters"), physical)
    assert(physical.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(user_id,13\\)[^\\]]*\\].*"),
      physical.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("user_id") == 13L &&
      r.getAs[String]("event_type") == "error"))
  }

  test("batch lookup is a broadcast semi-join, result == IN-filter") {
    import spark.implicits._
    val keys = Seq(1L, 5L, 9L).toDF("user_id")
    val df = Lookup.batchLookup(Tables.events(spark, sf), keys, Seq("user_id"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin") && physical.contains("LeftSemi"), physical)
    val expected = Tables.events(spark, sf)
      .filter(col("user_id").isin(1L, 5L, 9L)).count()
    assert(df.count() == expected && expected > 0)
  }

  test("schema init creates an empty typed sink once, then no-ops") {
    val path = java.nio.file.Files.createTempDirectory("graft_sink_").toString + "/sink"
    assert(SchemaInit.ensureSinkTable(spark, path))
    val df = spark.read.parquet(path)
    // core columns + the sink's physical `bucket` partition column
    assert(df.schema.fieldNames.toSeq ==
      Seq("user_id", "task_id", "event_id", "ts_us", "payload", "seq", "bucket"))
    assert(df.count() == 0)
    assert(!SchemaInit.ensureSinkTable(spark, path)) // idempotent
  }
}
