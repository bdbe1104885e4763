package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestSession
import graft.diff.JsonSubset
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** D13 end-to-end: drive the reference's `case4_multiple_changes` golden
  * fixture through the REAL streaming path (file source → stateful merge →
  * diff sink) and check the persisted diff documents against
  * `expected.json`.
  *
  * Per-event cadence note: the engine emits one diff per checkpoint event
  * (reference: one CDC message → one merge+diff,
  * `service/DataStreamService.java:61-93`), while the fixture's expected
  * diff is a single document over the whole before→after transition. The
  * two agree per task because `DiffEngine.computeDiff` is key-wise
  * independent — so the union of the second batch's per-event diffData maps
  * must equal the golden diffData for every task reachable through CDC
  * events. (`task5`'s whole-task removal is NOT reachable: the merge engine
  * never deletes a task on an event; it arises only from diffing arbitrary
  * states — covered by DiffEngineGoldenSpec.)
  */
class DiffStreamGoldenSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val mapper = new ObjectMapper()
  private val fixture = "src/test/resources/diffservice/case4_multiple_changes"

  /** Fixture state file → (task, content, timestamp) triples. */
  private def loadState(path: String): Seq[(String, String, Long)] = {
    val node = mapper.readTree(Files.readString(Paths.get(path)))
    node.properties().asScala.toSeq.flatMap { e =>
      e.getValue.elements().asScala.map { item =>
        (e.getKey, item.get("content").asText(), item.get("timestamp").asLong())
      }
    }
  }

  private def writeEvents(rows: Seq[(Long, String, String, Long)], dir: String): Unit = {
    // (event_id, task, content, ts_us) → the CDC feed's event schema
    val data = rows.map { case (id, task, content, tsUs) =>
      Row(id, tsUs, 7L, task, 0.0, content)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1),
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts_us", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(dir)
  }

  test("case4 through the streaming path: persisted diffs match the golden corpus") {
    val base = Files.createTempDirectory("graft_diffgolden_").toString
    val before = loadState(s"$fixture/before.json")
    val after = loadState(s"$fixture/after.json")
    val beforeByTask = before.map(t => t._1 -> t._2).toMap
    // batch 1: the full before-state; batch 2: the after-state of every task
    // whose content changed (task3 is unchanged; task5 has no after event)
    val changed = after.filter { case (task, content, _) =>
      beforeByTask.get(task).exists(_ != content)
    }
    assert(changed.map(_._1).toSet == Set("task1", "task2", "task4"))
    writeEvents(
      before.zipWithIndex.map { case ((task, c, ts), i) => (i + 1L, task, c, ts) },
      s"$base/feed/f0")
    writeEvents(
      changed.zipWithIndex.map { case ((task, c, ts), i) => (i + 100L, task, c, ts) },
      s"$base/feed/f1")

    val q = CheckpointStream.run(
      spark, s"$base/feed/f*", s"$base/ckpt", s"$base/sink", maxFilesPerTrigger = 1)
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")

    val diffRows = spark.read.parquet(s"$base/sink_diffs")
      .select("seq", "diff_json").collect()
      .map(r => r.getInt(0) -> mapper.readTree(r.getString(1))).sortBy(_._1)
    // 5 insert diffs from the before batch + 3 change diffs from the after batch
    assert(diffRows.length == 8, diffRows.map(_._1).mkString(","))
    assert(diffRows.map(_._1).toSeq == (1 to 8))

    // union the after-batch per-event diffData maps and compare each task's
    // entry with the golden document's
    val merged = mapper.createObjectNode()
    diffRows.drop(5).foreach { case (_, node) =>
      node.get("diffData").properties().asScala.foreach { e =>
        merged.set(e.getKey, e.getValue); ()
      }
    }
    val expected = mapper.readTree(Files.readString(Paths.get(s"$fixture/expected.json")))
    for (task <- Seq("task1", "task2", "task4")) {
      JsonSubset.assertSubset(expected.get("diffData").get(task), merged.get(task), s"$$.$task")
    }

    // reconstruct-after: applying the persisted diff stream in sequence
    // rebuilds the final session content for every task
    val diffs = diffRows.map { case (_, node) =>
      parseDiff(node)
    }
    val rebuilt = diffs.foldLeft(Map.empty[String, Vector[String]]) {
      (st, d) => graft.diff.DiffEngine.applyDiff(st, d)
    }
    val sinkContent = spark.read.parquet(s"$base/sink")
      .select("task_id", "payload").collect()
      .map(r => r.getString(0) -> r.getString(1).split("\n").toVector).toMap
    assert(rebuilt == sinkContent,
      s"rebuilt keys=${rebuilt.keySet} sink keys=${sinkContent.keySet}")
  }

  /** Parse the wire JSON back into the diff model (test-side inverse of
    * DiffModel.toJson, for driving applyDiff off the persisted stream).
    */
  private def parseDiff(node: com.fasterxml.jackson.databind.JsonNode): graft.diff.DiffModel.CheckpointDataDiff = {
    import graft.diff.DiffModel._
    def range(n: com.fasterxml.jackson.databind.JsonNode): DiffRange =
      DiffRange(n.get("start").asInt(), n.get("end").asInt())
    def lines(n: com.fasterxml.jackson.databind.JsonNode): Vector[String] =
      n.elements().asScala.map(_.asText()).toVector
    def content(n: com.fasterxml.jackson.databind.JsonNode): Content =
      n.get("type").asText() match {
        case "insert_content" => Content.Insert(range(n.get("linesToAdd")), lines(n.get("lines")))
        case "remove_content" => Content.Remove(range(n.get("linesRemoved")), lines(n.get("lines")))
        case "replace_content" =>
          Content.Replace(
            content(n.get("toRemove")).asInstanceOf[Content.Remove],
            content(n.get("toAddContent")).asInstanceOf[Content.Insert])
      }
    CheckpointDataDiff(
      node.get("sequenceNumber").asInt(),
      node.get("diffData").properties().asScala.map { e =>
        e.getKey -> DiffItem(
          e.getValue.get("changes").elements().asScala.map { cc =>
            ContentChange(content(cc.get("change")), cc.get("timestamp").asLong())
          }.toVector,
          e.getValue.get("taskId").asText())
      }.toMap)
  }
}
