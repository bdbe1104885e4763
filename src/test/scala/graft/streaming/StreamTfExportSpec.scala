package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Streaming TFRecord export: drained shards re-parse to exactly the
  * input set across batches; a replayed stream overwrites its shards
  * instead of duplicating; shards are real CRC-framed files.
  */
class StreamTfExportSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def shardFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else d.listFiles().filter(f => f.getName.endsWith(".tfrecord")).toSeq.sortBy(_.getName)
  }

  private def decodeAll(dir: String): Seq[(Long, String)] =
    shardFiles(dir).flatMap(f =>
      StreamTfExport.decodeShard(Files.readAllBytes(f.toPath)))

  test("drained export == input set exactly, across micro-batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tfexp_").toString
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    docs.grouped(math.max(docs.length / 3, 1)).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/f$i")
    }
    val q = StreamTfExport.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/out", maxFilesPerTrigger = 1, shards = 3)
    q.awaitTermination(180000L)
    assert(shardFiles(s"$base/out").size >= 3, "multiple batches → multiple shards")
    val decoded = decodeAll(s"$base/out")
    assert(decoded.toSet == docs.toSet)
    assert(decoded.length == docs.length, "no duplicates")
    // every shard is CRC-clean end to end
    shardFiles(s"$base/out").foreach { f =>
      val (st, corrupt, _) = graft.operators.TfRecordOps
        .parseShard(Files.readAllBytes(f.toPath))
      assert(st == "ok" && corrupt == 0, f.getName)
    }
  }

  test("a replayed stream overwrites its shards — never duplicates") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tfrep_").toString
    val docs = Seq((1L, "one doc"), (2L, "two doc"), (3L, "three doc"))
    docs.toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/f0")
    def runOnce(ckpt: String): Unit = {
      val q = StreamTfExport.run(spark, s"$base/feed/f*", ckpt,
        s"$base/out", shards = 2)
      q.awaitTermination(120000L)
    }
    runOnce(s"$base/ckpt1")
    val first = decodeAll(s"$base/out")
    // fresh checkpoint = the whole feed re-delivered (the crash-replay shape)
    runOnce(s"$base/ckpt2")
    val second = decodeAll(s"$base/out")
    assert(first.toSet == docs.toSet)
    assert(second == first, "deterministic shard names overwrite cleanly")
  }

  test("no tmp files survive a drained run") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tftmp_").toString
    Seq((9L, "x")).toDF("doc_id", "text").write.parquet(s"$base/feed/f0")
    val q = StreamTfExport.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/out", shards = 1)
    q.awaitTermination(120000L)
    val leftovers = Option(new java.io.File(s"$base/out").listFiles()).toSeq.flatten
      .filter(_.getName.startsWith(".tmp-"))
    assert(leftovers.isEmpty)
  }
}
