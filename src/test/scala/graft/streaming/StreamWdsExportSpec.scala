package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming WebDataset export: drained tar shards reassemble through
  * the format's adjacency rule to exactly the input set across
  * micro-batches; a replayed stream overwrites its shards instead of
  * duplicating; shards are real ustar files the q147 walker accepts.
  */
class StreamWdsExportSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def shardFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else d.listFiles().filter(_.getName.endsWith(".tar")).toSeq.sortBy(_.getName)
  }

  private def decodeAll(dir: String): Seq[(Long, String, String)] =
    shardFiles(dir).flatMap(f =>
      StreamWdsExport.decodeShard(Files.readAllBytes(f.toPath)))

  test("drained shards == input samples exactly, across batches AND a replay") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_wdsexp_").toString
    val langs = graft.operators.LangIdOps.LangNames
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        langs((r.getLong(0) % 6).toInt))).toSeq
    docs.grouped(math.max(docs.length / 3, 1)).zipWithIndex.foreach {
      case (chunk, i) =>
        chunk.toDF("doc_id", "text", "cls").coalesce(1)
          .write.parquet(s"$base/feed/f$i")
    }
    val q = StreamWdsExport.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/out", maxFilesPerTrigger = 1, shards = 3)
    q.awaitTermination(180000L)
    assert(!q.isActive)
    assert(shardFiles(s"$base/out").size >= 3, "multiple batches → multiple shards")
    val drained = decodeAll(s"$base/out").sortBy(_._1)
    assert(drained == docs.sortBy(_._1), "drained samples diverged from the input")
    // every shard is a REAL archive the q147 walker accepts, and its
    // samples obey the adjacency rule (txt and cls both present)
    shardFiles(s"$base/out").foreach { f =>
      val (status, members) = graft.operators.TarOps.parseTar(
        Files.readAllBytes(f.toPath))
      assert(status == "ok", f.getName)
      graft.operators.TarOps.webdatasetSamples(members).foreach { case (k, parts) =>
        assert(parts.keySet == Set("txt", "cls"), s"$k in ${f.getName}")
      }
    }
    // replay: a fresh checkpoint over the same feed must OVERWRITE the
    // deterministic shard names, never duplicate samples
    val q2 = StreamWdsExport.run(spark, s"$base/feed/f*", s"$base/ckpt2",
      s"$base/out", maxFilesPerTrigger = 1, shards = 3)
    q2.awaitTermination(180000L)
    val replayed = decodeAll(s"$base/out").sortBy(_._1)
    assert(replayed == docs.sortBy(_._1), "replay must not duplicate")
  }
}
