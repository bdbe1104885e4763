package graft.streaming

import graft.SparkTestSession
import graft.operators.{Jpeg, MultimodalOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming image dedup guard: exact (decoded digest, container-blind)
  * and near (dHash, re-encode-surviving) flags against the standing
  * signature index, undecodables dead-lettered, retention GC.
  */
class StreamImageDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // a smooth gray gradient with strong 9×8-grid contrast: the dHash
  // regime (quality-90 error ≪ grid step)
  private val W = 36
  private val H = 24
  private val gray = Array.tabulate(W * H)(i => (10 + (i % W) * 5 + (i / W) * 2).toByte)
  private def grayRgb: Array[Byte] = {
    val out = new Array[Byte](W * H * 3)
    gray.indices.foreach { i =>
      out(i * 3) = gray(i); out(i * 3 + 1) = gray(i); out(i * 3 + 2) = gray(i)
    }
    out
  }

  test("guard flags exact (cross-container), near (JPEG re-encode), and undecodable") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_imgdedup_").toString
    val png = MultimodalOps.encodePng(W, H, grayRgb)
    val bmp = MultimodalOps.encodeBmp(W, H, grayRgb) // gray: BGR == RGB
    val jpg = Jpeg.encodeJpegGray(W, H, gray, Jpeg.quantForQuality(90))
    val other = MultimodalOps.encodePngConst(10, 10, 200, 30, 90)
    val chunks = Seq(
      Seq(1L -> png, 2L -> other),
      Seq(3L -> bmp, 4L -> jpg),
      Seq(5L -> png, 6L -> "not an image at all".getBytes))
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("asset_id", "payload")
        .coalesce(1).write.parquet(s"$base/feed/c$i")
      val d = new java.io.File(s"$base/feed/c$i")
      (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamImageDedup.run(spark, s"$base/feed/c*", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")

    val flags = StreamImageDedup.readFlags(spark, s"$base/flags")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(flags == Set(
      (3L, 1L, "exact"), // same pixels, different container
      (4L, 1L, "near"), // lossy re-encode: pixels differ, dHash holds
      (5L, 1L, "exact"), // byte-identical replay (dup_of = earliest twin)
      (6L, -1L, "undecodable")), s"flags: $flags")

    // standing index: one generation per micro-batch, decodables only
    val gens = new java.io.File(s"$base/index").listFiles
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(gens == Seq("batch_id=0", "batch_id=1", "batch_id=2"), gens)
    assert(spark.read.parquet(s"$base/index").count() == 5)

    // retention: keep the newest 2 generations; a re-ingested copy of the
    // GC'd original goes undetected (the windowed trade), while a copy of
    // a retained asset still flags
    StreamImageDedup.gcIndex(spark, s"$base/index", keepBatches = 2)
    val kept = new java.io.File(s"$base/index").listFiles
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(kept == Seq("batch_id=1", "batch_id=2"), kept)
    val probe = Seq(10L -> other, 11L -> jpg).toDF("asset_id", "payload")
    StreamImageDedup.processBatch(probe, 99L, s"$base/flags", s"$base/index")
    val after = StreamImageDedup.readFlags(spark, s"$base/flags")
      .where(col("asset_id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // asset 10 (copy of GC'd asset 2's content) passes unflagged; asset 11
    // exact-matches the retained asset 4 (same jpg bytes decode equal)
    assert(after == Set((11L, 4L, "exact")), s"post-GC flags: $after")
  }

  test("in-batch earliest-arrival: lower asset id wins inside one micro-batch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_imgdedup_b_").toString
    val png = MultimodalOps.encodePng(W, H, grayRgb)
    val batch = Seq(7L -> png, 3L -> png, 9L -> png).toDF("asset_id", "payload")
    StreamImageDedup.processBatch(batch, 0L, s"$base/flags", s"$base/index")
    val flags = StreamImageDedup.readFlags(spark, s"$base/flags")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(flags == Set((7L, 3L, "exact"), (9L, 3L, "exact")), s"flags: $flags")
  }
}
