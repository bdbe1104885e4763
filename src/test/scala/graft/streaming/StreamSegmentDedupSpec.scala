package graft.streaming

import graft.SparkTestSession
import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming segment-dedup guard: q121's passage-grain first-
  * occurrence rule at ingest — in-order arrival drains to the batch
  * result exactly, segments dedup ACROSS micro-batches, and a replayed
  * batch must not see its own crashed index write.
  */
class StreamSegmentDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("in-order feed drains to batch q121 exactly") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_segdd_").toString
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    docs.grouped(math.max(docs.length / 3, 1)).zipWithIndex.foreach {
      case (chunk, i) =>
        chunk.toSeq.toDF("doc_id", "text")
          .coalesce(1).write.parquet(s"$base/feed/f$i")
        val d = new java.io.File(s"$base/feed/f$i")
        (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamSegmentDedup.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/dedup", s"$base/index")
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")
    val got = StreamSegmentDedup.readDedup(spark, s"$base/dedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val want = DedupOps.q121SegmentDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(want.nonEmpty && got == want,
      s"streamed dedup diverged: stream-only=${(got -- want).take(3)} " +
        s"batch-only=${(want -- got).take(3)}")
  }

  test("segments dedup across micro-batches; earliest arrival keeps") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_segdd_x_").toString
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val block = (1 to 10).map(i => s"dup$i").mkString(" ")
    val tailA = (1 to 10).map(i => s"a$i").mkString(" ")
    val tailB = (1 to 10).map(i => s"b$i").mkString(" ")
    // batch 0 introduces the block; batch 1's doc copies it mid-document
    Seq((1L, s"$block $tailA")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$base/feed/f0")
    Seq((2L, s"$tailB $block")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$base/feed/f1")
    for (i <- 0 to 1) {
      val d = new java.io.File(s"$base/feed/f$i")
      (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamSegmentDedup.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/dedup", s"$base/index")
    q.awaitTermination(120000L)
    val got = StreamSegmentDedup.readDedup(spark, s"$base/dedup")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got(1L) == ((2L, 2L, sha(s"$block $tailA"))))
    assert(got(2L) == ((2L, 1L, sha(tailB))), s"cross-batch copy kept: ${got(2L)}")
  }

  test("replayed batch ignores its own crashed index generation (both guards)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_segdd_replay_").toString
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    // first attempt writes output + index generation 0, "crashes" before
    // the commit; the replay must reproduce the first attempt's verdicts
    // (n_kept = 1), not flag the doc against its own crashed write
    StreamSegmentDedup.processBatch(docs, 0L, s"$base/dedup", s"$base/index", 10)
    StreamSegmentDedup.processBatch(docs, 0L, s"$base/dedup", s"$base/index", 10)
    val got = StreamSegmentDedup.readDedup(spark, s"$base/dedup").collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L,
      s"replay self-flagged: ${got.mkString("; ")}")
    // the image guard's identical window
    val img = Seq((1L, graft.operators.MultimodalOps.encodePngConst(4, 4, 1, 2, 3)))
      .toDF("asset_id", "payload")
    StreamImageDedup.processBatch(img, 0L, s"$base/iflags", s"$base/iidx")
    StreamImageDedup.processBatch(img, 0L, s"$base/iflags", s"$base/iidx")
    val flags = spark.read.parquet(s"$base/iflags").collect()
    assert(flags.isEmpty, s"image replay self-flagged: ${flags.mkString("; ")}")
  }
}
