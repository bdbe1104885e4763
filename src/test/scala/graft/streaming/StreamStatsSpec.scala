package graft.streaming

import graft.SparkTestSession
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming exact length profile (the CountHistogram payoff): the same
  * q54 numbers, continuously, with one histogram state row per language.
  */
class StreamStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("batch q73 (CountHistogram form) == q54 (groupBy+window form) exactly") {
    val q54 = graft.SparkEntry.queries("q54_length_profile")(spark, sf)
      .collect().toSeq
    val q73 = graft.SparkEntry.queries("q73_length_profile_agg")(spark, sf)
      .collect().toSeq
    assert(q54.nonEmpty && q73 == q54)
  }

  test("drained streaming profile == batch profile; one state row per language") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sstats_").toString
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // three deterministic arrival chunks
    docs.grouped(math.max(docs.length / 3, 1)).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toSeq.toDF("doc_id", "lang", "text")
        .coalesce(1).write.parquet(s"$base/feed/f$i")
    }
    val stream = spark.readStream
      .schema("doc_id LONG, lang STRING, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/feed/f*")
    val q = StreamStats.lengthProfile(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("sstats")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")

    val got = spark.table("sstats").orderBy("lang").collect().toSeq
    val want = TextOps.q54LengthProfile(spark, sf).collect().toSeq
    assert(got.nonEmpty && got.map(_.toString) == want.map(_.toString),
      s"streaming profile diverged from batch:\ngot  ${got.take(2)}\nwant ${want.take(2)}")

    // bounded state: one histogram row per language, however many rows
    // streamed through
    val langs = want.map(_.getString(0)).distinct.size
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows == langs.toLong,
      s"expected $langs state rows (one histogram per language), got $stateRows")
  }

  test("drained streaming vocab sketch == batch q97 derivation over the corpus") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_svocab_").toString
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.grouped(math.max(docs.length / 3, 1)).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toSeq.toDF("doc_id", "lang", "text")
        .coalesce(1).write.parquet(s"$base/feed/f$i")
    }
    val stream = spark.readStream
      .schema("doc_id LONG, lang STRING, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/feed/f*")
    val q = StreamStats.vocabSketch(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("svocab")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")
    // the sketch is a pure max-merge: streamed == batch BIT-FOR-BIT,
    // including the register digest and the IEEE estimate
    val got = spark.table("svocab").orderBy("lang").collect().map(_.toString).toSeq
    val want = StreamStats.vocabSketch(
        docs.toSeq.toDF("doc_id", "lang", "text"))
      .orderBy("lang").collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want,
      s"vocab sketch diverged:\ngot  ${got.take(2)}\nwant ${want.take(2)}")
  }
}
