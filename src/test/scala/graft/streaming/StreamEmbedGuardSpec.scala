package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming embedding near-dup GUARD: vectors are flagged at ingest
  * when an EARLIER vector (previous batch via the standing IVF index, or
  * a lower id within the same batch) reaches the cosine threshold — the
  * embedding-space mirror of `StreamNearDup`'s greedy earliest-arrival
  * contract. With `dupNprobe = nClusters` the probe is exhaustive, so the
  * drained stream's flags must equal a driver-side brute force over the
  * same arrival order — including accidental high-cosine pairs the
  * fixture did not plant.
  */
class StreamEmbedGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val K = 4
  private val T = 0.9
  private val dim = 8

  // deterministic pseudo-random integer vectors; planted relations below
  private def baseVec(i: Int): Array[Double] =
    Array.tabulate(dim)(d => (((i * 31 + d * 7) % 13) - 6).toDouble)

  private def vec(i: Int): Array[Double] = i match {
    case 13 => baseVec(11) // same-batch exact dup (11 arrives first)
    case 15 => baseVec(3) // cross-batch exact dup of batch-0's 3
    case 24 => baseVec(15).map(_ * 2.0) // dup of 15 AND 3 (scale-invariant)
    case 27 => { val v = baseVec(5); v(0) += 0.05; v } // near-dup of 5
    case _ => baseVec(i)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    def norm(x: Array[Double]) = math.sqrt(x.map(v => v * v).sum)
    val (na, nb) = (norm(a), norm(b))
    a.zip(b).map { case (x, y) => (x / na) * (y / nb) }.sum
  }

  test("drained guard flags == brute-force earliest-arrival cosine dedup; replay keeps the first view") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sembed_guard_").toString
    val batches = Seq(1 to 10, 11 to 20, 21 to 30)
    for ((ids, b) <- batches.zipWithIndex)
      ids.map(i => (i.toLong, vec(i).toSeq))
        .toDF("vec_id", "embedding")
        .coalesce(1).write.parquet(s"$base/feed/chunk=$b")

    val q = StreamEmbedIndex.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/index", nClusters = K,
      dupFlagsDir = Some(s"$base/flags"), dupThreshold = T, dupNprobe = K)
    q.awaitTermination(180000L)
    assert(!q.isActive, "stream did not drain")

    // driver-side brute force over the same arrival order: flagged iff an
    // earlier vector reaches T; best match = highest cosine, ties to the
    // lowest id (the guard's window order)
    val arrival = batches.zipWithIndex.flatMap { case (ids, b) => ids.map(i => (i, b)) }
    val expected = (for {
      (i, bi) <- arrival
      earlier = arrival.filter { case (j, bj) => bj < bi || (bj == bi && j < i) }
      matches = earlier.map { case (j, _) => (j, cosine(vec(i), vec(j))) }
        .filter(_._2 >= T)
      if matches.nonEmpty
    } yield {
      val best = matches.minBy { case (j, c) => (-c, j) }
      i.toLong -> best._1.toLong
    }).toMap
    // the fixture's planted relations must all be present (guards the
    // fixture itself against drift making the test vacuous)
    assert(Set(13L, 15L, 24L, 27L).subsetOf(expected.keySet), expected.toString)

    val got = spark.read.parquet(s"$base/flags")
      .select(col("vec_id"), col("dup_of"), col("cos"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet,
      s"flagged sets differ: only-stream=${got.keySet -- expected.keySet} " +
        s"only-bruteforce=${expected.keySet -- got.keySet}")
    for ((id, dupOf) <- expected) {
      assert(got(id)._1 == dupOf, s"best match for $id: got ${got(id)._1}, want $dupOf")
      val want = cosine(vec(id.toInt), vec(dupOf.toInt))
      assert(math.abs(got(id)._2 - want) < 1e-9, s"cosine drifted for $id")
    }

    // crash-replay AFTER the append: recomputing batch 1's flags with its
    // own delta already in the index must reproduce the original view
    // (the standing leg reads generations < 1 only)
    val origB1 = spark.read.parquet(s"$base/flags/batch_id=1")
      .select(col("vec_id"), col("dup_of")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/flags/batch_id=1"), true)
    val c1 = batches(1).map(i => (i.toLong, vec(i).toSeq)).toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    StreamEmbedIndex.processGuard(spark, c1, 1L, s"$base/index", s"$base/flags", T, K)
    val replayB1 = spark.read.parquet(s"$base/flags/batch_id=1")
      .select(col("vec_id"), col("dup_of")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replayB1 == origB1, "replay after append changed the guard's view")

    // first-write-wins: committed flags are never recomputed
    Seq((424242L, 7L, 1.0)).toDF("vec_id", "dup_of", "cos")
      .write.mode("overwrite").parquet(s"$base/flags/batch_id=2")
    StreamEmbedIndex.processGuard(spark, c1, 2L, s"$base/index", s"$base/flags", T, K)
    assert(spark.read.parquet(s"$base/flags/batch_id=2")
      .select(col("vec_id")).head.getLong(0) == 424242L,
      "a committed flags dir was recomputed")
  }

  test("registered q71 == driver-side brute force over the replayed arrival order") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q71_embed_guard_parity")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // independent reference: every (vec_id % 5) vector against all earlier
    // arrivals (batch = vec_id % 3; within batch by id), threshold 0.25
    val vecs = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def nrm(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val normed = vecs.map { case (id, v) => id -> nrm(v) }
    var expected = Map.empty[Long, (Long, Double)]
    for (a <- normed.keys) {
      val earlier = normed.keys.filter(b =>
        (b % 3 < a % 3) || (b % 3 == a % 3 && b < a))
      val scored = earlier.map { b =>
        (b, normed(a).zip(normed(b)).map { case (x, y) => x * y }.sum)
      }.filter(_._2 >= 0.25)
      if (scored.nonEmpty) {
        val best = scored.minBy { case (b, c) => (-c, b) }
        expected += a -> best
      }
    }
    assert(rows.keySet == expected.keySet,
      s"flag set diverged: extra=${(rows.keySet -- expected.keySet).take(3)} " +
        s"missing=${(expected.keySet -- rows.keySet).take(3)}")
    for ((id, (dupOf, cos)) <- expected) {
      assert(rows(id)._1 == dupOf, s"dup_of mismatch for $id")
      assert(math.abs(rows(id)._2 - cos) < 1e-12, s"cosine drifted for $id")
    }
    assert(rows.nonEmpty, "parity slice produced no flags")
  }
}
