package graft.operators

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Dedup operator tests at sf0.001: LSH result parity vs brute force, plan
  * shape (bucketed join, never a cartesian product), and SimHash locality.
  */
class DedupOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("minhash LSH near-dup == brute force at threshold 0.9 (full recall)") {
    val docs = Tables.documents(spark, sf)
    val lsh = DedupOps.minhashNearDup(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = DedupOps.bruteForceNearDup(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh == brute,
      s"missed=${(brute -- lsh).take(5)} extra=${(lsh -- brute).take(5)}")
  }

  test("LSH candidate generation is a bucket equi-join, not a cartesian") {
    val plan = planOf(DedupOps.minhashNearDup(Tables.documents(spark, sf), 0.9))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("exact n-gram Jaccard == brute force pairs AND values at threshold 0.8") {
    val docs = Tables.documents(spark, sf)
    val idx = DedupOps.ngramJaccardNearDup(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = DedupOps.bruteForceNearDup(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(brute.nonEmpty, "testdata should contain pairs above 0.8")
    assert(idx.keySet == brute.keySet,
      s"missed=${(brute.keySet -- idx.keySet).take(5)} extra=${(idx.keySet -- brute.keySet).take(5)}")
    // the inverted-index path is EXACT: values must agree, not just pairs
    idx.foreach { case (pair, j) =>
      assert(math.abs(j - brute(pair)) < 1e-12, s"$pair: $j vs ${brute(pair)}")
    }
  }

  test("n-gram Jaccard posting join is an equi-join, not a cartesian") {
    val plan = planOf(DedupOps.ngramJaccardNearDup(Tables.documents(spark, sf), 0.8))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("dedupGroups == driver union-find over the same pairs (components, min label)") {
    import spark.implicits._
    // hand graph: a 4-chain (0-1-2-3), a triangle (10,11,12), an isolated
    // pair (20,21) — exercises multi-hop propagation, not just 1 round
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = DedupOps.dedupGroups(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: textbook union-find on the collected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .foreach { case (a, b) => parent(find(a)) = find(b) }
    val roots = parent.keys.map(k => k -> find(k)).toMap
    val minOf = roots.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    val expected = roots.map { case (k, r) => k -> minOf(r) }
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("dedupGroups memoizes repeat calls on the live cache, recomputes after eviction") {
    import spark.implicits._
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b")
    val first = DedupOps.dedupGroups(pairs)
    val firstRows = first.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // an identical-plan repeat returns the memoized frame itself — the
    // propagation loop (and its per-generation cache churn) never reruns
    val second = DedupOps.dedupGroups(
      Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b"))
    assert(second eq first, "repeat call did not hit the resolution memo")
    // a DIFFERENT pair set must not alias (sameResult, not a weak hash)
    val other = DedupOps.dedupGroups(Seq((7L, 8L)).toDF("doc_a", "doc_b"))
    assert(!(other eq first))
    assert(other.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((7L, 7L), (8L, 7L)))
    // cache eviction invalidates the memo: the next call recomputes and
    // still answers correctly (the memo is never a second source of truth)
    spark.catalog.clearCache()
    val third = DedupOps.dedupGroups(
      Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b"))
    assert(!(third eq first), "memo served a frame whose cache was evicted")
    assert(third.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == firstRows)
  }

  test("exact dedup groups all docs and keeps min ids") {
    val docs = Tables.documents(spark, sf)
    val out = DedupOps.q18ExactDedup(spark, sf)
    assert(out.count() > 0)
    // no exact dups in this corpus: every group has one member
    assert(out.agg(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0) == docs.count())
  }

  test("simhash: near-dup pairs are closer in Hamming space than random pairs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val fps = docs.select(col("doc_id"),
      DedupOps.simhash(DedupOps.shingles(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearPairs = DedupOps.bruteForceNearDup(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val nearHam = nearPairs.map { case (a, b) => ham(fps(a), fps(b)).toDouble }
    val ids = fps.keys.toVector.sorted
    val randHam = (for (i <- 0 until 200) yield {
      val a = ids(i % ids.size); val b = ids((i * 37 + 11) % ids.size)
      if (a == b) None else Some(ham(fps(a), fps(b)).toDouble)
    }).flatten
    assert(nearHam.nonEmpty && randHam.nonEmpty)
    val nearAvg = nearHam.sum / nearHam.size
    val randAvg = randHam.sum / randHam.size
    assert(nearAvg < randAvg / 2,
      s"simhash not locality-sensitive: near=$nearAvg rand=$randAvg")
  }

  test("shingles of a short text (< n words) are empty, matching the oracle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Seq("one two", "a", "", "alpha beta gamma delta")
      .toDF("text")
      .select(DedupOps.shingles(col("text")).as("sh"))
      .collect().map(r => r.getSeq[String](0).toVector)
    assert(out(0).isEmpty && out(1).isEmpty && out(2).isEmpty)
    assert(out(3) == Vector("alpha beta gamma", "beta gamma delta"))
  }

  test("simhash near-dup never pairs shingle-less short docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two unrelated sub-n-word docs would both fingerprint to 0 without
    // the empty-shingle exclusion, reading as a hamming-0 duplicate pair
    val docs = Seq((1L, "hello"), (2L, "bye now"),
      (3L, "alpha beta gamma delta epsilon"), (4L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDup(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 4L)), pairs.toString)
  }

  test("simhash hamming join runs bucketed (no cartesian)") {
    val df = DedupOps.simhashNearDup(Tables.documents(spark, sf), maxHamming = 3)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), plan)
    df.collect() // executes without error; may legitimately be empty
  }

  test("q121 segment dedup: first occurrence wins, reassembly ordered, within-doc repeats drop") {
    import spark.implicits._
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val block = words("dup", 4) // a 4-word segment at segWords = 4
    // doc 1 owns `block` at segment 2 and REPEATS it at segment 4;
    // doc 2 copies it mid-document; doc 3 is untouched organic text
    val docs = Seq(
      (1L, s"${words("a", 4)} $block ${words("b", 4)} $block"),
      (2L, s"${words("c", 4)} $block ${words("d", 3)}"),
      (3L, words("e", 7))).toDF("doc_id", "text")
    val out = DedupOps.segmentDedup(docs, segWords = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1: 4 segments, the repeated block's SECOND copy drops
    assert(out(1L)._1 == 4 && out(1L)._2 == 3)
    assert(out(1L)._3 == sha(s"${words("a", 4)} $block ${words("b", 4)}"))
    // doc 2: 3 segments, the copied block drops, surrounding text remains
    // IN ORDER
    assert(out(2L)._1 == 3 && out(2L)._2 == 2)
    assert(out(2L)._3 == sha(s"${words("c", 4)} ${words("d", 3)}"))
    // doc 3: untouched (incl. the trailing partial segment)
    assert(out(3L)._1 == 2 && out(3L)._2 == 2)
    assert(out(3L)._3 == sha(words("e", 7)))
  }

  test("q121: a fully-duplicate document reassembles to the empty text") {
    import spark.implicits._
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val out = DedupOps.segmentDedup(docs, segWords = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._1 == 2)
    assert(out(2L)._1 == 0 && out(2L)._2 == sha(""), out(2L).toString)
  }
}
