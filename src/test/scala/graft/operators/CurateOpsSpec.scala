package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation pipeline: exact values are enforced by the q45
  * oracle; this spec pins the COMPOSITION properties — every stage is
  * active on this corpus (a vacuous stage tests nothing), the stages only
  * ever shrink the survivor set, and the survivors respect each stage's
  * invariant individually.
  */
class CurateOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every curation stage is active and survivors satisfy all stage invariants") {
    import spark.implicits._
    val all = Tables.documents(spark, sf)
    val train = all.filter(col("doc_id") % 20 =!= 0)
    val eval = all.filter(col("doc_id") % 20 === 0)
    val out = CurateOps.q45Curate(spark, sf)
    val survivors = out.select("doc_id").as[Long].collect().toSet
    assert(survivors.nonEmpty)

    // stage invariants, each checked against independent recomputation
    val tokens = split(col("text"), " ")
    val quality = train
      .withColumn("n_tokens", size(tokens))
      .withColumn("n_distinct", size(array_distinct(tokens)))
      .filter(col("n_tokens") >= 10 &&
        col("n_distinct") * 100 >= col("n_tokens") * 30)
    val qualityIds = quality.select("doc_id").as[Long].collect().toSet
    assert(qualityIds.size < train.count(), "quality stage was vacuous")
    assert(survivors.subsetOf(qualityIds), "a survivor failed the quality cut")

    // near-dup: no two survivors may be a >=0.9 pair, and the stage
    // actually dropped someone (the corpus has real near-dup groups)
    val pairs = DedupOps.minhashNearDup(quality)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "near-dup stage had no pairs to resolve (vacuous)")
    val bothSurvived = pairs.filter { case (a, b) =>
      survivors.contains(a) && survivors.contains(b) }
    assert(bothSurvived.isEmpty,
      s"near-dup pair survived curation intact: ${bothSurvived.take(3).toSeq}")

    // decontamination: no survivor shares a 5-gram with the eval set
    val contaminated = DedupOps.decontaminate(quality, eval)
      .filter(!col("keep")).select("doc_id").as[Long].collect().toSet
    assert(contaminated.nonEmpty, "decontamination stage was vacuous")
    assert(survivors.intersect(contaminated).isEmpty,
      "a contaminated document survived curation")

    // sampling: survivors are exactly the sampled subset of the clean set
    // (spot: the stage dropped someone, and kept keys obey the threshold)
    val sampledOut = out.filter(
      SampleOps.sampleKey(col("doc_id"), 0L, 10000L) >=
        when(col("lang") === "en", 8000L)
          .when(col("lang") === "zh", 2500L).otherwise(5000L))
    assert(sampledOut.isEmpty, "a survivor's sample key exceeds its stratum threshold")
    assert(survivors.size < qualityIds.size, "no stage after quality dropped anything")
  }

  test("pii redaction: injected emails and IPs are counted and replaced") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at alice.smith+x@mail.example.org or 192.168.0.1 ok"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c@d.io one ip 10.0.0.7"))
      .toDF("doc_id", "text")
    val (emails, ips) = TextOps.piiCounts(col("text"))
    val got = df.select(col("doc_id"), emails.as("e"), ips.as("i"),
      TextOps.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((1L, 1L, "reach me at <EMAIL> or <IP> ok")))
    assert(got(2L) == ((0L, 0L, "no pii here at all")))
    assert(got(3L) == ((2L, 1L, "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("q77 composition: doc counts match the gopher gate; percentiles are ordered") {
    val sf = "/root/testdata/sf0.001"
    val rows = CurateOps.q77CleanProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    val keptDocs = TextOps.q75GopherQuality(spark, sf)
      .filter(col("keep") === 1).count()
    assert(rows.map(_.getLong(1)).sum == keptDocs,
      "profile doc counts diverge from the quality gate's keep set")
    for (r <- rows) {
      val (mn, mx) = (r.getLong(2), r.getLong(3))
      val (p50, p90, p99) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(mn <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx, r.toString)
    }
    // stripping must have removed something somewhere: cleaned totals sit
    // strictly below the kept corpus' raw token totals
    val rawKept = graft.Tables.documents(spark, sf)
      .join(TextOps.q75GopherQuality(spark, sf)
        .filter(col("keep") === 1).select("doc_id"), Seq("doc_id"))
      .select(size(split(lower(col("text")), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(rows.map(_.getLong(4)).sum < rawKept)
  }

  test("q205 importance scoring: weights recompute by hand, the target " +
    "slice outscores the rest on average, selection is the exact " +
    "above-mean rule, and every document appears") {
    val out = CurateOps.q205ImportanceSample(spark, sf).collect()
    val nAll = Tables.documents(spark, sf).count()
    assert(out.length == nAll, "every document must appear (left join)")
    val scored = out.filter(_.getLong(1) > 0)
    assert(scored.nonEmpty)
    // exact above-mean rule: selected <=> score * n_docs >= sum(scores)
    val nDocs = scored.length.toLong
    val sSum = scored.map(r => BigInt(r.getLong(2))).sum
    out.foreach { r =>
      val expect = BigInt(r.getLong(2)) * nDocs >= sSum
      assert(r.getBoolean(3) == expect, s"doc ${r.getLong(0)}")
    }
    assert(out.exists(_.getBoolean(3)) && out.exists(!_.getBoolean(3)),
      "the mean rule must split the corpus")
    // the importance machinery's point: documents drawn from the target
    // slice (doc_id % 10 == 0) carry a HIGHER mean per-feature score
    // than the rest — their features define the target distribution
    def meanPerFeature(rs: Array[org.apache.spark.sql.Row]): Double = {
      val s = rs.map(r => BigInt(r.getLong(2))).sum
      val f = rs.map(_.getLong(1)).sum
      (BigDecimal(s) / BigDecimal(f)).toDouble
    }
    val (tgt, rest) = scored.partition(_.getLong(0) % 10 == 0)
    assert(tgt.nonEmpty && rest.nonEmpty)
    assert(meanPerFeature(tgt) > meanPerFeature(rest),
      "target-slice docs must outscore the raw rest per feature")
    // hand-recompute ONE document's score from first principles
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def buckets(text: String): Seq[Int] = {
      val w = text.toLowerCase.split(" ", -1)
      (0 until math.max(0, w.length - 1)).map { i =>
        val f = w(i) + " " + w(i + 1)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(f.getBytes("UTF-8"))
        ((md(0) & 0xff) << 4) | ((md(1) & 0xff) >> 4)
      }
    }
    val cntR = scala.collection.mutable.Map.empty[Int, Long]
    val cntT = scala.collection.mutable.Map.empty[Int, Long]
    docs.foreach { case (id, t) =>
      buckets(t).foreach { b =>
        cntR(b) = cntR.getOrElse(b, 0L) + 1
        if (id % 10 == 0) cntT(b) = cntT.getOrElse(b, 0L) + 1
      }
    }
    val rTot = cntR.values.sum
    val tTot = cntT.values.sum
    val one = docs.keys.min
    val expectScore = buckets(docs(one)).map { b =>
      (BigInt(cntT.getOrElse(b, 0L) + 1) * BigInt(rTot + 4096) * 10000) /
        (BigInt(cntR(b) + 1) * BigInt(tTot + 4096))
    }.sum
    val got = out.find(_.getLong(0) == one).get.getLong(2)
    assert(BigInt(got) == expectScore,
      s"doc $one: got $got expected $expectScore")
  }
}
