package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SampleOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Driver-side replica of the engine's keying — the determinism oracle. */
  private def key(id: Long, salt: Long, mod: Long): Long = {
    val folded = java.lang.Math.floorMod(id + salt, 1000000007L)
    java.lang.Math.floorMod(folded * 2654435761L, mod)
  }

  test("stratified sample equals the driver-side arithmetic exactly (deterministic)") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1))
    val rates = Map("en" -> 8000L, "zh" -> 2500L)
    val expected = docs.collect {
      case (id, lang) if key(id, 0L, 10000L) < rates.getOrElse(lang, 5000L) => id
    }.toSet
    val got = SampleOps.q41StratifiedSample(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // a rerun is bit-identical (no RNG anywhere)
    val again = SampleOps.q41StratifiedSample(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("sampling rates are honored per stratum (keying uniformity)") {
    val docs = Tables.documents(spark, sf)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SampleOps.q41StratifiedSample(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rate = Map("en" -> 0.8, "zh" -> 0.25).withDefaultValue(0.5)
    total.foreach { case (lang, n) =>
      val f = kept.getOrElse(lang, 0L).toDouble / n
      // strata are ~100-200 docs at sf0.001: generous binomial tolerance
      assert(math.abs(f - rate(lang)) < 0.15,
        s"lang=$lang sampled $f of $n, wanted ~${rate(lang)}")
    }
  }

  test("weighted mix: per-row copy counts match the weight formula exactly") {
    val out = SampleOps.q42WeightedMix(spark, sf)
      .groupBy("doc_id", "lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, lang) =>
      val (base, fracBp) = lang match {
        case "en" => (1L, 5000L)
        case "zh" => (0L, 5000L)
        case _    => (1L, 0L)
      }
      (id, lang, base + (if (key(id, 1L, 10000L) < fracBp) 1L else 0L))
    }.filter(_._3 > 0).toSet
    assert(out.toSet == expected,
      s"copies diverged, e.g. ${(expected -- out.toSet).take(3)}")
    // weight semantics spot checks: en rows appear 1-2x, zh 0-1x, rest exactly 1x
    val byLang = out.groupBy(_._2)
    assert(byLang("en").forall(r => r._3 == 1 || r._3 == 2))
    byLang.get("zh").foreach(rs => assert(rs.forall(_._3 == 1))) // zh rows present appear once
    (byLang.keySet -- Set("en", "zh")).foreach(l => assert(byLang(l).forall(_._3 == 1)))
    // and the fractional part really up-samples ~half of en
    val enTwice = byLang("en").count(_._3 == 2).toDouble / byLang("en").size
    assert(math.abs(enTwice - 0.5) < 0.2, s"en 2-copy fraction $enTwice")
  }

  test("mix order is keyed, not clustered: strata interleave through the epoch") {
    val langs = SampleOps.q42WeightedMix(spark, sf)
      .select("lang").collect().map(_.getString(0))
    // if the epoch were emitted stratum-by-stratum the number of adjacent
    // lang changes would be ~#strata; keyed ordering mixes rows so changes
    // are a large fraction of all positions
    val changes = langs.sliding(2).count { case Array(a, b) => a != b; case _ => false }
    assert(changes > langs.length / 4,
      s"epoch looks stratum-clustered: $changes changes over ${langs.length} rows")
  }

  test("property: arbitrary rates and weights match the driver replica") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val langs = docs.map(_._2).distinct.toSeq
    val rnd = new scala.util.Random(8)
    for (i <- 1 to 5) {
      val rates = langs.filter(_ => rnd.nextBoolean()).map(_ -> rnd.nextDouble()).toMap
      val dflt = rnd.nextDouble()
      val got = SampleOps.stratifiedSample(
        Tables.documents(spark, sf), "lang", "doc_id", rates, dflt)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val expected = docs.collect {
        case (id, lang)
          if key(id, 0L, 10000L) < math.round(rates.getOrElse(lang, dflt) * 10000) => id
      }.toSet
      assert(got == expected, s"rates config $i diverged: rates=$rates default=$dflt")
    }
    for (i <- 1 to 5) {
      val ws = langs.filter(_ => rnd.nextBoolean()).map(_ -> rnd.nextDouble() * 3).toMap
      val dflt = rnd.nextDouble() * 2
      val out = SampleOps.weightedMix(
        Tables.documents(spark, sf), "lang", "doc_id", ws, dflt)
        .groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = docs.map { case (id, lang) =>
        val w = ws.getOrElse(lang, dflt)
        val extra =
          if (key(id, 1L, 10000L) < math.round((w - math.floor(w)) * 10000)) 1L else 0L
        id -> (math.floor(w).toLong + extra)
      }.filter(_._2 > 0).toMap
      assert(out == expected, s"weights config $i diverged: ws=$ws default=$dflt")
    }
  }

  test("plans: sampling is a pure scan+filter, mixing adds only the epoch range sort") {
    // count exchange NODES, excluding the r21 input-widening repartition
    // (Tables.widen, REPARTITION_BY_COL origin, a no-op at scale): the
    // pin is that the SAMPLERS add no hash exchange of their own
    def requiredHash(df: org.apache.spark.sql.DataFrame): Int =
      graft.SparkTestSession.finalPlan(df).collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if !Seq(org.apache.spark.sql.execution.exchange.REPARTITION_BY_COL,
              org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
            .contains(s.shuffleOrigin) &&
            s.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => s
      }.size
    val df41 = SampleOps.q41StratifiedSample(spark, sf)
    val p41 = df41.queryExecution.executedPlan.toString
    assert(requiredHash(df41) == 0 && !p41.contains("Join"), p41)
    assert(p41.contains("rangepartitioning"), p41) // only the ORDER BY
    val df42 = SampleOps.q42WeightedMix(spark, sf)
    val p42 = df42.queryExecution.executedPlan.toString
    assert(requiredHash(df42) == 0 && !p42.contains("Join"), p42)
    assert(p42.contains("rangepartitioning") && p42.contains("Generate"), p42)
  }

  test("uniform group sample: exact k, deterministic, salt-decorrelated, scrambled") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val groupSizes = docs.groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()
      .map { case (l, s, n) => (l, s) -> n }.toMap
    val picked = SampleOps.uniformGroupSample(docs, Seq("lang", "source"), "doc_id", 5)
      .as[(String, String, Long)].collect().toSeq
    // exact k per group, all of a smaller group
    val perGroup = picked.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).toSet).toMap
    assert(perGroup.keySet == groupSizes.keySet)
    for ((g, ids) <- perGroup)
      assert(ids.size == math.min(5L, groupSizes(g)), s"group $g picked ${ids.size}")
    // deterministic: a second run picks the identical set
    val again = SampleOps.uniformGroupSample(docs, Seq("lang", "source"), "doc_id", 5)
      .as[(String, String, Long)].collect().toSeq
    assert(picked.toSet == again.toSet)
    // a different salt draws a different sample
    val other = SampleOps.uniformGroupSample(docs, Seq("lang", "source"), "doc_id", 5, salt = 99L)
      .as[(String, String, Long)].collect().toSeq
    assert(picked.toSet != other.toSet)
    // the key scrambles: picks are neither the k lowest nor the k highest ids
    val someGroup = groupSizes.maxBy(_._2)._1
    assert(groupSizes(someGroup) > 10, s"largest group too small for the scramble check: $groupSizes")
    val groupIds = docs.filter(col("lang") === someGroup._1 && col("source") === someGroup._2)
      .select("doc_id").as[Long].collect().sorted
    val got = perGroup(someGroup)
    assert(got != groupIds.take(5).toSet && got != groupIds.takeRight(5).toSet,
      s"sample of $someGroup degenerated to an id-extreme: $got")
    // bounded-aggregate plan: no window sort of the corpus
    val plan = SampleOps.q60UniformGroupSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
