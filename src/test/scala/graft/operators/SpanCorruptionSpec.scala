package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T5-style span corruption: hand-checked sentinel layout, mask-rate
  * arithmetic, short-document edges, and the q194 shape.
  */
class SpanCorruptionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("hand-checked corruption: spans at positions {3,4}, {10,11}; " +
    "sentinels ordinal; target closed by the final sentinel") {
    import spark.implicits._
    // 13 tokens t0..t12: spans {t3 t4} and {t10 t11}
    val text = (0 until 13).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    // run the same projection q194 applies by writing the doc through
    // a temp table dir
    val dir = java.nio.file.Files.createTempDirectory("graft_span_").toString
    df.write.parquet(s"$dir/documents.parquet")
    val row = PackOps.q194SpanCorruption(spark, dir).collect().head
    assert(row.getLong(1) == 13 && row.getLong(2) == 2 && row.getLong(3) == 4)
    val wantInput = "t0 t1 t2 <extra_id_0> t5 t6 t7 t8 t9 <extra_id_1> t12"
    val wantTarget = "<extra_id_0> t3 t4 <extra_id_1> t10 t11 <extra_id_2>"
    assert(row.getString(4) ==
      org.apache.commons.codec.digest.DigestUtils.sha256Hex(wantInput))
    assert(row.getString(5) ==
      org.apache.commons.codec.digest.DigestUtils.sha256Hex(wantTarget))
  }

  test("edges: a truncated last span (1 token) and a doc too short for " +
    "any span") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_span_").toString
    Seq(
      (1L, "a b c d e"), // n=5: one span {d, e}... positions 3,4 = d e
      (2L, "a b c d"), // n=4: span start 3, tail beyond: {d} only
      (3L, "a b c") // n=3: no span
    ).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = PackOps.q194SpanCorruption(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L) == ((5L, 1L, 2L)))
    assert(byId(2L) == ((4L, 1L, 1L)), "truncated last span masks 1 token")
    assert(byId(3L) == ((3L, 0L, 0L)))
    def sha(s: String) =
      org.apache.commons.codec.digest.DigestUtils.sha256Hex(s)
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getString(4) == sha("a b c <extra_id_0>"))
    assert(r2.getString(5) == sha("<extra_id_0> d <extra_id_1>"))
    val r3 = rows.find(_.getLong(0) == 3L).get
    assert(r3.getString(4) == sha("a b c"))
    assert(r3.getString(5) == sha(""))
  }

  test("q194 on sf0.001: mask rate lands at the designed ~2/7 and no " +
    "shuffle precedes the output sort") {
    val df = PackOps.q194SpanCorruption(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, spans, masked) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(spans == (n + 3) / 7)
      assert(masked == (n + 3) / 7 + (n + 2) / 7)
    }
    val totalN = rows.map(_.getLong(1)).sum
    val totalM = rows.map(_.getLong(3)).sum
    val bp = totalM * 10000 / totalN
    assert(bp > 2400 && bp < 3000, s"mask rate $bp bp should be ~2857")
    val plan = graft.SparkTestSession.finalPlan(df)
    val ex = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if !Seq(org.apache.spark.sql.execution.exchange.REPARTITION_BY_COL,
            org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
          .contains(s.shuffleOrigin) => s
    }.filterNot(_.outputPartitioning.toString.toLowerCase.contains("range"))
    assert(ex.isEmpty, s"span corruption must not shuffle:\n$plan")
  }
}
