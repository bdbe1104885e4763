package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q202 SFT chat-template + loss-mask construction: hand-checked turn
  * boundaries and mask offsets (the off-by-one-on-a-tag-token class of
  * label corruption), edge docs, and the no-shuffle plan shape.
  */
class ChatSftSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.SparkTestSession.spark

  private def run(texts: Seq[String]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chatsft").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    PackOps.q202ChatSft(spark, dir).collect()
  }

  test("hand-checked: 12 tokens cut at 4/8/10; rendered layout and " +
    "both mask spans land exactly on assistant content") {
    val text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 ta tb" // n = 12
    val row = run(Seq(text)).head
    // c1 = 4, c2 = 8, c3 = 10
    assert(row.getLong(1) == 12) // n_tokens
    assert(row.getLong(2) == 18) // n_rendered = n + 6
    // rendered: <|user|> t0..t3 <|assistant|> t4..t7 <|end|>
    //           <|user|> t8 t9 <|assistant|> ta tb <|end|>
    // 0-based token index of t4 = 1 + 4 + 1 = 6
    assert(row.getLong(3) == 6, "mask1_start")
    assert(row.getLong(4) == 4, "mask1_len")
    // t a at: 6 + 4 (a1) + 1 (end) + 1 (user) + 2 (u2) + 1 (asst) = 15
    assert(row.getLong(5) == 15, "mask2_start")
    assert(row.getLong(6) == 2, "mask2_len")
    val rendered = "<|user|> t0 t1 t2 t3 <|assistant|> t4 t5 t6 t7 " +
      "<|end|> <|user|> t8 t9 <|assistant|> ta tb <|end|>"
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(rendered.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(row.getString(7) == sha, "rendered_sha")
    // the mask spans, read back out of the rendered token stream, are
    // EXACTLY the assistant words — the label-integrity property
    val toks = rendered.split(" ")
    assert(toks.slice(6, 6 + 4).mkString(" ") == "t4 t5 t6 t7")
    assert(toks.slice(15, 15 + 2).mkString(" ") == "ta tb")
  }

  test("edges: 1- and 2-token docs produce empty turns with consistent " +
    "arithmetic (masks may be empty, never negative or overlapping)") {
    for (row <- run(Seq("only", "two tokens", "a b c d e"))) {
      val n = row.getLong(1)
      val (m1s, m1l, m2s, m2l) =
        (row.getLong(3), row.getLong(4), row.getLong(5), row.getLong(6))
      assert(m1l >= 0 && m2l >= 0)
      assert(m1s + m1l <= m2s, s"n=$n spans overlap")
      assert(m2s + m2l <= row.getLong(2) - 1, s"n=$n mask past <|end|>")
    }
  }

  test("plan: zero exchanges before the output sort (pure column " +
    "algebra, the q194/q198 contract)") {
    val df = PackOps.q202ChatSft(spark, "/root/testdata/sf0.001")
    df.collect()
    val exch = graft.SparkTestSession.finalPlan(df).collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if !Seq(org.apache.spark.sql.execution.exchange.REPARTITION_BY_COL,
            org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
          .contains(s.shuffleOrigin) => s
    }.count(_.outputPartitioning.toString.toLowerCase.contains("hash"))
    assert(exch == 0)
  }
}
