package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip tests for the polymorphic message model, mirroring the
  * reference's `BaseMessageTest.java:26-39`: every tagged variant parses,
  * string and array content both normalize to arrays, and serialization
  * always emits array content (stable under a second parse).
  */
class MessagesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val samples = Seq(
    ("""{"type":"ai","content":"hello there","id":"11111111-1111-1111-1111-111111111111","tool_calls":{"f":"{\"arg\":1}"}}""",
      "ai", Seq("hello there")),
    ("""{"type":"human","content":["line one","line two"],"name":"user1"}""",
      "human", Seq("line one", "line two")),
    ("""{"type":"system","content":"sys prompt","example":true}""",
      "system", Seq("sys prompt")),
    ("""{"type":"function","content":"result","function_call":{"name":"fn"}}""",
      "function", Seq("result")),
    ("""{"type":"tool","content":["out"],"tool_call_id":"tc1","tool_name":"search"}""",
      "tool", Seq("out")))

  test("5-way tag dispatch + content normalization (string and array)") {
    import spark.implicits._
    val df = Messages.parseMessages(
      samples.map(_._1).toDF("json"), "json")
    val rows = df.select(
      col("msg.type"), col("msg_content"),
      col("msg.tool_calls"), col("msg.function_call"),
      col("msg.tool_call_id"), col("msg.tool_name"), col("msg.example")).collect()
    for (((_, tpe, content), r) <- samples.zip(rows)) {
      assert(r.getString(0) == tpe)
      assert(r.getSeq[String](1) == content, s"content mismatch for $tpe")
    }
    // variant-specific fields land only on their variants
    assert(rows(0).getMap[String, String](2)("f") == """{"arg":1}""")
    assert(rows(3).getMap[String, String](3)("name") == "fn")
    assert(rows(4).getString(4) == "tc1" && rows(4).getString(5) == "search")
    assert(rows(2).getBoolean(6))
  }

  test("serialization emits array content; parse(serialize(x)) is stable") {
    import spark.implicits._
    val df = Messages.parseMessages(samples.map(_._1).toDF("json"), "json")
      .withColumn("wire", Messages.toWireJson(col("msg"), col("msg_content")))
    // every wire form has array content now
    val wires = df.select("wire").as[String].collect()
    assert(wires.forall(_.contains("\"content\":[")), wires.mkString("\n"))
    val reparsed = Messages.parseMessages(df.select(col("wire").as("json")), "json")
      .select(col("msg.type"), col("msg_content")).collect()
    for (((_, tpe, content), r: Row) <- samples.zip(reparsed)) {
      assert(r.getString(0) == tpe)
      assert(r.getSeq[String](1) == content, s"round-trip content mismatch for $tpe")
    }
  }

  test("malformed content types yield null, not a crash (error-as-value D15)") {
    import spark.implicits._
    val df = Messages.parseMessages(
      Seq("""not json at all""", """{"type":"ai"}""").toDF("json"), "json")
    val rows = df.select(col("msg.type"), col("msg_content")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getString(0) == "ai" && rows(1).isNullAt(1))
  }
}
