package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Polymorphic message parsing (SURVEY §2.3 D14, §1.1): the reference's
  * 5-way `type`-tagged message union (`ai` / `human` / `system` / `function`
  * / `tool`, reference `model/BaseMessage.java:28-47`) mapped to a sparse
  * union struct, plus the string-or-array content normalization
  * (`BaseMessage.java:67-91`: JSON `content` may be a string or an array of
  * strings; it is always normalized to an array and always serialized as an
  * array).
  *
  * Open `Map<String,Object>` attributes (kwargs / metadata / tool calls)
  * become `MapType(String, String)` — nested unknown values ride along as
  * JSON strings, lossless w.r.t. the reference, which never inspects them
  * (SURVEY §1.3).
  */
object Messages {

  val MessageTypes: Seq[String] = Seq("ai", "human", "system", "function", "tool")

  /** Sparse union schema: common fields plus every variant's extras
    * (AI: tool_calls/invalid_tool_calls; Function: function_call;
    * Tool: tool_call_id/tool_name). Absent fields parse as null.
    *
    * `content` is declared StringType on purpose: Spark's Jackson parser
    * captures a non-string value (the array form) as its raw JSON text, so
    * one parse yields either the plain string or the array text —
    * normalization then needs no second full-document scan.
    */
  val messageSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("content", StringType),
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("example", BooleanType),
    StructField("additional_kwargs", MapType(StringType, StringType)),
    StructField("response_metadata", MapType(StringType, StringType)),
    StructField("tool_calls", MapType(StringType, StringType)),
    StructField("invalid_tool_calls", MapType(StringType, StringType)),
    StructField("function_call", MapType(StringType, StringType)),
    StructField("tool_call_id", StringType),
    StructField("tool_name", StringType)))

  /** Content normalization from the parsed struct's `content` field (plain
    * string, or the raw JSON text of the array form — see messageSchema):
    * both become `array<string>`. Pure built-ins, no UDF, and no second
    * full-document parse.
    */
  def contentArray(contentField: Column): Column = {
    // JSON array text must start with '[' after JSON whitespace (space,
    // tab, CR, LF — exactly what Jackson skips): the prefix test skips the
    // Jackson parse attempt for every plain-string content row (half the
    // corpus in the registered q17) at the cost of a trim+compare.
    // Equivalent by case analysis: prefix '[' and parses → array (same as
    // before); prefix '[' and fails to parse → null → string branch
    // (same); no '[' prefix → could never parse as an array → string
    // branch (same).
    val parsed = when(ltrim(contentField, " \t\r\n").startsWith("["),
      from_json(contentField, ArrayType(StringType)))
    // bind the parse result as a lambda variable: the branch below
    // references it twice (null test + value), and from_json is a
    // CodegenFallback expression outside codegen CSE — inlined, array
    // rows would pay the Jackson parse twice (the same recompute hazard
    // the shingle/winnow pipelines hit with HOF lambdas)
    element_at(
      transform(array(parsed), arr =>
        when(contentField.isNull, lit(null).cast(ArrayType(StringType)))
          .when(arr.isNotNull, arr)
          .otherwise(array(contentField))),
      1)
  }

  /** Parse one message JSON into the sparse union struct. */
  def parseMessage(msgJson: Column): Column = from_json(msgJson, messageSchema)

  /** Serialize a parsed message back to wire JSON with the content always
    * as an array (the reference's serializer invariant).
    */
  def toWireJson(msgStruct: Column, contentArr: Column): Column =
    to_json(struct(
      msgStruct.getField("type").as("type"),
      contentArr.as("content"),
      msgStruct.getField("id").as("id"),
      msgStruct.getField("name").as("name"),
      msgStruct.getField("example").as("example"),
      msgStruct.getField("additional_kwargs").as("additional_kwargs"),
      msgStruct.getField("response_metadata").as("response_metadata"),
      msgStruct.getField("tool_calls").as("tool_calls"),
      msgStruct.getField("invalid_tool_calls").as("invalid_tool_calls"),
      msgStruct.getField("function_call").as("function_call"),
      msgStruct.getField("tool_call_id").as("tool_call_id"),
      msgStruct.getField("tool_name").as("tool_name")))

  /** Attach parsed-message columns to a DataFrame holding message JSON. */
  def parseMessages(df: DataFrame, jsonCol: String, out: String = "msg"): DataFrame =
    df.withColumn(out, parseMessage(col(jsonCol)))
      .withColumn(s"${out}_content", contentArray(col(s"$out.content")))
}
