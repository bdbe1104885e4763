package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Jupyter-notebook (nbformat) extraction — notebooks are a first-class
  * code-dataset source (the major code corpora all carry them), and
  * their JSON has a shape wart a rigid schema can't hold: a cell's
  * `source` is EITHER a list of line strings (canonical) OR one plain
  * string (legal, common in the wild). A `from_json` struct schema
  * silently nulls whichever form it wasn't given — so this operator is
  * the engine's showcase for Spark 4's native VARIANT path:
  * `parse_json` once, `variant_get` typed probes per field, and the
  * two source forms handled by `try_variant_get` + `coalesce` — still
  * pure codegen, no UDFs, no Scala-side JSON parsing.
  *
  * Extraction semantics: kernel language from
  * `metadata.kernelspec.language`; cells in order with `cell_type`
  * splitting code from markdown; per-cell text = the source lines
  * joined (or the plain string as-is — the corpus plants the wart on
  * `id % 5 == 0` with IDENTICAL text, so the hash only survives if
  * both forms decode); `outputs` (which carry text that must NEVER
  * leak into the corpus — execution results are not training text)
  * are structurally ignored.
  *
  * The oracle replays language, cell counts, and both per-kind text
  * shas from doc_id arithmetic.
  *
  * Scale shape (100 TB): one `parse_json` + variant probes per row,
  * zero exchange.
  */
object NotebookOps {

  // --------------------------------------------------------------- corpus

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private[graft] def codeText(id: Long, j: Int): String =
    s"import x_$id\nprint($id+$j)\n"
  private[graft] def mdText(id: Long, j: Int): String =
    s"# Head $id\ncell $j\n"
  private[graft] def nCells(id: Long): Int = 2 + (id % 4).toInt

  /** One notebook per document: alternating code/markdown cells, a
    * stream output that must not leak, and the string-form `source`
    * wart on the first cell of `id % 5 == 0` documents (same text, so
    * the hash pins both forms decoding identically).
    */
  private[graft] def buildNotebook(id: Long): String = {
    val cells = (0 until nCells(id)).map { j =>
      val code = j % 2 == 0
      val text = if (code) codeText(id, j) else mdText(id, j)
      val src =
        if (j == 0 && id % 5 == 0) "\"" + esc(text) + "\"" // the wart
        else text.split("\n", -1).dropRight(1)
          .map(l => "\"" + esc(l + "\n") + "\"").mkString("[", ",", "]")
      if (code)
        s"""{"cell_type":"code","execution_count":$j,"metadata":{},""" +
          s""""outputs":[{"output_type":"stream","name":"stdout",""" +
          s""""text":["LEAK $id should never surface"]}],"source":$src}"""
      else
        s"""{"cell_type":"markdown","metadata":{},"source":$src}"""
    }
    s"""{"nbformat":4,"nbformat_minor":5,"metadata":{"kernelspec":""" +
      s"""{"language":"python","name":"python3"}},""" +
      s""""cells":[${cells.mkString(",")}]}"""
  }

  private[graft] def syntheticNotebooks(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, buildNotebook(id))))
      .toDF("doc_id", "nb")
  }

  // ----------------------------------------------------------- extraction

  /** Cell text under BOTH source forms: list-of-lines joined, or the
    * plain string as-is.
    */
  private def cellText(c: Column): Column = coalesce(
    array_join(try_variant_get(c, "$.source", "array<string>"), ""),
    try_variant_get(c, "$.source", "string"),
    lit(""))

  /** q163: notebook extraction end to end — `parse_json` + variant
    * probes over the planted corpus; language, cell counts, and the
    * per-kind text shas (the wart under the code hash) all replayed by
    * the oracle from doc_id arithmetic.
    */
  def q163NotebookExtract(spark: SparkSession, dir: String): DataFrame = {
    val v = parse_json(col("nb"))
    val cells = variant_get(v, "$.cells", "array<variant>")
    def kindText(kind: String): Column = array_join(
      transform(
        filter(cells,
          c => variant_get(c, "$.cell_type", "string") === kind),
        c => cellText(c)),
      "")
    syntheticNotebooks(Tables.documents(spark, dir))
      .select(col("doc_id"),
        variant_get(v, "$.metadata.kernelspec.language", "string")
          .as("language"),
        size(cells).cast("long").as("n_cells"),
        size(filter(cells,
          c => variant_get(c, "$.cell_type", "string") === "code"))
          .cast("long").as("n_code"),
        size(filter(cells,
          c => variant_get(c, "$.cell_type", "string") === "markdown"))
          .cast("long").as("n_markdown"),
        sha2(kindText("code"), 256).as("code_sha"),
        sha2(kindText("markdown"), 256).as("md_sha"))
      .orderBy(col("doc_id"))
  }
}
