package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-code quality signals — the code-corpus counterpart of the
  * Gopher text rules (q75): code datasets filter on comment density,
  * license presence (SPDX), pathological line lengths, and detected
  * language BEFORE any dedup or training, and each signal is a cheap
  * per-row projection a 100 TB sweep can afford.
  *
  * Signals (one codegen projection, no UDFs):
  *   - language: shebang first (`#!…python`), else by dominant comment
  *     dialect (`//` → scala/c-family, `--` → sql, `#` → python-family)
  *     — the practical router when the file name is gone (crawled
  *     gists, pasted snippets);
  *   - comment lines per dialect (shebang excluded by SUBTRACTION, not
  *     lookahead — the oracle's RE2 has no lookahead, so the rule is
  *     expressed in the common dialect);
  *   - integer comment share (the q75 basis-point discipline);
  *   - SPDX license detection (`SPDX-License-Identifier`), the
  *     compliance gate every code pipeline needs;
  *   - max line length (minified/generated-code detector).
  *
  * The corpus builds a real file per document (language by `id % 3`,
  * optional shebang and SPDX header, comments every third line, one
  * planted long line) and the oracle replays every signal from doc_id
  * arithmetic.
  *
  * Scale shape (100 TB): split + filter/transform aggregates per row,
  * zero exchange.
  */
object CodeOps {

  private[graft] def tokOf(id: Long): String =
    Vector("#", "//", "--")((id % 3).toInt)
  private[graft] def langOf(id: Long): String =
    Vector("python", "scala", "sql")((id % 3).toInt)
  private[graft] def bodyLines(id: Long): Int = 6 + (id % 8).toInt
  private[graft] def hasShebang(id: Long): Boolean = id % 3 == 0 && id % 2 == 0
  private[graft] def hasLicense(id: Long): Boolean = id % 4 == 0

  /** One source file per document from pure arithmetic. */
  private[graft] def buildSource(id: Long): String = {
    val tok = tokOf(id)
    val sb = Vector.newBuilder[String]
    if (hasShebang(id)) sb += "#!/usr/bin/env python3"
    if (hasLicense(id)) {
      sb += s"$tok Copyright (c) 2026 Example Corp"
      sb += s"$tok SPDX-License-Identifier: MIT"
    }
    for (j <- 0 until bodyLines(id))
      sb += (if (j % 3 == 0) s"$tok step $j of $id" else s"val_$j = $id + $j")
    sb += "xline = \"" + "x" * (80 + (id % 40).toInt) + "\""
    sb.result().mkString("\n")
  }

  private[graft] def syntheticSource(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, buildSource(id))))
      .toDF("doc_id", "src")
  }

  /** q165: the quality projection — language routing, per-dialect
    * comment counts (shebang subtracted), integer comment share, SPDX
    * gate, max line length; every signal oracle-replayed.
    */
  def q165CodeQuality(spark: SparkSession, dir: String): DataFrame = {
    val lines = split(col("src"), "\n")
    def count(re: String): Column =
      size(filter(lines, l => l.rlike(re))).cast("long")
    val shebang = count("^#!")
    val hash = count("^\\s*#") - shebang
    val slash = count("^\\s*//")
    val dash = count("^\\s*--")
    val lang = when(shebang > 0, lit("python"))
      .when(slash > 0, lit("scala"))
      .when(dash > 0, lit("sql"))
      .when(hash > 0, lit("python"))
      .otherwise(lit("unknown"))
    val nComment = when(lang === "scala", slash)
      .when(lang === "sql", dash).otherwise(hash)
    val nLines = size(lines).cast("long")
    syntheticSource(Tables.documents(spark, dir))
      .select(col("doc_id"), lang.as("lang"), nLines.as("n_lines"),
        nComment.as("n_comment"),
        (nComment * 100 / nLines).cast("long").as("comment_pct"),
        array_max(transform(lines, l => length(l))).cast("long")
          .as("max_line_len"),
        count("SPDX-License-Identifier").gt(0).as("has_license"),
        (shebang > 0).as("has_shebang"))
      .orderBy(col("doc_id"))
  }
}
