package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shared fold for the SRP bucket keys (mirror-object static for codegen).
  * Hyperplane components are the same deterministic SplitMix64 stream the
  * builtin form ships as literal arrays — plane p, component j =
  * `splitmix((p << 32) | j) / 2^63` — materialized once per (tables, bits,
  * dim) per JVM and shared across tasks.
  *
  * Semantics are bit-identical to the builtin fold, INCLUDING the
  * dimension-mismatch trap: a vector whose length differs from `dim` makes
  * every plane dot null in the builtin (DotFold's length check), which
  * `when(dot > 0, 1)` turns into an all-zero key — reproduced here so the
  * parity test covers it. A null element yields the same all-zero bit the
  * null-propagating builtin produced.
  */
object SrpFold {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Boolean), Array[Double]]()

  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Flat (tables*bits) x dim plane matrix, row-major by plane index.
    *
    * Two plane families share the fold:
    *  - `portable = false`: SplitMix64 doubles in [-1, 1] — the fast
    *    production stream (plane p, component j = `splitmix((p << 32) | j)
    *    / 2^63`).
    *  - `portable = true`: small INTEGERS in [-5003, 5003] from a
    *    multiply-mod stream any SQL engine evaluates with plain bigint
    *    arithmetic (`((p·1000003 + j) mod 1000000007) · 2654435761 mod
    *    10007 − 5003`, q72's formula). Over int8-code inputs every dot
    *    term and partial sum is an integer below 2^53, so the double
    *    accumulation is EXACT and the sign decision replays bit-for-bit
    *    in an oracle (the q62 float-free-score discipline).
    */
  def planes(nPlanes: Int, dim: Int, portable: Boolean = false): Array[Double] =
    planeCache.computeIfAbsent((nPlanes, dim, portable), { _ =>
      val out = new Array[Double](nPlanes * dim)
      var p = 0
      while (p < nPlanes) {
        var j = 0
        while (j < dim) {
          out(p * dim + j) =
            if (portable)
              ((((p.toLong * 1000003L + j) % 1000000007L) * 2654435761L)
                % 10007L - 5003L).toDouble
            else
              splitmix((p.toLong << 32) | j.toLong).toDouble / 9.223372036854776e18
          j += 1
        }
        p += 1
      }
      out
    })

  def buckets(
      v: ArrayData, tables: Int, bitsPerTable: Int, dim: Int,
      portable: Boolean = false): ArrayData = {
    val pm = planes(tables * bitsPerTable, dim, portable)
    val n = v.numElements()
    val dimOk = n == dim
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bitsPerTable) {
        var bit = 0L
        if (dimOk) {
          val base = (t * bitsPerTable + b) * dim
          var acc = 0.0
          var j = 0
          var sawNull = false
          while (j < dim && !sawNull) {
            if (v.isNullAt(j)) sawNull = true
            else { acc += v.getDouble(j) * pm(base + j); j += 1 }
          }
          // Spark SQL orders NaN above every value, so the builtin's
          // `dot > 0` is TRUE for a NaN dot — mirror that, not Java's `>`
          if (!sawNull && (acc > 0 || java.lang.Double.isNaN(acc))) bit = 1L
        }
        key = key * 2 + bit
        b += 1
      }
      out(t) = (t.toLong << 56) + key
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native SRP bucket-key expression: one pass over a flat plane matrix
  * instead of tables×bits separate literal-array dot products — smaller
  * generated code, better locality, and the hyperplane constants never
  * ride the plan.
  */
case class SrpBuckets(
    child: Expression, tables: Int, bitsPerTable: Int, dim: Int,
    portable: Boolean = false)
    extends UnaryExpression {

  require(bitsPerTable <= 56, "bit key must fit below the table-index byte")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"srp_buckets requires array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  override def nullSafeEval(input: Any): Any =
    SrpFold.buckets(input.asInstanceOf[ArrayData], tables, bitsPerTable, dim, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpFold.buckets($c, $tables, $bitsPerTable, $dim, $portable);")

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  /** Column API entry point (production SplitMix64 planes). */
  def apply(v: Column, tables: Int, bitsPerTable: Int, dim: Int): Column =
    ColumnBridge.column(
      SrpBuckets(ColumnBridge.expression(v), tables, bitsPerTable, dim))

  /** Portable-plane entry point: integer multiply-mod planes over
    * int8-code inputs — exact-replayable bucket keys (see `SrpFold.planes`).
    */
  def portable(v: Column, tables: Int, bitsPerTable: Int, dim: Int): Column =
    ColumnBridge.column(
      SrpBuckets(ColumnBridge.expression(v), tables, bitsPerTable, dim, portable = true))
}
