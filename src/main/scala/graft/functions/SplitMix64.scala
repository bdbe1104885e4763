package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Engine-version-independent 64-bit mix of a LONG key (Steele et al.'s
  * SplitMix64 finalizer, a published constant-specified algorithm). Used
  * for the upsert sink's bucket assignment: Spark's builtin `hash()` /
  * `xxhash64()` are only as stable as the engine's implementation choice,
  * and a silent change would re-home existing sessions to different bucket
  * directories, leaving stale duplicates behind (the sink outlives any one
  * Spark version). This expression pins the exact bit-for-bit function in
  * the engine's own source.
  *
  * Interpreted and codegen paths both use raw Java long arithmetic
  * (wrapping), which ANSI mode does not intercept — the same fold as
  * `DedupOps.splitmix`, parity-tested against it.
  */
case class SplitMix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"splitmix64 requires bigint, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "splitmix64"

  override def nullSafeEval(input: Any): Any =
    graft.operators.DedupOps.splitmix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $c + 0x9E3779B97F4A7C15L;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
}

object SplitMix64 {
  /** Column API entry point. */
  def apply(key: Column): Column =
    ColumnBridge.column(SplitMix64(ColumnBridge.expression(key)))
}
