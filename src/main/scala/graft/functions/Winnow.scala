package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared winnowing fold: sliding-window minima via a monotonic deque
  * (O(n) instead of the O(n·w) slice-per-window of the builtin form),
  * then sorted distinct. Mirror-class static so codegen calls it directly.
  */
object WinnowFold {
  def fold(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val winCount = math.max(n - w, 0) + 1
    val mins = new Array[Long](winCount)
    // monotonic deque of indices; head = index of current window minimum
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      val windowStart = i - w + 1
      while (deque(head) < windowStart) head += 1
      if (i >= w - 1) mins(i - w + 1) = arr.getLong(deque(head))
      i += 1
    }
    if (n < w) mins(0) = arr.getLong(deque(head)) // single short window
    java.util.Arrays.sort(mins)
    // in-place dedupe of the sorted mins
    var out = 0
    var j = 0
    while (j < winCount) {
      if (out == 0 || mins(j) != mins(out - 1)) { mins(out) = mins(j); out += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }
}

/** Native winnowing expression: sorted distinct sliding-window minima of an
  * `array<bigint>` — semantics identical to
  * `array_sort(array_distinct(transform(windows, array_min(slice(...)))))`
  * (parity-tested), one primitive pass.
  */
case class Winnow(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"winnow requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowFold.fold(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.WinnowFold.fold($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  def apply(hashes: Column, w: Int): Column =
    ColumnBridge.column(Winnow(ColumnBridge.expression(hashes), w))
}
