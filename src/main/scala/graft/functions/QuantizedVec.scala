package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native integer-vector kernels for the quantized ANN tier (r21
  * optimization round, guide §"eliminate non-codegen expressions in the
  * hot path"): the int8/PQ scoring paths ran as interpreted higher-order
  * builtins (`aggregate`/`zip_with`/`transform` evaluate their lambda
  * per ELEMENT with boxing — measured multi-ms per row on 64-dim
  * vectors, the dominant cost of q62/q68/q115/q120), exactly the gap
  * `DotProduct`/`SrpBuckets` already close for the float paths. Each
  * kernel is a mirror-object static (codegen calls it directly), with
  * accumulation order and null/length semantics BIT-IDENTICAL to the
  * builtin form it replaces — pinned by parity tests in
  * QuantizedVecSpec.
  */
object QuantFold {

  /** Exact integer dot product — the accumulation order of
    * `aggregate(zip_with(a, b, (x, y) => x.long * y.long), 0L, _+_)`:
    * length mismatch → null (zip_with pads with null, the product and
    * the fold collapse to null), any null element → null.
    * Element widths are read per side (int8 codes ride as ints,
    * PQ-reconstructed sub-centroids as longs).
    */
  def qdot(a: ArrayData, b: ArrayData, aLong: Boolean, bLong: Boolean): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aLong) a.getLong(i) else a.getInt(i).toLong
      val y = if (bLong) b.getLong(i) else b.getInt(i).toLong
      acc += x * y
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** The `quantizeInt8` row kernel: scale = max |x| over the vector,
    * codes = round(x·127/scale) as ints (all-zero when scale == 0), and
    * the exact squared norm of the codes. Rounding is Spark's `round`
    * for DoubleType verbatim — `BigDecimal.valueOf(x).setScale(0,
    * HALF_UP)` — then the int cast, so codes match the builtin
    * projection bit-for-bit (parity-pinned). Null elements are not
    * produced by any caller and are rejected loudly rather than
    * silently diverging from the builtin's null propagation.
    */
  def quantize(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      require(!v.isNullAt(i), "quantize_int8: null vector element")
      val a = math.abs(v.getDouble(i))
      if (a > scale) scale = a
      i += 1
    }
    val codes = new Array[Int](n)
    var s2 = 0L
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val r = java.math.BigDecimal.valueOf(v.getDouble(i) * 127.0 / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        val c = r.toInt
        codes(i) = c
        s2 += c.toLong * c.toLong
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(codes), s2)
  }

  /** The `normalized` row kernel: divide by the L2 norm computed with
    * DotFold's accumulation order (bit-identical to
    * `sqrt(aggregate(zip_with(v, v, _*_), 0d, _+_))`). Null elements
    * are rejected loudly (no caller produces them).
    */
  def normalize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      require(!v.isNullAt(i), "normalize_vec: null vector element")
      val x = v.getDouble(i)
      acc += x * x
      i += 1
    }
    // ANSI sessions make the builtin division THROW on a zero norm —
    // mirror the loudness instead of silently minting NaNs
    require(acc != 0.0 || n == 0,
      "normalize_vec: zero-norm vector (division by zero)")
    val norm = math.sqrt(acc)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  /** The PQ-encode argmin kernel over a flat codebook: for subspace j,
    * the code of the candidate sub-centroid minimizing exact integer L2
    * distance to the query's sub-vector, FIRST minimum on ties (the
    * builtin `array_position(ds, array_min(ds))` convention). `cb` is
    * laid out [j][code][d] flattened row-major; cached per identity in
    * the expression instance, never shipped through the plan.
    */
  def pqCodes(qv: ArrayData, cb: Array[Long], m: Int, ksub: Int, dsub: Int): ArrayData = {
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var d2 = 0L
        var d = 0
        while (d < dsub) {
          val df = qv.getInt(j * dsub + d).toLong - cb(base + d)
          d2 += df * df
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native L2 normalization: `transform(v, x -> x / sqrt(dot(v, v)))`
  * in one pass — the interpreted per-element division lambda ran on
  * every IVF assignment/probe row. Norm uses DotFold's accumulation
  * order and Math.sqrt (Spark's Sqrt), division is IEEE double — all
  * bit-identical to the builtin chain (parity-pinned). A ZERO-NORM
  * vector THROWS (see the require in the evaluator): the engine runs
  * under ANSI mode, where the builtin `Divide` raises DIVIDE_BY_ZERO —
  * the kernel mirrors that loudness rather than minting NaNs
  * (QuantizedVecSpec pins the throw; r21 verdict doc fix).
  */
case class NormalizeVec(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"normalize_vec requires array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "normalize_vec"
  override def nullSafeEval(input: Any): Any =
    QuantFold.normalize(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantFold.normalize($c);")
  override protected def withNewChildInternal(newChild: Expression): NormalizeVec =
    copy(child = newChild)
}

object NormalizeVec {
  def apply(v: Column): Column =
    ColumnBridge.column(NormalizeVec(ColumnBridge.expression(v)))
}

/** Native exact integer dot product over int/long array columns —
  * replaces the interpreted `aggregate(zip_with(...))` form in the
  * quantized scoring paths (q62/q68 and the PQ reconstruction leg).
  */
case class QuantizedDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot requires array<int|bigint>, got ${left.dataType}, ${right.dataType}")

  private lazy val aLong = left.dataType match {
    case ArrayType(LongType, _) => true; case _ => false }
  private lazy val bLong = right.dataType match {
    case ArrayType(LongType, _) => true; case _ => false }

  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = QuantFold.qdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aLong, bLong)
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxedQdot")
      s"""
         |java.lang.Long $boxed = graft.functions.QuantFold.qdot($a, $b, $aLong, $bLong);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Native int8 quantization: struct(qscale, qv, qs2) in one pass —
  * replaces three interpreted higher-order projections per row.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"quantize_int8 requires array<double>, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("qscale", DoubleType, nullable = false),
    StructField("qv", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("qs2", LongType, nullable = false)))
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(input: Any): Any =
    QuantFold.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantFold.quantize($c);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  def apply(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))
}

/** Native PQ code assignment against a driver-trained codebook — the
  * m×ksub×dsub argmin that ran as m·ksub interpreted aggregates per row
  * (the measured hot spot of the q115/q120 encode, ~15 ms/row).
  * The codebook rides the expression instance (like SrpBuckets' plane
  * parameters), flattened once at construction.
  */
case class PqCodes(child: Expression, cb: Seq[Seq[Seq[Long]]]) extends UnaryExpression {

  @transient private lazy val m = cb.length
  @transient private lazy val ksub = cb.head.length
  @transient private lazy val dsub = cb.head.head.length
  @transient private lazy val flat: Array[Long] = cb.flatten.flatten.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pq_codes requires array<int>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(input: Any): Any =
    QuantFold.pqCodes(input.asInstanceOf[ArrayData], flat, m, ksub, dsub)

  // the flat codebook must reach generated code as a JVM reference, not
  // source text: register it with the codegen context
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", flat, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantFold.pqCodes($c, $cbRef, $m, $ksub, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  def apply(qv: Column, cb: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(qv),
      cb.map(_.map(_.toSeq).toSeq).toSeq))
}
