package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** XXH64 of a single 8-byte little-endian value (the public xxHash
  * specification's short-input path) — bit-identical to Spark's
  * `xxhash64` over one bigint column, verified by test. Kept local so the
  * MinHash fold below runs as a primitive loop with zero boxing.
  */
object XxHash64Long {
  private val Prime1 = 0x9E3779B185EBCA87L
  private val Prime2 = 0xC2B2AE3D27D4EB4FL
  private val Prime3 = 0x165667B19E3779F9L
  private val Prime4 = 0x85EBCA77C2B2AE63L
  private val Prime5 = 0x27D4EB2F165667C5L

  def hash(input: Long, seed: Long): Long = {
    var hash = seed + Prime5 + 8L
    val k1 = java.lang.Long.rotateLeft(input * Prime2, 31) * Prime1
    hash ^= k1
    hash = java.lang.Long.rotateLeft(hash, 27) * Prime1 + Prime4
    hash ^= hash >>> 33
    hash *= Prime2
    hash ^= hash >>> 29
    hash *= Prime3
    hash ^= hash >>> 32
    hash
  }
}

/** Shared fold helper — also the target of the generated code (mirror-class
  * static), so eval and codegen run the same loop.
  */
object MinHashFold {
  def fold(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val k = seeds.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = XxHash64Long.hash(h, seeds(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native MinHash signature: k min-hashes over an `array<bigint>` of base
  * hashes in ONE pass of primitive long arithmetic — replaces k interpreted
  * higher-order `array_min(transform(...))` expressions (boxed per-element
  * eval) with a tight loop.
  *
  * Per-seed values equal `xxhash64(lit(seedConst_i), h)` chained the way
  * Spark's XxHash64 chains multiple children: the literal folds into the
  * effective seed `s_i = XXH64(seedConst_i, 42)` and each element hashes as
  * `XXH64(h, s_i)`.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_signature requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val seeds: Array[Long] = MinHashSignature.seeds(k)

  override def nullSafeEval(input: Any): Any =
    MinHashFold.fold(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      s"${ev.value} = graft.functions.MinHashFold.fold($c, $seedsRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Effective seeds: splitmix constants pre-chained through XXH64 with
    * Spark's default seed 42, matching the two-child xxhash64 column form.
    */
  def seeds(k: Int): Array[Long] =
    Array.tabulate(k)(i => XxHash64Long.hash(graft.operators.DedupOps.splitmix(i.toLong), 42L))

  def apply(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), k))
}
