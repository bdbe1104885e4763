package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Accessor for the `private[sql]` session function registry — the
  * companion of [[ColumnBridge]] for the SQL-name side: lets an already
  * -running session adopt the engine's native functions without being
  * rebuilt with `spark.sql.extensions` (notebooks, test fixtures, REPLs).
  */
object RegistryBridge {
  def register(
      spark: SparkSession,
      name: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry.registerFunction(name, info, builder)
  }

  /** Names a [[org.apache.spark.sql.SparkSessionExtensions]] would add to a
    * session's registry, obtained by driving the SAME
    * `registerFunctions` hook `BaseSessionStateBuilder` drives at session
    * build — lets tests exercise the `spark.sql.extensions` wiring without
    * a fresh SparkContext (static confs cannot be applied to a live one).
    */
  def registeredNames(ext: org.apache.spark.sql.SparkSessionExtensions): Set[String] = {
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    val before = reg.listFunction().toSet
    ext.registerFunctions(reg)
    (reg.listFunction().toSet -- before).map(_.funcName)
  }
}
