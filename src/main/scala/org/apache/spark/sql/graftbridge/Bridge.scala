package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's private[sql] Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 wraps Column
  * around ColumnNode, so custom Catalyst expressions (graft.functions.*)
  * need this one hop to surface as user-facing Columns. Nested-package
  * placement is the sanctioned access path for private[sql] API.
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Registers a custom-Expression SQL function on an ALREADY-RUNNING
    * session (SparkSessionExtensions only applies at session build time).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
      builder)
}
