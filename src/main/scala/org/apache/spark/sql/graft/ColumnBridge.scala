package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ catalyst-Expression
  * converters, for registering custom native expressions
  * (graft.ops.expr). Lives in the org.apache.spark.sql namespace solely to
  * satisfy the access qualifier — the standard extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly-converted catalyst tree (no lazy ColumnNodeExpression wrapper —
    * the wrapper is Unevaluable and survives analysis when injected through
    * the function registry rather than a DataFrame API).
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
