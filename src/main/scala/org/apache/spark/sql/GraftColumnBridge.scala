package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters —
  * the supported pattern for libraries that ship custom Catalyst
  * expressions against Spark 4's Connect-compatible Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Like [[expression]], but unwraps the lazy ColumnNode envelope the
    * Connect-compatible Column API produces, yielding an actual
    * (unresolved) catalyst tree that pattern matching can walk —
    * comparisons arrive as `UnresolvedFunction("=" / "<" / "and", …)`
    * until the analyzer resolves them. */
  def catalystExpression(c: Column): Expression =
    ExpressionUtils.expression(c) match {
      case classic.ColumnNodeExpression(node) =>
        classic.ColumnNodeToExpressionConverter(node)
      case e => e
    }
}
