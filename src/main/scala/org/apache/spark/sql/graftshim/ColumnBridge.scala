package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported bridge (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`. This shim lives inside the `org.apache.spark.sql`
  * namespace purely to re-export the two conversions our custom Catalyst
  * expressions need. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode → Expression conversion. `expression` above wraps the
    * column in a lazy `ColumnNodeExpression` that only the plan-level
    * analysis entry points unwrap — inside a FunctionRegistry builder that
    * wrapper survives analysis and codegen then fails. This converts to a
    * real catalyst tree up front (builtin calls become ordinary
    * `UnresolvedFunction` nodes, which the analyzer resolves in its next
    * fixed-point iteration).
    */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
