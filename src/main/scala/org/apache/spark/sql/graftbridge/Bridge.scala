package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 gates these conversions behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * extension libraries expose them from a file inside the sql package
  * tree — the established pattern for native-expression libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly converts a Column's node tree to a catalyst expression tree
    * (`ColumnNodeToExpressionConverter`). Required when splicing a
    * composed Column into a FunctionRegistry builder: the lazy
    * `ColumnNodeExpression` wrapper from [[expression]] never meets the
    * plan-level converter on that path and would reach codegen
    * unresolved. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
