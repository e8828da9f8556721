package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression conversions. In Spark 4
  * the `Column` constructor no longer takes a Catalyst `Expression`
  * directly (Column is backed by a ColumnNode); custom native expressions
  * need this one hop. Lives under `org.apache.spark.sql` for package-scoped
  * access — the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode→Catalyst conversion: unlike `expression` (which
    * wraps lazily and defers to the analyzer), this resolves sort-order
    * nodes (`col.desc`) into real `SortOrder` expressions immediately —
    * needed when building logical plans outside the analyzer. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
