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
}
