package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` classic Column/Expression
  * converters, for registering graft's native Catalyst expressions
  * (e.g. [[graft.expressions.SortedLongIntersectCount]]) as Columns
  * without a FunctionRegistry round-trip. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
