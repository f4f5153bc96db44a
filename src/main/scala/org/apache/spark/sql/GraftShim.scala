package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 made `Column` implementation-agnostic (ColumnNode based); the
  * conversion helpers live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]` — this one-file shim re-exports the two methods we
  * need so the rest of the engine can stay in package `graft`.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
