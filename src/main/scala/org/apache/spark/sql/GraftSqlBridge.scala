package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the Column↔Expression converters (`classic.ExpressionUtils`)
  * `private[sql]`; third-party expression libraries conventionally host a
  * one-file shim inside the `org.apache.spark.sql` package to reach them.
  * This is the only file in the repo living outside the graft namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
