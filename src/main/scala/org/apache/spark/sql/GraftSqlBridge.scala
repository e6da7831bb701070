package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Column ⇄ Expression / DataFrame ⇄ LogicalPlan bridge for graft's native
  * Catalyst extensions.
  *
  * Spark 4 made the Column↔Expression converters (`classic.ExpressionUtils`)
  * and `Dataset.ofRows` `private[sql]`; third-party expression/operator
  * libraries conventionally host a one-file shim inside the
  * `org.apache.spark.sql` package to reach them. This is the only file in
  * the repo living outside the graft namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The analyzed logical plan backing a DataFrame (attributes resolved,
    * usable as children of custom logical nodes). */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a (already-resolved) logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
