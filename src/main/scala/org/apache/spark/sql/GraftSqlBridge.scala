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

  /** A DataSourceV2 parquet Table over an EXPLICIT file list — the
    * building block for a snapshot-log TableCatalog: each catalog load
    * resolves a version's file list from the log and serves it through
    * Spark's own ParquetTable (full pushdown, column pruning, vectorized
    * read), so `VERSION AS OF` scans plan exactly like a native V2
    * table. Internal constructor, hence bridged here. */
  def parquetTable(name: String, spark: SparkSession, paths: Seq[String],
      options: java.util.Map[String, String]): connector.catalog.Table =
    execution.datasources.v2.parquet.ParquetTable(
      name,
      spark.asInstanceOf[classic.SparkSession],
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(options),
      paths,
      None,
      classOf[execution.datasources.parquet.ParquetFileFormat])
}
