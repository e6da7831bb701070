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

  /** A V1 parquet scan built ENTIRELY from log metadata — the
    * Delta/Iceberg snapshot-read shape (TahoeLogFileIndex): the manifest
    * already records every data file's path, byte size and schema, so
    * the scan needs ZERO filesystem listings and ZERO footer/schema
    * probes before its first data byte. `spark.read.parquet(paths)`
    * pays both on every call (an InMemoryFileIndex listing — a
    * distributed job past the parallel-discovery threshold — plus a
    * mergeSchema footer pass); at 100 TB / O(100k files) that is 100k
    * object-store round-trips per query before planning even starts.
    * Planning, pushdown, column pruning, `_metadata` columns and
    * vectorized reads all go through the stock ParquetFileFormat /
    * FileSourceStrategy machinery — the physical plan is the same
    * `FileScan parquet` as a path-based read, just with a log-fed
    * location. */
  def logFileRelation(spark: SparkSession, schema: types.StructType,
      tableRoot: String, files: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.execution.datasources._
    val session = spark.asInstanceOf[classic.SparkSession]
    val statuses = files.map { case (p, len) =>
      new org.apache.hadoop.fs.FileStatus(len, false, 1, 134217728L, 0L,
        new org.apache.hadoop.fs.Path(p))
    }.toArray
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val index = new FileIndex {
      override def rootPaths: Seq[org.apache.hadoop.fs.Path] = Seq(root)
      override def listFiles(
          partitionFilters: Seq[Expression],
          dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
        Seq(PartitionDirectory(
          org.apache.spark.sql.catalyst.InternalRow.empty, statuses))
      override def inputFiles: Array[String] =
        statuses.map(_.getPath.toString)
      override def refresh(): Unit = ()
      override val sizeInBytes: Long = statuses.map(_.getLen).sum
      override def partitionSchema: types.StructType = new types.StructType()
    }
    // asNullable: a parquet-inferred schema is all-nullable; serving the
    // writer's schema verbatim could mark fields non-null and change
    // downstream null-handling plans vs the path-based read
    val relation = HadoopFsRelation(index, new types.StructType(),
      schema.asNullable, None,
      new execution.datasources.parquet.ParquetFileFormat,
      Map.empty[String, String])(session)
    classic.Dataset.ofRows(session,
      LogicalRelation(relation, isStreaming = false))
  }

  /** A DataSourceV2 parquet Table over an EXPLICIT file list — the
    * building block for a snapshot-log TableCatalog: each catalog load
    * resolves a version's file list from the log and serves it through
    * Spark's own ParquetTable (full pushdown, column pruning, vectorized
    * read), so `VERSION AS OF` scans plan exactly like a native V2
    * table. Internal constructor, hence bridged here. */
  def parquetTable(name: String, spark: SparkSession, paths: Seq[String],
      options: java.util.Map[String, String],
      // log-recorded schema when the manifest can prove one (uniform
      // eras): skips the footer-inference pass a None schema pays
      schema: Option[types.StructType] = None): connector.catalog.Table =
    execution.datasources.v2.parquet.ParquetTable(
      name,
      spark.asInstanceOf[classic.SparkSession],
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(options),
      paths,
      schema.map(_.asNullable),
      classOf[execution.datasources.parquet.ParquetFileFormat])
}
