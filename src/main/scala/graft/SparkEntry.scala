package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 that is SQL-expressible is declared here
  * twice: once as an idiomatic Spark DataFrame builder and once as ANSI SQL
  * for the DuckDB oracle; the driver hash-compares the two at sf0.01.
  * File-lifecycle operators (preflight validation, archive naming, lake
  * moves) are covered by ScalaTest specs instead.
  */
object SparkEntry {

  private val all: Seq[QueryDef] =
    RetailQueries.defs ++ ParityQueries.defs ++ EventQueries.defs ++
      AnalyticsQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ PipelineQueries.defs ++ SourceQueries.defs ++
      StreamingQueries.defs ++ MultimodalQueries.defs ++ CdcQueries.defs ++
      ProfileQueries.defs ++ RetrievalQueries.defs ++ GraphQueries.defs ++
      LayoutQueries.defs ++ LinkageQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RetailQueries.regionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
