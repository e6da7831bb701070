package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.lake.LakeLayout

/** F1 — the analyst SQL surface over gold, as a CATALOG table rather than
  * a session temp view: `CREATE TABLE ... USING PARQUET PARTITIONED BY
  * (date) LOCATION ...` + `MSCK REPAIR TABLE`, the Spark form of the
  * reference's Athena external-table DDL (docs/athena_queries.md:5-20) and
  * crawler partition discovery (docs/glue_crawlers.md:26-37).
  *
  * Unlike a temp view, the table lives in the session CATALOG: every
  * session sharing the catalog sees it (temp views die with their
  * session), and against a metastore-backed catalog (Hive/Glue — how a
  * real cluster deploys; the DDL is identical) it survives process
  * restarts, so a reconnecting analyst queries `retail_db.fact_sales`
  * directly. The partition column is typed DATE (Athena declares STRING
  * because its projection works on strings; Spark types partition values
  * properly and still prunes — CatalogSpec asserts PartitionFilters).
  */
object LakeCatalog {

  val db = "retail_db"
  val factSalesTable = s"$db.fact_sales"

  /** Create/refresh the external partitioned gold table and discover its
    * date partitions. Idempotent; DROP on an external table never touches
    * the data files. */
  def registerFactSales(spark: SparkSession, layout: LakeLayout): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $factSalesTable")
    spark.sql(s"""
      CREATE TABLE $factSalesTable (
        transaction_id STRING,
        store_id STRING,
        `timestamp` TIMESTAMP,
        item_id STRING,
        item_category STRING,
        quantity BIGINT,
        unit_price DOUBLE,
        revenue DOUBLE,
        payment_method STRING,
        customer_id STRING,
        ingest_run_id STRING,
        source_file STRING,
        ingest_ts TIMESTAMP,
        row_hash STRING,
        date DATE)
      USING PARQUET
      PARTITIONED BY (date)
      LOCATION '${layout.goldFactSales}'""")
    // Athena/Glue-crawler partition discovery equivalent: scan the
    // hive-style date=... directories into catalog partitions.
    spark.sql(s"MSCK REPAIR TABLE $factSalesTable")
  }

  /** F2 — daily revenue (docs/athena_queries.md:24-28). */
  def dailyRevenue(spark: SparkSession): DataFrame =
    spark.sql(s"""
      SELECT date, SUM(revenue) AS total_revenue
      FROM $factSalesTable
      GROUP BY date
      ORDER BY date DESC""")

  /** F3 — top-10 products by revenue (docs/athena_queries.md:32-37). */
  def topProducts(spark: SparkSession): DataFrame =
    spark.sql(s"""
      SELECT item_id, SUM(revenue) AS total_revenue
      FROM $factSalesTable
      GROUP BY item_id
      ORDER BY total_revenue DESC
      LIMIT 10""")
}
