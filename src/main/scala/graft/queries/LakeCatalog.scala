package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.lake.LakeLayout

/** F1 — the analyst SQL surface: register the gold fact table (partition
  * discovery infers `date` from the hive-style directory names) and run the
  * reference's Athena queries verbatim (docs/athena_queries.md:24-37).
  * Catalyst supplies partition pruning, predicate pushdown, and column
  * pruning on these for free.
  */
object LakeCatalog {

  val factSalesView = "fact_sales"

  def registerFactSales(spark: SparkSession, layout: LakeLayout): Unit =
    spark.read.parquet(layout.goldFactSales)
      .createOrReplaceTempView(factSalesView)

  /** F2 — daily revenue (docs/athena_queries.md:24-28). */
  def dailyRevenue(spark: SparkSession): DataFrame =
    spark.sql(s"""
      SELECT date, SUM(revenue) AS total_revenue
      FROM $factSalesView
      GROUP BY date
      ORDER BY date DESC""")

  /** F3 — top-10 products by revenue (docs/athena_queries.md:32-37). */
  def topProducts(spark: SparkSession): DataFrame =
    spark.sql(s"""
      SELECT item_id, SUM(revenue) AS total_revenue
      FROM $factSalesView
      GROUP BY item_id
      ORDER BY total_revenue DESC
      LIMIT 10""")
}
