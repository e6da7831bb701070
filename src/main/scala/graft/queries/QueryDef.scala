package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One verifiable query: a Spark DataFrame builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/types must line up exactly between the two.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** Load one of the driver-generated testdata tables (TESTDATA.md). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see [[graft.GraftSession]]) so `ts` arrives as nanos-since-epoch and
    * is floor-truncated to a µs timestamp here — exactly how DuckDB reads
    * the same file. */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
}

/** Helpers shared by query definitions.
  *
  * Monetary aggregates go through DECIMAL so Spark and DuckDB sum the exact
  * same rationals regardless of partition/aggregation order (double sums are
  * order-dependent in the last ulp); the final value is cast back to DOUBLE,
  * which is exact for 2-dp decimals in this range.
  */
object Num {
  val D18_2: DecimalType = DecimalType(18, 2)
  val D4_2: DecimalType = DecimalType(4, 2)

  def dec2(c: Column): Column = c.cast(D18_2)

  /** Order-independent sum of a money-like double column, as DOUBLE. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** SQL fragment mirror of [[sumMoney]] for the DuckDB oracle. */
  def sqlSumMoney(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
}
