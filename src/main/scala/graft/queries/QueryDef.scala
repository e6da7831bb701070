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

  /** Normalize the events `ts` column to a µs `TimestampType`, dispatching
    * on the type it ARRIVED as rather than on any config flag — testdata
    * generations have shipped events.parquet both ways:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it natively; sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` ([[graft.GraftSession]])
    *    so `ts` arrives as a nanos-since-epoch LONG and is floor-truncated
    *    to µs here — exactly how DuckDB reads the nanos file.
    *  - TIMESTAMP(MICROS): arrives as a native `TimestampType` (the session
    *    forces instant semantics via `inferTimestampNTZ=false` + UTC, same
    *    wall values DuckDB sees) — passed through untouched.
    *
    * Works on batch and streaming frames alike; every events consumer must
    * route through this so a future testdata regeneration changes nothing.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType                           =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampType                      => df
      case TimestampNTZType                   =>
        // NTZ only appears if a session re-enables inference; UTC session
        // makes the cast a wall-value no-op while restoring instant
        // semantics (unix_micros etc.)
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other                              =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other " +
            "(expected LONG nanos or TIMESTAMP)")
    }

  /** The events table with `ts` normalized to a µs timestamp (see
    * [[normalizeEventTs]]). */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(apply(spark, dir, "events"))
}

/** Helpers shared by query definitions.
  *
  * Money is aggregated as integral LONG cents: `round(x*100)` recovers the
  * exact cents of a 2-dp value stored as double, integer sums are exact and
  * order-independent (like the DECIMAL formulation this replaces), and the
  * hot aggregate path stays a primitive 64-bit add inside whole-stage
  * codegen instead of a 128-bit decimal add. The single scale-down division
  * happens once, after aggregation, identically in Spark and DuckDB, so the
  * final doubles agree bitwise.
  *
  * Headroom: a plain cents sum overflows 2^63 only past ~10^12 rows per
  * group at max TPC-H prices — safe at any realistic scale. Per-row cent
  * PRODUCTS (price×discount×tax, up to ~10^11 per row) would overflow a
  * long accumulator within ~10^8 rows per group, so those aggregate through
  * [[sumBig]]: the multiply stays a codegen'd long, only the accumulator is
  * DECIMAL(38,0) — matching DuckDB's HUGEINT sum exactly.
  */
object Num {
  private val D38_0: DecimalType = DecimalType(38, 0)

  /** Money-like 2-dp double as exact integral cents (LONG). */
  def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** Order-independent sum of a money-like double column, as DOUBLE. */
  def sumMoney(c: Column): Column = sum(cents(c)).cast(DoubleType) / 100.0

  /** Exact sum of an integral LONG expression with headroom beyond 2^63:
    * per-row values stay primitive, only the accumulator is decimal. */
  def sumBig(c: Column): Column = sum(c.cast(D38_0))

  /** SQL fragment mirror of [[cents]] for the DuckDB oracle. */
  def sqlCents(expr: String): String = s"CAST(round(($expr) * 100) AS BIGINT)"

  /** SQL fragment mirror of [[sumMoney]] for the DuckDB oracle. */
  def sqlSumMoney(expr: String): String =
    s"CAST(SUM(${sqlCents(expr)}) AS DOUBLE) / 100.0"
}
