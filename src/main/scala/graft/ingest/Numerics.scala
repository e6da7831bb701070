package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Currency / quantity string cleaning.
  *
  * Mirrors the reference's `clean_currency` and quantity cleaning
  * (`scripts/glue_job_raw_to_processed.py:279-287`,
  * `scripts/incremental_auto_compaction.py:205-207`): strip decoration,
  * map accounting `(x)` negatives to `-x`, cast — with `try_cast` so
  * garbage degrades to null (reference/pre-ANSI behavior) instead of
  * erroring under Spark 4 ANSI mode.
  */
object Numerics {

  /** `"$1,234.56"` → 1234.56; `"($12.00)"` → -12.0; non-numeric → null. */
  def cleanCurrency(c: Column): Column = {
    val stripped = regexp_replace(c, "[^0-9()\\.-]", "")
    val neg = regexp_replace(stripped, "[(]", "-")
    val closed = regexp_replace(neg, "[)]", "")
    try_cast(closed, DoubleType)
  }

  /** `" 5 pcs"` → 5L; `"N/A"` → null. Long per the gold/DDL type. */
  def cleanQuantity(c: Column): Column =
    try_cast(regexp_replace(c, "[^0-9-]", ""), LongType)

  private def try_cast(c: Column, t: org.apache.spark.sql.types.DataType): Column =
    c.try_cast(t)

  /** DuckDB SQL mirror of [[cleanCurrency]]. */
  def duckCleanCurrencySql(col: String): String =
    s"TRY_CAST(regexp_replace(regexp_replace(regexp_replace($col, '[^0-9()\\.-]', '', 'g'), '[(]', '-', 'g'), '[)]', '', 'g') AS DOUBLE)"

  /** DuckDB SQL mirror of [[cleanQuantity]]. */
  def duckCleanQuantitySql(col: String): String =
    s"TRY_CAST(regexp_replace($col, '[^0-9-]', '', 'g') AS BIGINT)"
}
