package graft.model

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** Typed boundaries of the lake (SURVEY.md §1.4): schema-flexible ingest is
  * DataFrame-land; these case classes pin the stable at-rest schemas.
  */

/** One cleaned, typed silver/gold fact row (gold adds row_hash).
  * Types follow the gold/Athena DDL (`docs/athena_queries.md:5-20` in the
  * reference), with quantity unified on Long (SURVEY §1.3). */
final case class FactSale(
    transaction_id: String,
    store_id: String,
    timestamp: Timestamp,
    item_id: String,
    item_category: Option[String],
    quantity: Option[Long],
    unit_price: Option[Double],
    revenue: Option[Double],
    payment_method: Option[String],
    customer_id: Option[String],
    ingest_run_id: String,
    source_file: String,
    ingest_ts: Timestamp,
    date: Date)

/** Fixed 13-column row-level reject record
  * (`glue_job_raw_to_processed.py:316-337`, `docs/rejects.md`). Numeric
  * fields stay strings: structural rejects carry the raw cell text. */
final case class RejectRow(
    raw_row: Option[String],
    transaction_id: Option[String],
    store_id: Option[String],
    timestamp_raw: Option[String],
    timestamp_parsed: Option[Timestamp],
    item_id: Option[String],
    item_category: Option[String],
    quantity: Option[String],
    unit_price: Option[String],
    revenue: Option[String],
    payment_method: Option[String],
    customer_id: Option[String],
    reject_reason: String)

object RejectRow {
  val reasonMissingRequired = "MISSING_REQUIRED_COLUMN"
  val reasonInvalidTimestamp = "INVALID_TIMESTAMP_FORMAT"
  val reasonBusinessLogic = "BUSINESS_LOGIC_FAIL"
  val columns: Seq[String] = Seq(
    "raw_row", "transaction_id", "store_id", "timestamp_raw",
    "timestamp_parsed", "item_id", "item_category", "quantity",
    "unit_price", "revenue", "payment_method", "customer_id",
    "reject_reason")
}

/** Per-partition gold-compaction audit document
  * (`incremental_auto_compaction.py:240-251`). */
final case class PartitionMetrics(
    target_date: String,
    input_partition: String,
    output_partition: String,
    total_rows_in_source_partition: Long,
    rows_after_dedup: Long,
    duplicate_rows_removed: Long,
    null_timestamp: Long,
    null_store: Long,
    dq_balance_issues: Long,
    processed_at_utc: String,
    status: String,
    error: Option[String] = None)

object Schemas {
  /** Silver/gold business columns in canonical order. */
  val silver: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("store_id", StringType),
    StructField("timestamp", TimestampType),
    StructField("item_id", StringType),
    StructField("item_category", StringType),
    StructField("quantity", LongType),
    StructField("unit_price", DoubleType),
    StructField("revenue", DoubleType),
    StructField("payment_method", StringType),
    StructField("customer_id", StringType),
    StructField("ingest_run_id", StringType),
    StructField("source_file", StringType),
    StructField("ingest_ts", TimestampType),
    StructField("date", DateType)))

  /** Gold row_hash input columns — order is part of the contract
    * (`incremental_auto_compaction.py:210`). */
  val rowHashColumns: Seq[String] = Seq(
    "store_id", "timestamp", "item_id", "item_category", "quantity",
    "unit_price", "revenue", "payment_method", "customer_id")
}
