package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema'd readers for text-format landing zones (CSV / JSON lines) —
  * how real users land data next to the raw-text ingest path
  * (graft.ingest.BronzeToSilver handles the reference's adversarial
  * delimiter/header drift; these readers are for wellformed validated
  * zones where a declared schema applies).
  *
  * Both read PERMISSIVE with an explicit `_corrupt_record` capture
  * column: a malformed line lands intact in `_corrupt_record` (its typed
  * columns null) instead of failing the job or silently dropping — the
  * same reject-not-crash contract as the bronze path. FAILFAST would
  * abort a 100 TB job on one bad line; DROPMALFORMED loses data silently;
  * PERMISSIVE + capture is the only scale-sane mode.
  *
  * Scale: both formats split by line, so a directory of files
  * parallelizes to (files × maxPartitionBytes) tasks with no shuffle;
  * the schema is declared, so no inference pass over the data.
  */
object TextSources {

  val CorruptCol = "_corrupt_record"

  private def withCapture(schema: StructType): StructType =
    schema.add(CorruptCol, StringType)

  /** Schema'd PERMISSIVE CSV read; with `capture` (default), malformed
    * rows are carried in [[CorruptCol]]. Pass `capture = false` for
    * downstream plans that may prune to zero data columns (e.g. a bare
    * count) — Spark rejects a scan whose only referenced column is the
    * corrupt capture, since the pruned parser would have nothing to
    * fail on. */
  def readCsvZone(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ",",
      capture: Boolean = true): DataFrame =
    spark.read
      .schema(if (capture) withCapture(schema) else schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Schema'd PERMISSIVE JSON-lines read; `capture` as in
    * [[readCsvZone]]. */
  def readJsonZone(spark: SparkSession, path: String, schema: StructType,
      capture: Boolean = true): DataFrame =
    spark.read
      .schema(if (capture) withCapture(schema) else schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Rows that parsed cleanly, typed columns only. */
  def good(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Captured malformed lines, verbatim.
    *
    * Callers splitting a zone into good + rejects should `persist()` the
    * parsed frame first: that parses the input once for both splits
    * (instead of two full scans), and Spark requires it — projecting ONLY
    * the corrupt column straight off a raw scan is disallowed
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) because the
    * pruned parser would have nothing to fail on. */
  def rejects(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
}
