package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.{Headers, Numerics, Timestamps}

/** Ingest-operator parity checks, expressed as queries the DuckDB oracle can
  * replay: each takes clean testdata, deterministically "dirties" it into the
  * messy shapes the reference's CSVs exhibit (decorated currency, mixed
  * timestamp formats, N/A quantities), then applies the engine's cleaning
  * operators (graft.ingest.*). Both engines derive the same dirty strings, so
  * results must hash-match exactly.
  */
object ParityQueries {

  /** Deterministic decorated currency string from a money double.
    * cents → "$d.cc", "USD d.cc", "(d.cc)" accounting-negative, or bare. */
  private def decorate(money: Column, variant: Column): (Column, Column) = {
    val cents = round(money * 100).cast(LongType)
    val base = format_string("%d.%02d", (cents / 100).cast(LongType), cents % 100)
    val s = when(variant === 0, concat(lit("$"), base))
      .when(variant === 1, concat(lit("USD "), base))
      .when(variant === 2, concat(lit("($"), base, lit(")")))
      .otherwise(base)
    (s, cents)
  }

  private val decorateSql =
    """WITH src AS (
      SELECT l_orderkey, l_linenumber,
        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        l_linenumber % 4 AS variant
      FROM lineitem),
    dirty AS (
      SELECT l_orderkey, l_linenumber,
        CASE variant
          WHEN 0 THEN '$' || printf('%d.%02d', cents // 100, cents % 100)
          WHEN 1 THEN 'USD ' || printf('%d.%02d', cents // 100, cents % 100)
          WHEN 2 THEN '($' || printf('%d.%02d', cents // 100, cents % 100) || ')'
          ELSE printf('%d.%02d', cents // 100, cents % 100)
        END AS raw_price
      FROM src)"""

  /** D3 — currency cleaning on decorated strings. */
  def currencyClean(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.util.Par.ensure(Tables(spark, dir, "lineitem"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), (col("l_linenumber") % 4).as("variant"))
    val (raw, _) = decorate(col("l_extendedprice"), col("variant"))
    li.withColumn("raw_price", raw)
      .select(col("l_orderkey"), col("l_linenumber"), col("raw_price"),
        Numerics.cleanCurrency(col("raw_price")).as("unit_price"))
  }

  /** D4 — quantity cleaning incl. N/A → null. */
  def quantityClean(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.util.Par.ensure(Tables(spark, dir, "lineitem"))
    val q = col("l_quantity").cast(LongType)
    val raw = when(col("l_linenumber") % 5 === 0, lit("N/A"))
      .when(col("l_linenumber") % 5 === 1, concat(q.cast(StringType), lit(" pcs")))
      .when(col("l_linenumber") % 5 === 2, concat(lit(" "), q.cast(StringType), lit(" ")))
      .otherwise(q.cast(StringType))
    li.select(col("l_orderkey"), col("l_linenumber"), raw.as("raw_qty"),
      Numerics.cleanQuantity(raw).as("quantity"))
  }

  /** D2 — regex-gated multi-format timestamp parse over 12 generated
    * shapes (11 valid reference formats + 1 unparseable). */
  def timestampParse(spark: SparkSession, dir: String): DataFrame = {
    val sparkFmts = Seq(
      "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm",
      "yyyy/MM/dd HH:mm:ss", "yyyy/MM/dd HH:mm",
      "MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy HH:mm",
      "MM/dd/yyyy", "yyyy-MM-dd", "yyyy/MM/dd",
      "yyyyMMdd HHmmss", "yyyyMMdd")
    val variant = (col("event_id") % 12).cast(IntegerType)
    val raw = sparkFmts.zipWithIndex.foldLeft(
      // variant 11: an unparseable shape (reference rejects hh:mmAM styles)
      when(variant === 11, concat(date_format(col("ts"), "HH:mm"), lit("XX")))) {
      case (acc, (fmt, i)) => acc.when(variant === i, date_format(col("ts"), fmt))
    }
    Tables.events(spark, dir)
      .withColumn("ts_raw", raw)
      .select(col("event_id"), col("ts_raw"),
        date_format(Timestamps.parseMultiFormat(col("ts_raw")),
          "yyyy-MM-dd HH:mm:ss").as("ts_parsed"))
  }

  private val timestampParseSql = {
    val duckGen = Seq(
      "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M",
      "%Y/%m/%d %H:%M:%S", "%Y/%m/%d %H:%M",
      "%m/%d/%Y %H:%M:%S", "%m/%d/%Y %H:%M",
      "%m/%d/%Y", "%Y-%m-%d", "%Y/%m/%d",
      "%Y%m%d %H%M%S", "%Y%m%d")
    val cases = duckGen.zipWithIndex.map { case (fmt, i) =>
      s"WHEN $i THEN strftime(ts, '$fmt')"
    }.mkString(" ")
    s"""WITH dirty AS (
      SELECT event_id,
        CASE CAST(event_id % 12 AS INT) $cases
          ELSE strftime(ts, '%H:%M') || 'XX' END AS ts_raw
      FROM events)
    SELECT event_id, ts_raw,
      strftime(${Timestamps.duckParseSql("ts_raw")}, '%Y-%m-%d %H:%M:%S') AS ts_parsed
    FROM dirty"""
  }

  /** D2-extended (q89) — the day-first formats behind the flag
    * ([[graft.ingest.Timestamps.extendedPatterns]]): dd/MM/yyyy variants
    * from the reference's design doc plus the dd-MM-yy H:mm shape its
    * sample data contains. Both chains run side by side: `ts_extended`
    * parses the day-first shapes, `ts_strict` (the default reference
    * chain) must reject the dashed shape and mis-read or reject the
    * slashed ones — pinning under the gate that the DEFAULT stays
    * reference-exact while the flag adds strictly more. Variant 4 is a
    * base-format control (both chains agree); variant 5 parses in
    * neither. Ambiguity precedence is part of the contract: a day ≤ 12
    * slashed string stays month-first even under the flag. */
  def timestampParseDayFirst(spark: SparkSession, dir: String): DataFrame = {
    val sparkFmts = Seq(
      "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy HH:mm", "dd/MM/yyyy",
      "dd-MM-yy HH:mm", "yyyy-MM-dd HH:mm:ss")
    val variant = (col("event_id") % 6).cast(IntegerType)
    val raw = sparkFmts.zipWithIndex.foldLeft(
      when(variant === 5, concat(date_format(col("ts"), "HH:mm"), lit("XX")))) {
      case (acc, (fmt, i)) => acc.when(variant === i, date_format(col("ts"), fmt))
    }
    Tables.events(spark, dir)
      .withColumn("ts_raw", raw)
      .select(col("event_id"), col("ts_raw"),
        date_format(Timestamps.parseMultiFormat(col("ts_raw"), extended = true),
          "yyyy-MM-dd HH:mm:ss").as("ts_extended"),
        date_format(Timestamps.parseMultiFormat(col("ts_raw")),
          "yyyy-MM-dd HH:mm:ss").as("ts_strict"))
  }

  private val timestampParseDayFirstSql = {
    val duckGen = Seq(
      "%d/%m/%Y %H:%M:%S", "%d/%m/%Y %H:%M", "%d/%m/%Y",
      "%d-%m-%y %H:%M", "%Y-%m-%d %H:%M:%S")
    val cases = duckGen.zipWithIndex.map { case (fmt, i) =>
      s"WHEN $i THEN strftime(ts, '$fmt')"
    }.mkString(" ")
    s"""WITH dirty AS (
      SELECT event_id,
        CASE CAST(event_id % 6 AS INT) $cases
          ELSE strftime(ts, '%H:%M') || 'XX' END AS ts_raw
      FROM events)
    SELECT event_id, ts_raw,
      strftime(${Timestamps.duckParseSql("ts_raw", extended = true)},
        '%Y-%m-%d %H:%M:%S') AS ts_extended,
      strftime(${Timestamps.duckParseSql("ts_raw")},
        '%Y-%m-%d %H:%M:%S') AS ts_strict
    FROM dirty"""
  }

  /** D5 — null-safe business DQ rule: revenue ≈ quantity × unit_price
    * within 0.01 (`glue_job_raw_to_processed.py:304-310`), with the
    * reference's 3VL row-loss bug (SURVEY §2.G Q4) fixed: null numerics
    * are classified as rejects instead of silently vanishing. */
  def businessDq(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.util.Par.ensure(Tables(spark, dir, "lineitem"))
    // deterministically perturb some revenues; null out others
    val revenue = when(col("l_linenumber") % 7 === 3, lit(null).cast(DoubleType))
      .when(col("l_linenumber") % 7 === 5,
        col("l_quantity") * col("l_extendedprice") + 0.05)
      .otherwise(col("l_quantity") * col("l_extendedprice"))
    val bad = abs(revenue - col("l_quantity") * col("l_extendedprice")) > 0.01
    li.select(col("l_orderkey"), col("l_linenumber"), revenue.as("revenue"),
      when(coalesce(bad, lit(true)), lit("BUSINESS_LOGIC_FAIL")).as("reject_reason"))
  }

  /** C3 — header normalization as a column expression, over part types. */
  def headerNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(col("p_type")).distinct()
      .select(col("p_type"), Headers.normalizeCol(col("p_type")).as("normalized"))

  /** Exact dedup — group identical texts, keep lowest id (hash-groupBy;
    * at scale this is one shuffle on the md5 key). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q08_currency_clean", currencyClean, Some(s"""
      $decorateSql
      SELECT l_orderkey, l_linenumber, raw_price,
        ${Numerics.duckCleanCurrencySql("raw_price")} AS unit_price
      FROM dirty""")),
    QueryDef("q09_quantity_clean", quantityClean, Some("""
      WITH dirty AS (
        SELECT l_orderkey, l_linenumber,
          CASE l_linenumber % 5
            WHEN 0 THEN 'N/A'
            WHEN 1 THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || ' pcs'
            WHEN 2 THEN ' ' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || ' '
            ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
          END AS raw_qty
        FROM lineitem)
      SELECT l_orderkey, l_linenumber, raw_qty,
        """ + Numerics.duckCleanQuantitySql("raw_qty") + """ AS quantity
      FROM dirty""")),
    QueryDef("q10_timestamp_parse", timestampParse, Some(timestampParseSql)),
    QueryDef("q89_timestamp_dayfirst", timestampParseDayFirst,
      Some(timestampParseDayFirstSql)),
    QueryDef("q11_business_dq", businessDq, Some("""
      WITH src AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
          CASE
            WHEN l_linenumber % 7 = 3 THEN NULL
            WHEN l_linenumber % 7 = 5 THEN l_quantity * l_extendedprice + 0.05
            ELSE l_quantity * l_extendedprice
          END AS revenue
        FROM lineitem)
      SELECT l_orderkey, l_linenumber, revenue,
        CASE WHEN coalesce(abs(revenue - l_quantity * l_extendedprice) > 0.01, TRUE)
          THEN 'BUSINESS_LOGIC_FAIL' END AS reject_reason
      FROM src""")),
    QueryDef("q12_header_normalize", headerNormalize, Some(s"""
      SELECT p_type, ${Headers.duckNormalizeSql("p_type")} AS normalized
      FROM (SELECT DISTINCT p_type FROM part)""")),
    QueryDef("q13_dedup_exact", dedupExact, Some("""
      SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id,
        COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text)""")))
}
