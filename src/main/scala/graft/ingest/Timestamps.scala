package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regex-gated multi-format timestamp parsing.
  *
  * Mirrors the reference's hardened parser
  * (`scripts/glue_job_raw_to_processed.py:242-273` in
  * Tbrown1998/Retail-AWS-ETL-Pipeline): each candidate format is guarded by a
  * full-match regex so only plausibly-matching strings are handed to the
  * parser, and the first match wins via a coalesce fold. Strings matching no
  * pattern parse to null (the caller routes those to
  * INVALID_TIMESTAMP_FORMAT rejects).
  *
  * We use `try_to_timestamp` rather than `to_timestamp` so a regex match with
  * an invalid calendar value (e.g. month 13) degrades to null instead of
  * failing the job under Spark 4's default ANSI mode.
  */
object Timestamps {

  /** (full-match regex, datetime pattern) pairs, first match wins.
    * Order and content follow the reference exactly. */
  val patterns: Seq[(String, String)] = Seq(
    ("^\\d{4}-\\d{2}-\\d{2} \\d{1,2}:\\d{2}:\\d{2}$", "yyyy-MM-dd H:mm:ss"),
    ("^\\d{4}-\\d{2}-\\d{2} \\d{1,2}:\\d{2}$", "yyyy-MM-dd H:mm"),
    ("^\\d{4}/\\d{2}/\\d{2} \\d{1,2}:\\d{2}:\\d{2}$", "yyyy/MM/dd H:mm:ss"),
    ("^\\d{4}/\\d{2}/\\d{2} \\d{1,2}:\\d{2}$", "yyyy/MM/dd H:mm"),
    ("^\\d{2}/\\d{2}/\\d{4} \\d{1,2}:\\d{2}:\\d{2}$", "MM/dd/yyyy H:mm:ss"),
    ("^\\d{2}/\\d{2}/\\d{4} \\d{1,2}:\\d{2}$", "MM/dd/yyyy H:mm"),
    ("^\\d{2}/\\d{2}/\\d{4}$", "MM/dd/yyyy"),
    ("^\\d{4}-\\d{2}-\\d{2}$", "yyyy-MM-dd"),
    ("^\\d{4}/\\d{2}/\\d{2}$", "yyyy/MM/dd"),
    ("^\\d{8} \\d{6}$", "yyyyMMdd HHmmss"),
    ("^\\d{8}$", "yyyyMMdd"))

  /** Day-first extension — the formats the reference's design doc lists
    * (`docs/timestamp_parsing.md:14-21`) but its code never implemented,
    * plus the `dd-MM-yy H:mm` shape its own sample data contains (which
    * the reference therefore rejects as INVALID_TIMESTAMP_FORMAT).
    *
    * Appended AFTER the reference list, never interleaved, so the
    * extension is strictly additive: every string the default chain
    * parses still parses to the SAME value (ambiguous `a/b/yyyy` strings
    * with both fields ≤ 12 stay month-first, matching the code-list
    * precedence the p91/q10 oracles pin), and the day-first branch only
    * catches strings the month-first parse rejects (day > 12, or the
    * dashed 2-digit-year shape no base pattern matches).
    *
    * yy caveat: Spark maps `yy` to 2000–2099 while DuckDB's `%y` is
    * C-style (69–99 → 19xx), so cross-engine parity for the dashed form
    * holds for years 00–68 — fine for retail data; a corpus with 19xx
    * 2-digit years needs an explicit century rule anyway. */
  val extendedPatterns: Seq[(String, String)] = Seq(
    ("^\\d{2}/\\d{2}/\\d{4} \\d{1,2}:\\d{2}:\\d{2}$", "dd/MM/yyyy H:mm:ss"),
    ("^\\d{2}/\\d{2}/\\d{4} \\d{1,2}:\\d{2}$", "dd/MM/yyyy H:mm"),
    ("^\\d{2}/\\d{2}/\\d{4}$", "dd/MM/yyyy"),
    ("^\\d{2}-\\d{2}-\\d{2} \\d{1,2}:\\d{2}$", "dd-MM-yy H:mm"))

  /** Parse a raw string column through the gated format chain. The
    * default is the reference's exact code list (oracle parity);
    * `extended = true` adds the day-first fallbacks above. */
  def parseMultiFormat(raw: Column, extended: Boolean = false): Column = {
    val pats = if (extended) patterns ++ extendedPatterns else patterns
    pats.foldLeft(lit(null).cast(TimestampType)) { case (acc, (re, fmt)) =>
      coalesce(acc, when(raw.rlike(re), try_to_timestamp(raw, lit(fmt))))
    }
  }

  /** DuckDB strptime formats positionally equivalent to [[patterns]]. */
  val duckFormats: Seq[String] = Seq(
    "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M",
    "%Y/%m/%d %H:%M:%S", "%Y/%m/%d %H:%M",
    "%m/%d/%Y %H:%M:%S", "%m/%d/%Y %H:%M",
    "%m/%d/%Y", "%Y-%m-%d", "%Y/%m/%d",
    "%Y%m%d %H%M%S", "%Y%m%d")

  /** DuckDB mirrors of [[extendedPatterns]]' formats. */
  val duckExtendedFormats: Seq[String] = Seq(
    "%d/%m/%Y %H:%M:%S", "%d/%m/%Y %H:%M", "%d/%m/%Y", "%d-%m-%y %H:%M")

  /** DuckDB SQL expression computing the same gated chain over a column.
    * (SQL single-quoted strings pass backslashes through untouched, so the
    * Java regexes embed verbatim — RE2 accepts this subset.) */
  def duckParseSql(col: String, extended: Boolean = false): String = {
    val pats =
      if (extended) patterns ++ extendedPatterns else patterns
    val fmts =
      if (extended) duckFormats ++ duckExtendedFormats else duckFormats
    val chain = pats.map(_._1).zip(fmts).map { case (re, fmt) =>
      s"CASE WHEN regexp_matches($col, '$re') THEN try_strptime($col, '$fmt') END"
    }
    s"COALESCE(${chain.mkString(", ")})"
  }
}
