package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DLT-style EXPECTATIONS on lake writes — the declarative data-quality
  * contract of Delta Live Tables (`expect` / `expect_or_drop` /
  * `expect_or_fail`), plus the quarantine pattern its docs recommend
  * building from them: each expectation is (name, predicate SQL); a row
  * VIOLATES when the predicate is false OR NULL (the CHECK-constraint
  * dual — an unknown quality signal is not a pass).
  *
  *  - [[expectOrFail]]: any violation refuses the WHOLE append, naming
  *    per-expectation counts; no version burned (q205's constraint
  *    discipline applied to batch admission).
  *  - [[expectOrDrop]]: clean rows land, violations are dropped; the
  *    per-expectation counts return to the caller (the DLT metrics).
  *  - [[expectOrQuarantine]]: clean rows land in the member table and
  *    violations in `<member>_rejects` (tagged with the failed
  *    expectation names) — ATOMICALLY, one [[TableGroup]] marker, so
  *    audit queries can never see admitted rows whose rejects are not
  *    yet visible or vice versa. This is the reference pipeline's
  *    reject-routing DNA (B3/D1) promoted to lakehouse transactions.
  *
  * Scale shape: tagging is one narrow projection; the quarantine split
  * is one predicate each side of the SAME staged frame; counts are one
  * aggregate pass. Nothing shuffles.
  */
object Expectations {

  val FailedCol = "_expect_failed"

  /** Clean iff EVERY predicate is true; the tag column lists the failed
    * expectation names comma-joined ("" = clean). */
  private def tagged(df: DataFrame,
      expectations: Seq[(String, String)]): DataFrame = {
    require(expectations.nonEmpty, "at least one expectation required")
    val failed = array(expectations.map { case (n, p) =>
      when(!coalesce(expr(p), lit(false)), lit(n))
    }: _*)
    df.withColumn(FailedCol,
      concat_ws(",", filter(failed, c => c.isNotNull)))
  }

  /** Per-expectation violation counts in ONE aggregate pass. */
  def violationCounts(df: DataFrame,
      expectations: Seq[(String, String)]): Map[String, Long] = {
    val aggs = expectations.map { case (n, p) =>
      sum(when(!coalesce(expr(p), lit(false)), 1L).otherwise(0L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head
    expectations.zipWithIndex.map { case ((n, _), i) =>
      n -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }.toMap
  }

  /** Any violation refuses the whole append, no version burned. */
  def expectOrFail(spark: SparkSession, table: String, df: DataFrame,
      expectations: Seq[(String, String)]): Int = {
    val bad = violationCounts(df, expectations).filter(_._2 > 0)
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"expectations violated on append to $table: " +
        bad.toSeq.sortBy(_._1)
          .map { case (n, c) => s"$n=$c" }.mkString(", "))
    Snapshots.append(spark, table, df)
  }

  /** Clean rows land; violations drop. Returns (version, counts). */
  def expectOrDrop(spark: SparkSession, table: String, df: DataFrame,
      expectations: Seq[(String, String)]): (Int, Map[String, Long]) = {
    val counts = violationCounts(df, expectations)
    val clean = tagged(df, expectations)
      .filter(col(FailedCol) === "").drop(FailedCol)
    (Snapshots.append(spark, table, clean), counts)
  }

  /** Clean rows → `member`, violations (with the failed-expectation tag)
    * → `<member>_rejects`, in ONE group-transaction marker. Both tables
    * must exist (seed with an empty append); `token` gives streaming
    * replays the usual idempotency. Returns the marker seq. */
  def expectOrQuarantine(spark: SparkSession, group: String,
      member: String, df: DataFrame,
      expectations: Seq[(String, String)], token: String = ""): Int = {
    val t = tagged(df, expectations)
    val clean = t.filter(col(FailedCol) === "").drop(FailedCol)
    val rejects = t.filter(col(FailedCol) =!= "")
    TableGroup.commitAll(spark, group, Seq(
      member -> ((tb: String, br: String) =>
        Snapshots.appendToBranch(spark, tb, br, clean)),
      s"${member}_rejects" -> ((tb: String, br: String) =>
        Snapshots.appendToBranch(spark, tb, br, rejects))),
      token = token)
  }
}
