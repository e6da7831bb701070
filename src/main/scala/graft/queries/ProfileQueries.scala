package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality surface: table profiling and the declarative rule engine
  * ([[graft.ingest.DqRules]]) under the driver's cross-engine gate.
  */
object ProfileQueries {

  private case class ProfCol(name: String, numeric: Boolean)

  private val OrdersCols = Seq(
    ProfCol("o_orderkey", numeric = true),
    ProfCol("o_custkey", numeric = true),
    ProfCol("o_totalprice", numeric = true),
    ProfCol("o_orderstatus", numeric = false),
    ProfCol("o_orderpriority", numeric = false))

  /** q111 — column profiler: per-column row/null/distinct counts plus
    * typed min/max — the stats sweep (Deequ `Analyzer` / DuckDB
    * `SUMMARIZE` shape) a lake runs on landing a new table. One
    * aggregation per column over a SINGLE-COLUMN scan: parquet column
    * pruning makes the N per-column passes read about one full-table's
    * worth of pages combined, and each aggregate is a handful of numbers
    * regardless of row count. Distinct counts are exact here so the gate
    * can hash them; at the 100 TB grain the same operator takes
    * `approx_count_distinct` (the q54 HLL path) as the documented
    * swap-in. */
  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.util.Par.ensure(Tables(spark, dir, "orders"))
    val parts = OrdersCols.map { pc =>
      val c = col(pc.name)
      orders.agg(
        count(lit(1)).as("n_rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(c).as("n_distinct"),
        (if (pc.numeric) min(c).cast("double") else lit(null).cast("double"))
          .as("min_num"),
        (if (pc.numeric) max(c).cast("double") else lit(null).cast("double"))
          .as("max_num"),
        (if (pc.numeric) lit(null).cast("string") else min(c).cast("string"))
          .as("min_str"),
        (if (pc.numeric) lit(null).cast("string") else max(c).cast("string"))
          .as("max_str"))
        .select(lit(pc.name).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    parts.reduce(_ unionByName _)
  }

  private val profileOracle: String = {
    val parts = OrdersCols.map { pc =>
      val (minN, maxN, minS, maxS) =
        if (pc.numeric)
          (s"CAST(MIN(${pc.name}) AS DOUBLE)", s"CAST(MAX(${pc.name}) AS DOUBLE)",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        else
          ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"MIN(${pc.name})", s"MAX(${pc.name})")
      s"""SELECT '${pc.name}' AS column_name,
        COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN ${pc.name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_null,
        COUNT(DISTINCT ${pc.name}) AS n_distinct,
        $minN AS min_num, $maxN AS max_num,
        $minS AS min_str, $maxS AS max_str
      FROM orders"""
    }
    parts.mkString("\n      UNION ALL\n      ")
  }

  /** q112 — the declarative DQ rule engine over orders: not-null,
    * uniqueness, range, set-membership, and pattern rules evaluated in
    * one aggregation pass ([[graft.ingest.DqRules]]), each reporting its
    * violation count. The oracle recomputes every rule declaratively;
    * rule r4's set and r5's pattern are chosen to PASS and r3's range to
    * FAIL on real data, so both report polarities are exercised. */
  def dqReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.ingest.DqRules._
    evaluate(graft.util.Par.ensure(Tables(spark, dir, "orders")), Seq(
      NotNull("r1_custkey_not_null", "o_custkey"),
      Unique("r2_orderkey_unique", "o_orderkey"),
      InRange("r3_price_range", "o_totalprice", 0.0, 100000.0),
      InSet("r4_status_domain", "o_orderstatus", Seq("F", "O", "P")),
      Matches("r5_priority_shape", "o_orderpriority", "[1-5]-[A-Z ]+")))
  }

  private val dqOracle: String = """
    SELECT 'r1_custkey_not_null' AS rule_id, 'not_null' AS kind,
      'o_custkey' AS column_name,
      CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_violations,
      SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS pass
    FROM orders
    UNION ALL
    SELECT 'r2_orderkey_unique', 'unique', 'o_orderkey',
      CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
      COUNT(*) - COUNT(DISTINCT o_orderkey) = 0
    FROM orders
    UNION ALL
    SELECT 'r3_price_range', 'in_range', 'o_totalprice',
      CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0
        OR o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT),
      SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0
        OR o_totalprice > 100000.0 THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'r4_status_domain', 'in_set', 'o_orderstatus',
      CAST(SUM(CASE WHEN o_orderstatus IS NULL
        OR o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT),
      SUM(CASE WHEN o_orderstatus IS NULL
        OR o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'r5_priority_shape', 'matches', 'o_orderpriority',
      CAST(SUM(CASE WHEN o_orderpriority IS NULL
        OR NOT regexp_matches(o_orderpriority, '[1-5]-[A-Z ]+')
        THEN 1 ELSE 0 END) AS BIGINT),
      SUM(CASE WHEN o_orderpriority IS NULL
        OR NOT regexp_matches(o_orderpriority, '[1-5]-[A-Z ]+')
        THEN 1 ELSE 0 END) = 0
    FROM orders"""

  /** q140 — k-anonymity audit (privacy DQ): group the table by its
    * quasi-identifier columns and flag every equivalence class smaller
    * than k — those rows are re-identifiable by joining the QI tuple to
    * an external dataset, the attack k-anonymity measures. One hash-agg
    * on the QI tuple (distributed, map-side partial); the suppression
    * decision is a pure per-group comparison. The release policy this
    * feeds (suppress or generalize flagged groups) composes as a
    * semi/anti join of this audit back to the table — same broadcast
    * shape as q139's erasure propagation. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = 5L
    Tables(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("suppressed", col("n_rows") < k)
  }

  private val kAnonOracle: String = """
    SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_rows,
      COUNT(*) < 5 AS suppressed
    FROM customer GROUP BY 1, 2"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q111_column_profile", profileOrders, Some(profileOracle)),
    QueryDef("q112_dq_rules", dqReport, Some(dqOracle)),
    QueryDef("q140_k_anonymity", kAnonymity, Some(kAnonOracle)))
}
