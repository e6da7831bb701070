package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Num._

/** Event-stream analytics over the `events` table: tumbling-window
  * aggregation and gap-based sessionization. Batch forms here; the
  * streaming variants (watermarked windows, stateful sessionization) live
  * in graft.streaming and are spec-tested — same column logic. */
object EventQueries {

  /** Tumbling 1-hour window aggregate by event type. */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"),
        col("value"), col("user_id"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType18_6)).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  private val DecimalType18_6 = org.apache.spark.sql.types.DecimalType(18, 6)

  /** Gap-based sessionization: a new session starts after >30 min idle.
    * Deterministic ordering tiebreak on event_id. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("user_id"), col("session_seq"))
  }

  /** Per-user top-3 events by value via the native bounded-heap
    * aggregate ([[graft.functions.TopKPairs]], O(k) state per key
    * through partial aggregation, input rows stay Tungsten) — oracle is
    * the equivalent window formulation. */
  def topEventsPerUser(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("value"), col("event_id"))
      .groupBy(col("user_id"))
      .agg(graft.functions.TopKPairs.column(
        col("value"), col("event_id"), 3).as("_top"))
      .select(col("user_id"), posexplode(col("_top")).as(Seq("_i", "_p")))
      .select(col("user_id"), (col("_i") + 1).cast("long").as("rank"),
        col("_p.id").as("event_id"), col("_p.score").as("value"))

  /** Session-level aggregates via Spark's native session_window operator
    * (merging-session state under the hood; the streaming form shares the
    * implementation). The oracle states the same semantics as a
    * gaps-and-islands window query: a session spans first-event ts to
    * last-event ts + gap. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        // float-derived `value` sums through DECIMAL like q18 — rounding
        // it to cents would hit the engines' decimal-vs-binary rounding
        // divergence on boundary doubles
        sum(col("value").cast(DecimalType18_6)).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Collect-to-list aggregation: the distinct event types each user
    * triggered, as one sorted comma-joined string. collect_set is
    * partition-order-nondeterministic, so the sort inside the aggregate
    * boundary is what makes the result (and the oracle compare)
    * well-defined. */
  def userEventTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
        .as("event_types"),
        countDistinct(col("event_type")).as("n_types"))

  /** Sliding-window aggregate: 1-hour windows every 15 minutes, so each
    * event lands in exactly 4 overlapping windows — Spark's `window()`
    * with a slide replicates rows per covering window before the hash
    * agg (the batch twin of the watermarked streaming form). The oracle
    * states the same replication arithmetically: window starts are the
    * 4 preceding 15-minute grid points. */
  def slidingHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType18_6)).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Ordered funnel: users reaching view → click-after-view →
    * purchase-after-click, as per-stage user counts. Each stage is a
    * filtered per-user MIN(ts) aggregation joined to the previous
    * stage's frontier — all shuffles hash on user_id, so the stage
    * joins co-partition after the first exchange. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("first_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("first_view"))
      .groupBy("user_id").agg(min(col("ts")).as("first_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("first_click"))
      .select("user_id").distinct()
    def staged(df: DataFrame, stage: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(stage).as("stage"), col("n_users"))
    staged(v, "1_view")
      .unionByName(staged(c, "2_click_after_view"))
      .unionByName(staged(p, "3_purchase_after_click"))
  }

  /** Lifecycle-order conformance audit (q132) — process-mining style:
    * each user's time-ordered event sequence is checked against the
    * funnel's stage order (signup → view → click → purchase; `error`
    * events are stage-agnostic and excluded). Conformance is the pure
    * INTEGER test "the stage-rank sequence is non-decreasing", i.e. the
    * ordered rank list equals its own sort — no regex engine (whose
    * semantics differ across engines), no FP. The q119 struct-sort trick
    * makes the sequence deterministic under any shuffle order. One
    * shuffle on the user key. */
  def sequenceConformance(spark: SparkSession, dir: String): DataFrame = {
    val stage = expr("""CASE event_type
      WHEN 'signup' THEN 0 WHEN 'view' THEN 1
      WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 END""")
    Tables.events(spark, dir)
      .filter(col("event_type") =!= "error")
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          stage.as("stage")).as("ev"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        expr("transform(array_sort(collect_list(ev)), x -> x.stage)")
          .as("_ranks"))
      .select(col("user_id"), col("n_events"),
        (col("_ranks") === array_sort(col("_ranks"))).as("conforms"))
  }

  /** Cohort retention matrix (q135) — the product-analytics staple: users
    * are bucketed by the week they first appeared (their cohort) and the
    * matrix counts how many of each cohort were active 0, 1, 2… weeks
    * later. Weeks are integral weeks-since-epoch (`unix_micros DIV
    * week_us`) — pure integer arithmetic, identical in both engines, no
    * timezone/locale week-of-year semantics to disagree on. Two shuffles,
    * both hashed on `user_id` (first-seen agg and the distinct
    * user-week relation), so the cohort join co-partitions without a
    * third exchange; the final rollup's cardinality is
    * O(weeks² / 2) — tiny at any corpus size. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV ${weekUs}L").as("week"))
    val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.distinct()
      .join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q135_cohort_retention", cohortRetention, Some("""
      WITH ev AS (
        SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
      c AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1),
      a AS (SELECT DISTINCT user_id, week FROM ev)
      SELECT cohort_week, week - cohort_week AS week_offset,
        COUNT(*) AS n_users
      FROM a JOIN c USING (user_id) GROUP BY 1, 2""")),
    QueryDef("q132_sequence_conformance", sequenceConformance, Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
          CASE event_type WHEN 'signup' THEN 0 WHEN 'view' THEN 1
            WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 END AS stage
        FROM events WHERE event_type <> 'error')
      SELECT user_id, COUNT(*) AS n_events,
        (list(stage ORDER BY ts_us, event_id) =
          list_sort(list(stage ORDER BY ts_us, event_id))) AS conforms
      FROM e GROUP BY 1""")),
    QueryDef("q60_funnel", funnel, Some("""
      WITH v AS (SELECT user_id, MIN(ts) AS first_view FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS first_click
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.first_view
        GROUP BY e.user_id),
      p AS (SELECT DISTINCT e.user_id
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.first_click)
      SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
      UNION ALL SELECT '2_click_after_view', COUNT(*) FROM c
      UNION ALL SELECT '3_purchase_after_click', COUNT(*) FROM p""")),
    QueryDef("q58_sliding_hourly", slidingHourly, Some("""
      WITH expanded AS (
        SELECT make_timestamp((epoch_us(ts) // 900000000 - s.i) * 900000000)
            AS win_start,
          event_type, value
        FROM events, (SELECT unnest(range(4)) AS i) s)
      SELECT win_start, event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM expanded GROUP BY 1, 2""")),
    QueryDef("q51_session_stats", sessionStats, Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
            OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000
            THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      islands AS (
        SELECT user_id, ts, value,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged)
      SELECT user_id,
        MIN(ts) AS session_start,
        MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM islands GROUP BY user_id, island""")),
    QueryDef("q41_user_event_types", userEventTypes, Some("""
      SELECT user_id,
        string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
        COUNT(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id""")),
    QueryDef("q36_topk_per_user", topEventsPerUser, Some("""
      SELECT user_id, CAST(rn AS BIGINT) AS rank, event_id, value FROM (
        SELECT user_id, event_id, value,
          row_number() OVER (PARTITION BY user_id
            ORDER BY value DESC, event_id) AS rn
        FROM events) WHERE rn <= 3""")),
    QueryDef("q18_events_hourly", hourly, Some("""
      SELECT date_trunc('hour', ts) AS hour, event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1, 2""")),
    QueryDef("q19_sessionize", sessionize, Some("""
      SELECT event_id, user_id,
        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM (
        SELECT event_id, user_id, ts,
          CASE WHEN lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
            THEN 1 ELSE 0 END AS is_new
        FROM events)""")))
}
