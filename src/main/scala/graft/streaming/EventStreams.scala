package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Structured Streaming forms of the event analytics (batch twins live in
  * graft.queries.EventQueries — the specs assert stream == batch).
  *
  * Scale notes: the windowed aggregate is a standard watermarked stateful
  * agg — state is bounded by (watermark horizon × group cardinality);
  * sessionization keeps one small state record per user via
  * flatMapGroupsWithState with an event-time timeout: a user idle longer
  * than `idleHorizonMs` is expired from the state store, so state size is
  * O(users active within the horizon), not O(all users ever seen).
  * Trade-off: a user returning after the horizon restarts session
  * numbering at 1 (cumulative per-user numbering over unbounded time
  * would require unbounded state).
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionAssignment(event_id: Long, user_id: Long,
      session_seq: Long)

  final case class SessionState(lastEventUs: Long, lastEventId: Long,
      sessionSeq: Long)

  val SessionGapUs: Long = 1800L * 1000000L // 30 min, matches batch twin

  /** Default state-expiry horizon: drop a user's state after 90 idle days. */
  val DefaultIdleHorizonMs: Long = 90L * 24 * 3600 * 1000L

  /** Tumbling 1-hour windowed aggregate with a 10-minute watermark.
    * Value sums accumulate through DECIMAL (q18/q58 convention) so the
    * exported double is partition-order-independent — oracle-comparable,
    * not just count-comparable. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour/15-minute windowed aggregate with a 10-minute
    * watermark — each event contributes to 4 overlapping windows (the
    * streaming twin of the q58 batch query, full shape: counts + exact
    * decimal-accumulated value sums); state is bounded by
    * (watermark horizon / slide) windows per group. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Watermarked stream-stream interval join: every event is attributed
    * to the purchase windows of the same user it falls into
    * ([purchase_ts, purchase_ts + 2h), the batch twin is the q31 range
    * join). The event-time range condition plus watermarks on BOTH inputs
    * let Spark derive a state watermark per side, so buffered rows are
    * evicted as time advances — state is bounded by (watermark delay +
    * window length) × arrival rate, not by stream length. */
  def attributeToPurchases(events: Dataset[Event],
      purchases: Dataset[Event],
      watermarkDelay: String = "1 hour"): DataFrame = {
    val e = events.toDF()
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
    val p = purchases.toDF()
      .select(col("event_id").as("window_id"), col("user_id").as("p_user"),
        col("ts").as("w_start"))
      .withWatermark("w_start", watermarkDelay)
    e.join(p,
        col("user_id") === col("p_user") &&
          col("ts") >= col("w_start") &&
          col("ts") < col("w_start") + expr("INTERVAL 2 HOURS"))
      .select(col("event_id"), col("user_id"), col("window_id"))
  }

  /** LEFT-OUTER watermarked stream-stream interval join — the production
    * attribution shape the inner form (above) never exercises: events
    * with NO covering purchase window must still be emitted (with a null
    * window id), and in a stream that can only happen at WATERMARK
    * EXPIRY — an unmatched left row is held in state until the watermark
    * proves no future purchase can start a window covering it (here:
    * until the watermark passes the event's own timestamp, since a
    * window starting after `ts` cannot cover `ts`), then emitted
    * null-extended and evicted. Matches emit eagerly exactly like the
    * inner join; the delayed-null trade is what bounds state on an
    * unbounded run. A bounded replay therefore yields: all inner pairs,
    * plus nulls for unmatched events far enough below the FINAL
    * watermark — the closed form the q177 oracle states explicitly
    * (events in the last watermark-horizon of the replay end with their
    * nulls unflushed; on a real 24×7 stream they flush as time
    * advances). */
  def attributeToPurchasesOuter(events: Dataset[Event],
      purchases: Dataset[Event],
      watermarkDelay: String = "1 hour"): DataFrame = {
    val e = events.toDF()
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
    val p = purchases.toDF()
      .select(col("event_id").as("window_id"), col("user_id").as("p_user"),
        col("ts").as("w_start"))
      .withWatermark("w_start", watermarkDelay)
    e.join(p,
        col("user_id") === col("p_user") &&
          col("ts") >= col("w_start") &&
          col("ts") < col("w_start") + expr("INTERVAL 2 HOURS"),
        "left_outer")
      .select(col("event_id"), col("user_id"), col("window_id"))
  }

  /** Streaming dedup on event_id with bounded state: duplicates arriving
    * while the original's state is live (i.e. within the watermark
    * horizon of the first occurrence) are dropped, and the per-key state
    * is evicted once the watermark passes — plain `dropDuplicates` would
    * instead grow state O(all ids ever seen). The trade-off of
    * `dropDuplicatesWithinWatermark` is explicitly bounded exactness: a
    * duplicate arriving after its original's state was evicted is
    * re-emitted, so results match batch `dropDuplicates("event_id")` only
    * when duplicates arrive within the horizon. */
  def dedupEvents(events: Dataset[Event],
      watermarkDelay: String = "1 hour"): Dataset[Event] =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stateful gap-based sessionization: one state record per user; a new
    * session starts after >30 min idle. Within a micro-batch, events are
    * processed in (ts, event_id) order so assignment matches the batch
    * window implementation. State for a user idle past `idleHorizonMs`
    * (event time, relative to the watermark) is expired via
    * EventTimeTimeout; rows later than `watermarkDelay` behind the max
    * seen event time are dropped as late data. */
  def sessionize(events: Dataset[Event],
      watermarkDelay: String = "1 hour",
      idleHorizonMs: Long = DefaultIdleHorizonMs): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(assignSessions(idleHorizonMs))
  }

  private[streaming] def eventMicros(t: Timestamp): Long =
    (t.getTime - t.getNanos / 1000000) * 1000L + t.getNanos / 1000L

  private[streaming] def assignSessions(idleHorizonMs: Long)(userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionAssignment] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    def micros(t: Timestamp): Long = eventMicros(t)
    val ordered = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, -1L, 0L))
    val out = ordered.map { e =>
      val us = micros(e.ts)
      val isNew = st.sessionSeq == 0L || us - st.lastEventUs > SessionGapUs
      st = SessionState(us, e.event_id,
        if (isNew) st.sessionSeq + 1 else st.sessionSeq)
      SessionAssignment(e.event_id, userId, st.sessionSeq)
    }
    if (ordered.nonEmpty) {
      state.update(st)
      // Expire once the watermark passes lastEvent + horizon; a timeout
      // timestamp must sit strictly above the current watermark.
      state.setTimeoutTimestamp(math.max(st.lastEventUs / 1000L + idleHorizonMs,
        state.getCurrentWatermarkMs + 1L))
    }
    out.iterator
  }

  /** The same sessionization through `transformWithState` — Spark 4's
    * arbitrary-stateful-operator API (typed state variables + explicit
    * event-time timers; requires the RocksDB state store provider, the
    * GraftSession default). Identical semantics to [[sessionize]]:
    * in-batch (ts, event_id) ordering, 30-min gap, one compact state
    * record per user, idle-horizon eviction — here via a registered timer
    * per user that [[SessionProcessor.handleExpiredTimer]] answers by
    * clearing state. Spec-pinned equal to both the fMGWS stream and the
    * batch window twin. */
  def sessionizeTws(events: Dataset[Event],
      watermarkDelay: String = "1 hour",
      idleHorizonMs: Long = DefaultIdleHorizonMs): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(idleHorizonMs),
        TimeMode.EventTime, OutputMode.Append)
  }

  /** One state record per user; a fresh timer per batch replaces the
    * previous one so an active user is never evicted by a stale timer. */
  class SessionProcessor(idleHorizonMs: Long)
      extends StatefulProcessor[Long, Event, SessionAssignment] {

    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SessionAssignment] = {
      val ordered = rows.toSeq.sortBy(e => (eventMicros(e.ts), e.event_id))
      if (ordered.isEmpty) return Iterator.empty
      var st =
        if (state.exists()) state.get() else SessionState(Long.MinValue, -1L, 0L)
      val out = ordered.map { e =>
        val us = eventMicros(e.ts)
        val isNew = st.sessionSeq == 0L || us - st.lastEventUs > SessionGapUs
        st = SessionState(us, e.event_id,
          if (isNew) st.sessionSeq + 1 else st.sessionSeq)
        SessionAssignment(e.event_id, userId, st.sessionSeq)
      }
      state.update(st)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(st.lastEventUs / 1000L + idleHorizonMs,
        tv.getCurrentWatermarkInMs + 1L))
      out.iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionAssignment] = {
      state.clear()
      Iterator.empty
    }
  }
}
