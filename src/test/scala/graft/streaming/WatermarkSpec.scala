package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.EventStreams.Event

/** Watermark semantics: in append mode a window emits once the watermark
  * passes its end, and events arriving later than the watermark horizon are
  * dropped instead of mutating emitted results. */
class WatermarkSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, hhmm: String): Event =
    Event(id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), 1L, "click", 1.0)

  test("late events beyond the watermark do not alter emitted windows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(stream.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      // three events in the 10:00 window
      stream.addData(ev(1, "10:01"), ev(2, "10:20"), ev(3, "10:40"))
      q.processAllAvailable()
      // watermark jumps past 11:00 → the 10:00 window closes and emits
      stream.addData(ev(4, "12:30"))
      q.processAllAvailable()
      val afterClose = spark.table("wm_out")
        .filter($"hour" === Timestamp.valueOf("2024-01-01 10:00:00"))
        .select("n_events").as[Long].collect()
      assert(afterClose.toSeq == Seq(3L))
      // a straggler for the already-closed 10:00 window: dropped
      stream.addData(ev(5, "10:55"))
      q.processAllAvailable()
      // advance watermark again so anything pending would have emitted
      stream.addData(ev(6, "14:30"))
      q.processAllAvailable()
      val finalRows = spark.table("wm_out")
        .filter($"hour" === Timestamp.valueOf("2024-01-01 10:00:00"))
        .select("n_events").as[Long].collect()
      assert(finalRows.toSeq == Seq(3L), "late event must not re-open the window")
    } finally q.stop()
  }
}
