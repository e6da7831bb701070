package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binned range join equals the naive inequality join, incl. bin edges") {
    val points = Seq(
      (1L, 1, ts("2024-01-01 00:00:00")), // == start: included
      (2L, 1, ts("2024-01-01 00:59:59")),
      (3L, 1, ts("2024-01-01 01:00:00")), // == end: excluded
      (4L, 1, ts("2024-01-01 02:30:00")), // crosses a bin boundary
      (5L, 2, ts("2024-01-01 00:30:00"))) // same time, other key
      .toDF("pid", "k", "t")
    val intervals = Seq(
      (10L, 1, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (11L, 1, ts("2024-01-01 02:15:00"), ts("2024-01-01 03:15:00")),
      (12L, 2, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("iid", "k", "s", "e")

    val binned = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
        binWidthSeconds = 3600)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, Seq("k"))
      .filter($"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(binned == Set((1L, 10L), (2L, 10L), (4L, 11L), (5L, 12L)))
  }

  test("plan is an equi-join, not a nested-loop product") {
    val points = Seq((1L, 1, ts("2024-01-01 00:00:00"))).toDF("pid", "k", "t")
    val intervals = Seq((10L, 1, ts("2024-01-01 00:00:00"),
      ts("2024-01-01 01:00:00"))).toDF("iid", "k", "s", "e")
    val plan = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e", 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
