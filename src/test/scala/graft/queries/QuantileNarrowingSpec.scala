package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Skew-narrowing pins for the exact-quantile family (q293/q305): a
  * degenerate distribution — a group's whole mass inside one histogram
  * bucket, or at ONE value — must never re-create the single-task
  * collect_list buffer the two-phase shape exists to avoid. The
  * narrowing loop re-histograms oversized target buckets at width/1024
  * until each slice is ≤ cap rows or single-valued (then the answer is
  * the range floor, no slice at all). */
class QuantileNarrowingSpec extends SparkTestBase {

  private val cap = 64L

  // group A: 20k rows, ALL the same value (total degeneracy — narrowing
  // must bottom out at width 1 and resolve without any phase 2);
  // group B: 10_001 distinct values 1..10001, all inside ONE phase-1
  // bucket (narrowing must stop at a ≤cap-row slice)
  private def data = {
    val a = spark.range(20000).select(lit("A").as("g"),
      lit(123456L).as("v"))
    val b = spark.range(1, 10002).select(lit("B").as("g"),
      col("id").as("v"))
    a.unionByName(b)
  }

  test("exact quantiles: degenerate buckets narrow to bounded slices") {
    val ts = AnalyticsQueries.qTargets(data, weighted = false, cap)
    assert(ts.nonEmpty)
    // the narrowing contract: every final target is collectable or
    // single-valued — NEVER an unbounded slice
    ts.foreach(t => assert(t.rows <= cap || t.width == 1L,
      s"unbounded slice survived narrowing: $t"))
    // group A bottoms out at width 1 (one value holds everything)
    assert(ts.filter(_.g == "A").forall(_.width == 1L))
    val got = AnalyticsQueries.exactQuantilesCore(data, cap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      .toSet
    // A: all values equal; B: p50 = rank 5001 → 5001, p90 = rank
    // (9·10001+9)/10 = 9001 → 9001
    assert(got == Set(("A", "p50", 123456L), ("A", "p90", 123456L),
      ("B", "p50", 5001L), ("B", "p90", 9001L)), got.toString)
  }

  test("weighted quantiles: mass locates through narrowed slices") {
    val w = data.withColumn("wt", col("v"))
    val ts = AnalyticsQueries.qTargets(w, weighted = true, cap)
    ts.foreach(t => assert(t.rows <= cap || t.width == 1L,
      s"unbounded slice survived narrowing: $t"))
    val got = AnalyticsQueries.weightedQuantilesCore(w, cap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // A: one value carries all mass. B: wt = v, total = 10001·10002/2 =
    // 50_015_001; p50 mass = 25_007_501 → smallest x with x(x+1)/2 ≥ it
    // is 7072; p90 mass = (9·50_015_001 + 9)/10 = 45_013_501 → x = 9489
    def cum(x: Long) = x * (x + 1) / 2
    val p50 = (1L to 10001L).find(cum(_) >= (50015001L + 1) / 2).get
    val p90 = (1L to 10001L).find(cum(_) >= (9 * 50015001L + 9) / 10).get
    assert(got == Set(("A", "p50", 123456L), ("A", "p90", 123456L),
      ("B", "p50", p50), ("B", "p90", p90)), got.toString)
  }

  test("healthy distributions run zero narrowing rounds") {
    // values spread across many buckets, per-bucket counts far below
    // the production cap: targets keep the phase-1 width untouched
    val w = spark.range(100000)
      .select(lit("G").as("g"), (col("id") * 37L).as("v"))
    val ts = AnalyticsQueries.qTargets(w, weighted = false, 65536L)
    assert(ts.forall(_.width == 65536L),
      s"healthy data must not narrow: $ts")
  }
}
