package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CdcSpec extends SparkTestBase {

  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "v")

  test("merge applies latest change per key, deletes drop, inserts add") {
    val changes = Seq(
      (2L, "b2", 21.0, "U", 5L),
      (3L, "c", 30.0, "D", 5L),
      (4L, "d", 40.0, "I", 5L))
      .toDF("k", "name", "v", "op", "seq")
    val out = CdcMerge(snap, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0)))
  }

  test("within a batch the highest sequence wins, including delete-then-reinsert") {
    val changes = Seq(
      (2L, "first", 1.0, "U", 1L),
      (2L, "last", 2.0, "U", 9L),   // later update supersedes
      (3L, "x", 0.0, "D", 1L),
      (3L, "revived", 33.0, "I", 2L), // re-insert after delete: survives
      (1L, "gone", 0.0, "D", 7L))
    val out = CdcMerge(snap, changes.toDF("k", "name", "v", "op", "seq"), Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((2L, "last", 2.0), (3L, "revived", 33.0)))
  }

  test("insert on an existing key degenerates to an update; delete of a missing key is a no-op") {
    val changes = Seq(
      (1L, "clobbered", 11.0, "I", 1L),
      (99L, "ghost", 0.0, "D", 1L))
      .toDF("k", "name", "v", "op", "seq")
    val out = CdcMerge(snap, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "clobbered", 11.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("empty change batch is identity") {
    val changes = Seq.empty[(Long, String, Double, String, Long)]
      .toDF("k", "name", "v", "op", "seq")
    val out = CdcMerge(snap, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("incremental agg merge equals from-scratch aggregation") {
    import graft.gold.IncrementalAgg
    val rows = Seq(
      ("a", 1L, 10L), ("a", 1L, 20L), ("b", 1L, 5L),
      ("a", 1L, 1L), ("c", 1L, 7L)) // last two form the delta
      .toDF("k", "n", "v")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(sum("n").as("n"), sum("v").as("v"))
    val merged = IncrementalAgg.merge(
      agg(rows.limit(3)), agg(rows.offset(3)), Seq("k"), Seq("n", "v"))
      .orderBy("k").as[(String, Long, Long)].collect()
    // groups only in stored (b), only in delta (c), and in both (a)
    assert(merged.toSeq == Seq(("a", 3L, 31L), ("b", 1L, 5L), ("c", 1L, 7L)))
  }

  test("scd2 history chains effective ranges per key") {
    val versions = Seq(
      (1L, 100L, "v1"), (1L, 200L, "v2"), (1L, 300L, "v3"),
      (2L, 150L, "only"))
      .toDF("k", "at", "payload")
    val hist = Scd.history(versions, Seq("k"), col("at"))
      .orderBy("k", "at")
      .select("k", "at", "effective_from", "effective_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect()
    assert(hist.toSeq == Seq(
      (1L, 100L, 100L, Some(200L), false),
      (1L, 200L, 200L, Some(300L), false),
      (1L, 300L, 300L, None, true),
      (2L, 150L, 150L, None, true)))
  }
}
