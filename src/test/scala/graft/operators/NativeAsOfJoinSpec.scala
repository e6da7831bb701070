package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.AsOfJoin
import graft.queries.Tables

/** The custom physical as-of join (logical node → strategy → merge exec)
  * must agree row-for-row with the compositional window formulation, plan
  * as AsOfJoinExec, and handle unmatched/empty sides. */
class NativeAsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("matches the compositional as-of join on real data") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), (col("user_id") % 50).as("bucket"), col("ts"))
    val orders = AsOfJoin.latestPerKeyTime(
      Tables(spark, sfDir, "orders")
        .select((col("o_custkey") % 50).as("bucket"), col("o_orderdate"),
          col("o_orderkey")),
      "bucket", "o_orderdate", "o_orderkey")
    val native = NativeAsOfJoin
      .latestPrior(events, orders, "bucket", "ts", "o_orderdate")
      .select("event_id", "bucket", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
    val composed = AsOfJoin
      .latestPrior(events, orders, "bucket", "ts", "o_orderdate")
      .select("event_id", "bucket", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
    assert(native.nonEmpty && native == composed)
  }

  test("plans as AsOfJoinExec with exchanges/sorts inserted by Spark") {
    val l = Seq((1L, new Timestamp(1000L))).toDF("k", "t")
    val r = Seq((1L, new Timestamp(500L), "x")).toDF("k", "rt", "v")
    val df = NativeAsOfJoin.latestPrior(l, r, "k", "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin"))
    assert(plan.contains("Exchange hashpartitioning"))
    assert(df.columns.toSeq == Seq("k", "t", "rt", "v")) // right key dropped
  }

  test("unmatched left rows carry nulls; exact-time ties match inclusively") {
    val l = Seq((1L, 100L), (1L, 50L), (2L, 10L), (3L, 5L))
      .toDF("k", "t")
    val r = Seq((1L, 100L, "at100"), (1L, 60L, "at60"), (2L, 20L, "late"))
      .toDF("k", "rt", "v")
    val got = NativeAsOfJoin.latestPrior(l, r, "k", "t", "rt")
      .select("k", "t", "v")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(got == Set(
      (1L, 100L, "at100"), // inclusive tie takes the t==100 right row
      (1L, 50L, null), // no right row at or before 50
      (2L, 10L, null), // right exists for the key but only later
      (3L, 5L, null))) // key absent on the right entirely
  }

  test("unmatched rows yield NULL even for non-nullable primitive right columns") {
    // local Datasets carry nullable=false longs; the result projection
    // must still read the substituted null row as NULL, not unbox it to 0
    val l = Seq((1L, 100L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 50L, 7L)).toDF("k", "rt", "rv")
    val rows = NativeAsOfJoin.latestPrior(l, r, "k", "t", "rt")
      .orderBy("k").collect()
    assert(rows(0).getLong(3) == 7L)
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(3))
  }

  test("SQL null semantics: null keys and null right-times never match") {
    // matches DuckDB ASOF JOIN (the q38 oracle): NULL = NULL is not a
    // match and rt <= lt is never true for NULL — unlike the window-based
    // compositional form, which groups null keys together
    val l = Seq((Option(1L), Option(100L)), (Option.empty[Long], Option(100L)),
      (Option(2L), Option.empty[Long])).toDF("k", "t")
    val r = Seq((Option(1L), Option.empty[Long], "nulltime"),
      (Option(1L), Option(50L), "ok"),
      (Option.empty[Long], Option(10L), "nullkey")).toDF("k", "rt", "v")
    val got = NativeAsOfJoin.latestPrior(l, r, "k", "t", "rt")
      .select("k", "v")
      .collect().map(x => (if (x.isNullAt(0)) -1L else x.getLong(0),
        x.getString(1))).toSet
    assert(got == Set(
      (1L, "ok"), // the NULL-time right row is skipped, not matched
      (-1L, null), // NULL left key matches nothing (incl. NULL right key)
      (2L, null))) // NULL left time satisfies no rt <= lt
  }

  test("strict variant: exact-time ties are excluded, earlier rows still match") {
    val l = Seq((1L, 100L), (1L, 60L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 100L, "at100"), (1L, 60L, "at60"), (1L, 40L, "at40"),
      (2L, 10L, "at10")).toDF("k", "rt", "v")
    val got = NativeAsOfJoin.latestPrior(l, r, "k", "t", "rt", strict = true)
      .select("k", "t", "v")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(got == Set(
      (1L, 100L, "at60"), // rt==100 tie excluded; latest strictly-prior wins
      (1L, 60L, "at40"), // rt==60 tie excluded
      (2L, 10L, null))) // only right row is AT the time — strict → no match
    // the tie row stays buffered for later lefts, not consumed+discarded
    val l2 = Seq((1L, 50L), (1L, 70L)).toDF("k", "t")
    val r2 = Seq((1L, 50L, "x")).toDF("k", "rt", "v")
    val got2 = NativeAsOfJoin.latestPrior(l2, r2, "k", "t", "rt", strict = true)
      .select("t", "v")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet
    assert(got2 == Set((50L, null), (70L, "x")))
  }

  test("strict variant: empty sides and nulls behave like the inclusive form") {
    val l = Seq((1L, 100L)).toDF("k", "t")
    val empty = Seq.empty[(Long, Long, String)].toDF("k", "rt", "v")
    assert(NativeAsOfJoin.latestPrior(l, empty, "k", "t", "rt", strict = true)
      .collect().map(_.isNullAt(2)).toSeq == Seq(true))
    assert(NativeAsOfJoin.latestPrior(empty.toDF("k", "t", "v")
        .select("k", "t"), l.withColumnRenamed("t", "rt"),
        "k", "t", "rt", strict = true).count() == 0L)
    val nullTime = Seq((Option(1L), Option.empty[Long], "nt")).toDF("k", "rt", "v")
    assert(NativeAsOfJoin.latestPrior(l, nullTime, "k", "t", "rt", strict = true)
      .collect().map(_.isNullAt(3)).toSeq == Seq(true))
  }

  test("within variant: matches outside the tolerance are nulled, inside kept") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val l = Seq((1L, ts(1000)), (1L, ts(5000)), (2L, ts(100)))
      .toDF("k", "t")
    val r = Seq((1L, ts(990), "recent"), (1L, ts(10), "stale"),
      (2L, ts(100), "attime")).toDF("k", "rt", "v")
    val got = NativeAsOfJoin.latestPriorWithin(l, r, "k", "t", "rt",
        expr("INTERVAL 60 SECONDS"))
      .select("k", "t", "v", "rt")
      .collect().map(x => (x.getLong(0), x.getTimestamp(1).getTime / 1000,
        x.getString(2), Option(x.getTimestamp(3)).map(_.getTime / 1000)))
      .toSet
    assert(got == Set(
      (1L, 1000L, "recent", Some(990L)), // 10s old — within 60s
      (1L, 5000L, null, None), // latest prior is 4010s old — nulled out
      (2L, 100L, "attime", Some(100L)))) // boundary: exactly at t, kept
    // exact boundary: rt == lt - tolerance is INSIDE the window (>=)
    val lb = Seq((1L, ts(1000))).toDF("k", "t")
    val rb = Seq((1L, ts(940), "edge")).toDF("k", "rt", "v")
    val gb = NativeAsOfJoin.latestPriorWithin(lb, rb, "k", "t", "rt",
        expr("INTERVAL 60 SECONDS")).select("v").collect()
    assert(gb.map(_.getString(0)).toSeq == Seq("edge"))
  }

  test("self-join inputs (shared lineage) do not collide on attribute ids") {
    val base = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "t", "v")
    val got = NativeAsOfJoin
      .latestPrior(base.select("k", "t"), base.select("k", "t", "v")
        .withColumnRenamed("t", "rt"), "k", "t", "rt")
      .select("k", "t", "v")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(got == Set((1L, 10L, "a"), (1L, 20L, "b")))
  }
}
