package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Write-side generated + identity columns (r17) — the contracts the
  * q314 gate row cannot see from its aggregate: identity allocation
  * under a LOST COMMIT RACE (re-staged from the winner's mark, never
  * interleaved or reused), truly concurrent appenders, and generated
  * columns recomputing through UPDATE and merge restages. */
class GeneratedIdentitySpec extends SparkTestBase {

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_genid_$tag").toString + "/t"

  test("identity: a lost commit race re-stages from the winner's mark") {
    import spark.implicits._
    val t = fresh("race")
    Snapshots.createTable(spark, t, Seq(("k", "BIGINT", None)))
    Snapshots.setIdentityColumn(spark, t, "rid")
    val a = (1L to 40L).toDF("k")
    val b = (101L to 130L).toDF("k")
    // deterministic interleave: append A stages its ids from mark 0,
    // then — before A publishes — append B commits and advances the
    // mark; A's commit must detect the moved mark, RE-STAGE from B's,
    // and land with ids strictly after B's
    val raced = new java.util.concurrent.atomic.AtomicBoolean(false)
    Snapshots.append(spark, t, a, beforePublish = () =>
      if (raced.compareAndSet(false, true)) {
        Snapshots.append(spark, t, b): Unit
      })
    assert(raced.get, "the interleaving never fired")
    val live = Snapshots.readLatest(spark, t).get
      .select(col("k"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(live.length == 70)
    val rids = live.map(_._2)
    assert(rids.distinct.length == 70 && rids.min == 1L && rids.max == 70L,
      s"ids not a contiguous 1..70: ${rids.sorted.mkString(",")}")
    // per-commit contiguity with B (the winner) first
    val bRids = live.filter(_._1 >= 101L).map(_._2)
    val aRids = live.filter(_._1 < 101L).map(_._2)
    assert(bRids.min == 1L && bRids.max == 30L)
    assert(aRids.min == 31L && aRids.max == 70L,
      "loser did not re-stage after the winner's mark")
  }

  test("identity: concurrent appenders never interleave or reuse ids") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val t = fresh("conc")
    Snapshots.createTable(spark, t, Seq(("batch", "BIGINT", None)))
    Snapshots.setIdentityColumn(spark, t, "rid")
    val fs = (0 until 4).map(bn => Future {
      Snapshots.append(spark, t,
        Seq.fill(25)(bn.toLong).toDF("batch"))
    })
    Await.result(Future.sequence(fs), 5.minutes)
    val rows = Snapshots.readLatest(spark, t).get
      .select(col("batch"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rids = rows.map(_._2)
    assert(rows.length == 100 && rids.distinct.length == 100 &&
      rids.min == 1L && rids.max == 100L,
      s"concurrent ids broken: ${rids.sorted.take(20).mkString(",")}…")
    // each commit's block is contiguous: span == count per batch
    rows.groupBy(_._1).foreach { case (bn, rs) =>
      val ids = rs.map(_._2)
      assert(ids.max - ids.min + 1 == ids.length,
        s"batch $bn ids not contiguous: ${ids.sorted.mkString(",")}")
    }
  }

  test("generated columns: update and merge restages recompute") {
    import spark.implicits._
    val t = fresh("regen")
    Snapshots.createTable(spark, t, Seq(
      ("k", "BIGINT", None), ("v", "BIGINT", None),
      ("band", "STRING", None)))
    Snapshots.setGeneratedColumn(spark, t, "band",
      "CASE WHEN v < 10 THEN 'lo' ELSE 'hi' END")
    Snapshots.append(spark, t,
      Seq((1L, 5L), (2L, 50L)).toDF("k", "v"))
    def bandOf(k: Long): String = Snapshots.readLatest(spark, t).get
      .filter(col("k") === k).select("band").head.getString(0)
    assert(bandOf(1L) == "lo" && bandOf(2L) == "hi")
    // UPDATE recomputes the derived value from the post-SET row
    Snapshots.updateWhere(spark, t, col("k") === 1L,
      Map("v" -> lit(100L)))
    assert(bandOf(1L) == "hi", "update restage did not recompute")
    // upsert merge: computed for both the replaced and the new row
    Snapshots.merge(spark, t,
      Seq((2L, 3L), (3L, 7L)).toDF("k", "v"), Seq("k"))
    assert(bandOf(2L) == "lo" && bandOf(3L) == "lo")
    // a lying writer is refused with no version burned
    val before = Snapshots.latestVersion(spark, t).get
    val e = intercept[IllegalArgumentException](
      Snapshots.append(spark, t,
        Seq((9L, 1L, "hi")).toDF("k", "v", "band")))
    assert(e.getMessage.contains("GENERATED ALWAYS AS"), e.getMessage)
    assert(Snapshots.latestVersion(spark, t).contains(before))
  }
}
