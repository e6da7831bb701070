package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.lake.Snapshots

/** [[SnapshotStreamSource]] contracts the q271 gate can't see: WAP
  * isolation (a branch version emits nothing; the fast-forward that
  * publishes it emits its rows exactly once), rate limiting above one
  * version per trigger, and rename survival (rows stream under the
  * CURRENT names whatever era their files were written in). */
class SnapshotStreamSourceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  test("branch versions invisible; fast-forward emits once; rename maps") {
    val root = Files.createTempDirectory("graft_snapsrc").toString
    val t = s"$root/t"
    val sink = s"$root/sink"
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 0))
    // WAP: stage on a branch, audit, fast-forward to publish
    Snapshots.createBranch(spark, t, "wap", 1)
    Snapshots.appendToBranch(spark, t, "wap",
      orders.filter(col("o_orderkey") % 3 === 1))
    SnapshotStreamSource.runOnce(spark, t, sink, s"$root/ckpt")
    def sinkRows = Snapshots.readLatest(spark, sink).get
    // v1 emitted, v2 (branch) consumed as an EMPTY version: staged rows
    // must not leak to the stream any more than to readLatest
    val mainOnly = orders.filter(col("o_orderkey") % 3 === 0)
    assert(sinkRows.count() == mainOnly.count())
    assert(Snapshots.latestVersion(spark, sink).contains(2))
    // fast-forward publishes the staged files on MAIN: append-shaped
    // (files superset, deletes unchanged) → the rows stream exactly once
    Snapshots.fastForwardMain(spark, t, "wap")
    SnapshotStreamSource.runOnce(spark, t, sink, s"$root/ckpt")
    val published = orders.filter(col("o_orderkey") % 3 <= 1)
    assert(sinkRows.count() == published.count())
    // rename, then append under the new name: the stream serves BOTH
    // eras under the current name (era-aware scan), no column split
    Snapshots.renameColumn(spark, t, "o_totalprice", "price")
    Snapshots.append(spark, t,
      orders.filter(col("o_orderkey") % 3 === 2)
        .withColumnRenamed("o_totalprice", "price"))
    SnapshotStreamSource.runOnce(spark, t, sink, s"$root/ckpt")
    val renamedBatch = sinkRows.filter(col("price").isNotNull)
    assert(renamedBatch.count() == orders.filter(col("o_orderkey") % 3 === 2)
      .count())
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }

  test("maxVersionsPerTrigger bounds the batch; multi-version batch exact") {
    val root = Files.createTempDirectory("graft_snapsrc2").toString
    val t = s"$root/t"
    val sink = s"$root/sink"
    for (b <- 0 to 3)
      Snapshots.append(spark, t,
        orders.filter(pmod(col("o_orderkey"), lit(4)) === b))
    SnapshotStreamSource.runOnce(spark, t, sink, s"$root/ckpt",
      maxVersionsPerTrigger = 2)
    // 4 source versions at 2 per trigger = 2 sink versions, all rows
    assert(Snapshots.latestVersion(spark, sink).contains(2))
    assert(Snapshots.readLatest(spark, sink).get.count() == orders.count())
    // startingTimestamp: the state AT v2's instant is the batch-read
    // baseline; the stream carries versions committed AFTER it (v3, v4)
    val sink2 = s"$root/sink2"
    val ts2 = Snapshots.snapshot(spark, t, 2).get.commitTs
    SnapshotStreamSource.runOnce(spark, t, sink2, s"$root/ckpt2",
      startingTimestampMs = Some(ts2))
    val expect = orders.filter(pmod(col("o_orderkey"), lit(4)) >= 2).count()
    assert(Snapshots.readLatest(spark, sink2).get.count() == expect)
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }
}
