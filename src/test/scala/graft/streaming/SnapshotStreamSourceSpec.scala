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

  test("byteBoundedWindow: every-window ceiling, soft single admit") {
    def w(bytes: Seq[Long], cap: Long, maxV: Int) =
      SnapshotStreamSource.byteBoundedWindow(bytes, cap, maxV)
    // cap far above everything → the version cap rules
    assert(w(Seq(10L, 10L, 10L, 10L), 1000L, 3) == 3)
    // the ceiling must hold for EVERY k-window, not just the first:
    // the checkpoint frontier can start a batch at any version
    assert(w(Seq(10L, 10L, 80L, 10L), 100L, 4) == 3) // 10+80+10 = 100 fits
    assert(w(Seq(10L, 10L, 80L, 10L), 99L, 4) == 2)  // 80+10+10 would not
    // one oversized version admits ALONE (soft cap — never wedged)
    assert(w(Seq(200L), 100L, 4) == 1)
    assert(w(Seq(10L, 200L, 10L), 100L, 4) == 1)
    // versions below the starting frontier weigh zero
    assert(w(Seq(0L, 0L, 0L, 90L, 90L), 100L, 4) == 1)
    assert(w(Seq(0L, 0L, 0L, 90L, 5L), 100L, 4) == 4)
  }

  test("maxBytesPerTrigger bounds catch-up batches from log-recorded sizes") {
    val root = Files.createTempDirectory("graft_snapsrc3").toString
    val t = s"$root/t"
    for (b <- 0 to 3)
      Snapshots.append(spark, t,
        orders.filter(pmod(col("o_orderkey"), lit(4)) === b))
    // the plan reads LOG-recorded sizes; they must equal the real files
    val perVersion = (1 to 4).map(v =>
      Snapshots.appendedVersionBytes(spark, t, v))
    val fsTotal = Snapshots.snapshot(spark, t, 4).get.files
      .map(f => new File(s"$t/$f").length).sum
    assert(perVersion.forall(_ > 0L) && perVersion.sum == fsTotal,
      s"log-recorded sizes $perVersion disagree with FS total $fsTotal")
    // a cap below any two-version window → one version per batch
    val pairMin = perVersion.sliding(2).map(_.sum).min
    SnapshotStreamSource.runOnce(spark, t, s"$root/sink1", s"$root/ck1",
      maxVersionsPerTrigger = 10, maxBytesPerTrigger = Some(pairMin - 1))
    assert(Snapshots.latestVersion(spark, s"$root/sink1").contains(4))
    assert(Snapshots.readLatest(spark, s"$root/sink1").get.count()
      == orders.count())
    // a cap above the total → the version cap alone decides
    SnapshotStreamSource.runOnce(spark, t, s"$root/sink2", s"$root/ck2",
      maxVersionsPerTrigger = 10,
      maxBytesPerTrigger = Some(perVersion.sum + 1))
    assert(Snapshots.latestVersion(spark, s"$root/sink2").contains(1))
    assert(Snapshots.readLatest(spark, s"$root/sink2").get.count()
      == orders.count())
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }
}
