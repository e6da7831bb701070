package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.lake.Snapshots

/** [[ChangeFeedSource]] contracts the q167 gate can't see: the version
  * frontier is the file source's OWN checkpoint over `_log` (restart
  * consumes only new versions), and the batchId↔feed-version guard makes
  * a full from-scratch replay a no-op rather than a double-apply. */
class ChangeFeedSourceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  test("restart resumes at the log frontier; replay never double-applies") {
    val root = Files.createTempDirectory("graft_cdfsrc").toString
    val t = s"$root/t"
    val feed = s"$root/feed"
    val ckpt = s"$root/ckpt"
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 2 === 0))
    val v2 = Snapshots.merge(spark, t,
      orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0),
      Seq("o_orderkey"))
    ChangeFeedSource.runOnce(spark, t, feed, ckpt)
    def feedRows = Snapshots.readLatest(spark, feed).get
    val after2 = feedRows.count()
    assert(after2 == Snapshots.changesBetween(spark, t, 1, v2).get.count())
    // one feed version per consumed log version (seed included, empty)
    assert(Snapshots.latestVersion(spark, feed).contains(2))
    // new source commit + RESTART with the same checkpoint: only the new
    // version's window is consumed — the frontier came from _log alone
    val v3 = Snapshots.deleteWhere(spark, t, col("o_totalprice") < 30000)
    ChangeFeedSource.runOnce(spark, t, feed, ckpt)
    val expect3 = Snapshots.changesBetween(spark, t, v2, v3).get.count()
    assert(feedRows.count() == after2 + expect3)
    assert(Snapshots.latestVersion(spark, feed).contains(3))
    // from-scratch REPLAY (fresh checkpoint): every batch id is at or
    // below the committed frontier → all no-ops, feed unchanged
    ChangeFeedSource.runOnce(spark, t, feed, s"$root/ckpt2")
    assert(feedRows.count() == after2 + expect3)
    assert(Snapshots.latestVersion(spark, feed).contains(3))
    // applying the feed WINDOW BY WINDOW (feed version k+1 = batch k —
    // the consumer contract; a multi-window batch must not collapse an
    // insert with its later delete) reconstructs the live table exactly
    val replica = s"$root/replica"
    Snapshots.append(spark, replica, Snapshots.readAt(spark, t, 1).get)
    for (k <- 2 to 3) {
      val files = Snapshots.newFilesBetween(spark, feed, k - 1, k)
      if (files.nonEmpty)
        Snapshots.applyChanges(spark, replica,
          spark.read.option("mergeSchema", "true")
            .parquet(files.map(f => s"$feed/$f"): _*), Seq("o_orderkey"))
    }
    val live = Snapshots.readLatest(spark, t).get
    val rep = Snapshots.readLatest(spark, replica).get
    assert(live.exceptAll(rep).isEmpty && rep.exceptAll(live).isEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }
}
