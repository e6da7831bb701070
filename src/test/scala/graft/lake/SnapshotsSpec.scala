package graft.lake

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Snapshots]] log mechanics the q154 gate can't see: structural
  * file-sharing between versions, immutability under later commits,
  * change-feed diffs, and vacuum retention. */
class SnapshotsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def fresh(tag: String): String =
    s"${Files.createTempDirectory(s"graft_snap_$tag").toString}/t"

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  test("append shares prior files by reference; commit writes only its delta") {
    val t = fresh("share")
    val v1 = Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 0))
    val s1 = Snapshots.snapshot(spark, t, v1).get
    val v2 = Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 1))
    val s2 = Snapshots.snapshot(spark, t, v2).get
    assert(s1.files.toSet.subsetOf(s2.files.toSet), "v2 dropped carried files")
    assert(Snapshots.newFilesBetween(spark, t, v1, v2).toSet ==
      s2.files.toSet -- s1.files.toSet)
    // all fresh v2 files live in v2's own commit dir — nothing rewritten
    assert(Snapshots.newFilesBetween(spark, t, v1, v2)
      .forall(_.startsWith("_snap/c-2/")))
    org.apache.commons.io.FileUtils.deleteQuietly(new File(t).getParentFile)
  }

  test("time travel is stable: v1's rows never change as history grows") {
    val t = fresh("stable")
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 0))
    def v1Sum = Snapshots.readAt(spark, t, 1).get
      .agg(sum(graft.queries.Num.cents(col("o_totalprice")))).head().getLong(0)
    val want = v1Sum
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 1))
    Snapshots.overwrite(spark, t, orders.filter(col("o_orderkey") % 3 === 2))
    assert(v1Sum == want)
    // and v1's physical bytes are untouched
    val c1 = new File(s"$t/_snap/c-1")
    assert(c1.exists() && c1.listFiles().nonEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(new File(t).getParentFile)
  }

  test("overwrite replaces the view; prior versions stay readable until vacuum") {
    val t = fresh("ow")
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 0))
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 1))
    val v3 = Snapshots.overwrite(spark, t, orders.filter(col("o_orderkey") % 3 === 2))
    val n3 = orders.filter(col("o_orderkey") % 3 === 2).count()
    val n12 = orders.filter(col("o_orderkey") % 3 =!= 2).count()
    assert(Snapshots.readLatest(spark, t).get.count() == n3)
    assert(Snapshots.readAt(spark, t, 2).get.count() == n12)
    // vacuum keeping only v3: old commit dirs reclaimed, v3 unharmed
    Snapshots.vacuum(spark, t, keepFrom = v3)
    assert(!new File(s"$t/_snap/c-1").exists())
    assert(!new File(s"$t/_snap/c-2").exists())
    assert(Snapshots.readAt(spark, t, v3).get.count() == n3)
    assert(Snapshots.snapshot(spark, t, 1).isEmpty, "trimmed log entry survives")
    org.apache.commons.io.FileUtils.deleteQuietly(new File(t).getParentFile)
  }

  test("merge: latest wins, tombstones reach prior delta files, history intact") {
    val t = fresh("merge")
    val base = orders.filter(col("o_orderkey") % 2 === 0)
    Snapshots.append(spark, t, base)
    val b1 = orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .unionAll(orders.filter(col("o_orderkey") % 4 === 1))
    val v2 = Snapshots.merge(spark, t, b1, Seq("o_orderkey"))
    // batch 2 re-updates keys batch 1 itself wrote (both its update half
    // %8==0 and its insert half %8==1): tombstones must hit c-2's files
    val b2 = orders.filter(col("o_orderkey") % 8 <= 1)
      .withColumn("o_totalprice", col("o_totalprice") + 2.0)
    val v3 = Snapshots.merge(spark, t, b2, Seq("o_orderkey"))
    val fin = Snapshots.readAt(spark, t, v3).get.cache()
    // exactly one live copy per key
    assert(fin.groupBy("o_orderkey").count().filter(col("count") > 1).count() == 0)
    val expectKeys = orders
      .filter(col("o_orderkey") % 2 === 0 || col("o_orderkey") % 4 === 1)
      .count()
    assert(fin.count() == expectKeys)
    // a key updated twice carries batch 2's value
    val k0 = fin.filter(col("o_orderkey") % 8 === 0)
    val base0 = orders.filter(col("o_orderkey") % 8 === 0)
    assert(k0.agg(sum(graft.queries.Num.cents(col("o_totalprice")))).head().getLong(0)
      == base0.agg(sum(graft.queries.Num.cents(col("o_totalprice") + 2.0))).head().getLong(0))
    // time travel below the merges still sees the un-merged states
    assert(Snapshots.readAt(spark, t, 1).get.count() == base.count())
    val v2Count = Snapshots.readAt(spark, t, v2).get.count()
    assert(v2Count == expectKeys) // same membership, pre-batch-2 values
    fin.unpersist()
    org.apache.commons.io.FileUtils.deleteQuietly(new File(t).getParentFile)
  }

  test("merge never rewrites existing files; the delete subtraction broadcasts") {
    val t = fresh("mergeplan")
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 2 === 0))
    def fileHashes: Map[String, Long] = {
      def walk(d: File): Seq[File] =
        d.listFiles().toSeq.flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f))
      walk(new File(s"$t/_snap"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> java.nio.file.Files.readAllBytes(f.toPath)
          .foldLeft(1125899906842597L)((h, x) => 31 * h + x)).toMap
    }
    val before = fileHashes
    Snapshots.merge(spark, t,
      orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0),
      Seq("o_orderkey"))
    val after = fileHashes
    assert(before.forall { case (p, h) => after.get(p).contains(h) },
      "an existing snapshot file changed under MERGE")
    val mor = Snapshots.readLatest(spark, t).get
    mor.collect()
    val plan = mor.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(2000))
    org.apache.commons.io.FileUtils.deleteQuietly(new File(t).getParentFile)
  }

  test("streaming snapshot sink: one version per batch, replay is a no-op, restart resumes") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft_snapsink_").toString
    val src = s"$root/src"; val table = s"$root/table"; val ckpt = s"$root/ckpt"
    val ev = graft.queries.Tables.events(spark, sfDir)
    ev.repartition(4).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val writeBatch: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
        (batch, id) =>
          if (Snapshots.latestVersion(spark, table).getOrElse(0) < id + 1)
            Snapshots.append(spark, table, batch)
      val q = stream.writeStream.foreachBatch(writeBatch)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    runOnce()
    val vAfter = Snapshots.latestVersion(spark, table).get
    assert(vAfter == 4, s"expected 4 versions (one per file batch), got $vAfter")
    assert(Snapshots.readLatest(spark, table).get.count() == ev.count())
    // a REPLAYED batch (id below the committed frontier) must be a no-op
    val replay = spark.read.parquet(src).limit(10)
    if (Snapshots.latestVersion(spark, table).getOrElse(0) < 0 + 1)
      Snapshots.append(spark, table, replay)
    assert(Snapshots.latestVersion(spark, table).get == vAfter)
    assert(Snapshots.readLatest(spark, table).get.count() == ev.count())
    // RESTART from the same checkpoint with no new input: nothing commits
    runOnce()
    assert(Snapshots.latestVersion(spark, table).get == vAfter)
    // and each intermediate version remains time-travelable
    assert(Snapshots.readAt(spark, table, 2).get.count() > 0)
    assert(Snapshots.readAt(spark, table, 2).get.count() < ev.count())
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }

  test("optimize folds merge debt into clean files as a new version") {
    val t = fresh("optimize")
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 2 === 0))
    Snapshots.merge(spark, t,
      orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0),
      Seq("o_orderkey"))
    val want = Snapshots.readLatest(spark, t).get
      .agg(count(lit(1)), sum(graft.queries.Num.cents(col("o_totalprice"))))
      .head()
    val vOpt = Snapshots.optimize(spark, t).get
    val s = Snapshots.snapshot(spark, t, vOpt).get
    assert(s.deletes.isEmpty, "optimize left positional deletes behind")
    assert(s.files.forall(_.startsWith(s"_snap/c-$vOpt/")),
      "optimize carried old files by reference instead of compacting")
    val got = Snapshots.readLatest(spark, t).get
      .agg(count(lit(1)), sum(graft.queries.Num.cents(col("o_totalprice"))))
      .head()
    assert(got == want)
    // history before the optimize is still travelable
    assert(Snapshots.readAt(spark, t, 1).get.count() ==
      orders.filter(col("o_orderkey") % 2 === 0).count())
    org.apache.commons.io.FileUtils.deleteQuietly(new File(t).getParentFile)
  }

  test("schema evolution: old versions keep the old schema, merged reads widen") {
    val t = fresh("evolve")
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 2 === 0))
    val s1 = Snapshots.readAt(spark, t, 1).get.schema.fieldNames.toSet
    assert(!s1.contains("o_channel"))
    Snapshots.append(spark, t,
      orders.filter(col("o_orderkey") % 2 === 1)
        .withColumn("o_channel", lit("web")))
    // v1 read is unchanged — time travel returns the era's own schema
    assert(Snapshots.readAt(spark, t, 1).get.schema.fieldNames.toSet == s1)
    val merged = Snapshots.readLatest(spark, t).get
    assert(merged.schema.fieldNames.contains("o_channel"))
    // pre-evolution rows carry null, post-evolution rows their value
    assert(merged.filter(col("o_channel").isNull).count() ==
      orders.filter(col("o_orderkey") % 2 === 0).count())
    assert(merged.filter(col("o_channel") === "web").count() ==
      orders.filter(col("o_orderkey") % 2 === 1).count())
    org.apache.commons.io.FileUtils.deleteQuietly(new File(t).getParentFile)
  }

  test("plain readers never see snapshot internals") {
    val t = fresh("plain")
    Snapshots.append(spark, t, orders.limit(100))
    // _snap/_log are underscore-invisible: a naive read of the table root
    // finds no parquet data at all rather than mixing versions
    val err = intercept[Exception](spark.read.parquet(t).count())
    assert(err != null)
    org.apache.commons.io.FileUtils.deleteQuietly(new File(t).getParentFile)
  }
}
