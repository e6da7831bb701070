package graft.lake

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SnapshotCatalog]] contracts the q179 gate can't see: V2 pushdown
  * through the catalog scan, merge-on-read/rename refusal (never wrong
  * rows), read-only DDL, and version routing. */
class SnapshotCatalogSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  private def freshCatalog(tag: String): (String, String) = {
    val root = Files.createTempDirectory(s"graft_snapcat_$tag").toString
    val cat = s"sc_${tag}_${System.nanoTime().toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("VERSION AS OF routes to the pinned version; bare name is latest") {
    val (cat, root) = freshCatalog("vers")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 0))
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 1))
    val n1 = orders.filter(col("o_orderkey") % 3 === 0).count()
    val n12 = orders.filter(col("o_orderkey") % 3 <= 1).count()
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1").count() == n1)
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2").count() == n12)
    assert(spark.sql(s"SELECT * FROM $cat.t").count() == n12)
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }

  test("TIMESTAMP AS OF resolves through recorded commit timestamps") {
    val (cat, root) = freshCatalog("ts")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 0))
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 3 === 1))
    val n1 = orders.filter(col("o_orderkey") % 3 === 0).count()
    val n12 = orders.filter(col("o_orderkey") % 3 <= 1).count()
    val ts1 = Snapshots.snapshot(spark, t, 1).get.commitTs
    val ts2 = Snapshots.snapshot(spark, t, 2).get.commitTs
    assert(ts2 > ts1, "commit timestamps must be strictly increasing")
    def lit(ms: Long): String = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ms))
    assert(spark.sql(
      s"SELECT * FROM $cat.t TIMESTAMP AS OF '${lit(ts1)}'").count() == n1)
    assert(spark.sql(
      s"SELECT * FROM $cat.t TIMESTAMP AS OF '${lit(ts2)}'").count() == n12)
    // before the first commit: no resolvable version
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat.t TIMESTAMP AS OF '${lit(ts1 - 1)}'").count())
    assert(e != null)
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }

  test("catalog scans push filters and prune columns like a native V2 table") {
    val (cat, root) = freshCatalog("push")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders)
    val df = spark.sql(
      s"SELECT o_orderkey FROM $cat.t WHERE o_orderkey = 5")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,5)]")
      || plan.contains("EqualTo(o_orderkey,5)"), plan.take(2000))
    // column pruning: the scan reads only the selected column
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint>"),
      plan.take(2000))
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }

  test("merge-on-read and renamed snapshots refuse SQL reads loudly") {
    val (cat, root) = freshCatalog("mor")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders.limit(200))
    Snapshots.deleteWhere(spark, t, col("o_totalprice") < 50000)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.t").collect())
    assert(e.getMessage.contains("positional deletes") ||
      Option(e.getCause).exists(_.getMessage.contains("positional deletes")),
      e.getMessage)
    // a rename-carrying snapshot refuses too (era-time names)
    val t2 = s"$root/t2"
    Snapshots.append(spark, t2, orders.limit(100))
    Snapshots.renameColumn(spark, t2, "o_orderpriority", "o_prio")
    val e2 = intercept[Exception](spark.sql(s"SELECT * FROM $cat.t2").collect())
    assert(e2.getMessage.contains("renames") ||
      Option(e2.getCause).exists(_.getMessage.contains("renames")),
      e2.getMessage)
    // but an OPTIMIZEd (rewritten) MoR table serves fine again
    Snapshots.optimize(spark, t)
    val live = spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
    assert(live == Snapshots.readLatest(spark, t).get.count())
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }

  test("a zero-file version fails at resolution with the real reason") {
    val (cat, root) = freshCatalog("zero")
    val t = s"$root/t"
    // DML on a never-committed table publishes a version with no files;
    // the log has no schema to serve, so the catalog must say so rather
    // than throw parquet's misleading inference error at scan time
    Snapshots.deleteWhere(spark, t, col("k") === 1)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.t").collect())
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("no data files"), msg)
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }

  test("the catalog is read-only: DDL fails, commits go through Snapshots") {
    val (cat, root) = freshCatalog("ro")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders.limit(50))
    val e = intercept[Exception](
      spark.sql(s"DROP TABLE $cat.t"))
    assert(e.getMessage.contains("read-only") ||
      Option(e.getCause).exists(_.getMessage.contains("read-only")),
      e.getMessage)
    // still readable after the refused DDL
    assert(spark.sql(s"SELECT * FROM $cat.t").count() == 50)
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }
}
