package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[MaterializedViews]] behaviors the q285 gate can't fully see:
  * definition validation refusals, WHERE-scoped views, group birth and
  * death across multiple refresh rounds, and frontier idempotency. */
class MaterializedViewSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_mv_$tag").toString

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  test("unsupported view shapes refuse with the cure") {
    def bad(sql: String): Unit =
      intercept[IllegalArgumentException](
        MaterializedViews.parseViewSql(sql))
    bad("SELECT a, COUNT(*) AS n FROM t1 JOIN t2 ON x GROUP BY a")
    bad("SELECT a, SUM(b) AS s FROM cat.t GROUP BY a") // no COUNT(*)
    bad("SELECT upper(a) AS u, COUNT(*) AS n FROM cat.t GROUP BY upper(a)")
    bad("SELECT a, b, COUNT(*) AS n FROM cat.t GROUP BY a") // stray col
    bad("SELECT a, COUNT(*) AS n, MAX(b) AS m FROM cat.t GROUP BY a")
    // float SUM refuses at CREATE (maintenance would drift)
    val root = fresh("float")
    val src = s"$root/src"
    Snapshots.append(spark, src, orders.limit(10))
    intercept[IllegalArgumentException](MaterializedViews.create(
      spark, s"$root/mv", src,
      "SELECT o_orderpriority, COUNT(*) AS n, SUM(o_totalprice) AS s " +
        "FROM c.src GROUP BY o_orderpriority"))
  }

  test("WHERE-scoped view maintains exactly across mixed DML rounds") {
    val root = fresh("rounds")
    val src = s"$root/src"
    val mv = s"$root/mv"
    val even = col("o_orderkey") % 2 === 0
    Snapshots.append(spark, src, orders.filter(even))
    MaterializedViews.create(spark, mv, src,
      "SELECT o_orderpriority, COUNT(*) AS n, " +
        "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents " +
        "FROM c.src WHERE o_totalprice >= 1000 GROUP BY o_orderpriority")
    def recompute() = Snapshots.readLatest(spark, src).get
      .filter(col("o_totalprice") >= 1000)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    def assertInSync(): Unit = {
      val got = Snapshots.readLatest(spark, mv).get
        .select("o_orderpriority", "n", "cents")
      assert(got.exceptAll(recompute()).isEmpty &&
        recompute().exceptAll(got).isEmpty)
    }
    assertInSync()
    // round 1: append (group growth) + a group-moving update
    Snapshots.append(spark, src, orders.filter(!even))
    Snapshots.updateWhere(spark, src, col("o_totalprice") < 30000,
      Map("o_orderpriority" -> lit("X-NEW")))
    MaterializedViews.refresh(spark, mv)
    assertInSync()
    assert(Snapshots.readLatest(spark, mv).get
      .filter(col("o_orderpriority") === "X-NEW").count() == 1,
      "moved group must be born in the view")
    // round 2: kill the new group entirely — net-zero rows drop out
    Snapshots.deleteWhere(spark, src, col("o_orderpriority") === "X-NEW")
    MaterializedViews.refresh(spark, mv)
    assertInSync()
    assert(Snapshots.readLatest(spark, mv).get
      .filter(col("o_orderpriority") === "X-NEW").count() == 0,
      "dead group must leave the view")
    // no-op refresh publishes nothing
    val v = Snapshots.latestVersion(spark, mv).get
    MaterializedViews.refresh(spark, mv)
    assert(Snapshots.latestVersion(spark, mv).contains(v))
  }
}
