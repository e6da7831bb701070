package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Snapshots.addColumn]] lifecycle the q284 gate can't fully see:
  * interaction with rename/drop/restore/clone, default validation, and
  * the declared-vs-materialized type unification. */
class AddColumnSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def fresh(tag: String): String =
    s"${Files.createTempDirectory(s"graft_addcol_$tag").toString}/t"

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  test("declared add fills null, default fills rows, history untouched") {
    val t = fresh("basic")
    Snapshots.append(spark, t, orders.limit(10))
    Snapshots.addColumn(spark, t, "chan", "STRING")
    Snapshots.addColumn(spark, t, "bonus", "BIGINT", Some("5"))
    val live = Snapshots.readLatest(spark, t).get
    assert(live.columns.contains("chan") && live.columns.contains("bonus"))
    assert(live.filter(col("chan").isNotNull).count() == 0)
    assert(live.filter(col("bonus") === 5L).count() == 10)
    // expression default over stored columns fills too
    Snapshots.addColumn(spark, t, "keyish", "BIGINT",
      Some("o_orderkey % 3"))
    val k = Snapshots.readLatest(spark, t).get
    assert(k.filter(col("keyish") === col("o_orderkey") % 3).count() == 10)
    // time travel below the add shows none of them
    val v1 = Snapshots.readAt(spark, t, 1).get
    assert(!v1.columns.contains("chan") && !v1.columns.contains("bonus"))
  }

  test("self-referencing or broken defaults and dup names refuse the DDL") {
    val t = fresh("refuse")
    Snapshots.append(spark, t, orders.limit(5))
    intercept[Exception](
      Snapshots.addColumn(spark, t, "x", "BIGINT", Some("x + 1")))
    intercept[Exception](
      Snapshots.addColumn(spark, t, "y", "BIGINT", Some("no_such_col")))
    intercept[Exception](
      Snapshots.addColumn(spark, t, "o_orderkey", "BIGINT"))
    intercept[Exception](Snapshots.addColumn(spark, t, "a.b", "BIGINT"))
    // none of the refusals burned a version
    assert(Snapshots.latestVersion(spark, t).contains(1))
  }

  test("later append materializes; declared/stored types unify by widening") {
    val t = fresh("mat")
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 2 === 0))
    Snapshots.addColumn(spark, t, "score", "BIGINT")
    // the new era stores INT — widens to the declared BIGINT
    Snapshots.append(spark, t, orders.filter(col("o_orderkey") % 2 === 1)
      .withColumn("score", lit(3).cast("int")))
    val live = Snapshots.readLatest(spark, t).get
    assert(live.schema("score").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(live.filter(col("score") === 3L).count() ==
      orders.filter(col("o_orderkey") % 2 === 1).count())
    assert(live.filter(col("score").isNull).count() ==
      orders.filter(col("o_orderkey") % 2 === 0).count())
  }

  test("rename and drop follow the declared entry; re-add starts clean") {
    val t = fresh("rename")
    Snapshots.append(spark, t, orders.limit(8))
    Snapshots.addColumn(spark, t, "tmp", "BIGINT", Some("1"))
    Snapshots.renameColumn(spark, t, "tmp", "flag")
    val renamed = Snapshots.readLatest(spark, t).get
    assert(renamed.columns.contains("flag") && !renamed.columns.contains("tmp"))
    assert(renamed.filter(col("flag") === 1L).count() == 8)
    Snapshots.dropColumn(spark, t, "flag")
    assert(!Snapshots.readLatest(spark, t).get.columns.contains("flag"))
    // re-added same name starts clean (no default resurrection)
    Snapshots.addColumn(spark, t, "flag", "STRING")
    val readd = Snapshots.readLatest(spark, t).get
    assert(readd.schema("flag").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(readd.filter(col("flag").isNotNull).count() == 0)
  }

  test("restore and clone pin the declared set of their source version") {
    val t = fresh("restore")
    Snapshots.append(spark, t, orders.limit(6))
    val vAdd = Snapshots.addColumn(spark, t, "extra", "BIGINT", Some("9"))
    Snapshots.dropColumn(spark, t, "extra")
    Snapshots.restore(spark, t, vAdd)
    val restored = Snapshots.readLatest(spark, t).get
    assert(restored.filter(col("extra") === 9L).count() == 6,
      "restore must resurrect the declared column + default")
    val dst = fresh("clone")
    Snapshots.shallowClone(spark, t, dst)
    assert(Snapshots.readLatest(spark, dst).get
      .filter(col("extra") === 9L).count() == 6)
  }
}
