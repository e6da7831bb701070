package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.lake.{SnapshotCatalog, Snapshots}

/** SQL DELETE routing (r17): `k = lit` / `k IN (…)` commits as a
  * ZERO-SCAN equality delete — the GDPR/CDC hot statement no longer
  * pays deleteWhere's locate-scan — while NULL literals, coerced
  * columns, and range predicates keep the positional path, and a table
  * can opt out wholesale via TBLPROPERTIES. */
class DeleteRoutingSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  private def freshCatalog(tag: String): (String, String) = {
    val root = Files.createTempDirectory(s"graft_delroute_$tag").toString
    val cat = s"delroute_${tag}_${System.nanoTime().toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def snap(t: String) =
    Snapshots.snapshot(spark, t, Snapshots.latestVersion(spark, t).get).get

  test("key-equality DELETE is zero-scan: files untouched, live view exact") {
    val (cat, root) = freshCatalog("eq")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders)
    val s0 = snap(t)
    val all = orders.select("o_orderkey").as[Long](spark.implicits
      .newLongEncoder).collect().sorted
    val inKeys = Seq(all(1), all(5), all(9))
    spark.sql(
      s"DELETE FROM $cat.t WHERE o_orderkey IN (${inKeys.mkString(", ")})")
    val s1 = snap(t)
    // ZERO-SCAN pin: no data file or manifest was written or dropped
    assert(s1.files == s0.files && s1.manifests == s0.manifests,
      "key-equality DELETE touched the data file list")
    val d1 = s1.deletes.diff(s0.deletes)
    assert(d1.size == 1 && Snapshots.isEqDelete(d1.head),
      s"expected one equality delete, got $d1")
    // live view identical to what the locate-scan path would produce
    val live1 = Snapshots.readLatest(spark, t).get
    assert(live1.count() == all.length - inKeys.size)
    assert(live1.filter(col("o_orderkey").isin(inKeys: _*)).isEmpty)
    // `= lit` (with the analyzer's literal cast) routes too
    spark.sql(s"DELETE FROM $cat.t WHERE o_orderkey = ${all(12)}")
    val s2 = snap(t)
    val d2 = s2.deletes.diff(s1.deletes)
    assert(d2.size == 1 && Snapshots.isEqDelete(d2.head))
    assert(s2.files == s0.files)
    val live2 = Snapshots.readLatest(spark, t).get
    assert(live2.count() == all.length - inKeys.size - 1)
    // a row RE-APPENDED after the delete survives (sequence semantics)
    Snapshots.append(spark, t,
      orders.filter(col("o_orderkey") === all(12)))
    assert(Snapshots.readLatest(spark, t).get
      .filter(col("o_orderkey") === all(12)).count() == 1)
  }

  test("NULL literals and non-key shapes keep the locate-scan path") {
    val (cat, root) = freshCatalog("null")
    val t = s"$root/t"
    import spark.implicits._
    Snapshots.append(spark, t, Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "n1"), (null, "n2"), (5L, "e"))
      .toDF("k", "v"))
    // SQL `IN (5, NULL)` never matches the NULL rows — the null-safe
    // equality-delete join WOULD, so this must NOT route
    spark.sql(s"DELETE FROM $cat.t WHERE k IN (5, NULL)")
    val live = Snapshots.readLatest(spark, t).get
    assert(live.filter(col("k").isNull).count() == 2,
      "NULL-keyed rows were deleted — a mis-routed null-safe join")
    assert(live.count() == 4)
    assert(snap(t).deletes.forall(!Snapshots.isEqDelete(_)))
    // a range predicate stays positional
    spark.sql(s"DELETE FROM $cat.t WHERE k > 1")
    assert(snap(t).deletes.forall(!Snapshots.isEqDelete(_)))
    assert(Snapshots.readLatest(spark, t).get
      .select("v").as[String].collect().toSet == Set("a", "n1", "n2"))
  }

  test("TBLPROPERTIES delete.eq-routing=off keeps positional tombstones") {
    val (cat, root) = freshCatalog("off")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders.limit(30))
    Snapshots.setTableProperties(spark, t,
      Map("delete.eq-routing" -> "off"))
    val k = orders.limit(1).select("o_orderkey").collect()(0).getLong(0)
    spark.sql(s"DELETE FROM $cat.t WHERE o_orderkey = $k")
    assert(snap(t).deletes.nonEmpty &&
      snap(t).deletes.forall(!Snapshots.isEqDelete(_)),
      "opted-out table still committed an equality delete")
    assert(Snapshots.readLatest(spark, t).get
      .filter(col("o_orderkey") === k).isEmpty)
  }
}
