package graft.lake

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Struct-leaf lake contracts the q272 gate can't see: leaf stats keys
  * FOLLOW a rename of their root struct column, leaf-path DDL refuses
  * loudly, and a struct schema evolved ACROSS eras refuses at read
  * rather than serving a silently wrong union. */
class StructLeafSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def structEvents = {
    val ev = graft.queries.Tables.events(spark, sfDir)
    ev.select(col("event_id"),
      struct((col("user_id") % 40).as("uid"),
        col("event_type").as("seg")).as("meta"))
  }

  test("leaf stats prune via dot paths and follow a root-struct rename") {
    val root = Files.createTempDirectory("graft_structleaf").toString
    val t = s"$root/t"
    for (q <- 0 to 3)
      Snapshots.append(spark, t,
        structEvents.filter(col("meta.uid").between(10 * q, 10 * q + 9)),
        statsCols = Seq("meta.uid", "meta.seg"))
    val v = Snapshots.latestVersion(spark, t).get
    val all = Snapshots.snapshot(spark, t, v).get.files
    val kept = Snapshots.prunedFilesAt(spark, t, v, "meta.uid", 10, 19).get
    assert(kept.size < all.size && kept.nonEmpty)
    // null-count pseudo keys ride the same dot-path grammar
    assert(Snapshots.snapshot(spark, t, v).get.stats.values
      .exists(_.contains("nulls(meta.uid)")))
    // rename the ROOT struct: leaf keys must resurface under the new
    // root (renamedStatsKey maps the first path segment through the
    // chain) — pruning under the CURRENT name keeps working
    Snapshots.renameColumn(spark, t, "meta", "info")
    val v2 = Snapshots.latestVersion(spark, t).get
    val kept2 = Snapshots.prunedFilesAt(spark, t, v2, "info.uid", 10, 19).get
    assert(kept2.toSet == kept.toSet)
    // and the renamed read serves the leaf under the new name
    assert(Snapshots.readLatest(spark, t).get
      .filter(col("info.uid") === 5).count() ==
      structEvents.filter(col("meta.uid") === 5).count())
    // DECLARED leaf stats (table property) follow the root rename too,
    // or collection silently stops after the DDL
    Snapshots.setTableProperties(spark, t,
      Map(Snapshots.StatsColumnsKey -> "info.uid,info.seg"))
    Snapshots.renameColumn(spark, t, "info", "meta2")
    assert(Snapshots.tableProperties(spark, t)(Snapshots.StatsColumnsKey)
      == "meta2.uid,meta2.seg")
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }

  test("leaf-path DDL refuses loudly with the cure") {
    val root = Files.createTempDirectory("graft_structleaf2").toString
    val t = s"$root/t"
    Snapshots.append(spark, t, structEvents)
    val e1 = intercept[IllegalArgumentException](
      Snapshots.renameColumn(spark, t, "meta.uid", "meta.user"))
    assert(e1.getMessage.contains("rename the whole struct column"))
    val e2 = intercept[IllegalArgumentException](
      Snapshots.dropColumn(spark, t, "meta.seg"))
    assert(e2.getMessage.contains("drop the whole struct column"))
    val e3 = intercept[IllegalArgumentException](
      Snapshots.setColumnDefault(spark, t, "meta.seg", "'x'"))
    assert(e3.getMessage.contains("default the whole struct column"))
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }

  test("additive struct leaf merges by name; era path refuses loudly") {
    val root = Files.createTempDirectory("graft_structleaf3").toString
    val t = s"$root/t"
    Snapshots.append(spark, t, structEvents)
    // second era ADDS a leaf: the plain read path merges struct fields
    // BY NAME (parquet mergeSchema semantics) — old-era rows serve null
    // for the new leaf, new-era rows their value
    Snapshots.append(spark, t,
      structEvents.withColumn("meta",
        struct(col("meta.uid"), col("meta.seg"), lit(1L).as("extra"))))
    val merged = Snapshots.readLatest(spark, t).get
    val n = structEvents.count()
    assert(merged.filter(col("meta.extra").isNull).count() == n)
    assert(merged.filter(col("meta.extra") === 1L).count() == n)
    // but the ERA-MAPPED path (forced by any rename) cannot union
    // divergent struct shapes under its positional cast — it must
    // refuse loudly, never silently mis-map leaves
    Snapshots.renameColumn(spark, t, "event_id", "eid")
    val e = intercept[IllegalArgumentException](
      Snapshots.readLatest(spark, t).get.collect())
    assert(e.getMessage.contains("cannot widen"))
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }
}
