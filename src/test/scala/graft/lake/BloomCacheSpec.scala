package graft.lake

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The deserialized-bloom cache (VERDICT r14 note 1): repeated point
  * lookups — DataFrame API and catalog SQL alike — deserialize each
  * (file, column) filter exactly ONCE per JVM, instead of copying the
  * ~15 KB bit array per (file, key) per query. */
class BloomCacheSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("one deserialization per (file, column), however many lookups") {
    val root = Files.createTempDirectory("graft_bloomcache").toString
    val t = s"$root/t"
    val orders = graft.queries.Tables(spark, sfDir, "orders")
    val res = pmod(col("o_custkey"), lit(3))
    for (r <- 0 to 2)
      Snapshots.append(spark, t, orders.filter(res === r),
        bloomCols = Seq("o_custkey"))
    val v = Snapshots.latestVersion(spark, t).get
    val s = Snapshots.snapshot(spark, t, v).get
    val entries = s.blooms.valuesIterator.map(_.size).sum
    assert(entries > 0)
    val keys = orders.select(col("o_custkey")).distinct()
      .limit(8).collect().map(_.getLong(0)).toSeq
    val d0 = Snapshots.bloomDeserializations.get()
    Snapshots.prunedFilesForKey(spark, t, v, "o_custkey", keys.head)
    val d1 = Snapshots.bloomDeserializations.get()
    // first lookup pays one readFrom per bloom-carrying (file, column)
    assert(d1 - d0 == entries)
    // every further lookup — different keys, DataFrame or SQL path —
    // reuses the shared bit arrays: ZERO new deserializations
    keys.tail.foreach(k =>
      Snapshots.prunedFilesForKey(spark, t, v, "o_custkey", k))
    val cat = s"blc_${Integer.toHexString(root.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    keys.foreach(k => spark.sql(
      s"SELECT count(*) AS n FROM $cat.t WHERE o_custkey = $k").collect())
    assert(Snapshots.bloomDeserializations.get() == d1)
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))
  }
}
