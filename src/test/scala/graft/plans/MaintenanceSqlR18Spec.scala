package graft.plans

import java.nio.file.Files

import graft.SparkTestBase
import graft.lake.{SnapshotCatalog, Snapshots}

/** Round-18 SQL statement surface — the edges the q318/q319 gate rows
  * don't reach: RESTORE by wall clock resolving through the monotone
  * in-commit-timestamp index (and its equivalence to the version
  * form), VACUUM retention at an explicit instant, COPY INTO error
  * shape, and DESCRIBE HISTORY falling through for non-snapshot
  * identifiers. */
class MaintenanceSqlR18Spec extends SparkTestBase {

  private def freshCatalog(tag: String): (String, String) = {
    val root = Files.createTempDirectory(s"graft_msql18_$tag").toString
    val cat = s"msql18_${tag}_${System.nanoTime().toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("RESTORE TIMESTAMP AS OF ≡ restore to the resolved version") {
    import spark.implicits._
    val (cat, root) = freshCatalog("rts")
    val t = s"$root/t"
    Snapshots.append(spark, t, Seq(1L, 2L).toDF("k")) // v1
    Snapshots.append(spark, t, Seq(3L).toDF("k")) // v2
    Snapshots.append(spark, t, Seq(4L, 5L).toDF("k")) // v3
    val ts2 = Snapshots.snapshot(spark, t, 2).get.commitTs
    // the instant of v2 (strictly before v3's monotone ts) → v2
    assert(Snapshots.versionAtTimestamp(spark, t, ts2).contains(2))
    val v = spark.sql(
      s"RESTORE TABLE $cat.t TO TIMESTAMP AS OF '$ts2'").head.getLong(0)
    assert(v == 4L)
    // equivalence pin: the timestamp form republishes EXACTLY what the
    // version form at the resolved version would — same file list,
    // same manifests, same content
    val byTs = Snapshots.snapshot(spark, t, 4).get
    val v2snap = Snapshots.snapshot(spark, t, 2).get
    assert(byTs.files == v2snap.files &&
      byTs.manifests == v2snap.manifests)
    assert(Snapshots.readLatest(spark, t).get.count() == 3)
    // ISO-8601 instant form resolves identically
    val iso = java.time.Instant.ofEpochMilli(ts2).toString
    val v5 = spark.sql(
      s"RESTORE TABLE $cat.t TO TIMESTAMP AS OF '$iso'").head.getLong(0)
    assert(Snapshots.snapshot(spark, t, v5.toInt).get.files
      == v2snap.files)
    // an instant before the first commit refuses loudly, no version
    val before = Snapshots.latestVersion(spark, t).get
    intercept[IllegalArgumentException](spark.sql(
      s"RESTORE TABLE $cat.t TO TIMESTAMP AS OF '0'").collect())
    assert(Snapshots.latestVersion(spark, t).contains(before))
  }

  test("VACUUM BEFORE TIMESTAMP AS OF reclaims strictly older versions") {
    import spark.implicits._
    val (cat, root) = freshCatalog("vts")
    val t = s"$root/t"
    Snapshots.append(spark, t, Seq(1L).toDF("k")) // v1
    Snapshots.append(spark, t, Seq(2L).toDF("k")) // v2
    Snapshots.append(spark, t, Seq(3L).toDF("k")) // v3
    val ts3 = Snapshots.snapshot(spark, t, 3).get.commitTs
    val cutoff = spark.sql(
      s"VACUUM $cat.t BEFORE TIMESTAMP AS OF '$ts3'").head.getLong(0)
    assert(cutoff == ts3)
    // v1/v2 (commitTs < cutoff) trimmed; v3 (== cutoff) kept and live
    assert(!new java.io.File(s"$t/_log/v000001.json").exists())
    assert(!new java.io.File(s"$t/_log/v000002.json").exists())
    assert(new java.io.File(s"$t/_log/v000003.json").exists())
    assert(Snapshots.readLatest(spark, t).get.count() == 3)
  }

  test("COPY INTO statement form: races and errors surface loudly") {
    import spark.implicits._
    val (cat, root) = freshCatalog("cpi")
    val src = s"$root/landing"
    Seq(1L, 2L).toDF("k").repartition(1)
      .write.mode("overwrite").parquet(src)
    val r = spark.sql(s"COPY INTO $cat.t FROM '$src'").head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    // replay: zero files, zero versions — answered from the ledger
    val r2 = spark.sql(
      s"COPY INTO $cat.t FROM '$src' FILEFORMAT = PARQUET").head
    assert(r2.getLong(0) == 1L && r2.getLong(1) == 0L)
    // unregistered catalog refuses with the registration hint
    val e = intercept[IllegalArgumentException](
      spark.sql(s"COPY INTO nocat.t FROM '$src'"))
    assert(e.getMessage.contains("not a registered snapshot catalog"))
  }

  test("DESCRIBE HISTORY falls through for non-snapshot identifiers") {
    // not catalog-qualified under a registered snapshot catalog →
    // Spark's own parser keeps its meaning (here: unresolved relation)
    intercept[Exception](
      spark.sql("DESCRIBE HISTORY no_such_table_xyz").collect())
    // and the statement itself serves the log on a real table
    import spark.implicits._
    val (cat, root) = freshCatalog("dh")
    val t = s"$root/t"
    Snapshots.append(spark, t, Seq(1L, 2L).toDF("k"))
    Snapshots.append(spark, t, Seq(3L).toDF("k"))
    val hist = spark.sql(s"DESC HISTORY $cat.t").collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(hist.forall(_.getString(1) == "append"))
    assert(hist.map(_.getLong(8)).toSeq == Seq(2L, 3L))
  }
}
