package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** r18 optimization pins: the log-served scan fast path (zero listing /
  * zero schema inference — manifest sizes + dir schemas feed the scan
  * directly) must (1) actually engage on a uniform-schema table,
  * (2) serve byte-identical rows to the path-based read, (3) decline on
  * schema-divergent eras so additive evolution keeps mergeSchema
  * semantics, and (4) the KMV sketch single-pass rewrite must emit the
  * same bottom-k sets and null counts the per-column passes did. */
class LogServedScanSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  test("log-served scan engages on a uniform table and matches the data") {
    val t = freshDir("logscan") + "/t"
    val df = (1L to 500L).map(i => (i, s"name$i", i % 7))
      .toDF("id", "name", "grp")
    Snapshots.append(spark, t, df.filter($"id" % 2 === 0))
    Snapshots.append(spark, t, df.filter($"id" % 2 === 1))
    val before = Snapshots.logServedScans.get()
    val served = Snapshots.readLatest(spark, t).get
    assert(Snapshots.logServedScans.get() == before + 1,
      "uniform-schema read must take the log-served fast path")
    // plan leaf must be a FileSourceScan (full pushdown machinery), and
    // its location must NOT be an InMemoryFileIndex (no listing ran)
    val leaves = served.queryExecution.executedPlan.collectLeaves()
    val scan = leaves.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty, s"expected FileSourceScanExec leaf, got $leaves")
    assert(!scan.get.relation.location
      .isInstanceOf[org.apache.spark.sql.execution.datasources.InMemoryFileIndex],
      "log-served scan must not build an InMemoryFileIndex")
    // identical rows to the raw path-based read of the same files
    val files = Snapshots.snapshot(spark, t,
      Snapshots.latestVersion(spark, t).get).get.files
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$t/$f"): _*)
    assert(served.exceptAll(raw).isEmpty && raw.exceptAll(served).isEmpty)
    // pushdown still reaches the scan through the fast path
    val filtered = Snapshots.readLatest(spark, t).get.filter($"id" === 42L)
    val fscan = filtered.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    assert(fscan.metadata("PushedFilters").contains("IsNotNull(id)"),
      s"pushed filters lost: ${fscan.metadata("PushedFilters")}")
    assert(filtered.count() == 1L)
  }

  test("schema-divergent eras decline the fast path and keep merging") {
    val t = freshDir("logscan_evo") + "/t"
    Snapshots.append(spark, t, Seq((1L, "a")).toDF("id", "name"))
    Snapshots.append(spark, t,
      Seq((2L, "b", 9L)).toDF("id", "name", "extra"))
    val before = Snapshots.logServedScans.get()
    val served = Snapshots.readLatest(spark, t).get
    assert(served.count() == 2L)
    assert(Snapshots.logServedScans.get() == before,
      "divergent-era read must fall back to the mergeSchema path")
    assert(served.filter($"extra".isNull).count() == 1L)
  }

  test("single-pass KMV sketches equal the independent per-column answer") {
    val t = freshDir("kmv") + "/t"
    val df = Seq[(java.lang.Long, String)](
      (1L, "x"), (2L, "y"), (3L, null), (null, "x"), (2L, "z"))
      .toDF("k", "s")
    Snapshots.createTable(spark, t,
      Seq(("k", "BIGINT", None), ("s", "STRING", None)),
      properties = Map(Snapshots.SketchColumnsKey -> "k,s"))
    Snapshots.append(spark, t, df)
    val v = Snapshots.latestVersion(spark, t).get
    // ndvAt must serve exact counts below k=64 (sketch is exact there):
    // distinct non-null k = {1,2,3} → 3; distinct s = {x,y,z} → 3
    assert(Snapshots.ndvAt(spark, t, v, "k").contains(3L))
    assert(Snapshots.ndvAt(spark, t, v, "s").contains(3L))
  }

  test("BottomKDistinct is the sorted distinct bottom-k, nulls skipped") {
    val df = Seq[java.lang.Long](9L, 1L, 5L, 1L, null, 3L, 5L, 2L)
      .toDF("v").withColumn("g", lit(1))
    val got = df.groupBy("g")
      .agg(graft.functions.BottomKDistinct.column(col("v"), 3).as("bk"))
      .head().getSeq[Long](1)
    assert(got == Seq(1L, 2L, 3L), s"got $got")
  }
}
