package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The CBO loop closed over the log (r18): a table's declared sketch
  * columns surface as `CatalogColumnStat` (distinct count + null
  * count) on the snapshot read's data leaf, so with
  * `spark.sql.cbo.enabled` Catalyst's join-cardinality estimation
  * (`rows_L · rows_R ∕ max(ndv_L, ndv_R)`) runs off LOG metadata.
  * The pinned consequence: a fact⋈dim join whose TRUE output is small
  * broadcasts into a big downstream table when the log serves the
  * stats, and sort-merges when it cannot — same data, same query,
  * the log answer is the only variable. */
class LogCboSpec extends SparkTestBase {

  private def mk(tag: String, declare: Boolean): String = {
    val t = s"${Files.createTempDirectory(s"graft_cbo_$tag").toString}/t"
    Snapshots.createTable(spark, t,
      Seq(("k", "BIGINT", None), (s"pad_$tag", "STRING", None)),
      properties =
        if (declare) Map(Snapshots.SketchColumnsKey -> "k")
        else Map.empty)
    Snapshots.append(spark, t, spark.range(0, 40000).select(
      col("id").as("k"),
      sha2(concat(col("id").cast("string"), lit(tag)), 256)
        .as(s"pad_$tag")))
    t
  }

  test("log column stats drive CBO join sizing: broadcast flips") {
    val bigDir =
      s"${Files.createTempDirectory("graft_cbo_big").toString}/b"
    spark.range(0, 200000).select((col("id") % 40000).as("k"),
      sha2(concat(col("id").cast("string"), lit("big")), 256).as("p1"),
      sha2(concat(col("id").cast("string"), lit("big2")), 256).as("p2"),
      sha2(concat(col("id").cast("string"), lit("big3")), 256).as("p3"))
      .write.parquet(bigDir)

    def planFor(f: String, d: String): String = {
      val fact = Snapshots.readLatest(spark, f).get
      val dim = Snapshots.readLatest(spark, d).get
      val big = spark.read.parquet(bigDir)
      fact.join(dim, "k").join(big, "k")
        .queryExecution.sparkPlan.toString
    }

    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (6L * 1024 * 1024).toString)
      // WITH declared sketches: the estimator sees ndv(k) ≈ 40k on
      // both sides → fact⋈dim ≈ 40k rows, a few MB → broadcast into
      // the big table; no sort-merge anywhere
      val withStats = planFor(mk("fs", declare = true),
        mk("ds", declare = true))
      assert(withStats.contains("BroadcastHashJoin"),
        withStats.take(3000))
      assert(!withStats.contains("SortMergeJoin"), withStats.take(3000))
      // WITHOUT them: no rowCount/ndv on the leaves, the join falls
      // back to the size-only product estimate → the joined side looks
      // enormous → the downstream join sort-merges
      val without = planFor(mk("fn", declare = false),
        mk("dn", declare = false))
      assert(without.contains("SortMergeJoin"), without.take(3000))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
    }
  }
}
