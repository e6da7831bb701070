package graft.lake

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Log-backed statistics for snapshot reads (VERDICT r17 task 8): a
  * merge-on-read version's LIVE (rows, bytes) served from LOG metadata
  * — manifest row counts and byte sizes minus the positional-delete
  * sidecars' tombstone counts — and attached to the read plan's data
  * leaf, so JOIN SIZING sees log truth where raw file sizes mislead
  * (tombstoned rows still occupy bytes). The headline assertion is the
  * verdict's done-condition: the broadcast-threshold decision FLIPS on
  * the same data depending only on whether the log can answer. */
class LogStatsSpec extends SparkTestBase {

  /** Distinct-hash payload so parquet bytes track row count (a constant
    * pad would dictionary-compress to nothing). */
  private def corpus(n: Int) =
    spark.range(1, n + 1).select(col("id"),
      sha2(concat(col("id").cast("string"), lit("a")), 256).as("p1"),
      sha2(concat(col("id").cast("string"), lit("b")), 256).as("p2"),
      sha2(concat(col("id").cast("string"), lit("c")), 256).as("p3"))

  /** A table with 20k rows, 95% tombstoned merge-on-read → 1k live. */
  private def morTable(): String = {
    val t = s"${Files.createTempDirectory("graft_logstats").toString}/t"
    Snapshots.append(spark, t, corpus(20000))
    Snapshots.deleteWhere(spark, t, col("id") % 20 =!= 0)
    t
  }

  test("liveStatsAt: manifest rows/bytes minus sidecar tombstone counts") {
    val t = morTable()
    val (rows1, bytes1) = Snapshots.liveStatsAt(spark, t, 1).get
    assert(rows1 === 20000L)
    assert(bytes1 > 0L)
    val (rows2, bytes2) = Snapshots.liveStatsAt(spark, t, 2).get
    assert(rows2 === 1000L)
    assert(bytes2 ===
      math.max(math.ceil(bytes1.toDouble * 1000 / 20000).toLong, 1L))
    assert(Snapshots.readLatest(spark, t).get.count() === 1000L)
  }

  test("equality deletes decline: matched count unknown until read") {
    val t = s"${Files.createTempDirectory("graft_logstats_eq").toString}/t"
    Snapshots.append(spark, t, corpus(100))
    import spark.implicits._
    Snapshots.deleteByKeys(spark, t, Seq(1L, 2L).toDF("id"))
    assert(Snapshots.liveStatsAt(spark, t,
      Snapshots.latestVersion(spark, t).get).isEmpty)
  }

  test("MoR read's optimized-plan size is the live bytes, not file bytes") {
    val t = morTable()
    val (_, fileBytes) = Snapshots.liveStatsAt(spark, t, 1).get
    val (_, liveBytes) = Snapshots.liveStatsAt(spark, t, 2).get
    val planSize = Snapshots.readLatest(spark, t).get
      .queryExecution.optimizedPlan.stats.sizeInBytes
    // the anti-join subtree reports ≈ the live fraction (projection
    // width scaling allowed), far under the raw file bytes
    assert(planSize < BigInt(fileBytes) / 4,
      s"plan=$planSize file=$fileBytes live=$liveBytes")
  }

  test("broadcast decision flips with the log answer (the verdict gate)") {
    def joinPlan(t: String, bigDir: String, threshold: Long): String = {
      val big = spark.read.parquet(bigDir)
      val mor = Snapshots.readLatest(spark, t).get
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          threshold.toString)
        big.join(mor, "id").queryExecution.sparkPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }

    val big = s"${Files.createTempDirectory("graft_logstats_big").toString}/b"
    corpus(60000).write.parquet(big)

    // WITH the sidecar: live bytes fit under the threshold → the MoR
    // side broadcasts; no sort-merge join anywhere in the plan
    val t1 = morTable()
    val (_, fileBytes) = Snapshots.liveStatsAt(spark, t1, 1).get
    val (_, liveBytes) = Snapshots.liveStatsAt(spark, t1, 2).get
    val threshold = (liveBytes + fileBytes) / 2
    val withStats = joinPlan(t1, big, threshold)
    assert(withStats.contains("BroadcastHashJoin"), withStats.take(2000))
    assert(!withStats.contains("SortMergeJoin"), withStats.take(2000))

    // WITHOUT it (a pre-sidecar log, simulated by removing the sidecar
    // before any read): stats decline, the leaf reports raw file bytes
    // above the threshold, and the same join falls back to sort-merge —
    // the read itself still works (the sidecar is advisory metadata)
    val t2 = morTable()
    val sidecars = new File(s"$t2/_snap").listFiles
      .filter(d => d.isDirectory && d.getName.startsWith("d-"))
      .map(d => new File(d, "_rows.json"))
    assert(sidecars.nonEmpty && sidecars.forall(_.delete()))
    assert(Snapshots.liveStatsAt(spark, t2, 2).isEmpty)
    val withoutStats = joinPlan(t2, big, threshold)
    assert(withoutStats.contains("SortMergeJoin"), withoutStats.take(2000))
    assert(Snapshots.readLatest(spark, t2).get.count() === 1000L)
  }
}
