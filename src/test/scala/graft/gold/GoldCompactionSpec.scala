package graft.gold

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.lake.{FileOps, LakeLayout}
import graft.model.FactSale

/** Concurrent per-date compaction: dates are disjoint output directories,
  * so `Conf.concurrency` jobs pipeline through the scheduler instead of
  * running strictly sequentially (the reference's loop) — at 100 TB the
  * small/straggler partitions overlap instead of serializing. */
class GoldCompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def sale(txn: String, date: String, qty: Long, price: Double,
      ingestTs: String): FactSale =
    FactSale(txn, s"S1", Timestamp.valueOf(s"$date 12:00:00"), "I1",
      Some("cat"), Some(qty), Some(price), Some(qty * price), Some("Card"),
      Some("CUST0001"), "deadbeef", s"sales_$date.csv",
      Timestamp.valueOf(ingestTs), Date.valueOf(date))

  test("four dates compact concurrently: all written, metrics exact, order kept") {
    val root = java.nio.file.Files.createTempDirectory("graft_goldconc_").toString
    val layout = LakeLayout(root)
    val fileOps = new FileOps(spark.sparkContext.hadoopConfiguration)
    val dates = Seq("2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04")
    try {
      dates.zipWithIndex.foreach { case (d, i) =>
        val rows = (1 to 50 + i).map(j => sale(s"T$d-$j", d, j.toLong, 2.0,
          s"$d 01:00:00")) ++
          // one duplicate transaction_id per date with a later ingest_ts —
          // latest-wins dedup must keep exactly one survivor
          Seq(sale(s"T$d-1", d, 1L, 2.0, s"$d 02:00:00"))
        rows.toDS().toDF().drop("date")
          .write.mode("overwrite").parquet(layout.processedDate(d))
      }
      val summary = GoldCompaction.run(spark, GoldCompaction.Conf(layout,
        maxPartitions = 100, concurrency = 4, refreshTable = None))
      // results return in input (ascending-date) order despite concurrency
      assert(summary.results.map(_.target_date) == dates)
      summary.results.zipWithIndex.foreach { case (m, i) =>
        assert(m.status == "written", s"${m.target_date}: ${m.error}")
        assert(m.total_rows_in_source_partition == 51L + i)
        assert(m.rows_after_dedup == 50L + i)
        assert(m.duplicate_rows_removed == 1L)
        assert(fileOps.exists(layout.auditMetrics(m.target_date)))
      }
      // every gold partition is independently readable with the survivors
      dates.zipWithIndex.foreach { case (d, i) =>
        val gold = spark.read.parquet(layout.goldDate(d))
        assert(gold.count() == 50L + i)
        // the dup key's survivor carries the LATER ingest_ts
        val surv = gold.filter(col("transaction_id") === s"T$d-1")
          .select(col("ingest_ts")).collect()
        assert(surv.length == 1 &&
          surv(0).getTimestamp(0) == Timestamp.valueOf(s"$d 02:00:00"))
      }
      assert(fileOps.exists(layout.auditSummary))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
