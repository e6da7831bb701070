package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gold.GoldCompaction
import graft.ingest.BronzeToSilver
import graft.lake.{FileOps, LakeLayout}

/** The full ingest pipeline (preflight → bronze→silver → gold compaction)
  * exposed through the driver contract: each query rebuilds a scratch lake
  * from the reference's five adversarial sample CSVs and returns
  * deterministic counts. Oracles are constant tables — the counts are the
  * frozen goldens (IngestE2ESpec), independently validated line-by-line.
  */
object PipelineQueries {

  private val sampleDir = "/root/reference/sample_csv_files"
  private val sampleFiles = Seq(
    "sales_2024-10-16.csv", "sales_2024-12-07.csv", "sales_2025-06-12.csv",
    "sales_2025-09-03.csv", "sales_2025-10-18.csv")

  /** Ingest the five sample files into a fresh scratch lake. */
  private def buildLake(spark: SparkSession, tag: String): (LakeLayout, Map[String, BronzeToSilver.Result]) = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_lake_$tag"
    val fileOps = new FileOps(spark.sparkContext.hadoopConfiguration)
    fileOps.delete(root)
    val layout = LakeLayout(root)
    Files.createDirectories(Paths.get(layout.raw))
    val results = sampleFiles.map { f =>
      Files.copy(Paths.get(s"$sampleDir/$f"), Paths.get(s"${layout.raw}/$f"),
        StandardCopyOption.REPLACE_EXISTING)
      BronzeToSilver.ingestFile(spark, s"${layout.raw}/$f", layout) match {
        case Right(r) => f -> r
        case Left(err) => throw new IllegalStateException(s"$f ${err.kind}-rejected: ${err.detail}")
      }
    }.toMap
    (layout, results)
  }

  /** E2E ingest routing counts per (file, class). */
  def ingestCounts(spark: SparkSession, dir: String): DataFrame = {
    val (_, results) = buildLake(spark, "p91")
    import spark.implicits._
    results.toSeq.flatMap { case (f, r) =>
      (("GOOD", r.goodRows) +: r.rejectsByReason.toSeq)
        .map { case (reason, n) => (f, reason, n) }
    }.toDF("source_file", "row_class", "n")
  }

  /** Gold-compaction audit counts per date partition. */
  def goldAudit(spark: SparkSession, dir: String): DataFrame = {
    val (layout, _) = buildLake(spark, "p92")
    val summary = GoldCompaction.run(spark,
      GoldCompaction.Conf(layout, maxPartitions = 100))
    import spark.implicits._
    summary.results
      .map(m => (m.target_date, m.total_rows_in_source_partition,
        m.rows_after_dedup, m.duplicate_rows_removed, m.dq_balance_issues))
      .toDF("date", "total_rows", "rows_after_dedup", "duplicates_removed",
        "dq_balance_issues")
  }

  /** Frozen per-date gold-audit goldens (also pinned by IngestE2ESpec):
    * total_rows per date equals the GOOD ingest count of that file's date
    * partition, and 2024-12-07 carries the corpus's 2 duplicate
    * transaction_ids. */
  private val goldAuditGoldens: Seq[(String, Long, Long, Long, Long)] = Seq(
    ("2024-10-16", 828L, 828L, 0L, 0L),
    ("2024-12-07", 1032L, 1030L, 2L, 0L),
    ("2025-06-12", 1119L, 1119L, 0L, 0L),
    ("2025-09-03", 964L, 964L, 0L, 0L),
    ("2025-10-18", 1110L, 1110L, 0L, 0L))

  private val goldAuditOracle = {
    val values = goldAuditGoldens.map { case (d, t, a, r, b) =>
      s"('$d',CAST($t AS BIGINT),CAST($a AS BIGINT),CAST($r AS BIGINT),CAST($b AS BIGINT))"
    }.mkString(",\n        ")
    s"""SELECT * FROM (VALUES
        $values) AS t(date, total_rows, rows_after_dedup,
          duplicates_removed, dq_balance_issues)"""
  }

  private val ingestCountsOracle = {
    // frozen goldens: (file, class, n) — see IngestE2ESpec
    val rows = Seq(
      ("sales_2024-10-16.csv", "GOOD", 828), ("sales_2024-10-16.csv", "INVALID_TIMESTAMP_FORMAT", 406), ("sales_2024-10-16.csv", "BUSINESS_LOGIC_FAIL", 7),
      ("sales_2024-12-07.csv", "GOOD", 1032), ("sales_2024-12-07.csv", "MISSING_REQUIRED_COLUMN", 24), ("sales_2024-12-07.csv", "INVALID_TIMESTAMP_FORMAT", 437), ("sales_2024-12-07.csv", "BUSINESS_LOGIC_FAIL", 7),
      ("sales_2025-06-12.csv", "GOOD", 1119), ("sales_2025-06-12.csv", "MISSING_REQUIRED_COLUMN", 33), ("sales_2025-06-12.csv", "INVALID_TIMESTAMP_FORMAT", 484), ("sales_2025-06-12.csv", "BUSINESS_LOGIC_FAIL", 10),
      ("sales_2025-09-03.csv", "GOOD", 964), ("sales_2025-09-03.csv", "MISSING_REQUIRED_COLUMN", 21), ("sales_2025-09-03.csv", "INVALID_TIMESTAMP_FORMAT", 462), ("sales_2025-09-03.csv", "BUSINESS_LOGIC_FAIL", 12),
      ("sales_2025-10-18.csv", "GOOD", 1110), ("sales_2025-10-18.csv", "MISSING_REQUIRED_COLUMN", 38), ("sales_2025-10-18.csv", "INVALID_TIMESTAMP_FORMAT", 539), ("sales_2025-10-18.csv", "BUSINESS_LOGIC_FAIL", 12))
    val values = rows.map { case (f, c, n) => s"('$f','$c',CAST($n AS BIGINT))" }
      .mkString(",\n        ")
    s"""SELECT * FROM (VALUES
        $values) AS t(source_file, row_class, n)"""
  }

  /** q87 — the zones composed as ONE continuous pipeline under the gate:
    * files arrive in three waves; each wave is discovered by the
    * [[graft.streaming.StreamingIngest]] watcher (not called file-by-file
    * like p91 — pickup moves files out of raw/, so re-processing is
    * structurally impossible), flows through preflight → bronze→silver,
    * and is gold-compacted INCREMENTALLY (selection = processed − gold,
    * so each wave compacts exactly its own new dates — a re-compacted
    * date would duplicate its audit row and fail the hash gate). The
    * per-date audit constants are the same frozen p92 goldens; `wave`
    * pins which arrival batch compacted each date. */
  def continuousPipeline(spark: SparkSession, dir: String): DataFrame = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_lake_q87"
    val fileOps = new FileOps(spark.sparkContext.hadoopConfiguration)
    fileOps.delete(root)
    val layout = LakeLayout(root)
    Files.createDirectories(Paths.get(layout.raw))
    val waves = Seq(sampleFiles.take(2), sampleFiles.slice(2, 4), sampleFiles.drop(4))
    import spark.implicits._
    waves.zipWithIndex.flatMap { case (files, i) =>
      files.foreach { f =>
        Files.copy(Paths.get(s"$sampleDir/$f"), Paths.get(s"${layout.raw}/$f"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      val tick = graft.streaming.StreamingIngest.pollOnce(spark, layout)
      if (tick.rejected.nonEmpty || tick.ingested.size != files.size)
        throw new IllegalStateException(
          s"wave ${i + 1}: ingested ${tick.ingested.size}/${files.size}, " +
            s"rejected ${tick.rejected.map(_._1)}")
      val summary = GoldCompaction.run(spark,
        GoldCompaction.Conf(layout, maxPartitions = 100))
      summary.results.map(m => (i + 1L, m.target_date,
        m.total_rows_in_source_partition, m.rows_after_dedup,
        m.duplicate_rows_removed, m.dq_balance_issues))
    }.toDF("wave", "date", "total_rows", "rows_after_dedup",
      "duplicates_removed", "dq_balance_issues")
  }

  private val continuousPipelineOracle = {
    val waveOf = Map("2024-10-16" -> 1, "2024-12-07" -> 1,
      "2025-06-12" -> 2, "2025-09-03" -> 2, "2025-10-18" -> 3)
    val values = goldAuditGoldens.map { case (d, t, a, r, b) =>
      s"(CAST(${waveOf(d)} AS BIGINT),'$d',CAST($t AS BIGINT)," +
        s"CAST($a AS BIGINT),CAST($r AS BIGINT),CAST($b AS BIGINT))"
    }.mkString(",\n        ")
    s"""SELECT * FROM (VALUES
        $values) AS t(wave, date, total_rows, rows_after_dedup,
          duplicates_removed, dq_balance_issues)"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("p91_ingest_sample_counts", ingestCounts, Some(ingestCountsOracle)),
    QueryDef("p92_gold_compaction_audit", goldAudit, Some(goldAuditOracle)),
    QueryDef("q87_continuous_pipeline", continuousPipeline,
      Some(continuousPipelineOracle)))
}
