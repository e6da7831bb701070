package graft.lake

/** Zone-path convention over any Hadoop-compatible filesystem (local, S3A,
  * HDFS). Mirrors the reference's S3 prefix layout (`docs/s3_layout.md`),
  * with gold partition-dir idempotent overwrite preserved.
  */
final case class LakeLayout(root: String) {
  private def p(parts: String*): String =
    (root.stripSuffix("/") +: parts).mkString("/")

  val raw: String = p("raw")
  val validated: String = p("validated")
  val processed: String = p("processed")
  val goldFactSales: String = p("gold", "fact_sales")
  val rejectedStructural: String = p("rejected", "structural")
  val rejectedSystem: String = p("rejected", "system")
  val rejectedDqJson: String = p("rejected", "data_quality", "json")
  val rejectedDqCsv: String = p("rejected", "data_quality", "csv")
  val archiveRaw: String = p("archive", "raw")
  val archiveValidated: String = p("archive", "validated")
  val audit: String = p("audit")

  def processedDate(date: String): String = s"$processed/date=$date"
  def goldDate(date: String): String = s"$goldFactSales/date=$date"
  def auditMetrics(date: String): String =
    s"$audit/gold_compaction/date=$date/metrics.json"
  def auditSummary: String = s"$audit/gold_compaction/last_run_summary.json"
}
