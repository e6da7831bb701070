package graft.lake

/** A12 — notification sink. The reference publishes DQ summaries and
  * failure alerts to SNS (`glue_job_raw_to_processed.py:370-385`,
  * `lambda_validator.py:108-111`); the engine core stays cloud-agnostic
  * behind this trait (SURVEY §2 A12). Production deployments plug in a
  * topic-backed impl; the default logs. */
trait Notifier {
  def notify(subject: String, message: String): Unit
}

object Notifier {
  /** stderr-logging default. */
  object Log extends Notifier {
    def notify(subject: String, message: String): Unit =
      System.err.println(s"[notify] $subject\n$message")
  }

  /** Collects notifications in memory (tests). */
  final class Buffering extends Notifier {
    val sent: scala.collection.mutable.Buffer[(String, String)] =
      scala.collection.mutable.Buffer.empty
    def notify(subject: String, message: String): Unit =
      sent += (subject -> message)
  }

  /** The reference's per-file DQ summary body (`glue_job:371-380`). */
  def dqSummary(sourceFile: String, total: Long, good: Long,
      byReason: Map[String, Long]): String =
    s"""FILE: $sourceFile
       |
       |Total Rows: $total
       |Good Rows: $good
       |Rejected Rows: ${byReason.values.sum}
       |
       |Breakdown:
       | - Missing Required Columns: ${byReason.getOrElse("MISSING_REQUIRED_COLUMN", 0L)}
       | - Invalid Timestamps: ${byReason.getOrElse("INVALID_TIMESTAMP_FORMAT", 0L)}
       | - Business Logic Rejects: ${byReason.getOrElse("BUSINESS_LOGIC_FAIL", 0L)}
       |""".stripMargin
}
