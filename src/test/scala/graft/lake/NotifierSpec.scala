package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** Byte-for-byte parity of the DQ summary body with the reference's SNS
  * message template (`glue_job_raw_to_processed.py:370-380` — an f-string
  * with fixed labels, blank separator lines, one leading space per
  * breakdown bullet, and a trailing newline). */
class NotifierSpec extends AnyFunSuite {

  test("dqSummary renders the reference SNS body field-for-field") {
    val got = Notifier.dqSummary("sales_2024-10-16.csv", total = 1241L,
      good = 828L, byReason = Map(
        "INVALID_TIMESTAMP_FORMAT" -> 406L,
        "BUSINESS_LOGIC_FAIL" -> 7L))
    // the reference template rendered with the frozen sample-file goldens
    // (IngestE2ESpec): reject_count = 413 = total - good
    val want = "FILE: sales_2024-10-16.csv\n" +
      "\n" +
      "Total Rows: 1241\n" +
      "Good Rows: 828\n" +
      "Rejected Rows: 413\n" +
      "\n" +
      "Breakdown:\n" +
      " - Missing Required Columns: 0\n" +
      " - Invalid Timestamps: 406\n" +
      " - Business Logic Rejects: 7\n"
    assert(got == want)
  }

  test("absent reject reasons render as 0, never drop a bullet") {
    val got = Notifier.dqSummary("clean.csv", 10L, 10L, Map.empty)
    assert(got.contains(" - Missing Required Columns: 0\n"))
    assert(got.contains(" - Invalid Timestamps: 0\n"))
    assert(got.contains(" - Business Logic Rejects: 0\n"))
    assert(got.contains("Rejected Rows: 0\n"))
  }
}
