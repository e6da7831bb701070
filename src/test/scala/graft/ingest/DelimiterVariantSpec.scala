package graft.ingest

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.lake.LakeLayout

/** End-to-end ingest of delimiter variants absent from the reference's
  * sample corpus: pipe (the Q3 regex-quoting fix — a raw `|` regex would
  * split every character), semicolon, and tab. */
class DelimiterVariantSpec extends SparkTestBase {

  private val header =
    "transaction_id|store_id|timestamp|item_id|item_category|quantity|unit_price|revenue|payment_method|customer_id"

  private def ingest(delim: String): BronzeToSilver.Result = {
    val root = Files.createTempDirectory(s"graft_delim_").toString
    val layout = LakeLayout(root)
    Files.createDirectories(Paths.get(layout.raw))
    val rows = Seq(
      header,
      "T1|S1|2024-01-01 10:00:00|I1|Cat|2|3.00|6.00|Card|c1",
      "T2|S2|2024-01-01 11:00:00|I2|Cat|1|5.00|5.00|Cash|c2",
      "T3|S3|not-a-date|I3|Cat|1|1.00|1.00|Card|c3", // ts reject
      "T4|S4|2024-01-01 12:00:00|I4|Cat|2|2.00|9.99|Card|c4" // dq reject
    ).map(_.replace("|", delim))
    val f = s"${layout.raw}/sales.csv"
    Files.writeString(Paths.get(f), rows.mkString("\n") + "\n")
    val Right(r) = BronzeToSilver.ingestFile(spark, f, layout)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    r
  }

  test("pipe-delimited file parses correctly (Q3: delimiter is regex-quoted)") {
    val r = ingest("|")
    assert(r.totalRows == 4 && r.goodRows == 2)
    assert(r.rejectsByReason == Map(
      "INVALID_TIMESTAMP_FORMAT" -> 1L, "BUSINESS_LOGIC_FAIL" -> 1L))
  }

  test("semicolon-delimited file parses correctly") {
    val r = ingest(";")
    assert(r.totalRows == 4 && r.goodRows == 2)
  }

  test("tab-delimited file parses correctly") {
    val r = ingest("\t")
    assert(r.totalRows == 4 && r.goodRows == 2)
  }
}
