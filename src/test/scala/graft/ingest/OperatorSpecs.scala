package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TimestampsSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(ss: String*): Seq[Option[String]] =
    ss.toDF("raw")
      .select(date_format(Timestamps.parseMultiFormat(col("raw")),
        "yyyy-MM-dd HH:mm:ss").as("p"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("all 11 reference formats parse") {
    val expected = "2024-10-16 15:23:07"
    assert(parse("2024-10-16 15:23:07") == Seq(Some(expected)))
    assert(parse("2024-10-16 5:23") == Seq(Some("2024-10-16 05:23:00")))
    assert(parse("2024/10/16 15:23:07") == Seq(Some(expected)))
    assert(parse("2024/10/16 15:23") == Seq(Some("2024-10-16 15:23:00")))
    assert(parse("10/16/2024 15:23:07") == Seq(Some(expected)))
    assert(parse("10/16/2024 15:23") == Seq(Some("2024-10-16 15:23:00")))
    assert(parse("10/16/2024") == Seq(Some("2024-10-16 00:00:00")))
    assert(parse("2024-10-16") == Seq(Some("2024-10-16 00:00:00")))
    assert(parse("2024/10/16") == Seq(Some("2024-10-16 00:00:00")))
    assert(parse("20241016 152307") == Seq(Some(expected)))
    assert(parse("20241016") == Seq(Some("2024-10-16 00:00:00")))
  }

  test("unparseable shapes (by design) give null") {
    // dd-MM-yy, AM/PM, ISO-T and empty all reject in the reference corpus
    assert(parse("16-10-24 15:23", "09/03/2025 06:28AM",
      "2025-09-03T13:10:32", "").forall(_.isEmpty))
  }

  test("regex match with invalid calendar value degrades to null, not error") {
    assert(parse("2024-13-45 10:00:00") == Seq(None))
  }
}

class NumericsSpec extends SparkTestBase {
  import spark.implicits._

  private def currency(ss: String*): Seq[Option[Double]] =
    ss.toDF("raw").select(Numerics.cleanCurrency(col("raw")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  private def quantity(ss: String*): Seq[Option[Long]] =
    ss.toDF("raw").select(Numerics.cleanQuantity(col("raw")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq

  test("currency: decoration stripped, accounting negatives, garbage→null") {
    assert(currency("$295.66", "USD 1,234.50", "(12.00)", "($7.5)", "N/A", "", "-3.2") ==
      Seq(Some(295.66), Some(1234.50), Some(-12.0), Some(-7.5), None, None, Some(-3.2)))
  }

  test("quantity: digits kept, N/A→null") {
    assert(quantity("5", " 5 pcs ", "N/A", "", "-4") ==
      Seq(Some(5L), Some(5L), None, None, Some(-4L)))
  }
}
