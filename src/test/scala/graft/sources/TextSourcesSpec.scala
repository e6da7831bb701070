package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkTestBase

/** PERMISSIVE capture semantics of the schema'd zone readers: bad lines
  * land verbatim in the corrupt column, good lines type cleanly, nothing
  * crashes and nothing is silently dropped. */
class TextSourcesSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("CSV: malformed rows are captured, good rows typed, none dropped") {
    val dir = Files.createTempDirectory("graft_csvspec_").toString
    val csv =
      """id,name,amount
        |1,alpha,10.5
        |2,beta,20.25
        |3,gamma,not-a-number
        |4,delta,""".stripMargin + "\n5,\"epsilon, quoted\",7.75\n"
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.csv"), csv)
    val df = TextSources.readCsvZone(spark, dir, schema).persist()
    val good = TextSources.good(df).collect()
    val bad = TextSources.rejects(df).collect().map(_.getString(0))
    // bad-numeric line is captured verbatim; short line 4 parses with a
    // null amount (fewer-token rows pad null — reject taxonomy for that
    // lives in the bronze path); quoted comma survives
    assert(bad.toSeq == Seq("3,gamma,not-a-number"))
    assert(good.length == 4)
    val eps = good.find(_.getLong(0) == 5L).get
    assert(eps.getString(1) == "epsilon, quoted" && eps.getDouble(2) == 7.75)
    assert(good.find(_.getLong(0) == 4L).get.isNullAt(2))
    assert(good.length + bad.length == 5)
    df.unpersist()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("JSON: malformed lines are captured, schema'd fields typed") {
    val dir = Files.createTempDirectory("graft_jsonspec_").toString
    val json =
      """{"id":1,"name":"alpha","amount":10.5}
        |{"id":2,"name":"beta"}
        |{broken json
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.json"), json)
    val df = TextSources.readJsonZone(spark, dir, schema).persist()
    val good = TextSources.good(df).collect()
    val bad = TextSources.rejects(df).collect().map(_.getString(0))
    assert(good.length == 2)
    assert(good.find(_.getLong(0) == 2L).get.isNullAt(2)) // absent field → null
    assert(bad.length == 1 && bad(0).contains("broken json"))
    df.unpersist()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("reference sample CSV reads schema'd: every line lands as good or captured") {
    // the comma-delimited reference sample, read against the declared
    // 10-column sales schema: currency/timestamp junk that the bronze
    // path rejects row-by-row must surface here as nulls or captures,
    // never crash (ANSI off inside the CSV parser) or drop
    val salesSchema = StructType(Seq(
      StructField("transaction_id", StringType),
      StructField("store_id", StringType),
      StructField("timestamp", StringType),
      StructField("item_id", StringType),
      StructField("item_category", StringType),
      StructField("quantity", LongType),
      StructField("unit_price", DoubleType),
      StructField("revenue", DoubleType),
      StructField("payment_method", StringType),
      StructField("customer_id", StringType)))
    val path = "/root/reference/sample_csv_files/sales_2024-10-16.csv"
    val df = TextSources.readCsvZone(spark, path, salesSchema).persist()
    val total = df.count()
    val good = TextSources.good(df).count()
    val bad = TextSources.rejects(df).count()
    assert(total == 1241) // header excluded; matches the ingest golden
    assert(good + bad == total)
    assert(good > 0)
    df.unpersist()
  }
}
