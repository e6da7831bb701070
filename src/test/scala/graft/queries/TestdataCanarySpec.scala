package graft.queries

import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Testdata schema-drift canary (VERDICT_r08 task 3).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed `events.ts`'s parquet encoding once (TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)), which silently zeroed 36 gate rows in round 8.
  * This suite pins the load path for every table so the NEXT regeneration
  * fails one named spec here instead of a third of the correctness gate:
  *
  *  - every table in TESTDATA.md loads through [[Tables]] and has rows
  *  - `Tables.events` yields a µs `TimestampType` ts AFTER normalization,
  *    whichever raw encoding the file ships
  *  - the columns each query family depends on still exist with the
  *    expected type family
  */
class TestdataCanarySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  for (t <- tables) test(s"canary: $t loads and is non-empty") {
    assume(new java.io.File(s"$dir/$t.parquet").exists(),
      s"$dir/$t.parquet absent on this machine")
    val df = Tables(spark, dir, t)
    assert(df.limit(1).count() == 1L, s"$t.parquet read back empty")
  }

  test("canary: events.ts is TimestampType after normalization") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val raw = Tables(spark, dir, "events")
    val rawTs = raw.schema("ts").dataType
    assert(rawTs == LongType || rawTs == TimestampType ||
      rawTs == TimestampNTZType,
      s"events.ts shipped as unrecognized raw type $rawTs — " +
        "extend Tables.normalizeEventTs before anything else this round")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"normalizeEventTs produced ${ev.schema("ts").dataType}")
    // a real instant in the generator's era, not 1970-epoch garbage from
    // a mis-scaled unit conversion
    val yr = ev.selectExpr("min(year(ts))", "max(year(ts))").head()
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"events.ts years ${yr.mkString("-")} outside sane range — " +
        "unit mis-scale in normalizeEventTs?")
  }

  test("canary: load-bearing columns keep their type families") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    def typeOf(t: String, c: String) = Tables(spark, dir, t).schema(c).dataType
    assert(typeOf("lineitem", "l_extendedprice") == DoubleType)
    assert(typeOf("lineitem", "l_quantity").isInstanceOf[NumericType])
    assert(Set[DataType](DateType, TimestampType, StringType)
      .contains(typeOf("orders", "o_orderdate")))
    assert(Set[DataType](LongType, IntegerType)
      .contains(typeOf("events", "user_id")))
    assert(typeOf("events", "event_type") == StringType)
    assert(typeOf("events", "value") == DoubleType)
    assert(typeOf("documents", "text") == StringType)
    assert(typeOf("embeddings", "embedding") == ArrayType(FloatType, false) ||
      typeOf("embeddings", "embedding") == ArrayType(FloatType, true))
  }
}
