package graft.ingest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkTestBase

/** Property-based coverage of the cleaning/parsing operators (SURVEY §5):
  * ScalaCheck generators produce the case lists, each property is checked
  * in bulk through the real Spark expressions (one job per property). */
class PropertySpecs extends SparkTestBase {
  import spark.implicits._

  private val money: Gen[(Long, Int)] = for {
    cents <- Gen.chooseNum(0L, 99999999L)
    variant <- Gen.chooseNum(0, 3)
  } yield (cents, variant)

  test("currency cleaner inverts decoration for all decorated amounts") {
    val cases = Gen.listOfN(300, money).sample.get
    val rows = cases.map { case (cents, v) =>
      val base = s"${cents / 100}.${"%02d".format(cents % 100)}"
      val decorated = v match {
        case 0 => s"$$$base"
        case 1 => s"USD $base"
        case 2 => s"($$$base)"
        case _ => base
      }
      val expected = if (v == 2) -cents / 100.0 else cents / 100.0
      (decorated, expected)
    }
    val got = rows.map(_._1).toDF("raw")
      .select(Numerics.cleanCurrency(col("raw"))).as[Double].collect()
    assert(got.toSeq == rows.map(_._2))
  }

  test("quantity cleaner: digits survive, all-garbage nulls") {
    val qty = Gen.chooseNum(-999L, 9999L)
    val cases = Gen.listOfN(200, qty).sample.get
    val rows = cases.map(q => (s" $q units", q))
    val got = rows.map(_._1).toDF("raw")
      .select(Numerics.cleanQuantity(col("raw"))).as[Option[Long]].collect()
    // negative sign in the middle is preserved by the char-class strip:
    // "-123" keeps '-', so parity with the reference regex holds
    assert(got.toSeq == rows.map(r => Some(r._2)))
    val garbage = Seq("N/A", "", "---", "none").toDF("raw")
      .select(Numerics.cleanQuantity(col("raw"))).as[Option[Long]].collect()
    assert(garbage.forall(_.isEmpty))
  }

  test("timestamp parser round-trips every generated date across all 11 formats") {
    val gen = for {
      y <- Gen.chooseNum(2000, 2030)
      m <- Gen.chooseNum(1, 12)
      d <- Gen.chooseNum(1, 28)
      hh <- Gen.chooseNum(0, 23)
      mm <- Gen.chooseNum(0, 59)
      ss <- Gen.chooseNum(0, 59)
    } yield java.time.LocalDateTime.of(y, m, d, hh, mm, ss)
    val dts = Gen.listOfN(50, gen).sample.get
    val fmts = Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm",
      "yyyy/MM/dd HH:mm:ss", "yyyy/MM/dd HH:mm", "MM/dd/yyyy HH:mm:ss",
      "MM/dd/yyyy HH:mm", "MM/dd/yyyy", "yyyy-MM-dd", "yyyy/MM/dd",
      "yyyyMMdd HHmmss", "yyyyMMdd")
    val rows = for (dt <- dts; f <- fmts) yield
      dt.format(java.time.format.DateTimeFormatter.ofPattern(f))
    val parsed = rows.toDF("raw")
      .select(Timestamps.parseMultiFormat(col("raw"))).collect()
    assert(parsed.forall(!_.isNullAt(0)),
      "every reference-format string must parse")
  }

  test("random non-matching strings never parse") {
    val junk = Gen.listOfN(150, Gen.alphaNumStr).sample.get
      .filterNot(s => s.matches("\\d{8}( \\d{6})?"))
    val parsed = junk.toDF("raw")
      .select(Timestamps.parseMultiFormat(col("raw"))).collect()
    assert(parsed.forall(_.isNullAt(0)))
  }

  test("gold compaction is idempotent: compact(compact(x)) == compact(x)") {
    import graft.gold.GoldCompaction
    val df = Seq(
      ("t1", "s1", "2024-01-01 10:00:00", "i1", "cat", "2", "3.0", "6.0", "Card", "c1", "r1", "f1", "2024-01-01 10:05:00"),
      ("t1", "s1", "2024-01-01 10:00:00", "i1", "cat", "2", "3.0", "6.0", "Card", "c1", "r2", "f2", "2024-01-01 11:05:00"),
      ("t2", "s2", "2024-01-01 12:00:00", "i2", "cat", "1", "5.0", "5.0", "Cash", "c2", "r1", "f1", "2024-01-01 10:05:00"))
      .toDF("transaction_id", "store_id", "timestamp", "item_id",
        "item_category", "quantity", "unit_price", "revenue",
        "payment_method", "customer_id", "ingest_run_id", "source_file",
        "ingest_ts")
    val once = GoldCompaction.compactFrame(df)
    val twice = GoldCompaction.compactFrame(once)
    assert(once.count() == 2)
    assert(twice.count() == once.count())
    val h1 = once.select("transaction_id", "row_hash").collect().map(_.toString).sorted
    val h2 = twice.select("transaction_id", "row_hash").collect().map(_.toString).sorted
    assert(h1.sameElements(h2))
  }
}
