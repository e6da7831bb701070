package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Expectations]] corners the q290 gate doesn't exercise: the drop
  * mode's counts, null-predicate semantics (null = violation), and
  * quarantine idempotency under token replay. */
class ExpectationsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  test("expectOrDrop lands clean rows and reports exact counts") {
    val t = s"${Files.createTempDirectory("graft_exp_drop").toString}/t"
    val exps = Seq("cheap" -> "o_totalprice < 200000",
      "even" -> "o_orderkey % 2 = 0")
    val (_, counts) = Expectations.expectOrDrop(spark, t, orders, exps)
    assert(counts("cheap") ==
      orders.filter(!(col("o_totalprice") < 200000)).count())
    assert(counts("even") ==
      orders.filter(col("o_orderkey") % 2 =!= 0).count())
    val landed = Snapshots.readLatest(spark, t).get
    assert(landed.count() == orders
      .filter(col("o_totalprice") < 200000 && col("o_orderkey") % 2 === 0)
      .count())
  }

  test("NULL predicate results count as violations (DLT semantics)") {
    import spark.implicits._
    val t = s"${Files.createTempDirectory("graft_exp_null").toString}/t"
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(-1.0)))
      .toDF("id", "v")
    val (_, counts) =
      Expectations.expectOrDrop(spark, t, df, Seq("pos" -> "v > 0"))
    assert(counts("pos") == 2, "null and false both violate")
    assert(Snapshots.readLatest(spark, t).get.count() == 1)
  }

  test("quarantine token replay is a no-op (streaming idempotency)") {
    val group = Files.createTempDirectory("graft_exp_tok").toString
    val exps = Seq("cheap" -> "o_totalprice < 200000")
    Snapshots.append(spark, s"$group/m", orders.limit(0))
    Snapshots.append(spark, s"$group/m_rejects",
      orders.limit(0).withColumn(Expectations.FailedCol, lit("")))
    val m1 = Expectations.expectOrQuarantine(spark, group, "m",
      orders, exps, token = "batch-7")
    val n = Snapshots.readLatest(spark, s"$group/m").get.count()
    val m2 = Expectations.expectOrQuarantine(spark, group, "m",
      orders, exps, token = "batch-7")
    assert(m1 == m2, "replayed token must return the same marker")
    assert(Snapshots.readLatest(spark, s"$group/m").get.count() == n,
      "replay must not double-apply")
  }
}
