package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.queries.{Num, Tables}

/** Ad-hoc plan/timing probe for bench-anatomy investigations: times named
  * variants of a query (best of 3 noop-sink passes, like Bench) so a slow
  * headline query can be attributed to a specific operator instead of
  * guessed at. Not part of the driver contract. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $tag%-28s best=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val li = Tables(spark, dir, "lineitem")
    val discRevenue = Num.cents(col("l_extendedprice")) *
      (lit(100L) - Num.cents(col("l_discount")))
    val tax100 = lit(100L) + Num.cents(col("l_tax"))

    time("q01_full") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Num.sumMoney(col("l_quantity")).as("sum_qty"),
          Num.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          (Num.sumBig(discRevenue).cast("double") / 10000.0).as("sum_disc_price"),
          (Num.sumBig(discRevenue * tax100).cast("double") / 1000000.0).as("sum_charge"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }
    time("q01_no_distinct") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Num.sumMoney(col("l_quantity")).as("sum_qty"),
          Num.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          (Num.sumBig(discRevenue).cast("double") / 10000.0).as("sum_disc_price"),
          (Num.sumBig(discRevenue * tax100).cast("double") / 1000000.0).as("sum_charge"),
          count(lit(1)).as("n_rows"))
    }
    time("q01_no_decimal") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Num.sumMoney(col("l_quantity")).as("sum_qty"),
          Num.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }
    time("q01_distinct_only") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
    }
    time("q01_scan_only") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"))
    }
    time("q01_piggyback") {
      // one shuffle: pre-aggregate per (rf, ls, orderkey) — the relation
      // the distinct pass shuffles anyway — then finalize on (rf, ls)
      li.groupBy(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"))
        .agg(sum(Num.cents(col("l_quantity"))).as("q"),
          sum(Num.cents(col("l_extendedprice"))).as("bp"),
          Num.sumBig(discRevenue).as("dp"),
          Num.sumBig(discRevenue * tax100).as("ch"),
          count(lit(1)).as("n"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(col("q")).cast("double") / 100.0).as("sum_qty"),
          (sum(col("bp")).cast("double") / 100.0).as("sum_base_price"),
          (sum(col("dp")).cast("double") / 10000.0).as("sum_disc_price"),
          (sum(col("ch")).cast("double") / 1000000.0).as("sum_charge"),
          sum(col("n")).as("n_rows"),
          count(lit(1)).as("n_orders"))
    }
    time("q01_piggyback_long") {
      // phase-1 partials in LONG (per-order sums are bounded by lines per
      // order, never by table size), decimal only at the 6-group fold
      li.groupBy(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"))
        .agg(sum(Num.cents(col("l_quantity"))).as("q"),
          sum(Num.cents(col("l_extendedprice"))).as("bp"),
          sum(discRevenue).as("dp"),
          sum(discRevenue * tax100).as("ch"),
          count(lit(1)).as("n"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((Num.sumBig(col("q")).cast("double") / 100.0).as("sum_qty"),
          (Num.sumBig(col("bp")).cast("double") / 100.0).as("sum_base_price"),
          (Num.sumBig(col("dp")).cast("double") / 10000.0).as("sum_disc_price"),
          (Num.sumBig(col("ch")).cast("double") / 1000000.0).as("sum_charge"),
          Num.sumBig(col("n")).cast("long").as("n_rows"),
          count(lit(1)).as("n_orders"))
    }
    def timeCall(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $tag%-28s best=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_STREAMS")) {
      import graft.queries.StreamingQueries
      for (sp <- Seq("32", "8", "4")) {
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        timeCall(s"q69_interval_sp$sp") {
          StreamingQueries.intervalJoinStream(spark, dir).count()
        }
        timeCall(s"q61_sliding_sp$sp") {
          StreamingQueries.slidingHourlyStream(spark, dir).count()
        }
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    time("q01_two_aggs_join") {
      val sums = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Num.sumMoney(col("l_quantity")).as("sum_qty"),
          Num.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          (Num.sumBig(discRevenue).cast("double") / 10000.0).as("sum_disc_price"),
          (Num.sumBig(discRevenue * tax100).cast("double") / 1000000.0).as("sum_charge"),
          count(lit(1)).as("n_rows"))
      val dist = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      sums.join(dist, Seq("l_returnflag", "l_linestatus"))
    }
    spark.stop()
  }
}
