package graft.util

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the plain-join result on skewed data") {
    // 10k rows all hitting one hot key + a tail
    val skewed = ((1 to 10000).map(i => ("hot", i)) ++
      (1 to 100).map(i => (s"k$i", i))).toDF("key", "v")
    val small = (Seq(("hot", "H")) ++ (1 to 100).map(i => (s"k$i", s"d$i")))
      .toDF("key", "name")
    val plain = skewed.join(small, Seq("key"))
      .select("key", "v", "name").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(skewed, small, "key", factor = 8,
        saltOn = col("v"))
      .select("key", "v", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("content-hash salt assigns identical salts under any partition layout") {
    val rows = (1 to 5000).map(i => (if (i % 2 == 0) "hot" else s"k$i", i))
    val small = (Seq(("hot", "H")) ++ (1 to 5000).map(i => (s"k$i", s"d$i")))
      .toDF("key", "name")
    // same logical rows arriving in three different physical layouts
    val layouts = Seq(
      rows.toDF("key", "v"),
      rows.toDF("key", "v").repartition(3),
      rows.reverse.toDF("key", "v").repartition(17, col("v")))
    def saltAssignment(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("_salt",
          pmod(xxhash64(col("v")), lit(8L)).cast("int"))
        .select("v", "_salt").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
    val expected = saltAssignment(layouts.head)
    layouts.tail.foreach(l => assert(saltAssignment(l) == expected))
    // the hot key actually spreads: >1 distinct salt on the hot rows
    val hotSalts = layouts.head.filter(col("key") === "hot")
      .withColumn("_salt", pmod(xxhash64(col("v")), lit(8L)).cast("int"))
      .select("_salt").distinct().count()
    assert(hotSalts > 4, s"hot key only spread over $hotSalts salts")
    // and the join result is still exactly the plain join on every layout
    val plain = layouts.head.join(small, Seq("key"))
      .select("key", "v", "name").collect().map(_.toString).sorted
    layouts.foreach { l =>
      val salted = Skew.saltedJoin(l, small, "key", factor = 8,
          saltOn = col("v"))
        .select("key", "v", "name").collect().map(_.toString).sorted
      assert(salted.sameElements(plain))
    }
  }

  test("keySkew surfaces the hot key first") {
    val df = ((1 to 500).map(_ => "hot") ++ Seq("a", "b")).toDF("key")
    val top = Skew.keySkew(df, "key", 1).collect()
    assert(top.head.getString(0) == "hot" && top.head.getLong(1) == 500L)
  }
}
