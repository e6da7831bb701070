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
    val salted = Skew.saltedJoin(skewed, small, "key", factor = 8)
      .select("key", "v", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("keySkew surfaces the hot key first") {
    val df = ((1 to 500).map(_ => "hot") ++ Seq("a", "b")).toDF("key")
    val top = Skew.keySkew(df, "key", 1).collect()
    assert(top.head.getString(0) == "hot" && top.head.getLong(1) == 500L)
  }
}
