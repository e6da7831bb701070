package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[TextAnalysis.ceilLog2Ratio]] must be the EXACT smallest k with
  * b·2ᵏ ≥ a — including at power-of-two boundaries where an FP log2
  * could seed one off in either direction. The q198 LM filter's whole
  * cross-engine determinism rests on this. */
class CeilLog2Spec extends SparkTestBase {

  test("ceilLog2Ratio is exact over an exhaustive small range") {
    import spark.implicits._
    val pairs = for {
      a <- 1L to 128L
      b <- 1L to a
    } yield (a, b)
    val got = pairs.toDF("a", "b")
      .withColumn("k", TextAnalysis.ceilLog2Ratio(col("a"), col("b")))
      .as[(Long, Long, Int)].collect()
    got.foreach { case (a, b, k) =>
      def holds(j: Int) = (b << j) >= a
      assert(holds(k), s"b<<k < a for a=$a b=$b k=$k")
      assert(k == 0 || !holds(k - 1), s"k not minimal for a=$a b=$b k=$k")
    }
  }

  test("ceilLog2Ratio is exact at large power-of-two boundaries") {
    import spark.implicits._
    val pairs = for {
      e <- 1 to 40
      d <- Seq(-1L, 0L, 1L)
    } yield ((1L << e) + d, 1L)
    val got = pairs.filter(_._1 >= 1).toDF("a", "b")
      .withColumn("k", TextAnalysis.ceilLog2Ratio(col("a"), col("b")))
      .as[(Long, Long, Int)].collect()
    got.foreach { case (a, _, k) =>
      assert((1L << k) >= a && (k == 0 || (1L << (k - 1)) < a),
        s"boundary miss at a=$a k=$k")
    }
  }
}
