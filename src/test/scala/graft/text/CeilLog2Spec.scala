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

  /** [[TextAnalysis.quarterBitsRatio]]'s contract is DEFINED as: k =
    * floor(log2(a/b)) decided by exact shifts, s = (a<<13) div (b<<k),
    * result = 4k + (bitlength(s⁴) − 53). The reference below replays
    * that definition in BigInt — the spec pins the Catalyst expression
    * (FP seed, shift window, IntegralDivide) to it everywhere,
    * including power-of-two boundaries where the seed can land off. */
  test("quarterBitsRatio matches the BigInt reference exhaustively") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long = {
      var k = 0
      while ((b << (k + 1)) <= a) k += 1
      val s = BigInt(a) * 8192 / (BigInt(b) << k)
      val s4 = s.pow(4)
      4L * k + (s4.bitLength - 53)
    }
    val pairs = (for {
      a <- 1L to 96L
      b <- 1L to a
    } yield (a, b)) ++ (for {
      e <- 1 to 40
      d <- Seq(-1L, 0L, 1L)
      if (1L << e) + d >= 1
    } yield ((1L << e) + d, 1L)) ++ Seq((1L << 49, 3L), ((1L << 49) - 1, 7L))
    val got = pairs.toDF("a", "b")
      .withColumn("q", TextAnalysis.quarterBitsRatio(col("a"), col("b")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, q) =>
      assert(q == ref(a, b), s"a=$a b=$b got $q want ${ref(a, b)}")
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
