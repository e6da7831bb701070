package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.{Tables, TextQueries}

/** Weighted corpus mixing (q64): per-bucket rates must be hit by EXACT
  * hash-bucket arithmetic — no randomness, no approximation. */
class SamplingSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("corpus mix selects exactly the docs whose hash bucket clears the bucket rate") {
    val mix = TextQueries.corpusMix(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // independent expectation: score+bucket every doc, apply the rate
    // table to its hash bucket directly
    val rates = TextQueries.MixRates.withDefaultValue(TextQueries.MixDefaultBp)
    val expected = Tables(spark, sfDir, "documents")
      .withColumn("quality_e6",
        floor(TextAnalysis.qualityScore(col("text")) * 1000000))
      .withColumn("q_bucket",
        when(col("quality_e6") >= TextQueries.MixHighE6, "high")
          .when(col("quality_e6") >= TextQueries.MixMidE6, "mid")
          .otherwise("low"))
      .withColumn("hb", Sampling.hashBucket(col("doc_id")))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("q_bucket"),
        r.getAs[Long]("hb")))
    val expectedSel = expected.collect {
      case (id, b, hb) if hb < rates(b) => (id, b)
    }.toSet
    assert(mix == expectedSel && mix.nonEmpty)
    // every bucket's selected count is the exact hash-arithmetic count —
    // and the mix genuinely upweights: the high bucket keeps a strictly
    // larger fraction than the low bucket
    val byBucket = expected.groupBy(_._2)
    byBucket.foreach { case (b, docs) =>
      val sel = mix.count(_._2 == b)
      assert(sel == docs.count(_._3 < rates(b)), b)
    }
    def frac(b: String): Double =
      byBucket.get(b).map(d => mix.count(_._2 == b).toDouble / d.size)
        .getOrElse(0.0)
    if (byBucket.contains("high") && byBucket.contains("low"))
      assert(frac("high") > frac("low"))
  }

  test("corpus mix is deterministic across runs") {
    val a = TextQueries.corpusMix(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = TextQueries.corpusMix(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
