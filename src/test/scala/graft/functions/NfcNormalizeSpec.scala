package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  // explicit escapes \u2014 source-file literals with combining characters are
  // one editor-normalization away from silently testing nothing
  private val decomposedAcute = "e\u0301"
  private val precomposedE = "\u00E9"

  test("NFC composes decomposed sequences and singletons, null-safe, codegen'd") {
    val rows = Seq(
      (decomposedAcute, precomposedE),
      ("A\u0300", "\u00C0"), // combining grave \u2192 \u00C0
      ("o\u0308", "\u00F6"), // combining diaeresis \u2192 \u00F6
      ("c\u0327", "\u00E7"), // combining cedilla \u2192 \u00E7
      ("\u212B", "\u00C5"), // ANGSTROM SIGN \u2192 \u00C5 (singleton)
      ("plain ascii", "plain ascii"), // already normal: unchanged
      (precomposedE, precomposedE)) // precomposed: idempotent
    // repartition keeps the projection out of ConvertToLocalRelation so
    // the codegen assertion below sees a real executed stage
    val df = rows.toDF("raw", "expected").repartition(2)
      .withColumn("norm", NfcNormalize(col("raw")))
    val got = df.collect().map(r => (r.getString(2), r.getString(1)))
    got.foreach { case (norm, expected) => assert(norm == expected) }
    // decomposed and precomposed forms fingerprint identically post-NFC
    val fp = Seq(decomposedAcute, precomposedE).toDF("s")
      .select(md5(NfcNormalize(col("s")))).as[String].collect()
    assert(fp(0) == fp(1))
    // null flows through the null-safe wrapper
    val n = Seq[Option[String]](None).toDF("s")
      .select(NfcNormalize(col("s"))).collect()
    assert(n(0).isNullAt(0))
    // a non-string child fails at ANALYSIS time with a clear type error,
    // not at runtime inside codegen
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(NfcNormalize(col("n"))).collect()
    }
    assert(err.getMessage.contains("nfc_normalize"), err.getMessage)
    // the expression stays inside whole-stage codegen (no UDF black box):
    // AQE prints codegen'd stages with the "*(n)" marker
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") &&
      plan.contains("nfc_normalize(raw"), plan.take(1500))
  }
}
