package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DiacriticFoldSpec extends SparkTestBase {
  import spark.implicits._

  test("folds precomposed and decomposed accents to bare ASCII, codegen'd") {
    val rows = Seq(
      ("caf\u00e9", "cafe"), // precomposed \u00e9
      ("cafe\u0301", "cafe"), // decomposed e + combining acute
      ("ma\u00f1ana", "manana"),
      ("\u00fcber", "uber"),
      ("\u010deko", "ceko"),
      ("\u00c0\u00c8\u00cc", "AEI"), // uppercase forms fold too
      ("plain ascii 42", "plain ascii 42"), // identity on ASCII
      ("\u00f8\u00df\u0142", "\u00f8\u00df\u0142")) // no canonical decomposition: untouched
    val df = rows.toDF("raw", "expected").repartition(2)
      .withColumn("folded", DiacriticFold(col("raw")))
    df.collect().foreach(r => assert(r.getString(2) == r.getString(1), r))
    // precomposed and decomposed inputs produce identical fold keys
    val fp = Seq("caf\u00e9", "cafe\u0301", "cafe").toDF("s")
      .select(md5(DiacriticFold(col("s")))).as[String].collect()
    assert(fp.distinct.length == 1)
    // null flows through the null-safe wrapper
    val n = Seq[Option[String]](None).toDF("s")
      .select(DiacriticFold(col("s"))).collect()
    assert(n(0).isNullAt(0))
    // non-string child: analysis-time type error
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(DiacriticFold(col("x"))).collect()
    }
    assert(err.getMessage.contains("diacritic_fold"))
  }

  test("interpreted eval agrees with the kernel") {
    assert(DiacriticFold.fold("r\u00e9sum\u00e9") == "resume")
    assert(DiacriticFold.fold("") == "")
  }
}
