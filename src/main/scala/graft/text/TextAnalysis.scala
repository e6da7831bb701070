package graft.text

import scala.collection.immutable.ListMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis operators for large-scale corpus pipelines: tokenization,
  * token counting (whitespace + BPE-ish regex), document fingerprinting
  * (normalized md5 + polynomial rolling hash), n-gram-heuristic language
  * ID, and quality scoring.
  *
  * Everything is built-in Catalyst expressions (codegen-friendly, no UDFs):
  * at 100 TB these run embarrassingly parallel inside whole-stage codegen
  * with zero shuffles. Each helper has an exact SQL mirror used by the
  * DuckDB oracle (see TextQueries), so semantics are pinned engine-
  * independently.
  */
object TextAnalysis {

  /** Mersenne prime 2^31-1; all rolling/min hashes work mod this. */
  val P: Long = 2147483647L

  /** Whitespace tokens of a trimmed string. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def wsTokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation. */
  val bpePattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpePattern), lit(0)))

  /** md5 fingerprint of whitespace-normalized lowercase text. */
  def normalizedFingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")))

  /** EXACT `ceil(log2(a/b))` for positive long columns with `a ≥ b` —
    * the Shannon code length in whole bits of a probability `b/a`. IEEE
    * `log2` carries no cross-libm correct-rounding guarantee (ADVICE
    * r03), so the FP value only SEEDS the answer; the result is the
    * smallest `k` with `b·2ᵏ ≥ a`, decided by exact integer shift
    * comparisons in a ±2 window around the seed. Overflow-safe: the
    * probed shifts are bounded by `4a`. The DuckDB oracles inline the
    * same seed-then-correct CASE, so both engines agree bitwise however
    * their libms round. */
  def ceilLog2Ratio(a: Column, b: Column): Column = {
    val k0 = greatest(lit(0), least(lit(40),
      ceil(log2(a.cast(DoubleType) / b.cast(DoubleType))).cast("int")))
    def sh(k: Column) = call_function("shiftleft", b, k)
    when(k0 >= 2 && sh(k0 - 2) >= a, k0 - 2)
      .when(k0 >= 1 && sh(k0 - 1) >= a, k0 - 1)
      .when(sh(k0) >= a, k0)
      .when(sh(k0 + 1) >= a, k0 + 1)
      .otherwise(k0 + 2)
  }

  /** EXACT `floor(4·log2(a/b))` for positive long columns with `a ≥ b` —
    * QUARTER-BIT Shannon costs. [[ceilLog2Ratio]]'s whole bits are too
    * coarse when per-item probability ratios sit well under one bit
    * (e.g. naive-Bayes token weights, where class-conditional ratios
    * are typically 1.1–1.5×): ceil quantizes most of them to the same
    * integer and the classifier's signal dies. Quarter bits keep the
    * sub-bit structure while staying EXACT INTEGER arithmetic end to
    * end: the whole-bit part `k = floor(log2(a/b))` is FP-seeded then
    * decided by shift comparisons (the [[ceilLog2Ratio]] discipline);
    * the mantissa is fixed-pointed at 2^13 by one integer division
    * `s = (a·2^13) div (b·2^k) ∈ [2^13, 2^14)`, and the fractional
    * quarter-bit index is read off `s⁴`'s magnitude (`s⁴ ∈ [2^52,
    * 2^56)` — fits a long). The 2^13 mantissa truncation makes this a
    * DEFINED deterministic cost function (≈2×10⁻⁴ bit quantization, far
    * below quarter-bit resolution), identical in any engine. Domain:
    * `1 ≤ b ≤ a ≤ 2^49` (token counts — at 2^49 ≈ 5×10¹⁴ tokens per
    * class, revisit the fixed point). */
  def quarterBitsRatio(a: Column, b: Column): Column = {
    val k0 = greatest(lit(0), least(lit(49),
      floor(log2(a.cast(DoubleType) / b.cast(DoubleType))).cast("int")))
    def sh(k: Column) = call_function("shiftleft", b, k)
    val k = when(sh(k0 + 2) <= a, k0 + 2)
      .when(sh(k0 + 1) <= a, k0 + 1)
      .when(sh(k0) <= a, k0)
      .when(k0 >= 1 && sh(k0 - 1) <= a, k0 - 1)
      .otherwise(greatest(lit(0), k0 - 2))
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}
    val s = toCol(IntegralDivide(
      toExpr(call_function("shiftleft", a, lit(13))),
      toExpr(call_function("shiftleft", b, k))))
    val s4 = s * s * s * s
    val j = when(s4 >= lit(1L << 55), 3)
      .when(s4 >= lit(1L << 54), 2)
      .when(s4 >= lit(1L << 53), 1)
      .otherwise(0)
    k.cast(LongType) * lit(4L) + j.cast(LongType)
  }

  /** DuckDB mirror of [[quarterBitsRatio]]: bind `k` first (seed via
    * [[sqlCeilLog2Seed]]'s floor twin [[sqlFloorLog2Seed]], corrected by
    * the same shift CASE), then read the quarter-bit index off the
    * fixed-point mantissa's fourth power. */
  def sqlFloorLog2Seed(a: String, b: String): String =
    s"greatest(0, least(49, CAST(floor(log2($a * 1.0 / $b)) AS INT)))"

  def sqlFloorLog2FromSeed(a: String, b: String, k0: String): String =
    s"""CASE WHEN ($b << ($k0+2)) <= $a THEN $k0+2
        WHEN ($b << ($k0+1)) <= $a THEN $k0+1
        WHEN ($b << $k0) <= $a THEN $k0
        WHEN $k0 >= 1 AND ($b << ($k0-1)) <= $a THEN $k0-1
        ELSE greatest(0, $k0-2) END"""

  /** Quarter-bit cost from already-bound columns `a`, `b`, `k` (the
    * corrected whole-bit floor). */
  def sqlQuarterBitsFromK(a: String, b: String, k: String): String = {
    val s = s"(($a << 13) // ($b << $k))"
    val s4 = s"($s * $s * $s * $s)"
    s"""(4 * CAST($k AS BIGINT) +
        CASE WHEN $s4 >= (CAST(1 AS BIGINT) << 55) THEN 3
             WHEN $s4 >= (CAST(1 AS BIGINT) << 54) THEN 2
             WHEN $s4 >= (CAST(1 AS BIGINT) << 53) THEN 1
             ELSE 0 END)"""
  }

  /** DuckDB mirror of [[ceilLog2Ratio]] as a CASE over columns `a`, `b`
    * and the seed column `k0` (bind the seed first —
    * [[sqlCeilLog2Seed]]). */
  def sqlCeilLog2FromSeed(a: String, b: String, k0: String): String =
    s"""CASE WHEN $k0 >= 2 AND ($b << ($k0-2)) >= $a THEN $k0-2
        WHEN $k0 >= 1 AND ($b << ($k0-1)) >= $a THEN $k0-1
        WHEN ($b << $k0) >= $a THEN $k0
        WHEN ($b << ($k0+1)) >= $a THEN $k0+1
        ELSE $k0+2 END"""

  def sqlCeilLog2Seed(a: String, b: String): String =
    s"greatest(0, least(40, CAST(ceil(log2($a * 1.0 / $b)) AS INT)))"

  /** 48-bit word hash from the md5 hex prefix, reduced mod [[P]].
    * (hex-prefix hashing is engine-portable: DuckDB computes the identical
    * value via ('0x' || substr(md5(w),1,12))::BIGINT). */
  def wordHash(c: Column): Column =
    pmod(conv(substring(md5(c), 1, 12), 16, 10).cast(LongType), lit(P))

  /** Polynomial rolling hash over the word sequence (base 31 mod P),
    * seeded with the first word's hash — order-sensitive, so
    * permutation-distinct documents fingerprint differently. */
  def rollingHash(c: Column): Column = {
    val hashed = transform(tokens(c), wordHash(_))
    when(length(trim(c)) === 0, lit(null).cast(LongType)).otherwise(
      aggregate(
        slice(hashed, lit(2), size(hashed) - 1),
        element_at(hashed, 1),
        (acc, h) => pmod(acc * 31 + h, lit(P))))
  }

  /** Tiny per-language stopword lists for the n-gram language heuristic.
    * Order matters: ties resolve to the earlier language. */
  val stopwords: ListMap[String, Seq[String]] = ListMap(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "que", "y", "los", "una"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "zh" -> Seq("的", "是", "在", "和", "了"))

  def stopwordPattern(lang: String): String =
    "\\b(" + stopwords(lang).mkString("|") + ")\\b"

  def langScore(c: Column, lang: String): Column =
    size(regexp_extract_all(c, lit(stopwordPattern(lang)), lit(0)))

  /** Argmax language over the stopword scores, first-wins on ties. */
  def predictedLang(c: Column): Column = {
    val langs = stopwords.keys.toSeq
    val scores = langs.map(l => l -> langScore(c, l)).toMap
    langs.tail.foldLeft(when(lit(true), lit(langs.head))) { (acc, l) =>
      // l wins only if strictly greater than every earlier language
      val beatsAllBefore = langs.takeWhile(_ != l)
        .map(e => scores(l) > scores(e)).reduce(_ && _)
      when(beatsAllBefore, lit(l)).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1]: stopword density + low punctuation
    * + word-length sanity. Deterministic double arithmetic. */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast(DoubleType)
    val nWords = wsTokenCount(c).cast(DoubleType)
    val punct = length(regexp_replace(c, "[^.,!?;:]", "")).cast(DoubleType)
    val alpha = length(regexp_replace(c, "[^A-Za-z]", "")).cast(DoubleType)
    val stopEn = langScore(c, "en").cast(DoubleType)
    when(nWords === 0, lit(0.0)).otherwise(
      least(stopEn / nWords * lit(2.0), lit(1.0)) * lit(0.4) +
        (lit(1.0) - punct / nChars) * lit(0.3) +
        least(alpha / nWords / lit(10.0), lit(1.0)) * lit(0.3))
  }

  // ---- DuckDB SQL mirrors (string builders for oracle queries) ----

  def sqlWordHash(expr: String): String =
    s"(('0x' || substr(md5($expr),1,12))::BIGINT % $P)"

  def sqlTokens(expr: String): String =
    s"string_split_regex(trim($expr), '\\s+')"

  def sqlLangScore(expr: String, lang: String): String =
    s"len(regexp_extract_all($expr, '${stopwordPattern(lang)}'))"

  def sqlPredictedLang(expr: String): String = {
    val langs = stopwords.keys.toSeq
    // mirror of predictedLang's fold: later langs win only on strict >
    val cases = langs.tail.reverse.map { l =>
      val cond = langs.takeWhile(_ != l)
        .map(e => s"${sqlLangScore(expr, l)} > ${sqlLangScore(expr, e)}")
        .mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE '${langs.head}' END"
  }
}
