package graft.lake

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the JSON writer/parser pair that now carries the
  * whole snapshot log and gold manifest: render∘parse must be identity
  * over the value shapes the log writes (nested maps/seqs of strings,
  * longs, doubles, booleans), including every escape-worthy character,
  * and malformed input must throw rather than scrape partial content. */
class JsonSpec extends AnyFunSuite {

  private val scalar: Gen[Any] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.oneOf("\"quoted\"", "back\\slash", "tab\tnl\ncr\r", "ctl",
      "unié中", ""),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(l => l: Any),
    Gen.chooseNum(-1e12, 1e12).map(d => d: Any),
    Gen.oneOf(true, false).map(b => b: Any))

  private def value(depth: Int): Gen[Any] =
    if (depth <= 0) scalar
    else Gen.frequency(
      3 -> scalar,
      1 -> Gen.listOfN(3, value(depth - 1)).map(_.toSeq),
      1 -> (for {
        ks <- Gen.listOfN(3, Gen.alphaNumStr.suchThat(_.nonEmpty))
        vs <- Gen.listOfN(3, value(depth - 1))
      } yield ks.distinct.zip(vs).toMap))

  test("render then parse is identity over log-shaped values") {
    val cases = Gen.listOfN(200, value(3)).sample.get
    cases.foreach { v =>
      val parsed = Json.parse(Json.render(v))
      assert(parsed == v, s"round-trip drift for $v -> $parsed")
    }
  }

  test("doubles survive when integral longs stay longs") {
    assert(Json.parse("1") == 1L)
    assert(Json.parse("-7") == -7L)
    assert(Json.parse("1.5") == 1.5)
    assert(Json.parse("-2.25e2") == -225.0)
    assert(Json.parse(Json.render(Map("a" -> 3L, "b" -> 3.0))) ==
      Map("a" -> 3L, "b" -> 3.0))
  }

  test("malformed input throws instead of scraping partial content") {
    for (bad <- Seq("", "{", "[1,", "{\"a\":}", "{\"a\":1,}x", "\"unterminated",
        "{\"a\" 1}", "tru", "[1 2]", "{\"a\":1}trailing"))
      intercept[IllegalArgumentException](Json.parse(bad))
  }

  test("nested log shape round-trips exactly") {
    val log = Map(
      "version" -> 7L,
      "manifests" -> Seq("m-abc", "m-def"),
      "deletes" -> Seq.empty[Any],
      "renames" -> Seq(Seq("o_chan", "o_channel")),
      "stats" -> Map("f.parquet" -> Map("c" ->
        Map("min" -> 1.25, "max" -> 88.0))))
    assert(Json.parse(Json.render(log)) == log)
  }
}
