package graft.operators

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("latest prior row wins; equal timestamps match inclusively; no prior → null") {
    val left = Seq((1, 5, "d"), (1, 10, "a"), (1, 20, "b"), (2, 15, "c"))
      .toDF("k", "t", "lv")
    val right = Seq((1, 10, "X"), (1, 18, "Y"), (2, 99, "Z"))
      .toDF("k", "rt", "rv")
    val out = AsOfJoin.latestPrior(left, right, "k", "t", "rt")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        Option(r.get(3)).map(_ => r.getString(4)))).toSet
    // mirrors the DuckDB ASOF LEFT JOIN result on the same rows
    assert(out == Set(
      (1, 5, None), // no right row at or before t=5
      (1, 10, Some("X")), // equal timestamp matches
      (1, 20, Some("Y")), // latest prior, not just any prior
      (2, 15, None))) // right row exists for the key but only later
  }

  test("right dedup keeps the greatest tiebreak per (key, time)") {
    val df = Seq((1, 10, 100L), (1, 10, 200L), (1, 11, 50L))
      .toDF("k", "t", "id")
    val kept = AsOfJoin.latestPerKeyTime(df, "k", "t", "id")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(kept == Set((10, 200L), (11, 50L)))
  }
}
