package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join splitting (on in GraftSession) handles most runtime
  * skew; salting is the explicit tool for pathological hot keys known in
  * advance (a null-heavy join key, one customer with half the fact rows):
  * the skewed (large) side gets a uniform random salt in [0, factor); the
  * small side is replicated `factor` times; joining on (key, salt) spreads
  * each hot key over `factor` reducers.
  */
object Skew {

  /** Inner equi-join of a skewed large frame with a small frame on `key`,
    * spreading each key over `factor` partitions. Column sets must be
    * disjoint apart from the key.
    *
    * The salt is `pmod(xxhash64(saltOn), factor)` — a pure function of row
    * content, NOT `rand`: a rand-salt is result-invariant but its reducer
    * packing depends on partition layout, so a retry or a different split
    * count re-bins rows; a content-hash salt assigns every row the same
    * reducer on any layout, any re-run (exactly-once retry semantics at
    * 100 TB). `saltOn` should be a row-distinguishing column of the skewed
    * side (an id, or several columns combined) so the hot key spreads
    * uniformly. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      factor: Int, saltOn: Column): DataFrame = {
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(saltOn), lit(factor.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Key-frequency report to decide whether salting is warranted. */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).count()
      .orderBy(desc("count"))
      .limit(topN)
}
