package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: points joined to the intervals containing them.
  *
  * The naive formulation (`l.t BETWEEN r.start AND r.end`) has no equi-key,
  * so Spark plans a broadcast-nested-loop / cartesian — O(|L|·|R|) and a
  * cluster-killer at scale. Binning restores an equi-key: points key by
  * their time bin, intervals explode to every bin they overlap, the join
  * is a plain hash equi-join on (key, bin), and the exact containment
  * predicate filters the bin-edge false positives. A point lies in exactly
  * one bin, so no post-join dedup is needed.
  *
  * Cost: |R| × (interval span / binWidth + 1) exploded rows — pick
  * binWidth on the order of the typical interval span.
  */
object RangeJoin {

  /** Inner join of `points` (with a µs-timestamp column `pointTime`) to
    * `intervals` (µs-timestamp columns `startTime`/`endTime`, inclusive
    * start, exclusive end) sharing `key`. Output: all point columns + all
    * interval columns minus the key. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startTime: String, endTime: String,
      binWidthSeconds: Long): DataFrame = {
    val binUs = binWidthSeconds * 1000000L
    def binOf(t: Column): Column = (unix_micros(t) / binUs).cast("long")

    val binned = points.withColumn("_bin", binOf(col(pointTime)))
    val exploded = intervals.withColumn("_bin",
      explode(sequence(binOf(col(startTime)), binOf(col(endTime)))))

    binned.join(exploded,
        Seq(key, "_bin") /* equi-keys */)
      .filter(col(pointTime) >= col(startTime) &&
        col(pointTime) < col(endTime))
      .drop("_bin")
  }
}
