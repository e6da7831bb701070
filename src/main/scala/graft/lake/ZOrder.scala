package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) clustering: lay a table out so that file-level
  * min/max stats ([[ZoneMap]]) prune scans on MORE THAN ONE column.
  *
  * Range-clustering on a single column gives that column tight per-file
  * intervals but leaves every other column's interval spanning the whole
  * domain — a predicate on the second column prunes nothing. Interleaving
  * the bits of both columns' ranks into one sort key walks the
  * two-dimensional space in a locality-preserving curve, so each file
  * covers a small RECTANGLE: both columns get usably tight intervals and
  * either predicate prunes. This is the layout lever behind
  * `OPTIMIZE ... ZORDER BY` in lakehouse engines; the skipping mechanism
  * it feeds is exactly [[ZoneMap]].
  *
  * The ranks are 16-bit min/max-scaled positions (bounds from one
  * bounded driver agg), and the interleave is a pure bitwise Column
  * expression — fully codegen'd, no UDF. The write is
  * `repartitionByRange` + in-partition sort on the z-value: one range
  * exchange, the same cost as any clustered write.
  */
object ZOrder {

  /** Morton-interleave two 16-bit values (bit i of `a` → bit 2i, bit i
    * of `b` → bit 2i+1). Inputs must already be in [0, 65535]. */
  def interleave(a: Column, b: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Min/max-scale a numeric column to a 16-bit rank. Degenerate domains
    * (lo == hi) map to 0. */
  def rank16(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      ((c.cast("double") - lo) / (hi - lo) * 65535.0).cast(LongType)))

  /** `df` laid out along the Morton curve of (`c1`, `c2`): `files`
    * range-partitioned, internally z-sorted partitions. One bounded
    * driver agg for the domain bounds (4 doubles), one range exchange —
    * the shared clustering step of [[clusterWrite]] and the snapshot
    * log's `OPTIMIZE … ZORDER BY` ([[Snapshots.optimizeSmallFiles]]). */
  def clustered(df: DataFrame, files: Int, c1: String, c2: String): DataFrame = {
    val b = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).head()
    // empty input / all-null column → min/max are null; degrade to the
    // documented degenerate domain (lo == hi) so rank16 maps everything to 0
    def d(i: Int): Double = if (b.isNullAt(i)) 0.0 else b.getDouble(i)
    val z = interleave(
      rank16(col(c1), d(0), d(1)),
      rank16(col(c2), d(2), d(3)))
    df.withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Write `df` z-ordered on (`c1`, `c2`) into `files` range-partitioned,
    * internally sorted files, then persist [[ZoneMap]] stats for both
    * columns. */
  def clusterWrite(df: DataFrame, path: String, files: Int,
      c1: String, c2: String): Unit = {
    clustered(df, files, c1, c2)
      .write.mode("overwrite").parquet(path)
    ZoneMap.writeStats(df.sparkSession, path, Seq(c1, c2))
  }
}
