package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (latest-prior) join: for every left row, attach the right row with
  * the greatest right-time ≤ left-time within the same key.
  *
  * Spark has no native as-of join; the preference order in this codebase is
  * compose-first (SURVEY §2), and the composition is exactly as scalable as
  * a purpose-built physical operator here: tag both sides, union, and carry
  * the last-seen right row over a keyed time-ordered window. One shuffle on
  * the key, a linear merge per key — never the O(|L|·|R|) blowup of the
  * naive range-join formulation.
  *
  * Ties: a right row at exactly the left row's time matches (inclusive),
  * ordered by side so right sorts first. Multiple right rows sharing
  * (key, time) are the caller's ambiguity — dedupe first (see
  * `latestPerKeyTime`).
  */
object AsOfJoin {

  /** Left as-of join. Output columns: all of `left`, then `right`'s
    * columns minus the key (null when no prior right row exists). */
  def latestPrior(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val rightValueCols = right.columns.filterNot(_ == key).toSeq
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields.filterNot(_.name == key))

    val leftU = left.select(col(key).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_side"),
      struct(left.columns.map(col).toSeq: _*).as("_l"),
      lit(null).cast(rStruct).as("_r"))
    val rightU = right.select(col(key).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"),
      lit(null).cast(lStruct).as("_l"),
      struct(rightValueCols.map(col): _*).as("_r"))

    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = leftU.unionByName(rightU)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))

    val outCols: Seq[Column] =
      left.columns.toSeq.map(c => col(s"_l.$c").as(c)) ++
        rightValueCols.map(c => col(s"_match.$c").as(c))
    carried.filter(col("_side") === 1).select(outCols: _*)
  }

  /** Deterministic right-side dedup for as-of inputs: one row per
    * (key, time), keeping the row with the greatest tiebreak column.
    *
    * The window partitions by KEY ALONE (ordered by time, tiebreak
    * descending; a (key, time) run's first row is its max-tiebreak row)
    * rather than by (key, time): the output then stays hash-partitioned
    * on exactly the key, which satisfies the as-of join's clustering
    * requirement directly — one shuffle for dedup + join instead of two
    * back-to-back exchanges of the same relation. */
  def latestPerKeyTime(df: DataFrame, key: String, time: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(time), desc(tiebreak))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_prev_t", lag(col(time), 1).over(w))
      // keep a row iff it starts a new time run; `<=>` (null-safe equal)
      // makes repeated NULL times dedup like values, and the row_number
      // test keeps a partition's genuine first row even when its time is
      // NULL (lag is NULL there too, so `<=>` alone would drop it)
      .filter(col("_rn") === 1 || !(col("_prev_t") <=> col(time)))
      .drop("_rn", "_prev_t")
  }
}
