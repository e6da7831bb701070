package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized aggregate: fold a new
  * batch's partial aggregate into the stored aggregate table without
  * rescanning history.
  *
  * A gold rollup recomputed from scratch costs a full fact scan per
  * refresh — at 100 TB that is the refresh bottleneck, and it grows with
  * history forever. For ALGEBRAIC measures (sums, counts — anything
  * where merge(agg(A), agg(B)) = agg(A ∪ B)), the delta batch can be
  * aggregated alone and merged into the stored table on the group keys:
  * the refresh cost becomes O(|delta| + |stored agg|), independent of
  * history size. Averages derive downstream as sum/count; exact money
  * merges stay exact because the stored measures are integral cents
  * ([[graft.queries.Num]]), which re-sum associatively.
  *
  * Non-algebraic measures (exact distinct counts, exact quantiles) do
  * NOT merge; their incremental forms are the mergeable sketches already
  * in the engine (HLL q54, KLL q56, CMS q68).
  */
object IncrementalAgg {

  /** Merge a delta partial aggregate into the stored aggregate: both
    * sides carry `keys` plus the measure columns, every measure re-sums.
    * One shuffle, keyed on the group keys, over agg-sized inputs. */
  def merge(stored: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(measures.nonEmpty, "at least one measure")
    val aggs = measures.map(c => sum(col(c)).as(c))
    stored.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
