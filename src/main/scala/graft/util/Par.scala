package graft.util

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for compute-heavy narrow operators.
  *
  * A scan's task count is bounded by file splits; a small or single-
  * row-group input (like the local test parquet) yields one task, leaving
  * every core but one idle through the expensive pre-shuffle work (md5 per
  * shingle, dot products per pair). Round-robin repartitioning such inputs
  * up to the default parallelism costs one tiny shuffle and unlocks the
  * full machine. On real multi-split inputs (the 100 TB case) the guard is
  * a no-op.
  */
object Par {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
