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
    // decide from the scan's file list, not df.rdd.getNumPartitions: the
    // latter forces a full extra physical-plan + RDD materialization per
    // call, while inputFiles only inspects the resolved logical scan. A
    // many-split single file may get one redundant (cheap) repartition;
    // non-file sources (0 files) are left alone.
    val nFiles = df.inputFiles.length
    if (nFiles > 0 && nFiles < target) df.repartition(target) else df
  }
}
