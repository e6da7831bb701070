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
  /** CONTRACT — call on BASE FILE SCANS only (a frame whose partitioning
    * is still the scan's split layout, before any shuffle/aggregate).
    * The guard decides from `df.inputFiles`, which reflects the
    * underlying scans, not the frame's current partitioning: on a
    * post-shuffle or in-memory relation `inputFiles` is empty and the
    * guard is deliberately a no-op, and on a derived plan it would
    * mis-estimate — all internal callers apply it directly to the
    * `Tables(...)` scan before any wide transform. */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // decide from scan metadata, not df.rdd.getNumPartitions: the latter
    // forces a full extra physical-plan + RDD materialization per call.
    // inputFiles inspects the resolved logical scan only; when the file
    // count alone is inconclusive (< target), estimate the scan's split
    // count from file sizes (a handful of driver-side FS metadata calls,
    // bounded by target) so a single LARGE file that naturally splits
    // wide is left alone. Non-file sources (0 files) are left alone.
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) return df
    val maxSplitBytes = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(df.sparkSession.conf
        .get("spark.sql.files.maxPartitionBytes", "128MB"))
    val fs = new org.apache.hadoop.fs.Path(files.head)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val estSplits = files.map { f =>
      val len = fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
      math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
    }.sum
    if (estSplits < target) df.repartition(target) else df
  }
}
