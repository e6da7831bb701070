package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: per-file min/max statistics persisted as a
  * sidecar table, used to prune the FILE LIST of a scan before any file
  * is opened.
  *
  * Parquet footers already carry row-group stats, and Spark pushes
  * predicates into them — but only after the file is LISTED and its
  * footer fetched. At 100 TB a table is O(100k) files; on an object
  * store, listing + footer reads are per-file round-trips that dominate
  * short selective queries. Table formats (Delta, Iceberg, Hudi) solve
  * this with file-level stats in the commit log; this module is that
  * mechanism for plain parquet directories: one bounded sidecar read
  * replaces 100k footer fetches, and files whose [min, max] interval
  * cannot contain a match are never touched.
  *
  * Zone maps earn their keep when files are RANGE-CLUSTERED on the
  * predicate column (each file covers a narrow slice); on unclustered
  * layouts every file's interval spans the domain and nothing prunes —
  * the standard pairing is `repartitionByRange` (or Z-order) at write
  * time, as gold compaction already does for its sort keys.
  *
  * Exactness: pruning drops only files that cannot contain a matching
  * row; [[prunedRead]] re-applies the predicate to the surviving files,
  * so results equal a full scan regardless of layout. The sidecar lives
  * under an underscore-prefixed subdirectory, which Spark's file index
  * treats as hidden — readers of the table itself never see it.
  */
object ZoneMap {

  val StatsDir = "_zonemap"

  /** Compute per-file (n_rows, min_c, max_c per stats column) in ONE
    * narrow scan — grouping on the hidden `_metadata.file_path` column —
    * and persist as a single-file parquet sidecar. Stats rows are one
    * per data file: bounded by file count, not data size. */
  def writeStats(spark: SparkSession, table: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "at least one stats column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(table)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$table/$StatsDir")
  }

  /** File paths whose [min_c, max_c] interval overlaps [lo, hi]. Files
    * with all-null `c` have null stats and are dropped — a range
    * predicate cannot match a null. */
  def pruneFiles(spark: SparkSession, table: String, c: String,
      lo: Any, hi: Any): Array[String] =
    spark.read.parquet(s"$table/$StatsDir")
      .filter(col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi))
      .select("file").collect().map(_.getString(0))

  /** Range scan through the zone map: read only overlapping files, then
    * re-apply the exact predicate (boundary files carry out-of-range
    * rows). Result is identical to filtering a full scan. */
  def prunedRead(spark: SparkSession, table: String, c: String,
      lo: Any, hi: Any): DataFrame = {
    val files = pruneFiles(spark, table, c, lo, hi)
    val base =
      if (files.isEmpty) // preserve the schema with an empty relation
        spark.read.parquet(table).filter(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
  }
}
