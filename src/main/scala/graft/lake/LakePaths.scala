package graft.lake

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Table-relative file references for merge-on-read metadata.
  *
  * Positional tombstones ([[DeletionVectors]], [[Snapshots.merge]]) key
  * rows by (data file, row index). Storing the ABSOLUTE
  * `_metadata.file_path` URI couples every sidecar to one spelling of
  * one location: relocate the table directory (or read it via a
  * differently-qualified path) and the anti-join silently matches
  * nothing — deleted rows resurrect with no error. Both the write side
  * and the read side therefore normalize to TABLE-RELATIVE paths, the
  * same way the snapshot log references its data files: strip the URI
  * scheme/authority, then the normalized table root. The normalization
  * is applied identically to the stored reference and to the scan's
  * `_metadata.file_path` at read time, so equality survives relocation
  * and any `file:/` vs `file:///` spelling difference.
  */
object LakePaths {

  /** The table root as a scheme-free absolute path (URI path component
    * of the fully-qualified location). */
  def tableRootPath(spark: SparkSession, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toUri.getPath
  }

  /** `_metadata.file_path` → path relative to `rootPath`: two
    * scheme-strips (`scheme://authority` and bare `scheme:`) then the
    * quoted root prefix. Codegen'd — no UDF.
    *
    * FAST PATH (r19, guide §1.2 per-task work): the two qualified
    * spellings of THIS root — `file:<root>/` and `file://<root>/`
    * (empty authority) — resolve with one startsWith + substring,
    * ~ns per row, where the three-regex chain measured ~6µs per row
    * (q312's MoR scans spent ~900ms CPU per 150k-row stage in it, and
    * EVERY merge-on-read scan pays this column). Any other spelling
    * (object-store schemes, unqualified paths, roots not under the
    * prefix) falls through to the regex chain unchanged, so results
    * are bit-identical; a production deployment on another scheme adds
    * its spelling here or rides the exact fallback. */
  def relFileCol(rootPath: String): Column = {
    val p = col("_metadata.file_path")
    val noScheme = regexp_replace(
      regexp_replace(p,
        lit("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"), lit("")),
      lit("^[a-zA-Z][a-zA-Z0-9+.-]*:"), lit(""))
    val slow = regexp_replace(noScheme,
      lit("^" + java.util.regex.Pattern.quote(rootPath + "/")), lit(""))
    val pref1 = s"file:$rootPath/"
    val pref2 = s"file://$rootPath/"
    when(p.startsWith(pref1), p.substr(lit(pref1.length + 1), length(p)))
      .when(p.startsWith(pref2), p.substr(lit(pref2.length + 1), length(p)))
      .otherwise(slow)
  }
}
