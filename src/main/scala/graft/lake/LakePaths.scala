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
    * quoted root prefix. Codegen'd regexp_replace chain — no UDF. */
  def relFileCol(rootPath: String): Column = {
    val noScheme = regexp_replace(
      regexp_replace(col("_metadata.file_path"),
        lit("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"), lit("")),
      lit("^[a-zA-Z][a-zA-Z0-9+.-]*:"), lit(""))
    regexp_replace(noScheme,
      lit("^" + java.util.regex.Pattern.quote(rootPath + "/")), lit(""))
  }
}
