package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot log — TIME TRAVEL and file-level incremental reads
  * over an append-mostly table, the transaction-log shape (Delta `_delta_
  * log` / Iceberg snapshot list) layered on [[ManifestCommit]]'s
  * staging discipline:
  *
  *  - every commit stages its NEW data files into a version-unique
  *    directory (`_snap/c-<v>/`, underscore-invisible to plain readers)
  *    and then publishes `_log/v<N>.json` — the complete file list of
  *    that version (previous files carried forward by reference for
  *    appends, dropped for overwrites). Data files are immutable and
  *    SHARED between versions; an append writes only its delta.
  *  - reads resolve one small log object and read exactly its file list:
  *    `readAt(v)` is the time-travel scan (audits, reproducible training
  *    runs pinned to a data version); `latest` is the current view.
  *  - `newFilesBetween(v1, v2)` is the incremental-processing source: the
  *    files added after v1 — O(log) metadata, no table diff — which is
  *    how a downstream job consumes "what changed" without CDC columns.
  *
  * Scale shape: log objects are KBs regardless of table size; version
  * resolution never lists data directories (object-store listings are
  * slow AND eventually consistent); snapshots share unchanged files so N
  * versions of a 100 TB table cost 100 TB + deltas, not N×100 TB.
  */
object Snapshots {

  final case class Snapshot(version: Int, files: Seq[String])

  private def logDir(table: String) = s"$table/_log"
  private def logPath(table: String, v: Int) = f"${logDir(table)}/v$v%06d.json"

  def latestVersion(spark: SparkSession, table: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(logDir(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val vs = fs.listStatus(p).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
          n.stripPrefix("v").stripSuffix(".json").toInt }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  def snapshot(spark: SparkSession, table: String, v: Int): Option[Snapshot] = {
    val ops = new FileOps(spark.sparkContext.hadoopConfiguration)
    val path = logPath(table, v)
    if (!ops.exists(path)) return None
    val json = ops.readString(path)
    """"files":\[([^\]]*)\]""".r.findFirstMatchIn(json).map { m =>
      Snapshot(v, m.group(1).split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
    }
  }

  private def commit(spark: SparkSession, table: String, df: DataFrame,
      carry: Seq[String]): Int = {
    val ops = new FileOps(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(spark, table).getOrElse(0) + 1
    val dataDir = s"$table/_snap/c-$v"
    df.write.mode("overwrite").parquet(dataDir)
    val p = new org.apache.hadoop.fs.Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted.map(f => s"_snap/c-$v/$f")
    val files = carry ++ fresh
    files.find(f => f.exists(c => c == ',' || c == '"' || c == '\\')).foreach(f =>
      throw new IllegalStateException(s"file name not log-safe: $f"))
    // publish LAST, through tmp+rename of the one small log object — the
    // same single-object atomicity contract as ManifestCommit.publish
    val json = Json.render(Map("version" -> v.toLong, "files" -> files))
    val tmp = s"${logPath(table, v)}.tmp"
    ops.writeString(tmp, json)
    ops.move(tmp, logPath(table, v))
    v
  }

  /** New version = previous version's files + this delta. */
  def append(spark: SparkSession, table: String, df: DataFrame): Int = {
    val carry = latestVersion(spark, table)
      .flatMap(v => snapshot(spark, table, v)).map(_.files).getOrElse(Nil)
    commit(spark, table, df, carry)
  }

  /** New version replaces the file list wholesale (old files remain for
    * time travel until vacuumed). */
  def overwrite(spark: SparkSession, table: String, df: DataFrame): Int =
    commit(spark, table, df, Nil)

  /** Time-travel scan: exactly version `v`'s files. */
  def readAt(spark: SparkSession, table: String, v: Int): Option[DataFrame] =
    snapshot(spark, table, v).map { s =>
      if (s.files.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(s.files.map(f => s"$table/$f"): _*)
    }

  def readLatest(spark: SparkSession, table: String): Option[DataFrame] =
    latestVersion(spark, table).flatMap(v => readAt(spark, table, v))

  /** Files present at `v2` but not at `v1` — the incremental-read source
    * for downstream jobs (file-level change feed). */
  def newFilesBetween(spark: SparkSession, table: String, v1: Int,
      v2: Int): Seq[String] = {
    val a = snapshot(spark, table, v1).map(_.files.toSet).getOrElse(Set.empty)
    val b = snapshot(spark, table, v2).map(_.files).getOrElse(Nil)
    b.filterNot(a)
  }

  /** Drop data files no live log version references (after retention
    * trims old log entries). Kept O(versions·files) metadata work. */
  def vacuum(spark: SparkSession, table: String, keepFrom: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val ops = new FileOps(conf)
    val latest = latestVersion(spark, table).getOrElse(return)
    // trim log entries below keepFrom
    (1 until keepFrom).foreach(v => ops.delete(logPath(table, v)))
    val live = (keepFrom to latest)
      .flatMap(v => snapshot(spark, table, v)).flatMap(_.files)
      .flatMap(_.split("/").drop(1).headOption).toSet
    val snapRoot = new org.apache.hadoop.fs.Path(s"$table/_snap")
    val fs = snapRoot.getFileSystem(conf)
    if (fs.exists(snapRoot))
      fs.listStatus(snapRoot).foreach { st =>
        if (!live.contains(st.getPath.getName)) fs.delete(st.getPath, true)
      }
  }
}
