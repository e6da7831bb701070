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

  /** One published version: data file list plus positional-delete file
    * list (both relative to the table root). Delete files are the
    * Iceberg-positional-delete half of merge-on-read [[merge]]: rows of
    * (file: absolute data-file URI, pos: row index) that [[readAt]]
    * subtracts with a broadcast anti join. */
  final case class Snapshot(version: Int, files: Seq[String],
      deletes: Seq[String] = Nil)

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
    def list(k: String): Option[Seq[String]] =
      (s""""$k":\\[([^\\]]*)\\]""").r.findFirstMatchIn(json).map(
        _.group(1).split(",").toSeq
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
    list("files").map(fs =>
      Snapshot(v, fs, list("deletes").getOrElse(Nil)))
  }

  private def listFresh(spark: SparkSession, dir: String,
      rel: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted.map(f => s"$rel/$f")
  }

  private def publish(spark: SparkSession, table: String, v: Int,
      files: Seq[String], deletes: Seq[String]): Int = {
    val ops = new FileOps(spark.sparkContext.hadoopConfiguration)
    (files ++ deletes).find(f =>
      f.exists(c => c == ',' || c == '"' || c == '\\')).foreach(f =>
      throw new IllegalStateException(s"file name not log-safe: $f"))
    // publish LAST, through tmp+rename of the one small log object — the
    // same single-object atomicity contract as ManifestCommit.publish
    val json = Json.render(Map("version" -> v.toLong, "files" -> files,
      "deletes" -> deletes))
    val tmp = s"${logPath(table, v)}.tmp"
    ops.writeString(tmp, json)
    ops.move(tmp, logPath(table, v))
    v
  }

  private def commit(spark: SparkSession, table: String, df: DataFrame,
      carry: Seq[String], carryDeletes: Seq[String] = Nil): Int = {
    val v = latestVersion(spark, table).getOrElse(0) + 1
    val dataDir = s"$table/_snap/c-$v"
    df.write.mode("overwrite").parquet(dataDir)
    publish(spark, table, v,
      carry ++ listFresh(spark, dataDir, s"_snap/c-$v"), carryDeletes)
  }

  private def latestSnapshot(spark: SparkSession, table: String): Option[Snapshot] =
    latestVersion(spark, table).flatMap(v => snapshot(spark, table, v))

  /** New version = previous version's files (and delete files) + this
    * delta. */
  def append(spark: SparkSession, table: String, df: DataFrame): Int = {
    val prev = latestSnapshot(spark, table)
    commit(spark, table, df, prev.map(_.files).getOrElse(Nil),
      prev.map(_.deletes).getOrElse(Nil))
  }

  /** New version replaces the file list wholesale (old files remain for
    * time travel until vacuumed). */
  def overwrite(spark: SparkSession, table: String, df: DataFrame): Int =
    commit(spark, table, df, Nil)

  /** Time-travel scan: exactly version `v`'s files, minus its positional
    * deletes (broadcast anti join on the reader's hidden file/row-index
    * columns — same shape and scale argument as
    * [[DeletionVectors.read]]). */
  def readAt(spark: SparkSession, table: String, v: Int): Option[DataFrame] =
    snapshot(spark, table, v).map { s =>
      if (s.files.isEmpty) spark.emptyDataFrame
      else {
        // mergeSchema: a version may reference files from commits with
        // DIFFERENT schemas (additive evolution — a later append
        // introduced a column); rows from pre-evolution files surface
        // the new column as null. At 100 TB the union is computed from
        // file FOOTERS, never a data pass.
        val data = spark.read.option("mergeSchema", "true")
          .parquet(s.files.map(f => s"$table/$f"): _*)
        if (s.deletes.isEmpty) data
        else {
          val withMeta = data
            .withColumn("_snap_file", org.apache.spark.sql.functions.col("_metadata.file_path"))
            .withColumn("_snap_pos", org.apache.spark.sql.functions.col("_metadata.row_index"))
          val dels = spark.read.parquet(s.deletes.map(f => s"$table/$f"): _*)
          import org.apache.spark.sql.functions.{broadcast, col}
          withMeta.join(broadcast(dels),
              withMeta("_snap_file") === dels("file") &&
                withMeta("_snap_pos") === dels("pos"),
              "left_anti")
            .drop("_snap_file", "_snap_pos")
        }
      }
    }

  def readLatest(spark: SparkSession, table: String): Option[DataFrame] =
    latestVersion(spark, table).flatMap(v => readAt(spark, table, v))

  /** MERGE (upsert, latest-wins) as a merge-on-read commit — the
    * lakehouse UPDATE path (Iceberg positional-delete MoR): keys present
    * in `changes` replace EVERY live copy (whether in base files or in a
    * prior merge's delta files); new keys insert. One commit =
    *
    *  1. tombstones: the current live rows semi-joined (broadcast) to the
    *     change keys → a positional-delete file (`_snap/d-<v>/`) of
    *     (file, pos);
    *  2. the change rows staged as new data files (`_snap/c-<v>/`);
    *  3. one published log object referencing prior files + delta and
    *     prior deletes + the new delete file.
    *
    * Cost is O(changes) + one scan to locate matches — no data file is
    * rewritten, ever; the rewrite debt is deferred to compaction/vacuum.
    * At 100 TB with MB-sized change batches the tombstone relation stays
    * broadcastable and the scan side never shuffles. */
  def merge(spark: SparkSession, table: String, changes: DataFrame,
      keyCols: Seq[String]): Int = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val prev = latestSnapshot(spark, table)
    val v = prev.map(_.version).getOrElse(0) + 1
    val prevFiles = prev.map(_.files).getOrElse(Nil)
    val prevDeletes = prev.map(_.deletes).getOrElse(Nil)
    val newDeletes: Seq[String] =
      if (prevFiles.isEmpty) Nil
      else {
        val data = spark.read.parquet(prevFiles.map(f => s"$table/$f"): _*)
          .withColumn("_snap_file", col("_metadata.file_path"))
          .withColumn("_snap_pos", col("_metadata.row_index"))
        val live =
          if (prevDeletes.isEmpty) data
          else {
            val dels = spark.read
              .parquet(prevDeletes.map(f => s"$table/$f"): _*)
            data.join(broadcast(dels),
              data("_snap_file") === dels("file") &&
                data("_snap_pos") === dels("pos"),
              "left_anti")
          }
        val keys = changes.select(keyCols.map(col): _*).distinct()
        val tomb = live.join(broadcast(keys), keyCols, "left_semi")
          .select(col("_snap_file").as("file"), col("_snap_pos").as("pos"))
        val dDir = s"$table/_snap/d-$v"
        tomb.coalesce(1).write.mode("overwrite").parquet(dDir)
        listFresh(spark, dDir, s"_snap/d-$v")
      }
    val dataDir = s"$table/_snap/c-$v"
    changes.write.mode("overwrite").parquet(dataDir)
    publish(spark, table, v,
      prevFiles ++ listFresh(spark, dataDir, s"_snap/c-$v"),
      prevDeletes ++ newDeletes)
  }

  /** OPTIMIZE: rewrite the current live view (data minus positional
    * deletes) into fresh compacted files published as a NEW version —
    * the amortized answer to merge-on-read debt. Unlike
    * [[DeletionVectors.compact]]'s in-place swap, history stays intact:
    * prior versions remain time-travelable until [[vacuum]] trims them.
    * Run when the delete ratio or small-file count crosses a threshold;
    * cost is one read+write of the live data, after which scans are
    * anti-join-free again. */
  def optimize(spark: SparkSession, table: String): Option[Int] =
    readLatest(spark, table).map(live => overwrite(spark, table, live))

  /** ROW-level change feed between two versions (the CDF shape): what a
    * downstream consumer must apply to move from `v1`'s state to `v2`'s.
    * Inserts = rows of data files added in the window, minus any of them
    * already tombstoned by `v2`; deletes = the PRIOR images of rows
    * tombstoned in the window, read straight out of the immutable v1
    * files the tombstones point into (merge-on-read means the old bytes
    * are still there — the change feed costs no extra storage). Output
    * carries a `_change_type` column ('insert' | 'delete'); an update
    * appears as its delete + insert pair, exactly like a merge executes.
    * O(changed files + tombstones) — never a diff of the full table. */
  def changesBetween(spark: SparkSession, table: String, v1: Int,
      v2: Int): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    for {
      s1 <- snapshot(spark, table, v1)
      s2 <- snapshot(spark, table, v2)
    } yield {
      val newFiles = s2.files.filterNot(s1.files.toSet)
      val newDeleteFiles = s2.deletes.filterNot(s1.deletes.toSet)
      def withMeta(files: Seq[String]) = spark.read
        .option("mergeSchema", "true")
        .parquet(files.map(f => s"$table/$f"): _*)
        .withColumn("_snap_file", col("_metadata.file_path"))
        .withColumn("_snap_pos", col("_metadata.row_index"))
      val tombs =
        if (newDeleteFiles.isEmpty) None
        else Some(spark.read.parquet(
          newDeleteFiles.map(f => s"$table/$f"): _*))
      val inserts =
        if (newFiles.isEmpty) None
        else Some {
          val rows = withMeta(newFiles)
          tombs.fold(rows)(t => rows.join(broadcast(t),
              rows("_snap_file") === t("file") && rows("_snap_pos") === t("pos"),
              "left_anti"))
            .drop("_snap_file", "_snap_pos")
            .withColumn("_change_type", lit("insert"))
        }
      val deletes = tombs.map { t =>
        val old = withMeta(s1.files)
        old.join(broadcast(t),
            old("_snap_file") === t("file") && old("_snap_pos") === t("pos"),
            "left_semi")
          .drop("_snap_file", "_snap_pos")
          .withColumn("_change_type", lit("delete"))
      }
      (inserts, deletes) match {
        case (Some(i), Some(d)) => i.unionByName(d, allowMissingColumns = true)
        case (Some(i), None) => i
        case (None, Some(d)) => d
        case (None, None) => spark.emptyDataFrame
      }
    }
  }

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
      .flatMap(v => snapshot(spark, table, v))
      .flatMap(s => s.files ++ s.deletes)
      .flatMap(_.split("/").drop(1).headOption).toSet
    val snapRoot = new org.apache.hadoop.fs.Path(s"$table/_snap")
    val fs = snapRoot.getFileSystem(conf)
    if (fs.exists(snapRoot))
      fs.listStatus(snapRoot).foreach { st =>
        if (!live.contains(st.getPath.getName)) fs.delete(st.getPath, true)
      }
  }
}
