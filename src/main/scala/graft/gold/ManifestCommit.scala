package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.lake.{FileOps, Json, Naming}

/** S3-safe commit protocol for gold partitions.
  *
  * The default gold write (`mode("overwrite")` + in-place rename) is atomic
  * on HDFS/local but NOT on object stores: S3 "rename" is a full
  * copy+delete over the data, O(data) and observable half-done. This
  * protocol never renames data:
  *
  *  1. data files land in a fresh, job-unique directory under
  *     `date=D/_commits/c-<id>/` — the underscore prefix makes the whole
  *     tree invisible to Spark/Hive directory listings, so no reader can
  *     half-see an in-flight commit;
  *  2. a tiny `_manifest.json` (file list + row count) is published LAST —
  *     the only atomicity the protocol needs is single-small-object
  *     last-write-wins, which every object store gives a PUT. (Locally the
  *     publish goes through tmp+rename of the manifest only — O(1), never
  *     O(data); an S3A deployment can PUT directly.)
  *
  * Readers resolve the manifest and read exactly its file list
  * ([[readCommitted]]). A crash before publish leaves the previous
  * manifest — and therefore the previous data — fully visible; the orphan
  * staging directory is reclaimed by [[vacuum]]. Concurrent committers
  * race on the manifest PUT: last writer wins wholesale, file lists never
  * interleave. [[vacuum]] is deliberately a SEPARATE step (production runs
  * it after a safety window) so a reader that resolved the old manifest
  * just before a new publish can still finish reading the old files.
  */
object ManifestCommit {

  final case class Manifest(
      commitId: String,
      files: Seq[String], // relative to the partition dir
      rowCount: Long,
      committedAtUtc: String)

  def manifestPath(partitionDir: String): String = s"$partitionDir/_manifest.json"
  def commitsDir(partitionDir: String): String = s"$partitionDir/_commits"

  /** Stage `df` into a fresh commit dir, then publish the manifest.
    * `beforePublish` is a failure-injection point for crash tests — it
    * runs after the data write, before the manifest swap (the window the
    * protocol exists to make safe). */
  def commit(spark: SparkSession, fileOps: FileOps, df: DataFrame,
      partitionDir: String, rowCount: Long,
      beforePublish: () => Unit = () => ()): Manifest = {
    val id = Naming.newRunId()
    val dataDir = s"${commitsDir(partitionDir)}/c-$id"
    df.write.mode("overwrite").parquet(dataDir)
    val staged = listParquet(spark, dataDir)
    val files = staged.map(f => s"_commits/c-$id/$f")
    val m = Manifest(id, files, rowCount, java.time.Instant.now().toString)
    beforePublish()
    publish(fileOps, partitionDir, m)
    m
  }

  private def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted
  }

  /** Publish = atomically replace the single small manifest object. */
  private def publish(fileOps: FileOps, partitionDir: String, m: Manifest): Unit = {
    val json = Json.render(Map(
      "commit_id" -> m.commitId,
      "row_count" -> m.rowCount,
      "committed_at_utc" -> m.committedAtUtc,
      "files" -> m.files))
    val tmp = s"${manifestPath(partitionDir)}.tmp-${m.commitId}"
    fileOps.writeString(tmp, json)
    fileOps.move(tmp, manifestPath(partitionDir))
  }

  /** The committed view, or None if the partition was never published.
    * Parsed with the real JSON parser (graft.lake.Json.parse) — a corrupt
    * manifest throws rather than scraping a partial file list. */
  def read(fileOps: FileOps, partitionDir: String): Option[Manifest] = {
    val path = manifestPath(partitionDir)
    if (!fileOps.exists(path)) return None
    val m = Json.parseObject(fileOps.readString(path))
    for {
      id <- m.get("commit_id").map(_.toString)
      rows <- m.get("row_count").collect { case l: Long => l }
      at <- m.get("committed_at_utc").map(_.toString)
      fs <- m.get("files").map(_.asInstanceOf[Seq[Any]].map(_.toString))
    } yield Manifest(id, fs, rows, at)
  }

  /** Read exactly the committed file set — never a directory listing. */
  def readCommitted(spark: SparkSession, fileOps: FileOps,
      partitionDir: String): Option[DataFrame] =
    read(fileOps, partitionDir).map { m =>
      if (m.files.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(m.files.map(f => s"$partitionDir/$f"): _*)
    }

  /** Reclaim commit directories the current manifest does not reference
    * (crashed stages, lost races). Run OUTSIDE the read path, after a
    * safety window long enough for in-flight readers of the previous
    * manifest to drain. */
  def vacuum(spark: SparkSession, fileOps: FileOps, partitionDir: String): Unit = {
    val live: Set[String] = read(fileOps, partitionDir)
      .map(_.files.flatMap(_.split("/").drop(1).headOption).toSet)
      .getOrElse(Set.empty)
    val cRoot = new org.apache.hadoop.fs.Path(commitsDir(partitionDir))
    val fs = cRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(cRoot))
      fs.listStatus(cRoot).foreach { st =>
        if (!live.contains(st.getPath.getName)) fs.delete(st.getPath, true)
      }
  }
}
