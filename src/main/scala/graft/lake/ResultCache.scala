package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERSION-PINNED QUERY RESULT CACHE — materialized result reuse made
  * SOUND by the snapshot log (the thing a plain file-based warehouse
  * can never have): a cached result is keyed by the canonicalized
  * logical plan PLUS the exact log version of every snapshot table it
  * read, so a hit is provably the same computation over provably the
  * same data — no TTLs, no "probably fresh", no invalidation daemon.
  * Any commit to any input table changes the key, which orphans the
  * old entry (reclaimed by [[sweep]]) and recomputes on next request.
  *
  * The 100 TB shape: dashboard/report queries repeat verbatim against
  * tables that commit a few times an hour. Between commits every
  * repeat is served from the KB..MB result parquet instead of a
  * corpus scan; after a commit exactly the affected queries recompute.
  * Concurrent misses on one key race benignly — both compute, one
  * rename publishes, the loser's work is discarded (same
  * staging+rename discipline as the ingest sinks). */
object ResultCache {

  /** Stable key: canonicalized analyzed plan (exprIds normalized) +
    * each input table's pinned log version. `toJSON`, not `toString`:
    * tree strings truncate long field lists (maxToStringFields), and a
    * truncated key would let two DIFFERENT plans collide — a false hit
    * is the one failure a result cache must make impossible. */
  private def cacheKey(spark: SparkSession, df: DataFrame,
      tables: Seq[String]): String = {
    val plan = df.queryExecution.analyzed.canonicalized.toJSON
    val pins = tables.sorted
      .map(t => s"$t@${Snapshots.latestVersion(spark, t).getOrElse(0)}")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(plan.getBytes("UTF-8"))
    pins.foreach(p => md.update(p.getBytes("UTF-8")))
    md.digest().take(16).map(b => f"$b%02x").mkString
  }

  /** Serve `df`'s result through the cache at `cacheRoot`, declaring
    * the snapshot `tables` it reads. Hit = one parquet read of the
    * materialized result; miss = compute once, publish by atomic
    * rename, serve the published copy. The returned frame ALWAYS scans
    * only the cache entry — callers can pin cache service by
    * inspecting `inputFiles`. */
  def through(spark: SparkSession, cacheRoot: String, df: DataFrame,
      tables: Seq[String]): DataFrame = {
    val key = cacheKey(spark, df, tables)
    val dir = s"$cacheRoot/r-$key"
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) {
      val tmp = new org.apache.hadoop.fs.Path(
        s"$cacheRoot/.tmp-$key-${Naming.newRunId()}")
      df.write.mode("overwrite").parquet(tmp.toString)
      // exclusive publish: the first renamer wins, a racing miss's
      // work is deleted — never a torn or doubled entry
      if (!fs.rename(tmp, p)) fs.delete(tmp, true)
    }
    spark.read.parquet(dir)
  }

  /** Drop every entry not in `liveKeys` — or, the practical form,
    * every entry older than `maxAgeMs` (orphaned keys stop being
    * requested the moment their input versions move on, so age is the
    * honest reclamation signal). */
  def sweep(spark: SparkSession, cacheRoot: String, maxAgeMs: Long): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(cacheRoot)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return 0
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val stale = fs.listStatus(root).toSeq.filter { st =>
      st.getPath.getName.startsWith("r-") &&
        st.getModificationTime < cutoff
    }
    stale.foreach(st => fs.delete(st.getPath, true))
    stale.size
  }
}
