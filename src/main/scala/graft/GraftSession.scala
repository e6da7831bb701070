package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession builder so every entry point (Verify, Bench, tests,
  * CLI apps) runs with the same scale-oriented configuration.
  *
  * - shuffle partitions sized to the local core count (the 200 default is a
  *   cluster setting; AQE coalesces further at runtime)
  * - AQE on: runtime shuffle coalescing + skew-join splitting — the local
  *   stand-in for what we'd rely on at 100 TB
  * - UTC session time zone for oracle parity
  * - nanos parquet timestamps surfaced as longs (Spark rejects
  *   TIMESTAMP(NANOS) natively); loaders truncate to µs timestamps
  */
object GraftSession {

  def builder(master: String = defaultMaster, cpus: Int = defaultCpus): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // custom planner strategies (native as-of join, graft.plans)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // generated-class cache sized to the query surface: the 100-entry
      // default thrashes across a ~185-query session (every evicted
      // stage pays a full janino recompile on its next pass — measured
      // q158 1.5 s isolated vs 3.6 s late in a full bench run, and the
      // same churn afflicts a real multi-tenant SQL server); entries are
      // weak-ref'd bytecode, tens of MB at worst
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE (r18, measured and rejected): lowering
      // spark.sql.adaptive.coalescePartitions.minPartitionSize to 16k
      // to keep tiny-bytes/heavy-CPU shuffles parallel was a 40% NET
      // LOSS on the lifecycle families (160.4s vs 114.5s over the same
      // 16-query subset) — every KB-scale exchange in every commit then
      // fans into ~14 tasks and job-count-heavy queries drown in task
      // overhead. Queries whose shuffle moves a lightweight proxy with
      // heavy per-row verify compute (q105) instead pin their
      // parallelism EXPLICITLY at the one exchange that needs it.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ms/µs parquet timestamps surface as LTZ instants (UTC session)
      // rather than NTZ — keeps unix_micros & friends applicable everywhere
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // RocksDB by default: heap (HDFSBacked) state caps at executor
      // memory, RocksDB is the provider a 100 TB-state deployment runs
      // (off-heap, spillable), so the correctness gate and bench exercise
      // it rather than the toy provider. SPARK_GRAFT_STATE_STORE=hdfs
      // opts back into the heap provider.
      .config("spark.sql.streaming.stateStore.providerClass",
        stateStoreProvider)
      // production RocksDB posture: commit uploads the per-batch changelog
      // instead of a full snapshot (snapshots compact in the background) —
      // at 100 TB state this is the difference between O(delta) and
      // O(state) per-batch checkpoint cost
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      // bucketed layouts here are deliberate zones (q108's co-located
      // join, q122's term-bucketed index): keep bucketed scans even when
      // the planner sees no distribution benefit — the auto-disable rule
      // (DisableUnnecessaryBucketedScan) also drops BUCKET PRUNING, which
      // is the entire point of the q122 index lookup ("Bucketed: false
      // (disabled by query planner)" would read all 16 buckets for a
      // 5-term query)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      // distributed file-listing cutover (default 32 paths): snapshot
      // reads pass EXPLICIT per-commit file lists, so "listing" a path
      // is one FS status call, not a directory walk — the driver's own
      // listing pool handles hundreds of such paths faster than
      // scheduling a cluster job for them. Log-served scans skip the
      // listing entirely; this covers the remaining path-list readers
      // (catalog DSv2 tables, mixed-schema fallbacks). Parameterized
      // for deployments whose listings ARE directory walks.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LISTING_JOB_THRESHOLD", "512"))
      .config("spark.ui.enabled", "false")

  /** Streaming state-store provider class from SPARK_GRAFT_STATE_STORE
    * (`rocksdb` default | `hdfs`). */
  def stateStoreProvider: String =
    sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "rocksdb") match {
      case "hdfs" =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      case _ =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    }

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder().appName(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def defaultMaster: String = s"local[$defaultCpus]"
}
