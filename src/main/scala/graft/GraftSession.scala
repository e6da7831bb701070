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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ms/µs parquet timestamps surface as LTZ instants (UTC session)
      // rather than NTZ — keeps unix_micros & friends applicable everywhere
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

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
