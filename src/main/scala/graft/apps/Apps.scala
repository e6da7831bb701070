package graft.apps

import graft.GraftSession
import graft.gold.GoldCompaction
import graft.lake.LakeLayout
import graft.queries.LakeCatalog
import graft.streaming.StreamingIngest

/** CLI entry points (SURVEY §7 app layer). Plain-args, no config deps. */

/** Ingest every file currently in `<lakeRoot>/raw`.
  * Usage: runMain graft.apps.IngestApp <lakeRoot> [--referenceNullDq] */
object IngestApp {
  def main(args: Array[String]): Unit = {
    val layout = LakeLayout(args(0))
    val strict = !args.contains("--referenceNullDq")
    val spark = GraftSession.get("graft-ingest")
    val tick = StreamingIngest.pollOnce(spark, layout, strict)
    tick.ingested.foreach { case (f, r) =>
      println(s"[ingest] $f: total=${r.totalRows} good=${r.goodRows} " +
        s"rejects=${r.rejectsByReason}")
    }
    tick.rejected.foreach { case (f, e) => println(s"[ingest] $f REJECTED: $e") }
    spark.stop()
  }
}

/** Compact processed partitions into gold.
  * Usage: runMain graft.apps.CompactApp <lakeRoot> [maxPartitions]
  *   [--reprocess] [--force_dates=d1,d2,...] */
object CompactApp {
  def main(args: Array[String]): Unit = {
    val layout = LakeLayout(args(0))
    val maxP = args.lift(1).filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(10)
    val force = args.find(_.startsWith("--force_dates="))
      .map(_.stripPrefix("--force_dates=").split(',').toSeq.filter(_.nonEmpty))
      .getOrElse(Nil)
    val conf = GoldCompaction.Conf(layout, maxPartitions = maxP,
      reprocess = args.contains("--reprocess"), forceDates = force)
    val spark = GraftSession.get("graft-compact")
    val summary = GoldCompaction.run(spark, conf)
    summary.results.foreach(m => println(s"[compact] ${m.target_date}: " +
      s"${m.status} rows=${m.rows_after_dedup} dups=${m.duplicate_rows_removed}"))
    spark.stop()
  }
}

/** Run the analyst SQL surface over gold.
  * Usage: runMain graft.apps.QueryApp <lakeRoot> <daily|top> */
object QueryApp {
  def main(args: Array[String]): Unit = {
    val layout = LakeLayout(args(0))
    val spark = GraftSession.get("graft-query")
    LakeCatalog.registerFactSales(spark, layout)
    val df = args.lift(1) match {
      case Some("top") => LakeCatalog.topProducts(spark)
      case _ => LakeCatalog.dailyRevenue(spark)
    }
    df.show(50, truncate = false)
    spark.stop()
  }
}
