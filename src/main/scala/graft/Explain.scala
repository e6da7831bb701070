package graft

/** Plan inspector: prints the formatted physical plan for each named query
  * (or all) so scan pruning (ReadSchema/PushedFilters), join strategies
  * (broadcast vs shuffle), and WholeStageCodegen coverage can be reviewed.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  * Set GRAFT_EXPLAIN_OUT to also write the plans to a file.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get("graft-explain")
    val sb = new StringBuilder
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        sb.append(s"\n========== $name ==========\n")
        try sb.append(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => sb.append(s"(failed: ${e.getMessage})") }
      }
    }
    println(sb.toString)
    sys.env.get("GRAFT_EXPLAIN_OUT").foreach { f =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f), sb.toString)
    }
    spark.stop()
  }
}
