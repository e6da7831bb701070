package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IncrementalRollupSpec extends SparkTestBase {
  import spark.implicits._

  private def aggOf(df: DataFrame): DataFrame =
    df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_rollup_").toString + "/r"

  test("batches accumulate and a replayed batch cannot double-count") {
    val root = freshRoot()
    val r = new IncrementalRollup(root, Seq("k"), Seq("n", "s"))
    assert(r.read(spark).isEmpty && r.committedBatch.isEmpty)
    r(Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v"), 0L, aggOf)
    r(Seq(("a", 4L), ("c", 7L)).toDF("k", "v"), 1L, aggOf)
    def state() = r.read(spark).get.orderBy("k")
      .as[(String, Long, Long)].collect().toSeq
    val after = state()
    assert(after == Seq(("a", 3L, 7L), ("b", 1L, 10L), ("c", 1L, 7L)))
    assert(r.committedBatch.contains(1L))
    // at-least-once replay of batch 1 (same id): skipped, state unchanged
    r(Seq(("a", 4L), ("c", 7L)).toDF("k", "v"), 1L, aggOf)
    assert(state() == after)
    // ...and an old batch id replayed late is also skipped
    r(Seq(("a", 999L)).toDF("k", "v"), 0L, aggOf)
    assert(state() == after)
  }

  test("a crash between version write and pointer swap stays invisible, then heals") {
    val root = freshRoot()
    val r = new IncrementalRollup(root, Seq("k"), Seq("n", "s"))
    r(Seq(("a", 1L)).toDF("k", "v"), 0L, aggOf)
    // simulate batch 1 crashing AFTER writing v1 but BEFORE the pointer
    // swap: write an orphan (and even corrupt-in-spirit) version dir
    Seq(("a", 100L)).toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .write.parquet(s"$root/v1")
    // readers still see v0 — the orphan was never published
    assert(r.committedBatch.contains(0L))
    assert(r.read(spark).get.as[(String, Long, Long)].collect().toSeq ==
      Seq(("a", 1L, 1L)))
    // the retried batch 1 rewrites v1 and publishes atomically
    r(Seq(("a", 4L)).toDF("k", "v"), 1L, aggOf)
    assert(r.committedBatch.contains(1L))
    assert(r.read(spark).get.as[(String, Long, Long)].collect().toSeq ==
      Seq(("a", 2L, 5L)))
  }
}
