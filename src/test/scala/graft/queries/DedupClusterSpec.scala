package graft.dedup

import graft.SparkTestBase

/** Connected components over near-dup pairs: min-reachable-id labeling on
  * hand-built graphs whose component structure is known. */
class DedupClusterSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toSeq.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and isolated pair each collapse to min id") {
    // chain 1-2-3-4, triangle 10-11-12 (with redundant edge), pair 20-21
    val got = cc((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("a long chain (worst case for plain propagation) still converges") {
    // 0-1-2-...-16 with the distributed pointer-jumping path FORCED
    // (driverMaxEdges=0): the chain's diameter is what the jump step's
    // O(log n) convergence exists for — the default threshold would
    // route this tiny graph to driver union-find and leave it untested
    val chain = (0L until 16L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(chain.toDF("a", "b"),
        driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 16L).map(_ -> 0L).toMap)
  }

  test("edge direction does not matter") {
    assert(cc((5L, 3L), (3L, 9L)) == Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  test("driver union-find and distributed propagation agree") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (7L, 30L), (30L, 8L)).toDF("a", "b")
    def run(threshold: Long) =
      Dedup.connectedComponents(pairs, driverMaxEdges = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // threshold 0 forces the distributed label-propagation path
    assert(run(0L) == run(Long.MaxValue))
  }

  test("incremental CC: no-op batches burn no version, merges touch only affected rows") {
    import spark.implicits._
    import graft.lake.Snapshots
    val table = java.nio.file.Files
      .createTempDirectory("graft_incc").toString + "/labels"
    def labelsNow = Snapshots.readLatest(spark, table).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.incrementalCC(spark, table,
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b"))
    assert(labelsNow == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    val v1 = Snapshots.latestVersion(spark, table).get
    // re-applying known edges: every pair vanishes at the label level
    val vSame = Dedup.incrementalCC(spark, table,
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b"))
    assert(vSame == v1 && Snapshots.latestVersion(spark, table).contains(v1))
    // bridging edge: only the losing component's rows rewrite
    val v2 = Dedup.incrementalCC(spark, table,
      Seq((2L, 3L)).toDF("a", "b"))
    assert(labelsNow == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val feed = Snapshots.changesBetween(spark, table, v1, v2).get
    assert(feed.filter(org.apache.spark.sql.functions
      .col("_change_type") === "insert").count() == 2) // rows 3 and 4 only
  }
}
