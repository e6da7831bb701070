package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[TableGroup]] transaction mechanics the q253 gate can't see:
  * stage-phase crashes leaving nothing visible, marker races replaying
  * cleanly, and branch hygiene after publish. */
class TableGroupSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  private def freshGroup(tag: String): String =
    s"${Files.createTempDirectory(s"graft_grp_$tag").toString}/g"

  private def initMembers(group: String): Unit = {
    Snapshots.append(spark, s"$group/a",
      orders.filter(col("o_orderkey") % 2 === 0))
    Snapshots.append(spark, s"$group/b",
      orders.filter(col("o_orderkey") % 2 === 0)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n")))
  }

  private def appendOdd: TableGroup.Write = (table, branch) =>
    Snapshots.appendToBranch(spark, table, branch,
      orders.filter(col("o_orderkey") % 2 === 1))

  test("crash during STAGE leaves nothing visible anywhere") {
    val g = freshGroup("stage")
    initMembers(g)
    intercept[RuntimeException](TableGroup.commitAll(spark, g, Seq(
      "a" -> appendOdd,
      "b" -> ((_, _) => throw new RuntimeException("stage crash")))))
    val evenN = orders.filter(col("o_orderkey") % 2 === 0).count()
    // no marker, so group reads AND main reads both serve the old state
    val r = TableGroup.readAll(spark, g, Seq("a", "b"))
    assert(r("a").count() == evenN)
    assert(Snapshots.readLatest(spark, s"$g/a").get.count() == evenN)
    // no leaked transaction branches: a surviving ref would pin the
    // half-staged versions against vacuum forever
    assert(Snapshots.listBranches(spark, s"$g/a").isEmpty &&
      Snapshots.listBranches(spark, s"$g/b").isEmpty,
      "stage crash must drop the transaction branches")
    // the half-staged transaction replays cleanly
    TableGroup.commitAll(spark, g, Seq("a" -> appendOdd))
    assert(Snapshots.readLatest(spark, s"$g/a").get.count() ==
      orders.count(), "replay after stage crash must land exactly once")
  }

  test("crash after MARK: readAll atomic, rollForward heals, once only") {
    val g = freshGroup("mark")
    initMembers(g)
    val total = orders.count()
    val evenN = orders.filter(col("o_orderkey") % 2 === 0).count()
    intercept[RuntimeException](TableGroup.commitAll(spark, g, Seq(
      "a" -> appendOdd),
      afterMark = () => throw new RuntimeException("publish crash")))
    // marked = durable: the group read serves the WHOLE transaction...
    assert(TableGroup.readAll(spark, g, Seq("a"))("a").count() == total)
    // ...while single-table main readers still see the pre-txn state
    assert(Snapshots.readLatest(spark, s"$g/a").get.count() == evenN)
    TableGroup.rollForward(spark, g)
    assert(Snapshots.readLatest(spark, s"$g/a").get.count() == total,
      "roll-forward must publish the marked transaction")
    // idempotent: a second roll-forward changes nothing, and the txn
    // branch was dropped at publish
    TableGroup.rollForward(spark, g)
    assert(Snapshots.readLatest(spark, s"$g/a").get.count() == total)
    assert(Snapshots.listBranches(spark, s"$g/a").isEmpty,
      "published transaction branches must be dropped")
  }

  test("marker race: loser replays and both transactions land once") {
    val g = freshGroup("race")
    initMembers(g)
    var raced = false
    val outerSeq = TableGroup.commitAll(spark, g, Seq(
      "a" -> ((table, branch) => {
        if (!raced) {
          raced = true
          // a full competing transaction on the OTHER member completes
          // while we are staging: it takes our reserved marker slot
          TableGroup.commitAll(spark, g, Seq("b" -> ((t, br) =>
            Snapshots.appendToBranch(spark, t, br,
              orders.filter(col("o_orderkey") % 2 === 1)
                .groupBy(col("o_orderpriority"))
                .agg(count(lit(1)).as("n"))))))
        }
        Snapshots.appendToBranch(spark, table, branch,
          orders.filter(col("o_orderkey") % 2 === 1))
      })))
    assert(outerSeq == 2, "loser must land on the next marker slot")
    // both effects present exactly once
    assert(Snapshots.readLatest(spark, s"$g/a").get.count() ==
      orders.count())
    val bRows = Snapshots.readLatest(spark, s"$g/b").get.count()
    val prios = orders.select(col("o_orderpriority")).distinct().count()
    assert(bRows == 2 * prios, s"b must hold both appends' rows, got $bRows")
    // the loser's abandoned first-attempt branch is gone from a
    assert(Snapshots.listBranches(spark, s"$g/a").isEmpty)
  }

  test("versionAtMarker: newest pin ≤ seq; skipped members carry; " +
      "unknown refuses") {
    val g = freshGroup("vam")
    initMembers(g)
    // marker 1 writes both members; marker 2 writes only b
    TableGroup.commitAll(spark, g, Seq("a" -> appendOdd, "b" -> appendOdd))
    TableGroup.commitAll(spark, g, Seq("b" -> appendOdd))
    val a1 = TableGroup.versionAtMarker(spark, g, "a", 1).get
    // a at marker 2 = its marker-1 pin (newest pin ≤ 2): a skipped
    // member's cut CARRIES, it doesn't vanish or jump ahead
    assert(TableGroup.versionAtMarker(spark, g, "a", 2).contains(a1))
    // b advanced between the markers
    assert(TableGroup.versionAtMarker(spark, g, "b", 2).get >
      TableGroup.versionAtMarker(spark, g, "b", 1).get)
    // unpublished seq and never-pinned member both refuse (None)
    assert(TableGroup.versionAtMarker(spark, g, "a", 3).isEmpty)
    assert(TableGroup.versionAtMarker(spark, g, "zzz", 1).isEmpty)
  }
}
