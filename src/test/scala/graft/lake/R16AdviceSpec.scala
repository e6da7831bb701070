package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-16 hardening pins, one per adjudicated ADVICE finding:
  *
  *  1. MV refresh must fold NULL grouping keys null-safely — a
  *     null-unsafe full_outer join splits a NULL-keyed group into a
  *     stale old row plus a delta-only row and the view silently
  *     drifts from the recompute it promises to equal.
  *  2. TRUNCATE must leave a table that still READS — empty, with the
  *     pre-truncate schema — from both SQL (catalog resolution) and
  *     the programmatic read path (a zero-file version used to be
  *     schemaless and SELECT failed).
  *  3. alterTable pre-validates the WHOLE change set before its first
  *     commit: a mixed statement with one invalid member must apply
  *     NOTHING (it used to apply earlier members then throw).
  *  4. REPLACE WHERE predicates round-trip through SQL text with
  *     qualifiers stripped — a resolved attribute rendering as
  *     `t.col` used to fail re-resolution inside the commit.
  *  5. ADD COLUMN refuses a DEFAULT whose type cannot up-cast to the
  *     declared type at DDL time — it used to pass and every read
  *     silently filled NULL.
  */
class R16AdviceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_r16_$tag").toString

  private def freshCatalog(tag: String): (String, String) = {
    val root = fresh(tag)
    val cat = s"r16_${tag}_${System.nanoTime().toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  // ------------------------------------------------------------- 1. MV

  test("MV refresh keeps a NULL-keyed group exact across rounds") {
    val root = fresh("mvnull")
    val src = s"$root/src"
    val mv = s"$root/mv"
    // grp is NULL for every 5th order — the group under test
    def keyed(df: org.apache.spark.sql.DataFrame) = df.select(
      when(col("o_orderkey") % 5 === 0, lit(null))
        .otherwise(col("o_orderpriority")).as("grp"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    Snapshots.append(spark, src, keyed(orders.filter(col("o_orderkey") % 2 === 0)))
    MaterializedViews.create(spark, mv, src,
      "SELECT grp, COUNT(*) AS n, SUM(cents) AS s FROM c.src GROUP BY grp")
    Snapshots.append(spark, src, keyed(orders.filter(col("o_orderkey") % 2 === 1)))
    MaterializedViews.refresh(spark, mv)
    val got = Snapshots.readLatest(spark, mv).get.select("grp", "n", "s")
    val want = Snapshots.readLatest(spark, src).get
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("cents").as("s"))
    // exact multiset equality — in particular ONE row for grp IS NULL
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.filter(col("grp").isNull).count() == 1)
  }

  // ------------------------------------------------------- 2. TRUNCATE

  test("TRUNCATE leaves an empty table that still reads with its schema") {
    val (cat, root) = freshCatalog("trunc")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders)
    val schemaBefore = Snapshots.readLatest(spark, t).get.schema
    spark.sql(s"TRUNCATE TABLE $cat.t")
    // SQL resolution serves the empty table WITH the schema
    val sel = spark.sql(s"SELECT * FROM $cat.t")
    assert(sel.count() == 0)
    assert(sel.schema.fieldNames.toSeq == schemaBefore.fieldNames.toSeq)
    // programmatic read path agrees
    val prog = Snapshots.readLatest(spark, t).get
    assert(prog.count() == 0 &&
      prog.schema.fieldNames.toSeq == schemaBefore.fieldNames.toSeq)
    // the table keeps working: a post-truncate append reads back alone
    Snapshots.append(spark, t, orders.limit(7))
    assert(spark.sql(s"SELECT * FROM $cat.t").count() == 7)
    // history below the truncate stays time-travelable
    assert(Snapshots.readAt(spark, t, 1).get.count() == orders.count())
  }

  // ----------------------------------------------- 3. alterTable atomicity

  test("a mixed ALTER with one invalid member applies nothing") {
    val (cat, root) = freshCatalog("alter")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders.limit(20))
    val before = Snapshots.latestVersion(spark, t).get
    // b collides with an existing column — the whole statement must
    // refuse BEFORE the first commit, so column a never appears
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t ADD COLUMNS (a INT, o_orderkey INT)"))
    assert(Snapshots.latestVersion(spark, t).contains(before))
    assert(!Snapshots.readLatest(spark, t).get
      .schema.fieldNames.contains("a"))
    // rename whose target collides, mixed with a valid drop: nothing
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t RENAME COLUMN o_custkey TO o_orderkey"))
    assert(Snapshots.latestVersion(spark, t).contains(before))
    // drop of a missing column mixed after a valid rename: nothing
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t DROP COLUMN no_such_col"))
    assert(Snapshots.latestVersion(spark, t).contains(before))
    assert(Snapshots.readLatest(spark, t).get
      .schema.fieldNames.contains("o_custkey"))
  }

  // ------------------------------------------- 4. REPLACE WHERE qualifiers

  test("REPLACE WHERE accepts a table-qualified predicate") {
    val (cat, root) = freshCatalog("rwq")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders)
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT").count()
    // the predicate names the column QUALIFIED — the resolved attribute
    // renders as `t.o_orderpriority`, which must not leak into the
    // re-parsed commit-side predicate
    spark.sql(s"""
      INSERT INTO $cat.t REPLACE WHERE t.o_orderpriority = '1-URGENT'
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1,
             o_orderdate, o_orderpriority
      FROM $cat.t WHERE o_orderpriority = '1-URGENT'""")
    val after = Snapshots.readLatest(spark, t).get
    assert(after.count() == orders.count())
    assert(after.filter(col("o_orderpriority") === "1-URGENT").count()
      == urgent)
  }

  // --------------------------------------------- 5. default castability

  test("ADD COLUMN refuses a DEFAULT not up-castable to the declared type") {
    val root = fresh("defcast")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders.limit(10))
    val before = Snapshots.latestVersion(spark, t).get
    val e = intercept[IllegalArgumentException](
      Snapshots.addColumn(spark, t, "b", "BIGINT", Some("'oops'")))
    assert(e.getMessage.contains("does not cast losslessly"), e.getMessage)
    assert(Snapshots.latestVersion(spark, t).contains(before))
    // a well-typed default still passes, including an up-cast (INT→BIGINT)
    Snapshots.addColumn(spark, t, "c", "BIGINT", Some("7"))
    assert(Snapshots.readLatest(spark, t).get
      .select("c").distinct().collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  // -------------------------------------------- 6. createTable validation

  test("createTable refuses bad shapes at DDL; defaults may chain") {
    import org.apache.spark.sql.functions.col
    val root = fresh("ct")
    def bad(cols: Seq[(String, String, Option[String])]): Unit = {
      val t = s"$root/t${cols.hashCode.toHexString}"
      intercept[Exception](Snapshots.createTable(spark, t, cols))
      assert(Snapshots.latestVersion(spark, t).isEmpty,
        "a refused CREATE burned a version")
    }
    bad(Seq.empty) // no columns
    bad(Seq(("a", "INT", None), ("a", "STRING", None))) // dup names
    bad(Seq(("a", "NOT_A_TYPE", None))) // bad type DDL
    bad(Seq(("a", "meta.uid", None), ("b.c", "INT", None))) // nested name
    bad(Seq(("a", "BIGINT", Some("'oops'")))) // non-castable default
    bad(Seq(("a", "INT", Some("a + 1")))) // self-referencing default
    // a default may reference ANOTHER declared column (fills after it)
    val t = s"$root/ok"
    Snapshots.createTable(spark, t, Seq(
      ("k", "BIGINT", None),
      ("base", "BIGINT", Some("10")),
      ("derived", "BIGINT", Some("base * 2"))))
    assert(Snapshots.latestVersion(spark, t).contains(1))
    val empty = Snapshots.readLatest(spark, t).get
    assert(empty.count() == 0 &&
      empty.schema.fieldNames.toSeq == Seq("k", "base", "derived"))
    // a column-less append fills the chained defaults in declared order
    import spark.implicits._
    Snapshots.append(spark, t, Seq(1L, 2L).toDF("k"))
    val got = Snapshots.readLatest(spark, t).get
      .select("k", "base", "derived").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 20L), (2L, 10L, 20L)), got.toString)
  }
}
