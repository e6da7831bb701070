package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.operators.{CdcMerge, Scd}

/** Change-data-capture surface: MERGE-style upsert application and
  * type-2 dimension history, both under the driver's cross-engine gate.
  *
  * The change batches are DERIVED from the tables themselves by closed
  * forms on the key (update keys ending 0-1, a delete decile, an insert
  * decile offset past the key domain), so the DuckDB oracle reconstructs
  * the same batch and replays the merge semantics declaratively while
  * Spark runs the actual shuffle-plan operators
  * ([[graft.operators.CdcMerge]], [[graft.operators.Scd]]).
  */
object CdcQueries {

  private val custCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  /** q100 — CDC merge: a synthetic change batch (20% updates, 10%
    * deletes, 10% inserts at key+1,000,000) applied to the customer
    * snapshot through the latest-wins merge plan. The result is the full
    * post-merge table, hash-compared against the oracle's declarative
    * reconstruction. One keyed shuffle regardless of snapshot size. */
  def cdcMergeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.util.Par.ensure(Tables(spark, dir, "customer"))
      .select(custCols.map(col): _*)
    val updates = cust.filter(col("c_custkey") % 10 < 2)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .withColumn("op", lit("U"))
    val deletes = cust.filter(col("c_custkey") % 10 === 2)
      .withColumn("op", lit("D"))
    val inserts = cust.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_name",
        concat(lit("NEW-"), col("c_custkey").cast(StringType)))
      .withColumn("c_custkey", col("c_custkey") + 1000000L)
      .withColumn("c_acctbal", lit(0.0))
      .withColumn("op", lit("I"))
    val changes = updates.unionByName(deletes).unionByName(inserts)
      .withColumn("seq", lit(1L))
    CdcMerge(cust, changes, Seq("c_custkey"))
  }

  private val cdcMergeOracle: String = """
    WITH keep AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 NOT IN (0, 1, 2)),
    up AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
        c_mktsegment
      FROM customer WHERE c_custkey % 10 IN (0, 1)),
    ins AS (
      SELECT c_custkey + 1000000 AS c_custkey,
        'NEW-' || CAST(c_custkey AS VARCHAR) AS c_name,
        c_nationkey, 0.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 3)
    SELECT * FROM keep
    UNION ALL SELECT * FROM up
    UNION ALL SELECT * FROM ins"""

  /** q239 — CONDITIONAL MULTI-CLAUSE `MERGE INTO` (the Delta/Iceberg
    * CDC-merge statement, [[graft.lake.Snapshots.mergeWhen]] via
    * [[graft.plans.SnapshotMergeWhenCommand]]): q100's change batch —
    * updates, deletes AND inserts — applied to a snapshot-log table in
    * ONE SQL statement with per-clause routing (`WHEN MATCHED AND
    * op='D' THEN DELETE / AND op='U' THEN UPDATE SET * / WHEN NOT
    * MATCHED AND op='I' THEN INSERT *`), the exact statement a Delta
    * user ports. One merge-on-read commit: positional tombstones for
    * every claimed row + the staged updated/inserted rows; the matched
    * side is one inner join against the broadcast batch (first-true
    * clause routing is a codegen'd when-chain, not a pass per clause),
    * so at 100 TB the cost is one scan + O(batch). The result is the
    * full post-merge table, hash-compared against the same declarative
    * oracle as q100 — the cross-engine witness that one statement
    * carries the whole CDC contract. */
  def mergeWhenCdc(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val root = graft.util.Scratch.dir("mrgwhen", dir)
    val table = s"$root/customer_mw"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    val cust = Tables(spark, dir, "customer").select(custCols.map(col): _*)
    Snapshots.append(spark, table, cust)
    val updates = cust.filter(col("c_custkey") % 10 < 2)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .withColumn("op", lit("U"))
    val deletes = cust.filter(col("c_custkey") % 10 === 2)
      .withColumn("op", lit("D"))
    val inserts = cust.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_name",
        concat(lit("NEW-"), col("c_custkey").cast(StringType)))
      .withColumn("c_custkey", col("c_custkey") + 1000000L)
      .withColumn("c_acctbal", lit(0.0))
      .withColumn("op", lit("I"))
    updates.unionByName(deletes).unionByName(inserts)
      .createOrReplaceTempView("mw_changes")
    val cat = s"mw_${Integer.toHexString(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""MERGE INTO $cat.customer_mw AS tgt
      USING mw_changes AS src
      ON tgt.c_custkey = src.c_custkey
      WHEN MATCHED AND src.op = 'D' THEN DELETE
      WHEN MATCHED AND src.op = 'U' THEN UPDATE SET *
      WHEN NOT MATCHED AND src.op = 'I' THEN INSERT *""")
    spark.sql(s"SELECT ${custCols.mkString(", ")} FROM $cat.customer_mw")
  }

  /** q243 — FULL-SYNC `MERGE INTO` WITH `WHEN NOT MATCHED BY SOURCE`
    * (Delta's third clause family, [[graft.lake.Snapshots.mergeWhen]]
    * `WhenNotMatchedBySource*`): the source claims COMPLETENESS — a
    * nightly dimension snapshot replacing upstream state — so target
    * rows whose key the source no longer carries must be reconciled
    * too: here deleted when their balance is small, marked stale
    * (`c_acctbal = -1`) otherwise, with the conditions referencing
    * TARGET columns only (there is no source row to speak of). One
    * merge-on-read commit: the by-source side is one anti join of the
    * live view against the broadcast source keys — the live side never
    * exchanges, and scanning every target row is exactly what
    * full-sync semantics require. The result is the full post-sync
    * table, hash-matched against the declarative replay. */
  def mergeFullSync(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val root = graft.util.Scratch.dir("mrgsync", dir)
    val table = s"$root/customer_fs"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    val cust = Tables(spark, dir, "customer").select(custCols.map(col): _*)
    Snapshots.append(spark, table, cust)
    // the upstream truth: keys ending 0-6 survive with bumped balances;
    // 7-9 vanished upstream; a decile of new keys appears
    val present = cust.filter(col("c_custkey") % 10 < 7)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
    val fresh = cust.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_name",
        concat(lit("NEW-"), col("c_custkey").cast(StringType)))
      .withColumn("c_custkey", col("c_custkey") + 1000000L)
      .withColumn("c_acctbal", lit(0.0))
    present.unionByName(fresh).createOrReplaceTempView("fs_truth")
    val cat = s"fs_${Integer.toHexString(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""MERGE INTO $cat.customer_fs AS tgt
      USING fs_truth AS src
      ON tgt.c_custkey = src.c_custkey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND tgt.c_acctbal < 5000.0 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c_acctbal = -1.0""")
    spark.sql(s"SELECT ${custCols.mkString(", ")} FROM $cat.customer_fs")
  }

  private val mergeFullSyncOracle: String = """
    WITH up AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
        c_mktsegment
      FROM customer WHERE c_custkey % 10 < 7),
    stale AS (
      SELECT c_custkey, c_name, c_nationkey, -1.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 >= 7 AND c_acctbal >= 5000.0),
    ins AS (
      SELECT c_custkey + 1000000 AS c_custkey,
        'NEW-' || CAST(c_custkey AS VARCHAR) AS c_name,
        c_nationkey, 0.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 3)
    SELECT * FROM up
    UNION ALL SELECT * FROM stale
    UNION ALL SELECT * FROM ins"""

  /** q240 — STREAMING CDC SINK VIA EQUALITY DELETES
    * ([[graft.lake.Snapshots.deleteByKeys]] composed with the q156
    * exactly-once discipline — the write path q237's mechanism was
    * built FOR): a keyed change stream lands each micro-batch as ONE
    * zero-scan equality-delete commit (the U/D key set — no table read
    * at write time, the cost a thousands-of-deletes-per-minute CDC
    * consumer cannot pay per batch) plus ONE append of the new row
    * images, with [[graft.lake.Snapshots.materializeEqDeletes]] run as
    * in-stream maintenance every second batch to cap read debt. Batch
    * replay is idempotent at COMMIT granularity (each sub-commit
    * guarded by its deterministic version slot, so a crash between the
    * delete and the append resumes exactly). Post-hoc log audit pins
    * `zero_scan_writes` (every eq-delete commit left the file list
    * untouched), `materialized_mid` (maintenance converted outstanding
    * eq deletes mid-stream), and `eq_outstanding_at_read` (the final
    * batch's eq delete is STILL outstanding when the gate reads — the
    * read path serves correct rows under debt). The accumulated state
    * hash-matches the batch CDC merge (q100) of the same change log:
    * the cross-engine witness that stream-of-eq-deletes ≡ batch merge. */
  /** q264 — STREAMING GROUP COMMIT (q253's transactions as a streaming
    * sink: every micro-batch lands its fact append AND its summary
    * MERGE as ONE marker, so no reader — group or main — ever sees a
    * batch half-applied): the batch id rides the marker as an
    * IDEMPOTENCY TOKEN (the Delta txn appId/version discipline), so a
    * restart's replayed batch is a pure no-op — the gate re-runs a
    * batch closure by hand after the stream drains and pins zero new
    * versions on both members (`replay_noop`). `lockstep_every_marker`
    * replays history: at EVERY published marker's pins, the summary
    * table equals the group-by of the fact table at the paired pin —
    * consistency held at every commit point, not just the end. Final
    * content is oracle-exact. At 100 TB this is the CDC topology that
    * kills the 3am "dashboard disagrees with the facts" page: the two
    * tables cannot diverge, not even transiently. */
  def streamingGroupCommit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.{Snapshots, TableGroup}
    val root = graft.util.Scratch.dir("stream_q264", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val src = s"$root/src"
    val group = s"$root/grp"
    val ckpt = s"$root/ckpt"
    val orders = Tables(spark, dir, "orders")
    val even = col("o_orderkey") % 2 === 0
    def sumOf(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(Num.cents(col("o_totalprice"))).as("sum_cents"))
    Snapshots.append(spark, s"$group/facts", orders.filter(even))
    Snapshots.append(spark, s"$group/summary", sumOf(orders.filter(even)))
    // three deterministic micro-batches of the odd half
    for (b <- 0 to 2)
      orders.filter(!even && pmod(col("o_orderkey"), lit(6)) === 2 * b + 1)
        .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val writeBatch: (Dataset[Row], Long) => Unit = (batch, id) => {
      val s = batch.sparkSession
      val delta = batch.cache()
      TableGroup.commitAll(s, group, Seq(
        "facts" -> ((t, br) => Snapshots.appendToBranch(s, t, br, delta)),
        "summary" -> ((t, br) => Snapshots.mergeWhen(s, t, sumOf(delta),
          Seq("o_orderpriority"),
          Seq(Snapshots.WhenMatchedUpdate(set = Map(
            "n_rows" -> (col("n_rows") + col("_src_n_rows")),
            "sum_cents" -> (col("sum_cents") + col("_src_sum_cents")))),
            Snapshots.WhenNotMatchedInsert()),
          branch = br))), token = s"batch-$id")
      delta.unpersist()
      ()
    }
    val q = stream.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    // a restart replays a batch: the token makes it a no-op
    def vOf(t: String) = Snapshots.latestVersion(spark, s"$group/$t").get
    val (vf0, vs0) = (vOf("facts"), vOf("summary"))
    val replayed = spark.read.parquet(src).filter(
      pmod(col("o_orderkey"), lit(6)) === 3) // batch 1's content
    writeBatch(replayed, 1L)
    val replayNoop = vOf("facts") == vf0 && vOf("summary") == vs0
    // consistency held at EVERY marker, not just the end
    val lockstepEveryMarker = TableGroup.markerPins(spark, group)
      .forall { pins =>
        val f = Snapshots.readAt(spark, s"$group/facts",
          pins("facts")).get
        val sm = Snapshots.readAt(spark, s"$group/summary",
          pins("summary")).get
        sm.exceptAll(sumOf(f)).isEmpty && sumOf(f).exceptAll(sm).isEmpty
      }
    Snapshots.readLatest(spark, s"$group/summary").get
      .withColumn("replay_noop", lit(replayNoop))
      .withColumn("lockstep_every_marker", lit(lockstepEveryMarker))
  }

  /** q274 — GROUP-TRANSACTION CONSISTENT READS OVER SQL
    * (`VERSION AS OF 'txn:<seq>'` — VERDICT r14 task 8: q253's
    * [[graft.lake.TableGroup.readAll]] cut, addressable from a SQL
    * dashboard): each member resolves to its pin from the newest
    * marker ≤ seq, so facts and summary read AT THE SAME MARKER can
    * never disagree — `lockstep_every_marker_sql` replays every
    * published marker over SQL and pins summary == group-by(facts) at
    * each. The marker IS the commit point: during the MARK→PUBLISH
    * window (crash-injection seam) the txn-addressed SQL read already
    * serves the full transaction while the PLAIN main read still
    * serves the old state (`marked_visible_main_not`) — the
    * dashboard's "consistent as of transaction N" without waiting for
    * publish. An unpinned seq refuses loudly (`bad_seq_loud`).
    * Resolution is O(markers) KB objects; the read itself is the
    * ordinary pinned-version scan. */
  def txnSqlReads(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.{Snapshots, TableGroup}
    val root = graft.util.Scratch.dir("txnsql", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val orders = Tables(spark, dir, "orders")
    val even = col("o_orderkey") % 2 === 0
    def sumOf(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(Num.cents(col("o_totalprice"))).as("sum_cents"))
    Snapshots.append(spark, s"$root/facts", orders.filter(even))
    Snapshots.append(spark, s"$root/summary", sumOf(orders.filter(even)))
    val cat = s"tx_${Integer.toHexString(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    def commitSlice(b: Int, afterMark: () => Unit = () => ()): Int = {
      val delta = orders.filter(!even &&
        pmod(col("o_orderkey"), lit(6)) === 2 * b + 1)
      TableGroup.commitAll(spark, root, Seq(
        "facts" -> ((t, br) => Snapshots.appendToBranch(spark, t, br, delta)),
        "summary" -> ((t, br) => Snapshots.mergeWhen(spark, t, sumOf(delta),
          Seq("o_orderpriority"),
          Seq(Snapshots.WhenMatchedUpdate(set = Map(
            "n_rows" -> (col("n_rows") + col("_src_n_rows")),
            "sum_cents" -> (col("sum_cents") + col("_src_sum_cents")))),
            Snapshots.WhenNotMatchedInsert()),
          branch = br))), afterMark = afterMark)
    }
    val s1 = commitSlice(0)
    val s2 = commitSlice(1)
    def factsAt(seq: Int) = spark.sql(
      s"SELECT * FROM $cat.facts VERSION AS OF 'txn:$seq'")
    def summaryAt(seq: Int) = spark.sql(
      s"SELECT * FROM $cat.summary VERSION AS OF 'txn:$seq'")
    // marked-but-unpublished: inside the MARK→PUBLISH seam the txn
    // read serves the new cut IN FULL, the plain main read none of it
    var markedVisibleMainNot = false
    val s3 = commitSlice(2, afterMark = () => {
      val atMarker = spark.sql(s"SELECT count(*) AS n FROM $cat.facts " +
        s"VERSION AS OF 'txn:${s2 + 1}'").head.getLong(0)
      val onMain = spark.sql(s"SELECT count(*) AS n FROM $cat.facts")
        .head.getLong(0)
      markedVisibleMainNot = atMarker > onMain &&
        onMain == factsAt(s2).count()
    })
    def sameSet(a: DataFrame, b: DataFrame) =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    val lockstepEveryMarkerSql = Seq(s1, s2, s3).forall(seq =>
      sameSet(summaryAt(seq), sumOf(factsAt(seq))))
    val badSeqLoud = scala.util.Try(factsAt(99).collect()) match {
      case scala.util.Failure(e) =>
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .exists(t => Option(t.getMessage)
            .exists(_.contains("no published group-transaction")))
      case _ => false
    }
    summaryAt(s3)
      .withColumn("lockstep_every_marker_sql", lit(lockstepEveryMarkerSql))
      .withColumn("marked_visible_main_not", lit(markedVisibleMainNot))
      .withColumn("bad_seq_loud", lit(badSeqLoud))
  }

  def streamingEqDeleteSink(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.Snapshots
    val root = graft.util.Scratch.dir("stream_q240", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val src = s"$root/src"
    val table = s"$root/table"
    val ckpt = s"$root/ckpt"
    val cust = Tables(spark, dir, "customer").select(custCols.map(col): _*)
    Snapshots.append(spark, table, cust) // version 1: the base snapshot
    val updates = cust.filter(col("c_custkey") % 10 < 2)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .withColumn("op", lit("U"))
    val deletes = cust.filter(col("c_custkey") % 10 === 2)
      .withColumn("op", lit("D"))
    val inserts = cust.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_name",
        concat(lit("NEW-"), col("c_custkey").cast(StringType)))
      .withColumn("c_custkey", col("c_custkey") + 1000000L)
      .withColumn("c_acctbal", lit(0.0))
      .withColumn("op", lit("I"))
    val changes = updates.unionByName(deletes).unionByName(inserts)
    // three key-deterministic micro-batches (one file per trigger)
    for (b <- 0 to 2)
      changes.filter(pmod(col("c_custkey"), lit(3)) === b).coalesce(1)
        .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val writeBatch: (Dataset[Row], Long) => Unit = (batch, id) => {
      val s = batch.sparkSession
      // deterministic version slots: base 1, +2 per prior batch, +1
      // per prior odd-batch materialize — each sub-commit replays as
      // a no-op when its slot is already filled
      val base = 1 + 2 * id + id / 2
      def latest = Snapshots.latestVersion(s, table).getOrElse(0)
      if (latest < base + 1)
        Snapshots.deleteByKeys(s, table,
          batch.filter(col("op").isin("U", "D")).select(col("c_custkey")))
      if (latest < base + 2)
        Snapshots.append(s, table,
          batch.filter(col("op").isin("U", "I")).drop("op"))
      if (id % 2 == 1 && latest < base + 3) {
        Snapshots.materializeEqDeletes(s, table)
        ()
      }
    }
    val q = stream.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    // post-hoc log audit, straight from the version chain
    val latestV = Snapshots.latestVersion(spark, table).get
    def snap(v: Int) = Snapshots.snapshot(spark, table, v).get
    val zeroScanWrites = (2 to latestV).forall { v =>
      val s = snap(v); val p = snap(v - 1)
      val newEq = s.deletes.filterNot(p.deletes.toSet)
        .filter(Snapshots.isEqDelete)
      newEq.isEmpty || s.files == p.files
    }
    val materializedMid = (2 to latestV).exists { v =>
      snap(v - 1).deletes.exists(Snapshots.isEqDelete) &&
        !snap(v).deletes.exists(Snapshots.isEqDelete)
    }
    val eqOutstanding = snap(latestV).deletes.exists(Snapshots.isEqDelete)
    Snapshots.readLatest(spark, table).get
      .select(custCols.map(col): _*)
      .withColumn("zero_scan_writes", lit(zeroScanWrites))
      .withColumn("materialized_mid", lit(materializedMid))
      .withColumn("eq_outstanding_at_read", lit(eqOutstanding))
  }

  private val streamingEqDeleteOracle: String = s"""
    SELECT t.*, true AS zero_scan_writes, true AS materialized_mid,
           true AS eq_outstanding_at_read
    FROM ($cdcMergeOracle) t"""

  /** q101 — SCD2 dimension history: each customer's orders, read as a
    * stream of versions of their "latest order" attribute, become
    * effective-dated records via the window-lead construction — the
    * classic warehouse type-2 build. One shuffle on the dimension key. */
  def scdOrderHistory(spark: SparkSession, dir: String): DataFrame =
    Scd.history(
      graft.util.Par.ensure(Tables(spark, dir, "orders"))
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"),
      keys = Seq("o_custkey"),
      effectiveAt = col("o_orderdate"),
      tieBreak = Seq(col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("effective_from"), col("effective_to"), col("is_current"))

  /** q134 snapshot date, interpolated into BOTH sides (mid-corpus for
    * TPC-H's 1992–1998 order-date span). */
  val SnapshotDate = "1995-06-15"

  /** q134 — SCD2 point-in-time snapshot: "the dimension as of date D",
    * the read half of q101's type-2 build (a history nobody can query
    * is an expensive log). One predicate over the effective-dated
    * records — `from ≤ D < to` (open `to` = current) — returns exactly
    * the version visible on D per key; zero-length same-day versions
    * are correctly invisible. At scale the history table is partitioned
    * by `effective_from` range, so a snapshot read prunes to the
    * partitions overlapping D's horizon instead of scanning all
    * history. */
  def scdSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val d = lit(SnapshotDate).cast("date")
    scdOrderHistory(spark, dir)
      .filter(col("effective_from") <= d &&
        (col("effective_to").isNull || col("effective_to") > d))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("effective_from"))
  }

  private val scdSnapshotOracle: String = s"""
    WITH h AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
        o_orderdate AS effective_from,
        lead(o_orderdate) OVER w AS effective_to
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
    SELECT o_custkey, o_orderkey, o_totalprice, effective_from
    FROM h WHERE effective_from <= DATE '$SnapshotDate'
      AND (effective_to IS NULL OR effective_to > DATE '$SnapshotDate')"""

  private val scdOracle: String = """
    SELECT o_custkey, o_orderkey, o_totalprice,
      o_orderdate AS effective_from,
      lead(o_orderdate) OVER w AS effective_to,
      lead(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""

  /** q104 — incremental aggregate maintenance: the monthly-revenue gold
    * rollup is materialized from "history" (4/5 of orders, by key
    * decile), then a "new batch" (the remaining 1/5) is folded in by
    * aggregating the DELTA ALONE and merging on the month key
    * ([[graft.gold.IncrementalAgg]]) — history is never rescanned, so
    * the refresh is O(delta + agg) instead of O(history). The stored
    * measures are integral cents, which re-sum exactly; the oracle
    * aggregates all orders from scratch and must hash-match the merged
    * result, proving merge(agg(A), agg(B)) = agg(A ∪ B) end-to-end. */
  def incrementalMonthlyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import graft.gold.IncrementalAgg
    import graft.queries.Num.cents
    val orders = graft.util.Par.ensure(Tables(spark, dir, "orders"))
    def monthlyCents(df: DataFrame): DataFrame = df
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("rev_cents"))
    // materialize the stored rollup for real (parquet round-trip, the
    // gold-table shape), then fold the delta batch in
    val stored = graft.util.Scratch.dir("incragg", dir)
    monthlyCents(orders.filter(col("o_orderkey") % 5 =!= 0))
      .write.mode("overwrite").parquet(stored)
    IncrementalAgg.merge(
      spark.read.parquet(stored),
      monthlyCents(orders.filter(col("o_orderkey") % 5 === 0)),
      keys = Seq("month"), measures = Seq("n_orders", "rev_cents"))
      .select(col("month"), col("n_orders"),
        (col("rev_cents").cast("double") / 100.0).as("revenue"))
  }

  private val incrementalOracle: String = s"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
      COUNT(*) AS n_orders,
      ${graft.queries.Num.sqlSumMoney("o_totalprice")} AS revenue
    FROM orders GROUP BY 1"""

  /** q113 — reconciliation diff: the merged table (q100's output) diffed
    * against the original snapshot recovers exactly the change batch's
    * net effect — updates as `changed`, deletes as `removed`, inserts as
    * `added` ([[graft.operators.TableDiff]]). This closes the CDC audit
    * loop: apply(changes) ∘ diff ≡ changes, which the oracle verifies by
    * deriving the expected diff from the same key-decile closed forms.
    * One full-outer shuffle join; row equality is struct comparison, no
    * hashing or stringification. */
  def cdcDiff(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TableDiff
    val cust = Tables(spark, dir, "customer").select(custCols.map(col): _*)
    TableDiff.diff(cust, cdcMergeCustomers(spark, dir), Seq("c_custkey"))
  }

  private val cdcDiffOracle: String = """
    SELECT c_custkey, 'changed' AS change_type
    FROM customer WHERE c_custkey % 10 IN (0, 1)
    UNION ALL
    SELECT c_custkey, 'removed' FROM customer WHERE c_custkey % 10 = 2
    UNION ALL
    SELECT c_custkey + 1000000, 'added' FROM customer WHERE c_custkey % 10 = 3"""

  /** q139 — GDPR delete propagation (right-to-be-forgotten): a deletion
    * request TABLE keyed on user is anti-joined through the fact table —
    * the request list is data (a compliance log), not a filter predicate,
    * which is what distinguishes erasure propagation from ordinary row
    * filtering. The request side here is a deterministic ~10% of users
    * via the q32 stable-hash gate (standing in for the real request log
    * so the oracle can reconstruct it). Plan shape at scale: the request
    * list is broadcast (requests are small by nature) and the fact table
    * is scanned once with a broadcast ANTI join — no fact-side shuffle;
    * the post-erasure per-type counts double as the compliance audit
    * that no requested user's events survive. */
  def gdprDelete(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Sampling
    val ev = Tables.events(spark, dir)
    val requests = ev.select(col("user_id")).distinct()
      .filter(Sampling.hashBucket(col("user_id")) < 1000)
    ev.join(broadcast(requests), Seq("user_id"), "left_anti")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }

  private val gdprOracle: String = {
    import graft.text.Sampling
    s"""
    WITH req AS (
      SELECT DISTINCT user_id FROM events
      WHERE ${Sampling.sqlHashBucket("user_id")} < 1000)
    SELECT event_type, COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users
    FROM events WHERE user_id NOT IN (SELECT user_id FROM req)
    GROUP BY 1"""
  }

  /** q215 — CDF-driven MATERIALIZED-VIEW maintenance (the consumer the
    * change feed exists FOR: q104 folds additive deltas, but a real MV
    * must survive DELETEs and UPDATEs, which is exactly what signed
    * insert/delete images enable): the view (revenue by priority) is
    * materialized once at v1, the base table then takes an append, a
    * predicate DELETE and a predicate UPDATE, and the view advances to
    * v4 by folding ONE O(changes) feed pass — insert rows add, delete
    * rows subtract, an update's delete+insert pair MOVES its row across
    * groups; net-zero groups drop out. Cost is O(feed + view), never a
    * base recompute; the `matches_recompute` marker pins the maintained
    * view row-for-row against the direct aggregate of the final state
    * (a full-outer diff with zero mismatches). */
  def cdfMaterializedView(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    import graft.queries.Num.cents
    val root = graft.util.Scratch.dir("cdfmv", dir)
    val table = s"$root/orders_mv"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    val orders = graft.util.Par.ensure(Tables(spark, dir, "orders"))
    def viewOf(df: DataFrame): DataFrame = df
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sum(cents(col("o_totalprice"))).as("sum_cents"))
    Snapshots.append(spark, table, orders.filter(col("o_orderkey") % 2 === 0))
    val mvStore = s"$root/mv"
    viewOf(Snapshots.readAt(spark, table, 1).get)
      .write.mode("overwrite").parquet(mvStore)
    Snapshots.append(spark, table, orders.filter(col("o_orderkey") % 2 === 1))
    Snapshots.deleteWhere(spark, table, col("o_orderkey") % 5 === 0)
    val v4 = Snapshots.updateWhere(spark, table, col("o_totalprice") < 50000,
      Map("o_orderpriority" -> lit("9-X")))
    val feed = Snapshots.changesBetween(spark, table, 1, v4).get
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val delta = feed.groupBy("o_orderpriority")
      .agg(sum(sign).as("dn"),
        sum(sign * cents(col("o_totalprice"))).as("dc"))
    val mv = spark.read.parquet(mvStore)
      .join(delta, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_cents"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("sum_cents"))
      .filter(col("n_rows") > 0)
    val direct = viewOf(Snapshots.readAt(spark, table, v4).get)
      .withColumnRenamed("n_rows", "n2").withColumnRenamed("sum_cents", "c2")
    val mismatches = mv.join(direct, Seq("o_orderpriority"), "full_outer")
      .filter(col("n_rows").isNull || col("n2").isNull ||
        col("n_rows") =!= col("n2") || col("sum_cents") =!= col("c2"))
      .count()
    mv.withColumn("matches_recompute", lit(mismatches == 0))
  }

  private val cdfMvOracle: String = s"""
    SELECT CASE WHEN o_totalprice < 50000 THEN '9-X'
                ELSE o_orderpriority END AS o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(SUM(${graft.queries.Num.sqlCents("o_totalprice")}) AS BIGINT)
             AS sum_cents,
           true AS matches_recompute
    FROM orders WHERE o_orderkey % 5 <> 0 GROUP BY 1"""

  /** q222 — RIGHT-TO-BE-FORGOTTEN through the whole lake lifecycle (the
    * privacy composition q139's event scrub only starts: under
    * merge-on-read, a DELETE is an append-only tombstone — the erased
    * BYTES are still on disk, and still on every replica; an auditor
    * checks files, not query results): erase a key set from the source
    * (one O(matches) tombstone commit), propagate the deletion to a
    * CDC replica through the change feed, then make the erasure
    * PHYSICAL on both tables — delete-ratio compaction rewrites every
    * file carrying an erased row, vacuum reclaims the dead files and
    * pre-erasure versions. The `physically_erased` marker is the audit
    * itself: it scans EVERY data file remaining under BOTH table
    * directories DIRECTLY (bypassing the log — exactly what a
    * regulator's forensic read does) and finds zero erased keys;
    * `in_sync` pins multiset equality of the live views. Cost at
    * 100 TB: O(files-containing-erased-rows) rewrite + O(feed), never
    * a full-table rewrite. */
  def gdprLakeErasure(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val src = graft.util.Scratch.dir("gdpr_src", dir)
    val rep = graft.util.Scratch.dir("gdpr_rep", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rep))
    val cust = graft.util.Par.ensure(Tables(spark, dir, "customer"))
      .select(custCols.map(col): _*)
    Snapshots.append(spark, src, cust)
    Snapshots.append(spark, rep, Snapshots.readAt(spark, src, 1).get)
    val erased = col("c_custkey") % 97 === 13
    val v2 = Snapshots.deleteWhere(spark, src, erased)
    Snapshots.applyChanges(spark, rep,
      Snapshots.changesBetween(spark, src, 1, v2).get, Seq("c_custkey"))
    // logical erasure done; now make it physical on both tables
    for (t <- Seq(src, rep)) {
      Snapshots.optimizeDeletes(spark, t, minDeleteRatio = 1e-9)
      Snapshots.vacuum(spark, t, Snapshots.latestVersion(spark, t).get)
    }
    // forensic audit: every remaining DATA file, read directly
    def physicalHits(table: String): Long = {
      val snap = new java.io.File(s"$table/_snap")
      val files = Option(snap.listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("c-"))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
      if (files.isEmpty) 0L
      else spark.read.parquet(files: _*).filter(erased).count()
    }
    val nErased = cust.filter(erased).count()
    val physOk = nErased > 0 &&
      physicalHits(src) == 0L && physicalHits(rep) == 0L
    val s = Snapshots.readLatest(spark, src).get
    val r = Snapshots.readLatest(spark, rep).get
    val inSync = s.exceptAll(r).isEmpty && r.exceptAll(s).isEmpty
    s.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        sum(graft.queries.Num.cents(col("c_acctbal"))).as("sum_cents"))
      .withColumn("in_sync", lit(inSync))
      .withColumn("physically_erased", lit(physOk))
  }

  private val gdprLakeOracle: String = s"""
    SELECT c_mktsegment, COUNT(*) AS n_rows,
           CAST(SUM(${graft.queries.Num.sqlCents("c_acctbal")}) AS BIGINT)
             AS sum_cents,
           true AS in_sync, true AS physically_erased
    FROM customer WHERE c_custkey % 97 <> 13 GROUP BY 1"""

  /** q285 — MATERIALIZED VIEWS OVER PLAIN SQL
    * ([[graft.lake.MaterializedViews]], the first-class form of q215's
    * hand fold): `CREATE MATERIALIZED VIEW` pins (source, view SQL,
    * last folded version) in the MV's own table properties;
    * `REFRESH MATERIALIZED VIEW` folds ONE change-feed pass over the
    * source versions since — insert adds, delete subtracts, an
    * update's pair moves its row across groups — at O(feed + view)
    * cost, never a base recompute. The gate creates the view, drives
    * the source through append + predicate DELETE + group-moving
    * UPDATE, refreshes once, and pins (a) row-exact equality with the
    * direct recompute of the final state (`matches_recompute`, a
    * full-outer diff) and (b) that a refresh with no source movement
    * publishes NOTHING (`noop_stable` — idempotent cron refreshes). */
  def materializedViewSql(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    import graft.queries.Num.cents
    val root = graft.util.Scratch.dir("mvsql", dir)
    val table = s"$root/orders_src"
    val mv = s"$root/rev_mv"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(mv))
    val orders = graft.util.Par.ensure(Tables(spark, dir, "orders"))
    Snapshots.append(spark, table, orders.filter(col("o_orderkey") % 2 === 0))
    val cat = s"mvq_${Integer.toHexString(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.rev_mv AS
      SELECT o_orderpriority, COUNT(*) AS n_rows,
        SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents
      FROM $cat.orders_src GROUP BY o_orderpriority""")
    Snapshots.append(spark, table, orders.filter(col("o_orderkey") % 2 === 1))
    Snapshots.deleteWhere(spark, table, col("o_orderkey") % 5 === 0)
    Snapshots.updateWhere(spark, table, col("o_totalprice") < 50000,
      Map("o_orderpriority" -> lit("9-X")))
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.rev_mv")
    val served = Snapshots.readLatest(spark, mv).get
      .select("o_orderpriority", "n_rows", "sum_cents")
    val direct = Snapshots.readLatest(spark, table).get
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n2"), sum(cents(col("o_totalprice"))).as("c2"))
    val mismatches = served.join(direct, Seq("o_orderpriority"), "full_outer")
      .filter(col("n_rows").isNull || col("n2").isNull ||
        col("n_rows") =!= col("n2") || col("sum_cents") =!= col("c2"))
      .count()
    val vServed = Snapshots.latestVersion(spark, mv).get
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.rev_mv")
    val noopStable = Snapshots.latestVersion(spark, mv).contains(vServed)
    served
      .withColumn("matches_recompute", lit(mismatches == 0))
      .withColumn("noop_stable", lit(noopStable))
  }

  private val mvSqlOracle: String = s"""
    SELECT CASE WHEN o_totalprice < 50000 THEN '9-X'
                ELSE o_orderpriority END AS o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(SUM(${graft.queries.Num.sqlCents("o_totalprice")}) AS BIGINT)
             AS sum_cents,
           true AS matches_recompute, true AS noop_stable
    FROM orders WHERE o_orderkey % 5 <> 0 GROUP BY 1"""

  /** q303 — CHANGE FEED ACROSS SCHEMA EVOLUTION (the CDC consumer's
    * hardest week: the producer ran `ADD COLUMN … DEFAULT` mid-window —
    * Delta's CDF pain point): all row images in a window materialize
    * under the WINDOW-END version's era mapping, so pre-add-era rows
    * arrive with the added column DEFAULT-filled and post-add rows
    * carry their stored values — one consistent schema, no consumer
    * special-casing. The metadata-only ADD emits no rows (the q245
    * CDC contract: consumers apply DDL out of band), and the gate
    * replays exactly that: a replica seeded with the v1 data applies
    * the same DDL then the feed, and must land multiset-equal on the
    * source's final state — delete images of pre-add rows MUST carry
    * the same filled default the replica's live view shows, or the
    * exceptAll apply misses them. */
  def cdfSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val root = graft.util.Scratch.dir("cdfevo", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val table = s"$root/orders_evo"
    val replica = s"$root/orders_rep"
    val orders = graft.util.Par.ensure(Tables(spark, dir, "orders"))
    val even = col("o_orderkey") % 2 === 0
    Snapshots.append(spark, table, orders.filter(even)) // v1
    Snapshots.addColumn(spark, table, "bonus", "BIGINT", Some("7")) // v2
    Snapshots.append(spark, table, orders.filter(!even)
      .withColumn("bonus", (col("o_orderkey") % 3).cast("long"))) // v3
    val v4 = Snapshots.deleteWhere(spark, table,
      col("o_totalprice") < 30000) // v4
    val feed = Snapshots.changesBetween(spark, table, 1, v4).get
    // the replica: v1 data + the same DDL out of band, then the feed
    Snapshots.append(spark, replica, orders.filter(even))
    Snapshots.addColumn(spark, replica, "bonus", "BIGINT", Some("7"))
    val cols = Snapshots.readLatest(spark, table).get.columns.map(col)
    // materialize both sides ONCE (r19): the two-sided exceptAll plus
    // the returned aggregate executed the CDF feed (3 era-aware scans +
    // eq-delete composition) twice and the live view three times
    val applied = Snapshots.readLatest(spark, replica).get
      .select(cols: _*)
      .exceptAll(feed.filter(col("_change_type") === "delete")
        .select(cols: _*))
      .unionAll(feed.filter(col("_change_type") === "insert")
        .select(cols: _*))
      .localCheckpoint()
    val target = Snapshots.readLatest(spark, table).get.select(cols: _*)
      .localCheckpoint()
    val inSync = applied.exceptAll(target).isEmpty &&
      target.exceptAll(applied).isEmpty
    target.groupBy(col("o_orderpriority"), col("bonus"))
      .agg(count(lit(1)).as("n_rows"),
        Num.sumMoney(col("o_totalprice")).as("sum_price"))
      .withColumn("in_sync", lit(inSync))
  }

  private val cdfEvoOracle: String = s"""
    SELECT o_orderpriority,
           CAST(CASE WHEN o_orderkey % 2 = 0 THEN 7
                ELSE o_orderkey % 3 END AS BIGINT) AS bonus,
           COUNT(*) AS n_rows,
           ${Num.sqlSumMoney("o_totalprice")} AS sum_price,
           true AS in_sync
    FROM orders WHERE NOT (o_totalprice < 30000)
    GROUP BY 1, 2"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q303_cdf_schema_evolution", cdfSchemaEvolution,
      Some(cdfEvoOracle)),
    QueryDef("q285_materialized_view_sql", materializedViewSql,
      Some(mvSqlOracle)),
    QueryDef("q222_gdpr_lake_erasure", gdprLakeErasure,
      Some(gdprLakeOracle)),
    QueryDef("q215_cdf_materialized_view", cdfMaterializedView,
      Some(cdfMvOracle)),
    QueryDef("q139_gdpr_delete", gdprDelete, Some(gdprOracle)),
    QueryDef("q100_cdc_merge", cdcMergeCustomers, Some(cdcMergeOracle)),
    QueryDef("q239_merge_when", mergeWhenCdc, Some(cdcMergeOracle)),
    QueryDef("q243_merge_full_sync", mergeFullSync,
      Some(mergeFullSyncOracle)),
    QueryDef("q274_txn_sql_reads", txnSqlReads, Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n_rows,
             CAST(SUM(${Num.sqlCents("o_totalprice")}) AS BIGINT)
               AS sum_cents,
             true AS lockstep_every_marker_sql,
             true AS marked_visible_main_not, true AS bad_seq_loud
      FROM orders
      GROUP BY 1""")),
    QueryDef("q264_streaming_group_commit", streamingGroupCommit, Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n_rows,
             CAST(SUM(${Num.sqlCents("o_totalprice")}) AS BIGINT)
               AS sum_cents,
             true AS replay_noop, true AS lockstep_every_marker
      FROM orders
      GROUP BY 1""")),
    QueryDef("q240_streaming_eq_delete_sink", streamingEqDeleteSink,
      Some(streamingEqDeleteOracle)),
    QueryDef("q101_scd2_history", scdOrderHistory, Some(scdOracle)),
    QueryDef("q134_scd2_snapshot", scdSnapshot, Some(scdSnapshotOracle)),
    QueryDef("q104_incremental_agg", incrementalMonthlyRevenue,
      Some(incrementalOracle)),
    QueryDef("q113_cdc_diff", cdcDiff, Some(cdcDiffOracle)))
}
