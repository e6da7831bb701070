package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: contiguous global row numbering without a
  * single-partition window, and order-invariant table fingerprints for
  * replica anti-entropy. Both are 100 TB primitives whose NAIVE
  * formulations (global `row_number()`, sorted full-table digest) collapse
  * to one task at scale — these are the shapes that don't.
  */
object LayoutQueries {

  /** q147 — contiguous global ids ordered by `doc_id`, the scalable
    * replacement for `row_number() OVER (ORDER BY ...)` — which Catalyst
    * plans as a SINGLE-partition window (every row through one task; the
    * canonical 100 TB deadlock). Shape here is the classic two-job
    * offset scheme (what `RDD.zipWithIndex` formalizes):
    *
    *   1. range-shuffle + per-partition sort on the key (`sortBy`) — the
    *      `RangePartitioner` samples ONCE at construction, so both
    *      downstream jobs see identical boundaries;
    *   2. an O(partitions) count job → per-partition start offsets on
    *      the driver (32 longs, not data);
    *   3. a narrow map assigns `offset(p) + local index`.
    *
    * Total cost: one shuffle + one tiny count job; no task ever holds
    * more than its partition. The RDD hop is deliberate — this is
    * genuine per-partition imperative logic (position within an
    * iterator), the one place the DataFrame API cannot express the
    * narrow form. Rows re-enter Catalyst immediately after. */
  def globalRowIds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables(spark, dir, "documents")
      .select(col("doc_id")).as[Long].rdd
      .sortBy(identity, ascending = true,
        numPartitions = spark.sessionState.conf.numShufflePartitions)
    val offsets = ids.mapPartitionsWithIndex { (p, it) =>
      Iterator.single(p -> it.size.toLong)
    }.collect().sortBy(_._1).map(_._2).scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    // mapPartitionsWithIndex, NOT TaskContext.getPartitionId(): a
    // downstream coalesce packs many RDD partitions into one task, where
    // the task-level id would hand every partition the same base.
    ids.mapPartitionsWithIndex { (p, it) =>
      val base = bc.value(p)
      it.zipWithIndex.map { case (d, i) => (d, base + i + 1) }
    }.toDF("doc_id", "rid")
  }

  private val FingerprintBuckets = 16

  /** Modulus for the additive digest: 2^61 keeps the exported value a
    * BIGINT on both engines while the accumulator runs in DECIMAL(38,0)
    * (Spark) / HUGEINT (DuckDB). */
  private val DigestMod = 2305843009213693952L

  /** q148 — order-invariant bucket fingerprints of the orders table: the
    * anti-entropy primitive for comparing two replicas of a 100 TB table
    * WITHOUT sorting or co-shuffling them. Each row hashes to one of
    * [[FingerprintBuckets]] buckets by key; per bucket we export the row
    * count plus two commutative digests of a canonical row rendering —
    * XOR (set semantics) and SUM mod 2^61 (multiset semantics: catches
    * the duplicated-row corruption XOR cancels). Replicas compare 16
    * rows; a mismatched bucket localizes repair to 1/16 of the keyspace,
    * recursively.
    *
    * Scale shape: one full scan, hash-agg to a constant-size result, no
    * sort, no join; every expression (md5, conv, xor, long add) is
    * codegen'd. The row rendering pins integer/cents/strftime forms so
    * both engines hash identical bytes (doubles never stringified). */
  def tableFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val rowStr = concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      Num.cents(col("o_totalprice")),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
      col("o_orderpriority"))
    // 60-bit hash: 15 hex digits of md5, engine-portable (DuckDB lacks
    // xxhash64) and always positive, so % == pmod
    val h = conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long")
    val bucket = conv(substring(md5(col("o_orderkey").cast("string")), 1, 15),
      16, 10).cast("long") % FingerprintBuckets
    Tables(spark, dir, "orders")
      .select(bucket.as("bucket"), h.as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(col("h")).as("xor_digest"),
        (Num.sumBig(col("h")) % DigestMod).cast("long").as("sum_digest"))
  }

  private val fpRowStr =
    """concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT),
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
       o_orderpriority)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q147_global_row_ids", globalRowIds, Some("""
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rid
      FROM documents""")),
    QueryDef("q148_table_fingerprint", tableFingerprint, Some(s"""
      SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
               % $FingerprintBuckets AS bucket,
             COUNT(*) AS n_rows,
             bit_xor(('0x' || substr(md5($fpRowStr), 1, 15))::BIGINT)
               AS xor_digest,
             CAST(SUM(('0x' || substr(md5($fpRowStr), 1, 15))::BIGINT)
               % $DigestMod AS BIGINT) AS sum_digest
      FROM orders GROUP BY 1""")))
}
