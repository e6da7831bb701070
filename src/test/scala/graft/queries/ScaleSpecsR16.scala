package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Plan-shape and scale-contract pins for the round-16 changes. */
class ScaleSpecsR16 extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("record linkage: bounded blocking decides the same pairs") {
    // the name-prefix secondary key must change WORK, not RESULTS: the
    // decided-pair set under bounded blocks equals the unbounded
    // coarse-key run (decided pairs need name or balance agreement,
    // both reachable inside the bounded passes)
    val bounded = LinkageQueries.recordLinkageWith(spark, dir,
      boundedBlocks = true)
    val unbounded = LinkageQueries.recordLinkageWith(spark, dir,
      boundedBlocks = false)
    assert(bounded.exceptAll(unbounded).isEmpty &&
      unbounded.exceptAll(bounded).isEmpty,
      "bounded blocking changed the decided pairs")
  }

  test("record linkage: pass-1 block pair volume is capped") {
    // the blocking key (nation, segment, name-prefix) holds at most
    // ~1000 records per side whatever the corpus size (the prefix
    // frees only the name's last 3 characters); pin Σ-free max
    // per-block |A|·|B| ≤ cap² so a key regression reads as a failure
    val cap = 1000L
    val a0 = Tables(spark, dir, "customer")
      .withColumn("bal_cents", Num.cents(col("c_acctbal")))
    val aBlocks = a0.groupBy(col("c_nationkey"), col("c_mktsegment"),
        substring(col("c_name"), 1, 15).as("pfx"))
      .agg(count(lit(1)).as("na"))
    val b0 = LinkageQueries.corrupted(a0)
    val bBlocks = b0.groupBy(col("b_nation"), col("b_seg"),
        substring(col("b_name"), 1, 15).as("pfx"))
      .agg(count(lit(1)).as("nb"))
    val maxPair = aBlocks.join(bBlocks,
        aBlocks("c_nationkey") === bBlocks("b_nation") &&
        aBlocks("c_mktsegment") === bBlocks("b_seg") &&
        aBlocks("pfx") === bBlocks("pfx"))
      .agg(max(col("na") * col("nb"))).collect()(0).getLong(0)
    assert(maxPair <= cap * cap,
      s"pass-1 block pair volume $maxPair exceeds cap ${cap * cap}")
    // and the per-side block size itself is far below the cap here
    val maxSide = aBlocks.agg(max("na")).collect()(0).getLong(0)
    assert(maxSide <= cap, s"a-side block of $maxSide exceeds $cap")
  }

  test("record linkage: equi-joins only — no cartesian, no nested loop") {
    val plan = LinkageQueries.recordLinkage(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"linkage blocking must stay an equi-join:\n${plan.take(2000)}")
  }

  test("cdc chunking: per-document hash windows, never a global range sort") {
    val docs = Tables(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val plan = TextQueries.cdcChunkRows(docs)
      .queryExecution.executedPlan.toString
    // the boundary prefix-sum windows PARTITION BY doc_id — a global
    // range exchange here would serialize the corpus through one sort
    assert(!plan.contains("rangepartitioning"),
      s"cdc chunking planned a global range exchange:\n${plan.take(2000)}")
    assert(plan.contains("hashpartitioning"),
      "per-document window should hash-partition on doc_id")
  }
}
