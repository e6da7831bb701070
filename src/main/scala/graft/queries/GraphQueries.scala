package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics via relational joins — the Pregel-by-joins
  * pattern: vertex state is a DataFrame keyed by node, one superstep is
  * (edges ⋈ state) → aggregate-by-destination → state', and the driver
  * loop only composes plans (never touches data). Connected components
  * already exist in the dedup family (pointer-jumping, Dedup.scala);
  * this adds rank propagation.
  */
object GraphQueries {

  /** Fixed superstep count, interpolated into BOTH sides. PageRank to
    * convergence is a driver-side loop over the same superstep; three
    * steps keep the oracle CTE chain reviewable while exercising the
    * full propagate→aggregate→reweight cycle. */
  val PrIters = 3

  /** q127 — integer PageRank over the customer–part purchase graph.
    *
    * Graph: distinct (customer, part) purchase pairs from
    * lineitem⋈orders, undirected (both edge directions materialized);
    * node ids disambiguate the bipartite sides by parity (2·custkey /
    * 2·partkey+1). Ranks are EXACT integers at e12 scale: contribution
    * `r DIV deg`, damping `0.15·1e12 + (85·Σ) DIV 100` — floor-division
    * mass loss is deterministic and identical in both engines, which is
    * what makes an ITERATIVE fixpoint gate-able at all (FP ranks drift
    * ulp-per-iteration across engines).
    *
    * Scale shape: each superstep is one join shuffle on the edge source
    * + one aggregate shuffle on the destination. The edge/degree
    * subtrees appear in every superstep's lineage, but Spark's exchange
    * reuse dedups identical subplans — the edge shuffle runs ONCE and
    * later supersteps read its files (`ReusedExchange`, pinned in
    * ScaleSpecs; measured FASTER than an explicit `.persist()`, which
    * only inserts a materialization barrier and cache-write cost on top
    * of the same reuse). Rank overflow headroom is nodes·1e12 per hub,
    * so a web-scale graph drops the rank unit to e9 or routes the sum
    * through [[Num.sumBig]]. */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_partkey") * 2 + 1).cast("long").as("dst"))
      .distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    var ranks = deg.withColumn("r", lit(1000000000000L))
    for (_ <- 1 to PrIters) {
      val contribs = edges
        .join(ranks, edges("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r DIV deg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = deg.join(contribs, "node")
        .select(col("node"), col("deg"),
          (lit(150000000000L) + expr("(85 * s) DIV 100")).as("r"))
    }
    ranks.select(col("node"), col("deg"), col("r").as("rank_e12"))
  }

  private def prOracle: String = {
    val iters = (1 to PrIters).map { i =>
      val prev = s"r${i - 1}"
      s"""t$i AS (
        SELECT e.dst AS node, CAST(SUM(r.r // r.deg) AS BIGINT) AS s
        FROM edges e JOIN $prev r ON r.node = e.src GROUP BY 1),
      r$i AS (
        SELECT d.node, d.deg,
          150000000000 + (85 * t.s) // 100 AS r
        FROM deg d JOIN t$i t ON t.node = d.node)"""
    }.mkString(",\n      ")
    s"""
      WITH e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_partkey * 2 + 1 AS BIGINT) AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT src, dst FROM e0
        UNION ALL SELECT dst, src FROM e0),
      deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
      r0 AS (SELECT node, deg, CAST(1000000000000 AS BIGINT) AS r FROM deg),
      $iters
      SELECT node, deg, CAST(r AS BIGINT) AS rank_e12 FROM r$PrIters"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q127_pagerank", pageRank, Some(prOracle)))
}
