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

  /** Minimum co-purchase support for a q142 edge: a part pair must share
    * ≥2 orders. Interpolated into BOTH sides; it's what keeps the
    * co-purchase graph sparse (115k raw pairs → 3.6k edges at sf0.01)
    * so the wedge join is bounded at any scale. */
  val TriMinSupport = 2

  /** q142 — triangle participation counts over the part co-purchase
    * graph, via degree-ordered orientation (the MapReduce-classic
    * Suri–Vassilvitskii / Cohen formulation).
    *
    * Graph: parts sharing ≥[[TriMinSupport]] orders (support filter =
    * the sparsifier). Each undirected edge is oriented from the
    * lower-(degree, id) endpoint to the higher one; every triangle is
    * then enumerated EXACTLY once as a wedge at its lowest-ordered
    * vertex plus one closing-edge probe.
    *
    * Scale shape — the whole point of the orientation: out-degree under
    * degree ordering is O(√m) even on power-law graphs, so the wedge
    * self-join fans out per-vertex by √m instead of by the hub degree
    * (a raw wedge join on a 10^6-degree hub is 10^12 rows; oriented it
    * is ≤ m). The closing-edge check joins on the CANONICAL (lo, hi)
    * key — a plain two-column hash equi-join, never an OR-predicate
    * join (which would force BNL/cartesian in any engine). Wedge and
    * closing relations both derive from the same oriented-edge subtree;
    * exchange reuse shares its shuffle. Per-node counts export every
    * triangle corner, so one wrong edge anywhere flips the hash. */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val pairs = li.as("a").join(li.as("b"), expr("a.ok = b.ok AND a.pk < b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= TriMinSupport)
      .select("u", "v")
    val und = pairs.unionByName(pairs.select(col("v").as("u"), col("u").as("v")))
    val deg = und.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val o = und
      .join(deg.as("du"), col("u") === col("du.node"))
      .join(deg.as("dv"), col("v") === col("dv.node"))
      .filter(col("du.deg") < col("dv.deg") ||
        (col("du.deg") === col("dv.deg") && col("u") < col("v")))
      .select(col("u").as("s"), col("v").as("t"))
    val closing = o.select(least(col("s"), col("t")).as("lo"),
      greatest(col("s"), col("t")).as("hi"))
    val tri = o.as("w1").join(o.as("w2"),
        expr("w1.s = w2.s AND w1.t < w2.t"))
      .select(col("w1.s").as("a"), col("w1.t").as("b"), col("w2.t").as("c"))
      .join(closing,
        least(col("b"), col("c")) === col("lo") &&
          greatest(col("b"), col("c")) === col("hi"))
      .select("a", "b", "c")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("tri_cnt"))
  }

  private def triOracle: String = s"""
    WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    pairs AS (
      SELECT a.pk AS u, b.pk AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= $TriMinSupport),
    und AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
    deg AS (SELECT u AS node, COUNT(*) AS deg FROM und GROUP BY 1),
    o AS (
      SELECT e.u AS s, e.v AS t FROM und e
      JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      WHERE du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)),
    closing AS (
      SELECT LEAST(s, t) AS lo, GREATEST(s, t) AS hi FROM o),
    tri AS (
      SELECT w1.s AS a, w1.t AS b, w2.t AS c
      FROM o w1 JOIN o w2 ON w1.s = w2.s AND w1.t < w2.t
      JOIN closing e3
        ON e3.lo = LEAST(w1.t, w2.t) AND e3.hi = GREATEST(w1.t, w2.t)),
    corners AS (
      SELECT a AS part FROM tri UNION ALL
      SELECT b FROM tri UNION ALL SELECT c FROM tri)
    SELECT part, COUNT(*) AS tri_cnt FROM corners GROUP BY part"""

  /** Fixed synchronous supersteps, interpolated into BOTH sides. */
  val LpaIters = 3

  /** q216 — LABEL-PROPAGATION community detection over the part
    * co-purchase graph (q142's support-sparsified edges): labels start
    * as node ids; each synchronous superstep reassigns every node the
    * MODE of its neighbors' labels, ties to the smallest label — the
    * classic LPA vote, made gate-able by being pure integer argmax
    * (no float score ever exists, so the fixpoint is bit-identical in
    * any engine). The per-node argmax is computed WITHOUT a window:
    * `max(struct(cnt, -label))` reduces with map-side partial
    * aggregation carrying one struct per node — lexicographic struct
    * order = count DESC then label ASC, exactly the oracle's
    * row_number ordering. Scale shape per superstep: one join shuffle
    * on the edge source + one aggregate on the destination — the q127
    * Pregel-by-joins cost, with exchange reuse sharing the edge
    * shuffle across supersteps. */
  def labelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val pairs = li.as("a").join(li.as("b"), expr("a.ok = b.ok AND a.pk < b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= TriMinSupport)
      .select("u", "v")
    val edges = pairs.unionByName(
      pairs.select(col("v").as("u"), col("u").as("v")))
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node").cast("long"))
    for (_ <- 1 to LpaIters) {
      labels = edges.join(labels, col("u") === col("node"))
        .groupBy(col("v"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("v").as("n2"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("n2").as("node"), (-col("m.nl")).as("label"))
    }
    labels.select(col("node").cast("long").as("node"), col("label"))
  }

  private def lpaOracle: String = {
    val iters = (1 to LpaIters).map { i =>
      val prev = s"l${i - 1}"
      s"""c$i AS (
        SELECT e.v AS node, l.label, COUNT(*) AS cnt
        FROM und e JOIN $prev l ON l.node = e.u GROUP BY 1, 2),
      l$i AS (
        SELECT node, label FROM (
          SELECT node, label, row_number() OVER (PARTITION BY node
            ORDER BY cnt DESC, label) AS rn
          FROM c$i) WHERE rn = 1)"""
    }.mkString(",\n      ")
    s"""
      WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      pairs AS (
        SELECT a.pk AS u, b.pk AS v
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2 HAVING COUNT(*) >= $TriMinSupport),
      und AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
      l0 AS (SELECT DISTINCT u AS node, CAST(u AS BIGINT) AS label
             FROM und),
      $iters
      SELECT CAST(node AS BIGINT) AS node, label FROM l$LpaIters"""
  }

  /** q289 — 2-HOP NEIGHBORHOOD FEATURES over the purchase graph (the
    * graph-feature extraction a GNN/recsys training pipeline runs per
    * node): for every customer, the out-degree (distinct parts), the
    * co-purchase cohort size (distinct customers sharing ≥1 part), and
    * the cohort's total degree mass — all exact integers. Two
    * relational supersteps: edges ⋈ edges on the part key (the wedge
    * join), then a per-source aggregate; degree mass joins the degree
    * relation back on the DISTINCT cohort pairs so shared parts never
    * double-count a neighbor.
    *
    * Scale shape: the wedge join's cost is Σ_part deg(part)² — the
    * triangle-counting bound, governed by hub parts. At 100 TB the
    * standard cures compose (degree-capped wedges like q142's
    * degree-ordering, or hub salting via [[graft.util.Skew]]); at gate
    * scale the honest exact join is the point. Distinct-before-join
    * keeps the cohort relation a set, so the degree join is
    * |cohort pairs|, not |wedges|. */
  def khopFeatures(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("cust"),
        col("l_partkey").cast("long").as("part"))
      .distinct()
    val deg = edges.groupBy(col("cust").as("node"))
      .agg(count(lit(1)).as("deg"))
    val cohort = edges.as("a")
      .join(edges.as("b"), col("a.part") === col("b.part"))
      .filter(col("a.cust") =!= col("b.cust"))
      .select(col("a.cust").as("cust"), col("b.cust").as("peer"))
      .distinct()
    cohort.join(deg.select(col("node").as("peer"), col("deg")), Seq("peer"))
      .groupBy("cust")
      .agg(count(lit(1)).as("n_cohort"), sum("deg").as("cohort_degree"))
      .join(deg.select(col("node").as("cust"), col("deg").as("out_degree")),
        Seq("cust"))
      .select("cust", "out_degree", "n_cohort", "cohort_degree")
  }

  private val khopOracle: String = """
      WITH e AS (
        SELECT DISTINCT CAST(o_custkey AS BIGINT) AS cust,
          CAST(l_partkey AS BIGINT) AS part
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      deg AS (SELECT cust AS node, COUNT(*) AS deg FROM e GROUP BY 1),
      cohort AS (
        SELECT DISTINCT a.cust AS cust, b.cust AS peer
        FROM e a JOIN e b ON b.part = a.part AND b.cust <> a.cust)
      SELECT c.cust, d2.deg AS out_degree,
        COUNT(*) AS n_cohort,
        CAST(SUM(d.deg) AS BIGINT) AS cohort_degree
      FROM cohort c
      JOIN deg d ON d.node = c.peer
      JOIN deg d2 ON d2.node = c.cust
      GROUP BY 1, 2"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q289_khop_features", khopFeatures, Some(khopOracle)),
    QueryDef("q127_pagerank", pageRank, Some(prOracle)),
    QueryDef("q142_triangles", triangles, Some(triOracle)),
    QueryDef("q216_label_propagation", labelPropagation, Some(lpaOracle)))
}
