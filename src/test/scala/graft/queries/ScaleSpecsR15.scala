package graft.queries

import graft.SparkTestBase

/** Plan-shape pins for the round-15 operators — the cluster-scale
  * contracts stated in their Scaladocs, captured from actual plans. */
class ScaleSpecsR15 extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("priority sample: bounded-heap partial agg, no window, no sort-merge") {
    val plan = AnalyticsQueries.prioritySample(spark, dir)
      .queryExecution.executedPlan.toString
    // the top-(k+1) must reduce map-side through the typed-imperative
    // heap — a window formulation would shuffle and SORT every row
    assert(plan.toLowerCase.contains("topkpairs") ||
        plan.contains("ObjectHashAggregate"),
      s"bounded-heap aggregate missing:\n${plan.take(2000)}")
    assert(!plan.contains("Window"),
      "priority sample must not plan a window over the corpus")
    assert(!plan.contains("SortMergeJoin"),
      "the sampled join-back must broadcast, not sort-merge")
  }

  test("pca covariance: inline pair generation — no corpus join, one tiny exchange family") {
    val plan = SimilarityQueries.pcaCovariance(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"),
      "upper-triangle products must generate inline")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"covariance must never join the corpus:\n${plan.take(2000)}")
    // map-side partial aggregation bounds every partition's output at d²
    assert(plan.contains("partial_sum"),
      "pair sums must combine map-side before the exchange")
  }

  test("ivf range search: candidate join broadcasts, nothing sort-merges") {
    val plan = SimilarityQueries.ivfRangeSearch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the (query × kept-cell) probe must broadcast against the corpus")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"range search shuffled or went all-pairs:\n${plan.take(2000)}")
  }

  test("k-hop features: wedge join stays equi, never cartesian") {
    val plan = GraphQueries.khopFeatures(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge join must be an equi-join on the part key:\n${plan.take(2000)}")
  }

  test("query likelihood: top-k survives a coalesce (the AQE limit-elimination trap)") {
    // Spark 4.1's AQE logical replan ELIMINATED a GlobalLimit under a
    // Repartition/coalesce on this query's original orderBy+limit plan
    // (the verify dump's coalesce(1) returned every candidate). The
    // bounded-heap rewrite removes the hazard class; this pins the
    // exact failing composition so a regression to orderBy+limit — or
    // a recurrence elsewhere — fails loudly.
    val ql = RetrievalQueries.queryLikelihood(spark, dir)
    assert(ql.count() == RetrievalQueries.QlTopK.toLong)
    assert(ql.coalesce(1).count() == RetrievalQueries.QlTopK.toLong,
      "coalesce(1) changed the row count — the AQE limit bug is back")
  }

  test("every final-limit query survives the dump's coalesce(1) — the AQE hazard sweep") {
    // the verify dump appends coalesce(1) to EVERY query; q294 proved
    // Spark 4.1's AQE replan can eliminate a GlobalLimit under exactly
    // that composition. Sweep the queries whose plans end in
    // orderBy+limit so any future manifestation fails here, loudly,
    // instead of at the driver's hash gate.
    // (some of these limit mid-query — top-50 terms then expand — so
    // the pin is coalesce-INVARIANCE, not an absolute row cap)
    val sweep = Seq("q55_tfidf_top_terms", "q130_collocations",
      "q50_top_bigrams", "q146_bpe_vocab", "q144_bm25")
    sweep.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plain = df.count()
      val coalesced = df.coalesce(1).count()
      assert(plain == coalesced,
        s"$name: coalesce(1) changed rows $plain -> $coalesced (AQE limit bug)")
    }
    // q144's plan-internal offset+limit (the q294 triplication shape):
    // two evaluations must agree row-for-row
    val a = RetrievalQueries.bm25(spark, dir).collect().toSet
    val b = RetrievalQueries.bm25(spark, dir).collect().toSet
    assert(a == b, "bm25 returned different results across evaluations")
  }

  test("kmv sketches: bottom-k through the bounded heap, corpus never sorts") {
    val plan = AnalyticsQueries.kmvSketchOps(spark, dir)
      .queryExecution.executedPlan.toString
    // the collected synopsis is driver-side by design; the exact-count
    // companion join must not sort the base relation either
    assert(!plan.contains("SortMergeJoin"),
      s"exact-union companion must broadcast the 10-row pair list:\n${plan.take(2000)}")
  }

  test("era-aware reads keep column pruning and filter pushdown") {
    // the MoR/era read (renames/drops/defaults/added columns) plans a
    // cast-mapped union over per-era scans — at 100 TB it MUST still
    // prune columns and push filters into parquet, or every evolved
    // table pays full-width scans forever
    import org.apache.spark.sql.functions._
    val t = java.nio.file.Files.createTempDirectory("graft_prune").toString + "/t"
    val orders = Tables(spark, dir, "orders")
    graft.lake.Snapshots.append(spark, t, orders)
    graft.lake.Snapshots.renameColumn(spark, t, "o_orderstatus", "status")
    graft.lake.Snapshots.deleteWhere(spark, t, col("o_totalprice") < 10000)
    val narrow = graft.lake.Snapshots.readLatest(spark, t).get
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderpriority")
    val plan = narrow.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toList
      .filterNot(_.contains("struct<file:string"))  // tombstone sidecar
    assert(schemas.nonEmpty)
    schemas.foreach { rs =>
      assert(!rs.contains("o_totalprice") && !rs.contains("o_custkey"),
        s"era read lost column pruning: $rs")
    }
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]") ||
      plan.contains("EqualTo(o_orderpriority,1-URGENT)"),
      s"era read lost filter pushdown:\n${plan.take(1500)}")
  }
}
