package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.Tables

/** Structural + recall checks for the approximate search paths against the
  * exact brute-force baseline (deterministic data + deterministic
  * algorithms ⇒ stable recall). */
class SimilaritySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables(spark, dir, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact = resultSet(
    Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))

  test("brute force returns exactly k neighbors per query, no self-matches") {
    val rows = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect()
    assert(rows.length == 20 * 5)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("IVF probe search achieves useful recall and never invents neighbors") {
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 8)
    val got = resultSet(ivf)
    val recall = (got intersect exact).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.3f")
    assert(recall >= 0.3, f"recall $recall%.3f")
    // every IVF hit must score no better than the exact top-1
    assert(got.forall { case (q, _) => exact.exists(_._1 == q) })
  }

  test("LSH bucket search results are a subset-quality approximation") {
    val lsh = resultSet(
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5))
    val recall = (lsh intersect exact).size.toDouble / exact.size
    info(f"LSH recall@5 = $recall%.3f")
    assert(recall > 0.0) // buckets are coarse at 8 planes; exactness is q24/q25's job
  }

  test("k-means refinement improves the centroid objective; full probe stays exact") {
    val nCells = 16
    val sampled = Similarity.sampleCentroids(emb, "vec_id", "embedding", nCells)
    val trained = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCells, iters = 3)
    assert(trained.length == nCells)
    // spherical k-means objective: mean max-cosine to the nearest centroid
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def objective(cents: Array[Array[Double]]): Double =
      vecs.map(v => cents.map(c => cos(v, c)).max).sum / vecs.length
    val objS = objective(sampled)
    val objT = objective(trained)
    info(f"objective sampled=$objS%.4f trained=$objT%.4f")
    assert(objT >= objS - 1e-9)
    // probing every trained cell is exhaustive ⇒ identical to brute force
    val got = resultSet(Similarity.ivfTopKTrained(emb, queries, "vec_id",
      "embedding", 5, trained, nProbe = nCells))
    assert(got == exact)
  }

  test("incremental NSW add: recall holds the fresh-build floor") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_nswinc").toString + "/idx"
    val initial = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    Similarity.nswIndexBuild(spark, root, initial, "vec_id", "embedding")
    Similarity.nswIndexAdd(spark, root, batch, "vec_id", "embedding")
    val inc = Similarity.nswIndexSearch(spark, root, emb, queries,
      "vec_id", "embedding", 5)
    val fresh = Similarity.nswTopK(emb, queries, "vec_id", "embedding", 5)
    val rInc = (resultSet(inc) intersect exact).size.toDouble / exact.size
    val rFresh = (resultSet(fresh) intersect exact).size.toDouble / exact.size
    info(f"incremental recall@5 = $rInc%.3f vs fresh $rFresh%.3f")
    // insert wiring differs from a one-shot build (batch nodes wire
    // only against existing buckets, old nodes keep their edges), but
    // it must stay within a fixed floor of the fresh rebuild — the
    // FAISS add() quality contract
    assert(rInc >= 0.4, f"incremental recall $rInc%.3f below floor")
    assert(rInc >= rFresh - 0.15,
      f"add() lost too much vs fresh rebuild: $rInc%.3f < $rFresh%.3f - 0.15")
    // added vectors are findable: batch ids appear among results of a
    // search whose true top-k contains them
    val incSet = resultSet(inc)
    val exactBatchPairs = exact.filter { case (_, n) => n % 5 == 0 }
    if (exactBatchPairs.nonEmpty)
      assert((incSet intersect exactBatchPairs).nonEmpty,
        "no batch vector ever surfaced despite being a true neighbor")
    // a second add() is one O(batch) append, never a rewrite: v2 files
    // carry into v3 by reference
    import graft.lake.Snapshots
    def files(t: String) = Snapshots.snapshot(spark, s"$root/$t",
      Snapshots.latestVersion(spark, s"$root/$t").get).get.files.toSet
    val (e2, s2) = (files("edges"), files("sigs"))
    Similarity.nswIndexAdd(spark, root,
      emb.filter(col("vec_id") % 5 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L),
      "vec_id", "embedding")
    assert(e2.subsetOf(files("edges")) && s2.subsetOf(files("sigs")))
  }

  test("NSW graph search: structure, determinism, and useful recall") {
    val nsw = Similarity.nswTopK(emb, queries, "vec_id", "embedding", 5)
    val rows = nsw.collect()
    // never a self-match; ranks contiguous from 1 per query
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length),
        s"non-contiguous ranks for query $q")
      assert(rs.length <= 5)
    }
    // deterministic build + search: identical output across runs
    val again = Similarity.nswTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(_.toString).sorted
    assert(again.sameElements(rows.map(_.toString).sorted))
    // greedy routing through the banded-LSH graph must find a useful
    // fraction of the true neighbors from a single fixed entry point
    val recall = (resultSet(nsw) intersect exact).size.toDouble / exact.size
    info(f"NSW recall@5 = $recall%.3f")
    assert(recall >= 0.4, f"recall $recall%.3f")
    // scores are true cosines: no NSW hit may beat the exact top-1
    val best = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    nsw.collect().foreach(r =>
      assert(r.getDouble(3) <= best(r.getLong(0)) + 1e-12))
  }

  test("HNSW descent: layer sizes geometric, recall >= single-layer NSW") {
    // layer populations follow the 4^-l hash-geometric rule
    val lvls = emb.select(Similarity.hnswLevel(col("vec_id")).as("l"))
      .groupBy("l").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = lvls.values.sum
    val n1 = lvls.filterKeys(_ >= 1).values.sum
    val n2 = lvls.getOrElse(2, 0L)
    assert(n1 > 0 && n1 < n / 2, s"layer1 population $n1 of $n")
    assert(n2 < n1, s"layer2 $n2 not sparser than layer1 $n1")
    val layers = Similarity.hnswBuildLayers(emb, "vec_id", "embedding")
    val hnsw = Similarity.hnswSearch(layers, emb, queries, "vec_id",
      "embedding", 5)
    val rows = hnsw.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    // deterministic
    val again = Similarity.hnswSearch(layers, emb, queries, "vec_id",
      "embedding", 5).collect().map(_.toString).sorted
    assert(again.sameElements(rows.map(_.toString).sorted))
    // the hierarchy must not LOSE recall vs the single-layer search —
    // the descent seeds the base beam nearer the answer
    val nsw = Similarity.nswTopK(emb, queries, "vec_id", "embedding", 5)
    val rNsw = (resultSet(nsw) intersect exact).size.toDouble / exact.size
    val rHnsw = (resultSet(hnsw) intersect exact).size.toDouble / exact.size
    info(f"HNSW recall@5 = $rHnsw%.3f vs NSW $rNsw%.3f")
    assert(rHnsw >= rNsw, f"hierarchy lost recall: $rHnsw%.3f < $rNsw%.3f")
    // scores are true cosines: no hit may beat the exact top-1
    val best = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    rows.foreach(r => assert(r.getDouble(3) <= best(r.getLong(0)) + 1e-12))
  }

  test("PQ-ADC search: structure, determinism, and better-than-chance recall") {
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      nSub = 4, nCodes = 64, dim = 64)
    assert(cbs.length == 4 && cbs.forall(_.length == 64) &&
      cbs.forall(_.forall(_.length == 16)))
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
      cbs, dim = 64)
    val rows = pq.collect()
    assert(rows.length == 20 * 5)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    // deterministic: a second evaluation is row-identical
    assert(Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
      cbs, dim = 64).collect().toSeq == rows.toSeq)
    // quantized scores still retrieve far better than random: expected
    // random recall@5 over ~500 candidates is ~1%; require 10%
    val got = resultSet(pq)
    val recall = (got intersect exact).size.toDouble / exact.size
    info(f"PQ recall@5 = $recall%.3f")
    assert(recall >= 0.10, f"recall $recall%.3f")
    // 16 codes × 4 subspaces really compress: every corpus vector maps
    // into the finite code space, so distinct reconstructed score rows
    // per query are ≤ corpus size (sanity that ADC used codes, not the
    // original vectors: many candidates tie EXACTLY on the same score)
    val distinctScores = pq.select("query_id", "cos_sim").distinct().count()
    val pairs = pq.count()
    assert(distinctScores <= pairs)
  }

  test("trained PQ sub-codebooks improve the per-subspace objective") {
    val sampled = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      nSub = 4, nCodes = 16, dim = 64)
    val trained = Similarity.pqCodebooksTrained(emb, "vec_id", "embedding",
      nSub = 4, nCodes = 16, dim = 64, iters = 3)
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // mean max-sub-cosine per subspace: training must not regress it
    for (m <- 0 until 4) {
      def objective(cb: Array[Array[Double]]): Double =
        vecs.map { v =>
          val sub = v.slice(m * 16, (m + 1) * 16)
          cb.map(c => cos(sub, c)).max
        }.sum / vecs.length
      val s = objective(sampled(m)); val t = objective(trained(m))
      info(f"subspace $m objective sampled=$s%.4f trained=$t%.4f")
      assert(t >= s - 1e-9, f"subspace $m regressed: $t%.4f < $s%.4f")
    }
    // the trained search still returns a full, deterministic result set
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
      trained, dim = 64)
    assert(pq.count() == 20 * 5)
    val recall = (resultSet(pq) intersect exact).size.toDouble / exact.size
    info(f"trained-PQ recall@5 = $recall%.3f")
    assert(recall > 0.0)
  }

  test("IVF-PQ composes: probed cells only, codes drive the scores") {
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCells = 16, iters = 2)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      nSub = 4, nCodes = 64, dim = 64)
    val ivfpq = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 5,
      cents, nProbe = 8, cbs, dim = 64)
    val got = resultSet(ivfpq)
    // IVF-PQ results ⊆ flat-PQ results' candidate space: with FULL probe
    // it must equal flat PQ exactly (cells only prune, never re-rank)
    val full = resultSet(Similarity.ivfPqTopK(emb, queries, "vec_id",
      "embedding", 5, cents, nProbe = 16, cbs, dim = 64))
    val flat = resultSet(Similarity.pqTopK(emb, queries, "vec_id",
      "embedding", 5, cbs, dim = 64))
    assert(full == flat, "full-probe IVF-PQ diverged from flat PQ")
    val recall = (got intersect exact).size.toDouble / exact.size
    info(f"IVF-PQ recall@5 = $recall%.3f")
    assert(recall > 0.0)
  }

  test("widening probes improves or preserves IVF recall") {
    def recallAt(nProbe: Int): Double = {
      val got = resultSet(Similarity.ivfTopK(emb, queries, "vec_id",
        "embedding", 5, nCells = 16, nProbe = nProbe))
      (got intersect exact).size.toDouble / exact.size
    }
    val r2 = recallAt(2)
    val r16 = recallAt(16)
    info(f"recall nProbe=2: $r2%.3f, nProbe=16: $r16%.3f")
    assert(r16 >= r2)
    assert(r16 == 1.0) // probing every cell = exhaustive = exact
  }

  test("HNSW layer count scales log4 with corpus size") {
    import Similarity.hnswMaxLevelFor
    assert(hnswMaxLevelFor(31) == 0 && hnswMaxLevelFor(32) == 1)
    assert(hnswMaxLevelFor(127) == 1 && hnswMaxLevelFor(128) == 2)
    // layer 3 appears exactly when n crosses 4^3 * floor = 512
    assert(hnswMaxLevelFor(511) == 2 && hnswMaxLevelFor(512) == 3)
    assert(hnswMaxLevelFor(2047) == 3 && hnswMaxLevelFor(2048) == 4)
    // the static emission bound caps growth until a rebuild raises it
    assert(hnswMaxLevelFor(100000000L) == Similarity.HnswStaticMaxLevel)
    // integration: the 500-node corpus earns layers 0..2; pushing past
    // 512 births layer 3
    assert(Similarity.hnswBuildLayers(emb, "vec_id", "embedding").size == 3)
    val bigger = emb.unionByName(emb.limit(100)
      .withColumn("vec_id", col("vec_id") + 1000000L))
    assert(Similarity.hnswBuildLayers(bigger, "vec_id", "embedding")
      .size == 4)
  }

  test("graph-ANN delete: tombstoned results, repair restores the graph") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_nswdel").toString + "/idx"
    Similarity.nswIndexBuild(spark, root, emb, "vec_id", "embedding")
    val pre = resultSet(Similarity.nswIndexSearch(spark, root, emb,
      queries, "vec_id", "embedding", 5))
    Similarity.nswIndexDelete(spark, root, col("id") % 9 === 3)
    val post = resultSet(Similarity.nswIndexSearch(spark, root, emb,
      queries, "vec_id", "embedding", 5))
    // no deleted id ever surfaces
    assert(post.forall { case (_, n) => n % 9 != 3 })
    // the scored set is identical, so surviving pre-delete results all
    // stay — recall on survivors can only improve
    assert(pre.filter { case (_, n) => n % 9 != 3 }.subsetOf(post))
    val survivors = emb.filter(col("vec_id") % 9 =!= 3)
    val exactSurv = resultSet(Similarity.bruteForceTopK(survivors,
      queries, "vec_id", "embedding", 5))
    val rPost = (post intersect exactSurv).size.toDouble / exactSurv.size
    val rPre = (pre intersect exactSurv).size.toDouble / exactSurv.size
    info(f"post-delete survivor recall $rPost%.3f vs pre $rPre%.3f")
    assert(rPost >= rPre)
    // optimize: edges clean, tombstones cleared, recall holds
    Similarity.nswIndexOptimize(spark, root)
    import graft.lake.Snapshots
    assert(Snapshots.readLatest(spark, s"$root/tombstones").get.isEmpty)
    val edges = Snapshots.readLatest(spark, s"$root/edges").get
    assert(edges.filter(col("src") % 9 === 3 || col("dst") % 9 === 3)
      .isEmpty, "repaired graph keeps deleted edges")
    val rep = resultSet(Similarity.nswIndexSearch(spark, root, survivors,
      queries, "vec_id", "embedding", 5))
    assert(rep.forall { case (_, n) => n % 9 != 3 })
    val rRep = (rep intersect exactSurv).size.toDouble / exactSurv.size
    info(f"post-repair survivor recall $rRep%.3f")
    assert(rRep >= rPost - 0.1, f"repair lost recall: $rRep%.3f")
  }

  test("HNSW delete mirrors the NSW lifecycle across layers") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_hnswdel").toString + "/idx"
    Similarity.hnswIndexBuild(spark, root, emb, "vec_id", "embedding")
    Similarity.hnswIndexDelete(spark, root, col("id") % 9 === 3)
    val post = resultSet(Similarity.hnswIndexSearch(spark, root, emb,
      queries, "vec_id", "embedding", 5))
    assert(post.forall { case (_, n) => n % 9 != 3 })
    Similarity.hnswIndexOptimize(spark, root)
    import graft.lake.Snapshots
    assert(Snapshots.readLatest(spark, s"$root/tombstones").get.isEmpty)
    (0 to Similarity.hnswIndexLevels(spark, root)).foreach { l =>
      val e = Snapshots.readLatest(spark, s"$root/l$l/edges").get
      assert(e.filter(col("src") % 9 === 3 || col("dst") % 9 === 3)
        .isEmpty, s"layer $l keeps deleted edges")
    }
    val survivors = emb.filter(col("vec_id") % 9 =!= 3)
    val rep = resultSet(Similarity.hnswIndexSearch(spark, root, survivors,
      queries, "vec_id", "embedding", 5))
    assert(rep.forall { case (_, n) => n % 9 != 3 })
    val exactSurv = resultSet(Similarity.bruteForceTopK(survivors,
      queries, "vec_id", "embedding", 5))
    val rRep = (rep intersect exactSurv).size.toDouble / exactSurv.size
    info(f"HNSW post-repair survivor recall $rRep%.3f")
    assert(rRep >= 0.4, f"post-repair recall $rRep%.3f below floor")
  }

  test("filtered graph search: brute-force-filtered recall, one index " +
      "serves every predicate (r18)") {
    // the q321 hybrid-search discipline: the predicate applies to the
    // RESULT set while routing traverses the FULL graph (ACORN /
    // FreshDiskANN-tombstone shape) — so ONE edge list, built once,
    // serves any predicate with no rebuild
    val edges = Similarity.nswBuildEdges(emb, "vec_id", "embedding", m = 8)
    def filteredRecall(pred: org.apache.spark.sql.Column): Double = {
      val exactF = resultSet(Similarity.bruteForceTopK(
        emb.filter(pred), queries, "vec_id", "embedding", 5))
      val got = resultSet(Similarity.nswSearch(edges, emb, queries,
        "vec_id", "embedding", 5,
        exclude = Some(emb.filter(!pred).select("vec_id"))))
      // never an invented result: every hit satisfies the predicate
      val allowed = emb.filter(pred).select("vec_id").collect()
        .map(_.getLong(0)).toSet
      assert(got.forall { case (_, n) => allowed(n) },
        "a filtered search returned a node failing the predicate")
      (got intersect exactF).size.toDouble / exactF.size
    }
    val rEven = filteredRecall(col("label") % 2 === 0)
    info(f"filtered NSW recall@5 (label even) = $rEven%.3f")
    assert(rEven >= 0.4, f"filtered recall $rEven%.3f below floor")
    // the SAME edges serve the complementary predicate — no rebuild
    val rOdd = filteredRecall(col("label") % 2 === 1)
    info(f"filtered NSW recall@5 (label odd)  = $rOdd%.3f")
    assert(rOdd >= 0.4, f"filtered recall $rOdd%.3f below floor")
    // multi-layer HNSW twin through the same exclude discipline
    val layers = Similarity.hnswBuildLayers(emb, "vec_id", "embedding")
    val pred = col("label") % 2 === 0
    val exactF = resultSet(Similarity.bruteForceTopK(
      emb.filter(pred), queries, "vec_id", "embedding", 5))
    val hnsw = resultSet(Similarity.hnswSearch(layers, emb, queries,
      "vec_id", "embedding", 5,
      exclude = Some(emb.filter(!pred).select("vec_id"))))
    val rH = (hnsw intersect exactF).size.toDouble / exactF.size
    info(f"filtered HNSW recall@5 = $rH%.3f")
    assert(rH >= 0.4, f"filtered HNSW recall $rH%.3f below floor")
  }
}
