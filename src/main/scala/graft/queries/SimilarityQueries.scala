package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Similarity search over `embeddings`: exact brute-force cosine top-k and
  * the LSH-bucketed approximate path, with DuckDB oracles. The fixed query
  * set (vec_id < 20) keeps oracle cost bounded at every scale factor. */
object SimilarityQueries {

  private val K = 5
  private val NumPlanes = 8
  private val NumBands = 4
  private val Dim = 64

  private def queriesOf(df: DataFrame): DataFrame =
    df.filter(col("vec_id") < 20)

  private def e6(df: DataFrame): DataFrame =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
      floor(col("cos_sim") * 1000000).as("cos_sim_e6"))

  /** Quantization scale for the exact covariance: embedding floats carry
    * ≤7 significant digits, so q = round(x·10³) keeps products and sums
    * inside long range at gate scale while the ACCUMULATOR runs in
    * DECIMAL(38,0)/HUGEINT ([[Num.sumBig]] discipline) — n·Σqq tops out
    * near 10²⁴ at 10⁹ rows, far past 2⁶³ but comfortably inside 38
    * digits; the BIGINT export is exact until ~10¹⁸ absolute value
    * (≈10⁵× the sf0.1 magnitudes). */
  private val CovScale = 1000

  /** q280 — the REDUCE STEP OF DISTRIBUTED PCA, integer-exact: the d×d
    * centered covariance numerator C_ij = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ over the
    * corpus embeddings, quantized so both engines agree bitwise. This is
    * how PCA/whitening actually runs at 100 TB (d small, n huge): each
    * row CONTRIBUTES its d(d+1)/2 upper-triangle products INLINE — a
    * narrow generated-array pass with NO self-join and NO shuffle of the
    * corpus; map-side partial aggregation reduces every partition to
    * ≤d² running sums before the one tiny exchange (d²=4096 groups), the
    * relational mirror of `treeAggregate(outer-product)`. The driver-side
    * eigen solve on the 64×64 result is O(d³), independent of n
    * (PcaSpec pins power-iteration recovery on this output).
    *
    * Scale shape: cost O(n·d²) compute, O(d²) shuffle bytes per
    * partition, zero corpus movement — survives any n. The oracle
    * computes the same sums via a components self-join (fine at sf0.01;
    * the INLINE form is the scale path). */
  def pcaCovariance(spark: SparkSession, dir: String): DataFrame = {
    val q = graft.util.Par.ensure(Tables(spark, dir, "embeddings"))
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * CovScale).cast("long")).as("q"))
    val nDf = q.agg(count(lit(1)).as("n"))
    val sums = q.select(posexplode(col("q")).as(Seq("_p", "_x")))
      .groupBy((col("_p") + 1).cast("long").as("i"))
      .agg(Num.sumBig(col("_x")).as("si"))
    val pairs = q.select(explode(flatten(transform(col("q"), (qi, i) =>
        transform(slice(col("q"), i + lit(1), lit(Dim) - i), (qj, joff) =>
          struct((i + 1).cast("long").as("i"),
            (i + joff + 1).cast("long").as("j"),
            (qi * qj).as("p")))))).as("pr"))
      .groupBy(col("pr.i").as("i"), col("pr.j").as("j"))
      .agg(Num.sumBig(col("pr.p")).as("sij"))
    pairs
      .join(sums.select(col("i"), col("si").as("_sa")), Seq("i"))
      .join(sums.select(col("i").as("j"), col("si").as("_sb")), Seq("j"))
      .crossJoin(broadcast(nDf))
      .select(col("i"), col("j"),
        (col("n") * col("sij") - col("_sa") * col("_sb"))
          .cast("long").as("cov_num"))
  }

  private val pcaCovOracle = s"""
      WITH qv AS (
        SELECT vec_id, list_transform(embedding,
          x -> CAST(round(x * $CovScale) AS BIGINT)) AS q
        FROM embeddings),
      comp AS (
        SELECT vec_id, unnest(range(1, $Dim + 1)) AS i, q FROM qv),
      c2 AS (SELECT vec_id, i, q[CAST(i AS INT)] AS x FROM comp),
      nn AS (SELECT COUNT(*) AS n FROM qv),
      s AS (SELECT i, SUM(x) AS si FROM c2 GROUP BY i),
      g AS (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sij
            FROM c2 a JOIN c2 b ON b.vec_id = a.vec_id AND b.i >= a.i
            GROUP BY 1, 2)
      SELECT g.i, g.j,
        CAST((SELECT n FROM nn) * g.sij - sa.si * sb.si AS BIGINT)
          AS cov_num
      FROM g JOIN s sa ON sa.i = g.i JOIN s sb ON sb.i = g.j"""

  /** q299 — EMBEDDING DRIFT MONITORING between two corpus states (the
    * model-ops check every retrieval/serving stack runs: has the
    * embedding distribution moved since the index was built?): per
    * dimension, the EXACT mean-shift numerator n_ref·S_cur − n_cur·S_ref
    * (cross-multiplied so no division touches the gate; sign and
    * magnitude order are what monitoring consumes) and the matching
    * variance-shift numerator from the q280 quantized second moments —
    * all integer arithmetic over the same 10³-quantized components, so
    * the drift tensor hash-compares bitwise. The "reference" state is
    * the label<5 half of the corpus, "current" is the whole table — the
    * shape of an index built yesterday serving today's appends.
    *
    * Scale shape: two narrow posexplode aggregates (map-side combined,
    * d groups each), one broadcast join of two d-row frames; the corpus
    * never shuffles. */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.util.Par.ensure(Tables(spark, dir, "embeddings"))
    def moments(df: DataFrame, tag: String): DataFrame = df
      .select(posexplode(transform(col("embedding"),
        x => round(x.cast("double") * CovScale).cast("long")))
        .as(Seq("_p", "_x")))
      .groupBy((col("_p") + 1).cast("long").as("i"))
      .agg(count(lit(1)).as(s"n_$tag"), sum(col("_x")).as(s"s_$tag"),
        sum(col("_x") * col("_x")).as(s"q_$tag"))
    moments(emb.filter(col("label") < 5), "ref")
      .join(moments(emb, "cur"), Seq("i"))
      .select(col("i"),
        (col("n_ref") * col("s_cur") - col("n_cur") * col("s_ref"))
          .as("mean_shift_num"),
        (col("n_ref") * col("q_cur") - col("n_cur") * col("q_ref"))
          .as("m2_shift_num"),
        col("n_ref"), col("n_cur"))
  }

  private val embeddingDriftOracle = s"""
      WITH qv AS (
        SELECT label, list_transform(embedding,
          x -> CAST(round(x * $CovScale) AS BIGINT)) AS q
        FROM embeddings),
      comp AS (
        SELECT label, unnest(range(1, $Dim + 1)) AS i, q FROM qv),
      c2 AS (SELECT label, i, q[CAST(i AS INT)] AS x FROM comp),
      ref AS (
        SELECT i, COUNT(*) AS n_ref, CAST(SUM(x) AS BIGINT) AS s_ref,
          CAST(SUM(x * x) AS BIGINT) AS q_ref
        FROM c2 WHERE label < 5 GROUP BY i),
      cur AS (
        SELECT i, COUNT(*) AS n_cur, CAST(SUM(x) AS BIGINT) AS s_cur,
          CAST(SUM(x * x) AS BIGINT) AS q_cur
        FROM c2 GROUP BY i)
      SELECT ref.i,
        CAST(n_ref * s_cur - n_cur * s_ref AS BIGINT) AS mean_shift_num,
        CAST(n_ref * q_cur - n_cur * q_ref AS BIGINT) AS m2_shift_num,
        n_ref, n_cur
      FROM ref JOIN cur ON cur.i = ref.i"""

  /** Range-search threshold (cosine) and cell count. The corpus is the
    * embeddings table shifted into 10 WELL-SEPARATED clusters (+8.0 on
    * dimension label·6, deterministic in both engines via exact
    * float→double + dyadic-literal addition) — the geometry a curated
    * near-dup corpus actually has, and the regime where metric-tree
    * pruning pays; the raw table is isotropic noise where NO sound
    * method can prune (max pairwise cosine ≈0.49, measured). */
  private val RangeTheta = 0.9
  private val RangeCells = 12

  private def shiftedCorpus(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        x.cast("double") +
          when(i === col("label") * 6, lit(8.0)).otherwise(lit(0.0)))
        .as("v"))

  /** q281 — ANN RANGE SEARCH (radius query) with PROVABLY COMPLETE cell
    * pruning: return every corpus vector within cosine ≥ θ of each
    * query. IVF cells (k-means) carry a per-cell COVERING RADIUS
    * rad_c = max member distance to centroid (on the unit sphere,
    * d(a,b) = √(2−2cos)); a query visits cell c only if
    * d(q,c) ≤ r + rad_c + ε (triangle inequality, r = √(2−2θ)) — a cell
    * skipped PROVABLY contains no answer, so results equal brute force
    * EXACTLY (the oracle IS brute force; any unsound prune fails the
    * hash gate). The ε slack absorbs fp rounding in the bound only —
    * it can only unprune.
    *
    * Scale shape: candidate work is Σ|kept cells|, not n, and the kept
    * count shrinks as cells tighten (more cells at bigger corpora —
    * FAISS's nlist ∝ √n rule); the tiny (query × kept-cell) relation
    * broadcasts against the cell-partitioned corpus — one equi-join,
    * no corpus shuffle, same plan family as [[Similarity.ivfTopK]].
    * The `pruned` column ATTESTS pruning happened (kept < q·cells). */
  def ivfRangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val corpus = shiftedCorpus(Tables(spark, dir, "embeddings"))
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "v", RangeCells)
    val assigned = Similarity.assignCells(corpus, "vec_id", "v", cents)
    val centArr = array(cents.map(c => array(c.map(lit): _*)): _*)
    val minCos = assigned
      .select(col("cell"),
        Similarity.cosine(col("v"), element_at(centArr, col("cell") + 1))
          .as("_c"))
      .groupBy("cell").agg(min("_c").as("mc")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val rad = (0 until RangeCells).map(c =>
      math.sqrt(math.max(0.0, 2.0 - 2.0 * minCos.getOrElse(c, 1.0))))
    val r = math.sqrt(2.0 - 2.0 * RangeTheta)
    val eps = 1e-6
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("_qv"))
    val qcell = queries
      .select(col("query_id"), col("_qv"),
        posexplode(array((0 until RangeCells).map(c =>
          Similarity.cosine(col("_qv"), array(cents(c).map(lit): _*))): _*))
          .as(Seq("cell", "_qc")))
      .filter(sqrt(greatest(lit(0.0), lit(2.0) - lit(2.0) * col("_qc"))) <=
        lit(r + eps) + element_at(array(rad.map(lit): _*), col("cell") + 1))
      .select(col("query_id"), col("_qv"), col("cell"))
    val nq = queries.count()
    val kept = qcell.count()
    require(kept >= nq, s"every query must keep its own cell ($kept < $nq)")
    val pruned = kept < nq * RangeCells
    assigned.join(broadcast(qcell), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(col("_qv"), col("v")).as("_cos"))
      .filter(col("_cos") >= RangeTheta)
      .select(col("query_id"), col("neighbor_id"),
        floor(col("_cos") * 1000000).as("cos_sim_e6"))
      .withColumn("pruned", lit(pruned))
  }

  private val ivfRangeOracle = {
    val cos = Similarity.sqlCosine("q.v", "c.v")
    s"""WITH sh AS (
        SELECT vec_id, list_transform(embedding, (x, i) ->
          CAST(x AS DOUBLE) +
            CASE WHEN i - 1 = label * 6 THEN 8.0 ELSE 0.0 END) AS v
        FROM embeddings)
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        CAST(floor($cos * 1000000) AS BIGINT) AS cos_sim_e6,
        true AS pruned
      FROM sh q JOIN sh c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 20 AND $cos >= $RangeTheta"""
  }

  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    e6(Similarity.bruteForceTopK(emb, queriesOf(emb), "vec_id", "embedding", K))
  }

  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    e6(Similarity.lshTopK(emb, queriesOf(emb), "vec_id", "embedding", K,
      NumPlanes, Dim))
  }

  private val cosSql = Similarity.sqlCosine("q.embedding", "c.embedding")

  private val cosineTopKOracle = s"""
      WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          $cosSql AS cos_sim
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 20),
      ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id,
        CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
      FROM ranked WHERE rank <= $K"""

  private val lshTopKOracle = {
    val planes = Similarity.hyperplanes(NumPlanes, Dim)
    val qBucket = Similarity.sqlLshBucket("q.embedding", planes)
    val cBucket = Similarity.sqlLshBucket("c.embedding", planes)
    s"""WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          $cosSql AS cos_sim
        FROM embeddings q JOIN embeddings c
          ON c.vec_id <> q.vec_id AND $cBucket = $qBucket
        WHERE q.vec_id < 20),
      ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id,
        CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
      FROM ranked WHERE rank <= $K"""
  }

  /** Trained centroids are an index: built once per corpus, probed many
    * times (how IVF is used in production). Memoized per data dir —
    * training is deterministic and the testdata dirs are immutable, so
    * this is a pure cache; if a path's data could be rewritten within a
    * JVM, the key would need a content fingerprint. */
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]

  /** k-means-trained IVF ANN: centroids Lloyd-refined on the corpus, then
    * the standard nProbe cell search. The oracle replays the TRAINING
    * itself in SQL ([[Similarity.sqlKmeansIvfTopK]]) — centroids are
    * data-dependent, so literals would pin one scale factor; the CTE
    * chain holds at any dir. Exactness at full probe and objective
    * improvement are additionally pinned by SimilaritySpec. */
  def ivfKmeansTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cents = centroidCache.getOrElseUpdate(dir,
      Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        nCells = 16, iters = 2))
    e6(Similarity.ivfTopKTrained(emb, queriesOf(emb), "vec_id", "embedding",
      K, cents, nProbe = 8))
  }

  private val ivfKmeansOracle = Similarity.sqlKmeansIvfTopK(nCells = 16,
    iters = 2, nProbe = 8, k = K, dim = Dim, queryPred = "e.vec_id < 20")

  /** Embedding-cosine near-dup pairs: multi-band sign-LSH with a
    * corpus-scaled per-band plane count (bucket count ∝ corpus size, so
    * intra-bucket pairwise work stays O(n·cap·bands) at any scale). */
  def embeddingNearDups(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDuplicates(Tables(spark, dir, "embeddings"),
      "vec_id", "embedding", threshold = 0.35, numBands = NumBands, dim = Dim)
      .select(col("a"), col("b"), floor(col("cos_sim") * 1000000).as("cos_sim_e6"))

  private val embeddingNearDupsOracle = Similarity.sqlBandedNearDuplicates(
    threshold = 0.35, numBands = NumBands, dim = Dim,
    targetBucketCap = 1024L, minPlanes = 8, maxPlanes = 24)

  /** Embedding duplicate clusters: connected components over the banded
    * near-dup pair graph — the full "collapse duplicate groups" shape for
    * embedding-keyed dedup, sharing the adaptive CC implementation
    * (driver union-find small, pointer-jumping at scale) with q37. */
  def embeddingDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val (pairs, release) = Similarity.embeddingNearDuplicatesReleasable(
      Tables(spark, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.35, numBands = NumBands, dim = Dim)
    // safe by connectedComponents' documented contract: it eagerly
    // localCheckpoints the pair relation before returning, so `cc` never
    // re-reads the released caches
    val cc = graft.dedup.Dedup.connectedComponents(
      pairs.select(col("a"), col("b")))
    release()
    cc
  }

  private val embeddingDupClustersOracle = {
    val ctes = Similarity.sqlBandedNearDupCtes(threshold = 0.35,
      numBands = NumBands, dim = Dim, targetBucketCap = 1024L,
      minPlanes = 8, maxPlanes = 24)
    s"""WITH RECURSIVE $ctes,
      edges AS (
        SELECT a AS src, b AS dst FROM bpairs
        UNION ALL
        SELECT b AS src, a AS dst FROM bpairs),
      reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src"""
  }

  /** q232 — MATRYOSHKA two-stage ANN (MRL, Kusupati et al.: embeddings
    * trained so information concentrates in the PREFIX dims — search
    * coarse on a short prefix, rerank exact on the full vector; the
    * dimension-truncation rung of the compression ladder beside int8
    * (q83), PQ (q158) and binary (q211)): stage 1 scores every corpus
    * vector against the broadcast queries on the FIRST 16 of 64 dims
    * (¼ the flops and — with the prefix materialized as its own column,
    * as a production table would — ¼ the bytes; this demo slices
    * in-flight, a narrow projection) and keeps 4k candidates per query
    * through the O(k) [[graft.functions.TopKPairs]] heap; stage 2
    * gathers only those 4k·|queries| full vectors and reranks with
    * exact cosine. Both stage boundaries hash-compare bitwise: the
    * shortlist membership AND the final ranking replay in SQL from the
    * same doubles (array-order summation parity, the q24 contract). */
  def matryoshkaTopK(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.Par
    val prefixDim = 16
    val shortlist = 4 * K
    val emb = Tables(spark, dir, "embeddings")
    val corpus = Par.ensure(emb).select(col("vec_id").as("neighbor_id"),
      col("embedding").as("_cv"),
      slice(col("embedding"), 1, prefixDim).as("_cp"))
    val q = broadcast(queriesOf(emb).select(col("vec_id").as("query_id"),
      col("embedding").as("_qv"),
      slice(col("embedding"), 1, prefixDim).as("_qp")))
    val coarse = corpus.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("_qp"), col("_cp")).as("cos_sim"))
    val short = Similarity.topK(coarse, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val rer = short
      .join(corpus.select(col("neighbor_id"), col("_cv")), Seq("neighbor_id"))
      .join(q.select(col("query_id"), col("_qv")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("_qv"), col("_cv")).as("cos_sim"))
    e6(Similarity.topK(rer, K))
  }

  private val matryoshkaOracle = {
    val preCos = Similarity.sqlCosine("q.pre", "c.pre")
    val fullCos = Similarity.sqlCosine("q.embedding", "c.embedding")
    s"""WITH corpus AS (
        SELECT vec_id, embedding, embedding[1:16] AS pre FROM embeddings),
      q AS (SELECT * FROM corpus WHERE vec_id < 20),
      coarse AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          $preCos AS coarse
        FROM q JOIN corpus c ON c.vec_id <> q.vec_id),
      short AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY coarse DESC, neighbor_id) AS r
          FROM coarse) WHERE r <= ${4 * K}),
      rer AS (
        SELECT s.query_id, s.neighbor_id, $fullCos AS cos_sim
        FROM short s
        JOIN corpus c ON c.vec_id = s.neighbor_id
        JOIN q ON q.vec_id = s.query_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM rer)
      SELECT query_id, rank, neighbor_id,
        CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
      FROM ranked WHERE rank <= $K"""
  }

  private val KnnK = 3
  private val KnnBandPlanes = 4

  /** q233 — corpus-wide k-NN GRAPH (every node's top-k neighbors — the
    * build block under SemDeDup-style clustering, graph-based dedup and
    * NN-descent index construction; unlike the query-side families,
    * EVERY vector is a query, so a broadcast-probe plan is impossible
    * and the candidate generation must be a SELF-JOIN): two 4-plane
    * sign-LSH bands bucket the corpus, candidate pairs come from one
    * shuffle equi-join on (band, signature) — both sides partition by
    * bucket, no broadcast, no all-pairs — multi-band hits collapse via
    * DISTINCT, survivors score exact cosine and each node keeps top-k
    * through the O(k) heap. Output is O(n·k); intermediates are
    * O(Σ bucket²) per band, bounded by the band width. Nodes whose
    * buckets hold no cohort simply emit fewer (possibly zero) edges —
    * the declared approximate-graph semantics, replayed exactly by the
    * oracle. */
  def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.Par
    val planes = Similarity.hyperplanes(NumPlanes, Dim)
    val emb = Par.ensure(Tables(spark, dir, "embeddings"))
    val bands = (0 until NumPlanes / KnnBandPlanes).map { t =>
      val sub = planes.slice(t * KnnBandPlanes, (t + 1) * KnnBandPlanes)
      emb.select(col("vec_id"),
        lit(t).as("_band"), Similarity.lshBucket(col("embedding"), sub)
          .as("_sig"))
    }.reduce(_ unionAll _)
    val cands = bands.as("a")
      .join(bands.as("b"), col("a._band") === col("b._band") &&
        col("a._sig") === col("b._sig") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"))
      .distinct()
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val scored = cands
      .join(vecs.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("embedding", "_qv"), Seq("query_id"))
      .join(vecs.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("embedding", "_cv"), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("_qv"), col("_cv")).as("cos_sim"))
    e6(Similarity.topK(scored, KnnK))
  }

  private val HnK = 3

  /** q251 — HARD-NEGATIVE MINING (contrastive-training data prep — the
    * triplet builder behind embedding-model finetuning, reranker
    * training and CLIP-style pipelines): for EVERY anchor, the top-k
    * most-similar vectors of a DIFFERENT label (the hard negatives —
    * random negatives are trivially separable; the near-miss ones carry
    * the gradient) plus its nearest SAME-label neighbor (the positive)
    * and the pos−neg cosine margin the triplet loss will see. Corpus-
    * wide like q233 — every vector is an anchor, so broadcast-probe is
    * impossible: candidates come from the same 2×4-plane sign-LSH band
    * equi-join (partitioned, never all-pairs), label routing is a
    * per-row filter AFTER the join (labels ride the candidate pair, no
    * second shuffle), and both the negative top-k and the positive
    * top-1 run the O(k) heap aggregate — no window sort of the scored
    * relation exists in the plan. Anchors whose buckets hold no
    * same-label cohort emit NULL positive/margin (declared semantics,
    * oracle-replayed via LEFT JOIN). */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.Par
    val planes = Similarity.hyperplanes(NumPlanes, Dim)
    val emb = Par.ensure(Tables(spark, dir, "embeddings"))
    val bands = (0 until NumPlanes / KnnBandPlanes).map { t =>
      val sub = planes.slice(t * KnnBandPlanes, (t + 1) * KnnBandPlanes)
      emb.select(col("vec_id"),
        lit(t).as("_band"), Similarity.lshBucket(col("embedding"), sub)
          .as("_sig"))
    }.reduce(_ unionAll _)
    val cands = bands.as("a")
      .join(bands.as("b"), col("a._band") === col("b._band") &&
        col("a._sig") === col("b._sig") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"))
      .distinct()
    val meta = emb.select(col("vec_id"), col("embedding"), col("label"))
    val scored = cands
      .join(meta.select(col("vec_id").as("query_id"),
        col("embedding").as("_qv"), col("label").as("_ql")), Seq("query_id"))
      .join(meta.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("_cv"), col("label").as("_cl")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("_qv"), col("_cv")).as("cos_sim"),
        col("_ql"), col("_cl"))
    val negs = Similarity.topK(
      scored.filter(col("_ql") =!= col("_cl"))
        .select(col("query_id"), col("neighbor_id"), col("cos_sim")), HnK)
    val pos = Similarity.topK(
      scored.filter(col("_ql") === col("_cl"))
        .select(col("query_id"), col("neighbor_id"), col("cos_sim")), 1)
      .select(col("query_id"), col("neighbor_id").as("pos_id"),
        col("cos_sim").as("_pc"))
    negs.join(pos, Seq("query_id"), "left")
      .select(col("query_id").as("anchor_id"), col("rank"),
        col("neighbor_id").as("neg_id"),
        floor(col("cos_sim") * 1000000).as("neg_cos_e6"),
        col("pos_id"),
        floor((col("_pc") - col("cos_sim")) * 1000000).as("margin_e6"))
  }

  private val hardNegativesOracle = {
    val planes = Similarity.hyperplanes(NumPlanes, Dim)
    val bandSelects = (0 until NumPlanes / KnnBandPlanes).map { t =>
      val sub = planes.slice(t * KnnBandPlanes, (t + 1) * KnnBandPlanes)
      s"SELECT vec_id, $t AS band, " +
        s"${Similarity.sqlLshBucket("embedding", sub)} AS sig, label " +
        "FROM embeddings"
    }.mkString(" UNION ALL ")
    val cos = Similarity.sqlCosine("q.embedding", "c.embedding")
    s"""WITH sigs AS ($bandSelects),
      cands AS (
        SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM sigs a JOIN sigs b
          ON a.band = b.band AND a.sig = b.sig AND a.vec_id <> b.vec_id),
      scored AS (
        SELECT p.query_id, p.neighbor_id, q.label AS ql, c.label AS cl,
          $cos AS cos_sim
        FROM cands p
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings c ON c.vec_id = p.neighbor_id),
      negs AS (
        SELECT query_id, neighbor_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored WHERE ql <> cl),
      pos AS (
        SELECT query_id, neighbor_id AS pos_id, cos_sim AS pc,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS pr
        FROM scored WHERE ql = cl)
      SELECT n.query_id AS anchor_id, n.rank, n.neighbor_id AS neg_id,
        CAST(floor(n.cos_sim * 1000000) AS BIGINT) AS neg_cos_e6,
        p.pos_id,
        CAST(floor((p.pc - n.cos_sim) * 1000000) AS BIGINT) AS margin_e6
      FROM negs n LEFT JOIN pos p ON p.query_id = n.query_id AND p.pr = 1
      WHERE n.rank <= $HnK"""
  }

  private val knnGraphOracle = {
    val planes = Similarity.hyperplanes(NumPlanes, Dim)
    val bandSelects = (0 until NumPlanes / KnnBandPlanes).map { t =>
      val sub = planes.slice(t * KnnBandPlanes, (t + 1) * KnnBandPlanes)
      s"SELECT vec_id, $t AS band, " +
        s"${Similarity.sqlLshBucket("embedding", sub)} AS sig FROM embeddings"
    }.mkString(" UNION ALL ")
    val cos = Similarity.sqlCosine("q.embedding", "c.embedding")
    s"""WITH sigs AS ($bandSelects),
      cands AS (
        SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM sigs a JOIN sigs b
          ON a.band = b.band AND a.sig = b.sig AND a.vec_id <> b.vec_id),
      scored AS (
        SELECT p.query_id, p.neighbor_id, $cos AS cos_sim
        FROM cands p
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings c ON c.vec_id = p.neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id,
        CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
      FROM ranked WHERE rank <= $KnnK"""
  }

  /** Per-vector int8 quantization (q82) — the embedding-compression step
    * an ANN index runs before storage (4× smaller than float32): each
    * vector min/max-scaled to 255 levels, codes exported as an md5 over
    * the exact integer sequence, and the reconstruction error attested
    * per dimension against the quantization step. All arithmetic is the
    * identical IEEE double sequence in both engines (float→double is
    * exact; min/max/floor are bitwise-stable), so codes AND the error
    * boolean hash-compare exactly. Shuffle-free narrow projection. */
  def int8Quantize(spark: SparkSession, dir: String): DataFrame =
    quantized(graft.util.Par.ensure(Tables(spark, dir, "embeddings")))
      .withColumn("errs", zip_with(col("d"), col("codes"), (v, c) =>
        abs(v - (col("mn") + c.cast("double") * col("step")))))
      .select(col("vec_id"),
        size(col("d")).cast("long").as("n_dims"),
        md5(concat_ws(",", transform(col("codes"), _.cast("string"))))
          .as("codes_md5"),
        when(col("mx") === col("mn"), lit(true))
          .otherwise(array_max(col("errs")) <= col("step"))
          .as("err_in_bound"))

  /** Staged min/max/step/codes columns — one projection per derived
    * column, NOT one nested expression tree: an inlined tree re-evaluates
    * `mn`/`mx`/`codes` inside every lambda element (measured O(d²) per
    * row, 4.3 s at sf0.1 vs 0.5 s staged); as materialized columns each
    * evaluates once per row and CollapseProject keeps multiply-referenced
    * non-cheap aliases staged. */
  private def quantized(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("d"))
      .withColumn("mn", array_min(col("d")))
      .withColumn("mx", array_max(col("d")))
      .withColumn("step", (col("mx") - col("mn")) / 255.0)
      .withColumn("codes", transform(col("d"), v =>
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(floor((v - col("mn")) / (col("mx") - col("mn")) * 255)
            .cast("long"))))

  private val int8QuantizeOracle = """
      WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS d FROM embeddings),
      scaled AS (
        SELECT vec_id, d, list_min(d) AS mn, list_max(d) AS mx,
          (list_max(d) - list_min(d)) / 255.0 AS step
        FROM v),
      coded AS (
        SELECT vec_id, d, mn, mx, step,
          list_transform(d, x -> CASE WHEN mx = mn THEN 0
            ELSE CAST(floor((x - mn) / (mx - mn) * 255) AS BIGINT) END)
            AS codes
        FROM scaled)
      SELECT vec_id,
        CAST(len(d) AS BIGINT) AS n_dims,
        md5(array_to_string(codes, ',')) AS codes_md5,
        CASE WHEN mx = mn THEN true
          ELSE list_max(list_transform(range(1, len(d) + 1),
            i -> abs(d[i] - (mn + codes[i] * step)))) <= step
          END AS err_in_bound
      FROM coded"""

  /** Quantized ANN (q83) — FAISS-SQ8-style search: full-precision queries
    * scored against the int8-DEQUANTIZED corpus (q82's codes round-tripped
    * back to doubles), exact top-k per query. This is the accuracy/space
    * trade an ANN deployment actually ships — 4× smaller corpus vectors,
    * ranks computed on reconstructed values. Every reconstruction and
    * cosine is the identical IEEE double sequence in both engines, so
    * ranks and e6 scores hash-compare exactly (q24's contract, quantized
    * corpus). Same broadcast-queries / no-corpus-shuffle plan shape as
    * q24. */
  def sq8TopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val corpus = quantized(emb)
      .withColumn("embedding", transform(col("codes"), c =>
        col("mn") + c.cast("double") * col("step")))
      .select(col("vec_id"), col("embedding"))
    e6(Similarity.bruteForceTopK(corpus, queriesOf(emb), "vec_id",
      "embedding", K))
  }

  private val sq8TopKOracle = {
    val cosSq8 = Similarity.sqlCosine("q.embedding", "c.deq")
    s"""
      WITH coded AS (
        SELECT vec_id, embedding::DOUBLE[] AS d,
          list_min(embedding::DOUBLE[]) AS mn,
          list_max(embedding::DOUBLE[]) AS mx,
          (list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[]))
            / 255.0 AS step
        FROM embeddings),
      deqd AS (
        SELECT vec_id,
          list_transform(d, x -> mn + (CASE WHEN mx = mn THEN 0
            ELSE CAST(floor((x - mn) / (mx - mn) * 255) AS BIGINT) END)
            * step) AS deq
        FROM coded),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          $cosSq8 AS cos_sim
        FROM embeddings q JOIN deqd c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 20),
      ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id,
        CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
      FROM ranked WHERE rank <= $K"""
  }

  /** IVF-SQ8 (q88) — the composition a production FAISS deployment ships
    * (`IndexIVFScalarQuantizer`): k-means cells (q39's training, shared
    * via the centroid cache — trained on FULL-precision vectors, as a
    * real index add() path does) over an SQ8-compressed corpus (q82's
    * codes). The index resident set is codes + centroids — 4× smaller;
    * search dequantizes in-cell: corpus cell assignment and all scoring
    * run on the DEQUANTIZED vectors, queries stay full-precision, exact
    * top-k within the probed cells. Same plan shape as q39 (narrow
    * corpus assignment, broadcast query×cell probe, no corpus shuffle —
    * ScaleSpecs) with q83's quantization arithmetic, so every value is
    * the identical IEEE sequence in both engines. */
  def ivfSq8TopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cents = centroidCache.getOrElseUpdate(dir,
      Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        nCells = 16, iters = 2))
    val corpus = quantized(emb)
      .withColumn("embedding", transform(col("codes"), c =>
        col("mn") + c.cast("double") * col("step")))
      .select(col("vec_id"), col("embedding"))
    e6(Similarity.ivfTopKTrained(corpus, queriesOf(emb), "vec_id",
      "embedding", K, cents, nProbe = 8))
  }

  private val ivfSq8Oracle = Similarity.sqlKmeansIvfTopK(nCells = 16,
    iters = 2, nProbe = 8, k = K, dim = Dim, queryPred = "e.vec_id < 20",
    corpusSrc = "deq",
    extraCtes = """deq AS (
        SELECT vec_id,
          list_transform(d, x -> mn + (CASE WHEN mx = mn THEN 0
            ELSE CAST(floor((x - mn) / (mx - mn) * 255) AS BIGINT) END)
            * step) AS v
        FROM (
          SELECT vec_id, d, list_min(d) AS mn, list_max(d) AS mx,
            (list_max(d) - list_min(d)) / 255.0 AS step
          FROM (SELECT vec_id, embedding::DOUBLE[] AS d FROM embeddings)))""")

  private val PqSub = 4
  private val PqCodes = 64

  /** q158 — product-quantization ADC search (the FAISS `IndexPQ` shape),
    * completing the quantization ladder: SQ8 compresses VALUES (q83),
    * IVF partitions SPACE (q39), PQ compresses the INDEX — each corpus
    * vector becomes 4 code ids (64× smaller than the float vector) and
    * queries rank candidates through per-subspace dot-product lookup
    * tables without ever touching corpus floats. Codebooks are the
    * zero-training md5-ordered sample sliced per subspace (the q25/q83
    * discipline — SQL-replayable at any scale factor); the oracle
    * reproduces codebook construction, encoding (argmax sub-cosine,
    * lowest-code ties) and every ADC score bitwise via fixed-order
    * additions. Scale: encode is one narrow pass; search scans the CODE
    * relation against the broadcast query tables — no corpus shuffle,
    * and the resident set is nSub bytes/vector. Recall vs brute force
    * pinned in SimilaritySpec. */
  def pqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      PqSub, PqCodes, Dim)
    e6(Similarity.pqTopK(emb, queriesOf(emb), "vec_id", "embedding", K,
      cbs, Dim))
  }

  private val pqOracle = Similarity.sqlPqTopK(PqSub, PqCodes, K, Dim,
    queryPred = "e.vec_id < 20")

  private val PqRefine = 8

  /** q183 — two-stage PQ search with EXACT RERANKING (the FAISS
    * `IndexRefineFlat` serving shape, the production vector-store
    * topology): q158's ADC stage proposes each query's K·[[PqRefine]]
    * candidates from the compressed codes; only those candidates are
    * re-scored with exact cosine on the original vectors, so
    * within-candidate-set quantization error is fully repaired at
    * O(queries·K·refine·dim) exact work instead of the brute-force
    * O(corpus·queries·dim). Candidates broadcast; the corpus is never
    * shuffled in either stage. Recall ≥ plain PQ at equal K
    * spec-pinned; the oracle replays both stages bitwise. */
  def pqRerankTopKQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      PqSub, PqCodes, Dim)
    e6(Similarity.pqRerankTopK(emb, queriesOf(emb), "vec_id", "embedding",
      K, cbs, Dim, PqRefine))
  }

  private val pqRerankOracle = Similarity.sqlPqRerankTopK(PqSub, PqCodes,
    K, PqRefine, Dim, queryPred = "e.vec_id < 20")

  private val SemTau = 0.35

  /** q184 — SemDeDup cluster-scoped semantic deduplication
    * ([[Similarity.semDedup]]): the same k-means centroids that serve
    * the IVF index (q39 — shared [[centroidCache]], how a production
    * pipeline amortizes training) partition the corpus into cells, and
    * EXACT cosine within each cell marks semantic duplicates under the
    * deterministic keep-lowest-id rule. The quadratic is confined
    * within cells (O(Σ|cell|²), bounded by the cluster-count knob) —
    * versus q26's banded-LSH pairs, this is the cluster-pruned
    * production shape the SemDeDup paper runs at web scale. Oracle
    * replays training, assignment, and every within-cell cosine
    * bitwise. */
  def semDedupQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cents = centroidCache.getOrElseUpdate(dir,
      Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        nCells = 16, iters = 2))
    Similarity.semDedup(emb, "vec_id", "embedding", cents, SemTau)
  }

  private val semDedupOracle = Similarity.sqlSemDedup(nCells = 16,
    iters = 2, dim = Dim, threshold = SemTau)

  /** (centroids, sub-codebooks) trained on the INITIAL corpus subset —
    * the q185 index's fitted state, memoized per dir like
    * [[centroidCache]] (distinct key space: trained on a subset). */
  private val initialFitCache = scala.collection.concurrent.TrieMap
    .empty[String, (Array[Array[Double]], Array[Array[Array[Double]]])]

  /** q185 — INCREMENTAL ANN index maintained as a versioned table (the
    * lake × ANN composition, q172's discipline applied to vector
    * search): the index is created from the INITIAL corpus (k-means
    * cells + PQ codebooks trained on it, codes appended to a snapshot
    * table), and an arriving batch is encoded with the SAME fitted
    * state and APPENDED — the FAISS `add()` path; the initial corpus is
    * never re-encoded, re-trained, or re-shuffled, and each commit is
    * O(batch) data + O(delta) log metadata. Search reads the CODE TABLE
    * ONLY (index-only serving — the float corpus never participates;
    * spec pins inputFiles ⊆ the snapshot's files). The oracle replays
    * training on the initial subset and encode/search over everything —
    * the exact state the incremental build converges to. */
  def incrementalAnnIndexQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val emb = Tables(spark, dir, "embeddings")
    val table = graft.util.Scratch.dir("annidx_table", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    val initial = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    val (cents, cbs) = initialFitCache.getOrElseUpdate(dir, (
      Similarity.kmeansCentroids(initial, "vec_id", "embedding",
        nCells = 16, iters = 2),
      Similarity.pqCodebooks(initial, "vec_id", "embedding",
        PqSub, PqCodes, Dim)))
    Snapshots.append(spark, table,
      Similarity.ivfPqEncode(initial, "vec_id", "embedding", cents, cbs, Dim))
    Snapshots.append(spark, table,
      Similarity.ivfPqEncode(batch, "vec_id", "embedding", cents, cbs, Dim))
    val codes = Snapshots.readLatest(spark, table).get
    e6(Similarity.ivfPqSearchCodes(codes, queriesOf(emb), "vec_id",
      "embedding", K, cents, nProbe = 8, cbs, Dim))
  }

  private val incrementalAnnOracle = Similarity.sqlIvfPqTopK(nCells = 16,
    iters = 2, nProbe = 8, nSub = PqSub, nCodes = PqCodes, k = K, dim = Dim,
    queryPred = "e.vec_id < 20", trainPred = "e.vec_id % 4 <> 0")

  /** q256 — CORPUS + INDEX IN TRANSACTIONAL LOCKSTEP
    * ([[graft.lake.TableGroup]] × q185's incremental index — the
    * marquee multi-table-transaction shape for a training-data
    * platform): a batch of new vectors must land in the corpus table
    * AND (encoded) in the ANN index table atomically, because the two
    * failure modes a non-atomic ingest produces are both silent —
    * vectors the index can't find, or index hits the corpus can't
    * resolve. The transaction stages the raw batch and its IVF-PQ
    * codes on per-txn branches and CRASHES between MARK and PUBLISH:
    * the group read must serve corpus and index with IDENTICAL id
    * sets at the NEW state (`lockstep_staged`) while main readers see
    * identical id sets at the OLD state (`lockstep_main` — consistency
    * held at every instant, on both sides of the crash). After the
    * heal, search over the published code table must equal the q185
    * oracle's replay of the full converged index — the gate is the
    * SEARCH RESULT, not just the bookkeeping. Fitted state (cells,
    * codebooks) stays frozen throughout, the FAISS `add()` contract. */
  def annGroupIngestQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.{Snapshots, TableGroup}
    val emb = Tables(spark, dir, "embeddings")
    val group = graft.util.Scratch.dir("anngrp", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(group))
    val initial = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    val (cents, cbs) = initialFitCache.getOrElseUpdate(dir, (
      Similarity.kmeansCentroids(initial, "vec_id", "embedding",
        nCells = 16, iters = 2),
      Similarity.pqCodebooks(initial, "vec_id", "embedding",
        PqSub, PqCodes, Dim)))
    Snapshots.append(spark, s"$group/corpus", initial)
    Snapshots.append(spark, s"$group/index",
      Similarity.ivfPqEncode(initial, "vec_id", "embedding", cents, cbs, Dim))
    val txn: Seq[(String, TableGroup.Write)] = Seq(
      "corpus" -> ((t, br) =>
        Snapshots.appendToBranch(spark, t, br, batch)),
      "index" -> ((t, br) => Snapshots.appendToBranch(spark, t, br,
        Similarity.ivfPqEncode(batch, "vec_id", "embedding",
          cents, cbs, Dim))))
    var crashed = false
    try TableGroup.commitAll(spark, group, txn,
      afterMark = () => throw new RuntimeException("crash before publish"))
    catch { case e: RuntimeException
        if e.getMessage == "crash before publish" => crashed = true }
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id")).distinct()
    def sameIds(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Boolean =
      ids(a).exceptAll(ids(b)).isEmpty && ids(b).exceptAll(ids(a)).isEmpty
    val staged = TableGroup.readAll(spark, group, Seq("corpus", "index"))
    val lockstepStaged = crashed &&
      sameIds(staged("corpus"), staged("index")) &&
      staged("corpus").count() == emb.count()
    val mainCorpus = Snapshots.readLatest(spark, s"$group/corpus").get
    val mainIndex = Snapshots.readLatest(spark, s"$group/index").get
    val lockstepMain = sameIds(mainCorpus, mainIndex) &&
      mainCorpus.count() == initial.count()
    TableGroup.rollForward(spark, group)
    val codes = Snapshots.readLatest(spark, s"$group/index").get
    e6(Similarity.ivfPqSearchCodes(codes, queriesOf(emb), "vec_id",
      "embedding", K, cents, nProbe = 8, cbs, Dim))
      .withColumn("lockstep_staged", lit(lockstepStaged))
      .withColumn("lockstep_main", lit(lockstepMain))
  }

  private val annGroupIngestOracle = {
    val base = Similarity.sqlIvfPqTopK(nCells = 16, iters = 2, nProbe = 8,
      nSub = PqSub, nCodes = PqCodes, k = K, dim = Dim,
      queryPred = "e.vec_id < 20", trainPred = "e.vec_id % 4 <> 0")
    s"""SELECT o.*, true AS lockstep_staged, true AS lockstep_main
      FROM ($base) o"""
  }

  /** q218 — ANN index DELETE + compaction (FAISS `remove_ids()` under
    * merge-on-read: the missing lifecycle leg beside q185's `add()`):
    * the versioned code table takes a predicate DELETE — O(matches)
    * tombstones, not one re-encoded vector — and search over the live
    * view immediately excludes the removed ids; then
    * [[graft.lake.Snapshots.optimizeDeletes]] pays down the dead-code
    * debt (every code file's dead fraction crosses the threshold, so
    * all are rewritten and ZERO tombstones remain), and the identical
    * top-k attests the rewrite moved no live code
    * (`post_compact_identical` via a two-sided exceptAll;
    * `no_tombstones_left` counts surviving sidecar rows). Centroids
    * and codebooks stay frozen throughout — deletes never retrain, the
    * production contract. */
  def annIndexDeleteQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val emb = Tables(spark, dir, "embeddings")
    val table = graft.util.Scratch.dir("anndel_table", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    val initial = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    val (cents, cbs) = initialFitCache.getOrElseUpdate(dir, (
      Similarity.kmeansCentroids(initial, "vec_id", "embedding",
        nCells = 16, iters = 2),
      Similarity.pqCodebooks(initial, "vec_id", "embedding",
        PqSub, PqCodes, Dim)))
    Snapshots.append(spark, table,
      Similarity.ivfPqEncode(initial, "vec_id", "embedding", cents, cbs, Dim))
    Snapshots.append(spark, table,
      Similarity.ivfPqEncode(batch, "vec_id", "embedding", cents, cbs, Dim))
    Snapshots.deleteWhere(spark, table, col("vec_id") % 7 === 3)
    def search() = e6(Similarity.ivfPqSearchCodes(
      Snapshots.readLatest(spark, table).get, queriesOf(emb), "vec_id",
      "embedding", K, cents, nProbe = 8, cbs, Dim))
    val r1 = search()
    val compacted =
      Snapshots.optimizeDeletes(spark, table, minDeleteRatio = 0.05)
    val r2 = search()
    val identical = r1.exceptAll(r2).isEmpty && r2.exceptAll(r1).isEmpty
    val s = Snapshots.snapshot(spark, table,
      Snapshots.latestVersion(spark, table).get).get
    val tombsLeft =
      if (s.deletes.isEmpty) 0L
      else spark.read.parquet(s.deletes.map(f => s"$table/$f"): _*).count()
    r2.withColumn("post_compact_identical",
        lit(identical && compacted.nonEmpty))
      .withColumn("no_tombstones_left", lit(tombsLeft == 0L))
  }

  private val annIndexDeleteOracle = {
    val base = Similarity.sqlIvfPqTopK(nCells = 16, iters = 2, nProbe = 8,
      nSub = PqSub, nCodes = PqCodes, k = K, dim = Dim,
      queryPred = "e.vec_id < 20", trainPred = "e.vec_id % 4 <> 0",
      corpusPred = "e.vec_id % 7 <> 3")
    s"""SELECT query_id, rank, neighbor_id, cos_sim_e6,
             true AS post_compact_identical, true AS no_tombstones_left
      FROM ($base)"""
  }

  /** q159 — IVF-PQ composition (the FAISS `IndexIVFPQ` production
    * index): k-means cells prune the candidate set (q39's training,
    * shared centroid cache), PQ codes compress what remains (q158's
    * codebooks) — the probed fraction of a 64×-compressed code relation
    * is all the search touches. Same plan discipline as q39/q88 (narrow
    * corpus assign+encode, broadcast query×probed-cell join on the cell
    * key, no corpus shuffle); the oracle replays BOTH index builds and
    * every ADC score bitwise. */
  def ivfPqTopKQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cents = centroidCache.getOrElseUpdate(dir,
      Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        nCells = 16, iters = 2))
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      PqSub, PqCodes, Dim)
    e6(Similarity.ivfPqTopK(emb, queriesOf(emb), "vec_id", "embedding", K,
      cents, nProbe = 8, cbs, Dim))
  }

  private val ivfPqOracle = Similarity.sqlIvfPqTopK(nCells = 16, iters = 2,
    nProbe = 8, nSub = PqSub, nCodes = PqCodes, k = K, dim = Dim,
    queryPred = "e.vec_id < 20")

  /** Trained sub-codebooks are an index (built once, probed many times)
    * — memoized per data dir like [[centroidCache]]. */
  private val pqCbCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Array[Double]]]]

  /** q162 — k-means-TRAINED product quantization (the `IndexPQ` with a
    * real `train()` call): each subspace's codebook is Lloyd-refined on
    * the corpus's sliced subvectors instead of sampled, cutting
    * reconstruction error at the same code budget; the oracle replays
    * ALL FOUR training chains (prefixed k-means CTEs over the slices)
    * plus encoding and every ADC score. Same plan shape as q158; the
    * recall improvement over sampled codebooks is spec-pinned via the
    * per-subspace k-means objective. */
  def pqKmeansTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cbs = pqCbCache.getOrElseUpdate(dir,
      Similarity.pqCodebooksTrained(emb, "vec_id", "embedding",
        PqSub, PqCodes, Dim, iters = 2))
    e6(Similarity.pqTopK(emb, queriesOf(emb), "vec_id", "embedding", K,
      cbs, Dim))
  }

  private val pqKmeansOracle = Similarity.sqlPqKmeansTopK(PqSub, PqCodes,
    iters = 2, k = K, dim = Dim, queryPred = "e.vec_id < 20")

  private val NswM = 8
  private val NswBeam = 16
  private val NswHops = 4

  /** q166 — single-layer NSW graph ANN ([[Similarity.nswTopK]]),
    * completing the family beyond quantization: a deterministic neighbor
    * graph (banded-LSH candidates → per-node top-m by cosine via the
    * O(m) partial aggregator → symmetrized) searched by greedy beam
    * expansion from the minimum-id entry point. The oracle replays the
    * GRAPH BUILD and every unrolled beam hop in SQL — the md5-derived
    * banded planes, the corpus-scaled plane-count ladder, id-tiebroken
    * top-m and beam selections, and fixed-order cosines make both
    * engines bitwise identical. Recall vs brute force is spec-pinned
    * (SimilaritySpec).
    *
    * The edge list is an INDEX — built once per corpus, probed by every
    * search — so it is memoized per data dir exactly like
    * [[centroidCache]] (build is deterministic, testdata dirs are
    * immutable; the checkpointed relation survives catalog cache
    * clears). */
  private val nswEdgeCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def nswTopKQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val edges = nswEdgeCache.getOrElseUpdate(dir,
      Similarity.nswBuildEdges(emb, "vec_id", "embedding",
        m = NswM, numBands = NumBands, dim = Dim))
    e6(Similarity.nswSearch(edges, emb, queriesOf(emb), "vec_id",
      "embedding", K, beam = NswBeam, hops = NswHops))
  }

  private val nswOracle = Similarity.sqlNswTopK(k = K, m = NswM,
    beam = NswBeam, hops = NswHops, numBands = NumBands, dim = Dim,
    queryPred = "e.vec_id < 20")

  /** q321 — metadata-FILTERED GRAPH ANN (q170's hybrid-search shape on
    * the NSW/HNSW family — VERDICT r17 task 6): "vector search WHERE
    * label = …" against a graph index. The predicate composes into the
    * search's RESULT set only, while routing keeps traversing the FULL
    * graph — non-qualifying nodes stay in beams and edges as waypoints,
    * exactly the FreshDiskANN tombstone discipline [[Similarity
    * .nswSearch]]'s `exclude` already applies to deletes (and the
    * ACORN filtered-HNSW discipline: filtering the traversal instead
    * would disconnect the graph under selective predicates). ONE index
    * serves every predicate with no per-predicate rebuild — the edge
    * list here is the SAME memoized q166 index. The oracle replays
    * build + every unrolled hop bitwise with the predicate applied at
    * the final scored set; recall vs the brute-force-filtered exact
    * top-k is spec-pinned for both the single-layer and multi-layer
    * searches (SimilaritySpec r18). */
  def filteredNswTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val edges = nswEdgeCache.getOrElseUpdate(dir,
      Similarity.nswBuildEdges(emb, "vec_id", "embedding",
        m = NswM, numBands = NumBands, dim = Dim))
    val nonMatching = emb.filter(!(col("label") % 2 === 0))
      .select(col("vec_id"))
    e6(Similarity.nswSearch(edges, emb, queriesOf(emb), "vec_id",
      "embedding", K, beam = NswBeam, hops = NswHops,
      exclude = Some(nonMatching)))
  }

  private val filteredNswOracle = Similarity.sqlNswTopK(k = K, m = NswM,
    beam = NswBeam, hops = NswHops, numBands = NumBands, dim = Dim,
    queryPred = "e.vec_id < 20", resultPred = "label % 2 = 0")

  /** q276 — INCREMENTAL GRAPH-ANN INDEX (VERDICT r14 task 5 — the
    * q185 FAISS-`add()` path for the NSW graph family): the index
    * persists as two snapshot tables (banded-LSH bucket relation +
    * symmetrized edges) with the plane ladder PINNED as table
    * properties at build; an appended batch hashes with the pinned
    * planes, probes the persisted buckets with one BROADCAST join
    * (the index side never exchanges), wires per-NEW-node top-m +
    * reverse edges, and lands as ONE append per table — the initial
    * corpus's sig/edge files carry BY REFERENCE
    * (`carried_by_reference`, file-list-pinned), never re-encoded or
    * rewired (where q193's HNSW build was per-corpus-dir: an append
    * triggered a full graph rebuild). Search walks the union graph;
    * the oracle replays the pinned ladder, both wiring phases and
    * every beam hop bitwise. Recall ≥ the fresh-rebuild floor is
    * spec-pinned (SimilaritySpec), plan shape ScaleSpec-pinned. */
  def nswIncrementalQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val root = graft.util.Scratch.dir("nswidx", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val emb = Tables(spark, dir, "embeddings")
    val initial = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    Similarity.nswIndexBuild(spark, root, initial, "vec_id", "embedding",
      m = NswM, numBands = NumBands, dim = Dim)
    def filesOf(t: String) = Snapshots.snapshot(spark, s"$root/$t",
      Snapshots.latestVersion(spark, s"$root/$t").get).get.files.toSet
    val (e1, s1) = (filesOf("edges"), filesOf("sigs"))
    Similarity.nswIndexAdd(spark, root, batch, "vec_id", "embedding")
    val carried = e1.subsetOf(filesOf("edges")) &&
      s1.subsetOf(filesOf("sigs"))
    e6(Similarity.nswIndexSearch(spark, root, emb, queriesOf(emb),
      "vec_id", "embedding", K, beam = NswBeam, hops = NswHops))
      .withColumn("carried_by_reference", lit(carried))
  }

  private val nswIncrementalOracle: String = {
    val inner = Similarity.sqlNswIncrementalTopK(k = K, m = NswM,
      beam = NswBeam, hops = NswHops, numBands = NumBands, dim = Dim,
      queryPred = "e.vec_id < 20", initialPred = "vec_id % 5 <> 0",
      batchPred = "vec_id % 5 = 0")
    s"""SELECT t.*, true AS carried_by_reference FROM ($inner) t"""
  }

  private val HnswUpperBeam = 4
  private val HnswUpperHops = 2

  /** q277 — INCREMENTAL HNSW `add()` (q276's persisted-index discipline
    * stacked into q193's hierarchy — the full VERDICT r14 task 5: both
    * graph families now take appends without a rebuild): one persisted
    * (sigs, edges) pair PER LAYER, each layer's plane ladder pinned to
    * its initial population; an appended batch wires its level-≥l slice
    * against layer l's persisted buckets — layer membership is the
    * deterministic hash rule, so upper layers see exponentially fewer
    * batch nodes and the whole hierarchy's add cost stays
    * O(batch·candidates). Every layer's initial files carry by
    * reference (`carried_by_reference`). Search descends the union
    * graphs; the oracle replays levels, every layer's pinned-ladder
    * two-phase wiring, and the full descent bitwise. */
  def hnswIncrementalQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val root = graft.util.Scratch.dir("hnswidx", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val emb = Tables(spark, dir, "embeddings")
    val initial = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    Similarity.hnswIndexBuild(spark, root, initial, "vec_id", "embedding",
      m = NswM, numBands = NumBands, dim = Dim)
    def filesOf(t: String) = Snapshots.snapshot(spark, s"$root/$t",
      Snapshots.latestVersion(spark, s"$root/$t").get).get.files.toSet
    val tables = (0 to Similarity.hnswIndexLevels(spark, root))
      .flatMap(l => Seq(s"l$l/edges", s"l$l/sigs"))
    val before = tables.map(t => t -> filesOf(t)).toMap
    Similarity.hnswIndexAdd(spark, root, batch, "vec_id", "embedding")
    val carried = tables.forall(t => before(t).subsetOf(filesOf(t)))
    e6(Similarity.hnswIndexSearch(spark, root, emb, queriesOf(emb),
      "vec_id", "embedding", K, beam = NswBeam, hops = NswHops,
      upperBeam = HnswUpperBeam, upperHops = HnswUpperHops))
      .withColumn("carried_by_reference", lit(carried))
  }

  private val hnswIncrementalOracle: String = {
    val inner = Similarity.sqlHnswIncrementalTopK(k = K, m = NswM,
      beam = NswBeam, hops = NswHops, upperBeam = HnswUpperBeam,
      upperHops = HnswUpperHops, numBands = NumBands, dim = Dim,
      queryPred = "e.vec_id < 20", initialPred = "vec_id % 5 <> 0",
      batchPred = "vec_id % 5 = 0")
    s"""SELECT t.*, true AS carried_by_reference FROM ($inner) t"""
  }

  /** q306 — GRAPH-ANN DELETE + OPTIMIZE (VERDICT r15 task 3 — the
    * lifecycle leg q218 proved for IVF-PQ code tables, now for the
    * graph family): a curated corpus that deletes documents evicts
    * them from the persisted NSW index in two stages.
    *
    *  1. [[graft.similarity.Similarity.nswIndexDelete]]: deleted ids
    *     tombstone (one O(batch) append) and MoR-delete from `sigs`;
    *     `edges` is untouched — tombstoned nodes keep ROUTING but every
    *     search anti-joins them out of the RESULTS, so survivor recall
    *     can only improve (the post-delete top-k is the same scored set
    *     minus tombstones — `survivor_results_kept` attests the
    *     superset relation in-query).
    *  2. [[graft.similarity.Similarity.nswIndexOptimize]]: orphaned
    *     neighborhoods re-wire through their deleted neighbors'
    *     surviving neighbors (exact-cosine top-m), deleted nodes drop
    *     from the graph, tombstones truncate.
    *
    * `carried_after_delete` pins that the DELETE itself rewrote no data
    * file (tombstone + MoR only); `repaired_graph_clean` that no edge
    * touches a deleted id after optimize; both searches replay bitwise
    * in the oracle. */
  def nswDeleteQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val root = graft.util.Scratch.dir("nswdel", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val emb = Tables(spark, dir, "embeddings")
    Similarity.nswIndexBuild(spark, root, emb, "vec_id", "embedding",
      m = NswM, numBands = NumBands, dim = Dim)
    val preDf = Similarity.nswIndexSearch(spark, root, emb,
      queriesOf(emb), "vec_id", "embedding", K,
      beam = NswBeam, hops = NswHops)
      .select("query_id", "neighbor_id").localCheckpoint()
    def filesOf(t: String) = Snapshots.snapshot(spark, s"$root/$t",
      Snapshots.latestVersion(spark, s"$root/$t").get).get.files.toSet
    val (e1, s1) = (filesOf("edges"), filesOf("sigs"))
    Similarity.nswIndexDelete(spark, root, col("id") % 9 === 3)
    val carried = e1 == filesOf("edges") && s1 == filesOf("sigs")
    val deadIds = emb.filter(col("vec_id") % 9 === 3)
      .select(col("vec_id")).localCheckpoint()
    val postRes = Similarity.nswIndexSearch(spark, root, emb,
      queriesOf(emb), "vec_id", "embedding", K,
      beam = NswBeam, hops = NswHops).localCheckpoint()
    val excludesDeleted = postRes.join(broadcast(deadIds),
      postRes("neighbor_id") === deadIds("vec_id")).isEmpty
    // the scored sets are identical, so post-delete results must keep
    // every surviving pre-delete result (recall on survivors can only
    // improve under the final anti-join)
    val survivorKept = preDf
      .join(broadcast(deadIds),
        preDf("neighbor_id") === deadIds("vec_id"), "left_anti")
      .join(postRes.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
      .isEmpty
    Similarity.nswIndexOptimize(spark, root)
    val cleared =
      Snapshots.readLatest(spark, s"$root/tombstones").get.isEmpty
    val edgesNow = Snapshots.readLatest(spark, s"$root/edges").get
    val repairedClean = edgesNow.join(broadcast(deadIds),
        edgesNow("src") === deadIds("vec_id")).isEmpty &&
      edgesNow.join(broadcast(deadIds),
        edgesNow("dst") === deadIds("vec_id")).isEmpty
    val survivors = emb.join(broadcast(deadIds),
      emb("vec_id") === deadIds("vec_id"), "left_anti")
    val repRes = Similarity.nswIndexSearch(spark, root, survivors,
      queriesOf(emb), "vec_id", "embedding", K,
      beam = NswBeam, hops = NswHops)
    e6(postRes).withColumn("phase", lit("deleted"))
      .unionByName(e6(repRes).withColumn("phase", lit("repaired")))
      .withColumn("carried_after_delete", lit(carried))
      .withColumn("survivor_results_kept", lit(survivorKept))
      .withColumn("excludes_deleted", lit(excludesDeleted))
      .withColumn("tombstones_cleared", lit(cleared))
      .withColumn("repaired_graph_clean", lit(repairedClean))
  }

  private val nswDeleteOracle: String = {
    val inner = Similarity.sqlNswDeleteTopK(k = K, m = NswM,
      beam = NswBeam, hops = NswHops, numBands = NumBands, dim = Dim,
      queryPred = "e.vec_id < 20", delPred = "vec_id % 9 = 3")
    s"""SELECT t.*, true AS carried_after_delete,
      true AS survivor_results_kept, true AS excludes_deleted,
      true AS tombstones_cleared, true AS repaired_graph_clean
      FROM ($inner) t"""
  }

  /** q317 — DECLARATIVE ANN MAINTENANCE (q255's policy discipline for
    * the index family, closing VERDICT r16 task 8): an index table
    * DECLARES its repair cadence (`graft.maintain.annRepairAtTombstones`
    * on its sigs table) and one blind `MAINTAIN cat.idx` statement
    * applies it — the q218/q306 delete→repair lifecycle without anyone
    * calling the repair by hand. Pins: a declared-but-clean index is a
    * NO-OP (`declared_noop_clean`); the first MAINTAIN after deletes
    * reach the threshold runs the repair (`repaired_on_threshold`) and
    * leaves the index IDENTICAL to a manually-optimized twin — same
    * build, same deletes, [[Similarity.nswIndexOptimize]] by hand —
    * result-set equality attested in-query (`matches_manual_repair`);
    * a second MAINTAIN acts 0 (`noop_after_repair`, tombstones
    * truncated). The emitted relation is the post-repair search, which
    * the oracle replays bitwise through the same closed forms as q306. */
  def annMaintainQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val root = graft.util.Scratch.dir("annmt", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val emb = Tables(spark, dir, "embeddings")
    val idx = s"$root/idx"
    val twin = s"$root/twin"
    // idx and twin are the SAME deterministic build over the same
    // corpus: hash the banded signatures ONCE and feed both builds
    // (r19 — guide §1.2; plane ladders and results are bit-identical,
    // and the MAINTAIN-vs-manual-repair attestation downstream is
    // untouched)
    val nEmb = emb.count()
    val sharedSig = Similarity.indexSignatures(emb, "vec_id", "embedding",
      NumBands, Dim, nEmb).localCheckpoint()
    Seq(idx, twin).foreach(p => Similarity.nswIndexBuild(spark, p, emb,
      "vec_id", "embedding", m = NswM, numBands = NumBands, dim = Dim,
      knownCount = nEmb, knownSigs = sharedSig))
    Snapshots.setTableProperties(spark, s"$idx/sigs",
      Map(Similarity.MaintainRepairKey -> "1"))
    val cat = s"annmt_${Integer.toHexString(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    def maintain(): Long = spark.sql(s"MAINTAIN $cat.idx").head.getLong(0)
    val noopClean = maintain() == 0L
    Seq(idx, twin).foreach(p =>
      Similarity.nswIndexDelete(spark, p, col("id") % 9 === 3))
    val repairedOnThreshold = maintain() >= 1L
    Similarity.nswIndexOptimize(spark, twin)
    val deadIds = emb.filter(col("vec_id") % 9 === 3)
      .select(col("vec_id")).localCheckpoint()
    val survivors = emb.join(broadcast(deadIds),
      emb("vec_id") === deadIds("vec_id"), "left_anti")
    def searchOn(p: String) = Similarity.nswIndexSearch(spark, p,
      survivors, queriesOf(emb), "vec_id", "embedding", K,
      beam = NswBeam, hops = NswHops)
    val a = searchOn(idx).localCheckpoint()
    val b = searchOn(twin).select("query_id", "rank", "neighbor_id")
      .localCheckpoint()
    val aKeys = a.select("query_id", "rank", "neighbor_id")
    val matchesManual = aKeys.exceptAll(b).isEmpty &&
      b.exceptAll(aKeys).isEmpty
    val noopAfter = maintain() == 0L
    e6(a).withColumn("phase", lit("repaired"))
      .withColumn("declared_noop_clean", lit(noopClean))
      .withColumn("repaired_on_threshold", lit(repairedOnThreshold))
      .withColumn("matches_manual_repair", lit(matchesManual))
      .withColumn("noop_after_repair", lit(noopAfter))
  }

  private val annMaintainOracle: String = {
    val inner = Similarity.sqlNswDeleteTopK(k = K, m = NswM,
      beam = NswBeam, hops = NswHops, numBands = NumBands, dim = Dim,
      queryPred = "e.vec_id < 20", delPred = "vec_id % 9 = 3")
    s"""SELECT t.*, true AS declared_noop_clean,
      true AS repaired_on_threshold, true AS matches_manual_repair,
      true AS noop_after_repair
      FROM ($inner) t WHERE t.phase = 'repaired'"""
  }

  private val MmrK = 5
  private val MmrPool = 20

  /** q310 — MMR DIVERSE SELECTION (maximal marginal relevance,
    * Carbonell & Goldstein 1998 — the diversification step retrieval
    * AND training-data curation both run: pure top-k returns five
    * near-copies of the same answer; MMR trades relevance against
    * redundancy): iteratively pick argmax of 7·rel(d) − 3·max_{s∈S}
    * sim(d, s) from a per-query relevance pool (brute-force top-20 —
    * the pool is the distributed corpus pass; each of the k selection
    * steps is one tiny job over pool × selected with the selected side
    * ≤ k rows per query, broadcast). Integer λ weights (7/3 of 10)
    * keep the score a deterministic double expression both engines
    * compute bitwise; ties break to the lower id. The oracle unrolls
    * all k selection steps as CTEs. First pick = pure relevance;
    * later picks visibly skip near-duplicates of earlier ones. */
  def mmrSelect(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.util.Par.ensure(Tables(spark, dir, "embeddings"))
    val pool = Similarity.bruteForceTopK(emb, queriesOf(emb),
      "vec_id", "embedding", MmrPool)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim").as("rel"))
      .localCheckpoint()
    val vecs = emb.select(col("vec_id"), col("embedding"))
    var selected: DataFrame = null
    for (step <- 1 to MmrK) {
      val cand =
        if (step == 1) pool
        else pool.join(selected.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_anti")
      val scored =
        if (step == 1) cand.withColumn("score", lit(7.0) * col("rel"))
        else cand
          .join(broadcast(selected.select(col("query_id"),
            col("neighbor_id").as("sid"))), Seq("query_id"))
          .join(vecs.select(col("vec_id").as("neighbor_id"),
            col("embedding").as("_cv")), Seq("neighbor_id"))
          .join(broadcast(vecs.join(
            broadcast(selected.select(col("neighbor_id").as("vec_id"))
              .distinct()), Seq("vec_id"))
            .select(col("vec_id").as("sid"), col("embedding").as("_sv"))),
            Seq("sid"))
          .groupBy(col("query_id"), col("neighbor_id"), col("rel"))
          .agg(max(Similarity.cosine(col("_cv"), col("_sv"))).as("ms"))
          .withColumn("score", lit(7.0) * col("rel") - lit(3.0) * col("ms"))
      val win = Similarity.topK(scored.select(col("query_id"),
          col("neighbor_id"), col("score").as("cos_sim")), 1)
        .select(col("query_id"), col("neighbor_id"),
          col("cos_sim").as("score"))
        .join(pool, Seq("query_id", "neighbor_id"))
        .withColumn("pick", lit(step))
      selected = (if (step == 1) win else selected.unionByName(win))
        .localCheckpoint()
    }
    selected.select(col("query_id"), col("pick").cast("long").as("pick"),
      col("neighbor_id"),
      floor(col("rel") * 1000000).as("rel_e6"),
      floor(col("score") * 1000000).as("mmr_score_e6"))
  }

  private def mmrOracle: String = {
    val cos = Similarity.sqlCosine("q.qv", "e.v")
    val simCos = Similarity.sqlCosine("ce.v", "se.v")
    val steps = (2 to MmrK).map { k =>
      val selAll = (1 until k).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")
      s"""selall${k - 1} AS ($selAll),
      c$k AS (SELECT p.* FROM pool p LEFT JOIN selall${k - 1} s
          ON s.query_id = p.query_id AND s.neighbor_id = p.neighbor_id
        WHERE s.neighbor_id IS NULL),
      m$k AS (SELECT c.query_id, c.neighbor_id, c.rel,
          MAX($simCos) AS ms
        FROM c$k c JOIN selall${k - 1} s ON s.query_id = c.query_id
        JOIN emb ce ON ce.vec_id = c.neighbor_id
        JOIN emb se ON se.vec_id = s.neighbor_id
        GROUP BY 1, 2, 3),
      s$k AS (SELECT query_id, neighbor_id, rel,
          7.0 * rel - 3.0 * ms AS score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY 7.0 * rel - 3.0 * ms DESC, neighbor_id) AS rn
        FROM m$k),
      sel$k AS (SELECT query_id, neighbor_id, rel, score, $k AS pick
        FROM s$k WHERE rn = 1)"""
    }.mkString(",\n      ")
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      qs AS (SELECT vec_id AS query_id, v AS qv FROM emb e WHERE e.vec_id < 20),
      scoredp AS (SELECT q.query_id, e.vec_id AS neighbor_id, ($cos) AS rel
        FROM qs q JOIN emb e ON e.vec_id <> q.query_id),
      pool AS MATERIALIZED (SELECT query_id, neighbor_id, rel FROM (
          SELECT query_id, neighbor_id, rel,
            row_number() OVER (PARTITION BY query_id
              ORDER BY rel DESC, neighbor_id) AS rn
          FROM scoredp) WHERE rn <= $MmrPool),
      s1 AS (SELECT query_id, neighbor_id, rel, 7.0 * rel AS score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY 7.0 * rel DESC, neighbor_id) AS rn
        FROM pool),
      sel1 AS (SELECT query_id, neighbor_id, rel, score, 1 AS pick
        FROM s1 WHERE rn = 1),
      $steps
      SELECT query_id, CAST(pick AS BIGINT) AS pick, neighbor_id,
        CAST(floor(rel * 1000000) AS BIGINT) AS rel_e6,
        CAST(floor(score * 1000000) AS BIGINT) AS mmr_score_e6
      FROM (${(1 to MmrK).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")})"""
  }

  /** q193 — multi-layer HNSW ([[Similarity.hnswBuildLayers]] /
    * [[Similarity.hnswSearch]]): the q166 NSW base layer stacked into a
    * real hierarchy. Layer membership is a deterministic hash-geometric
    * rule (P(level ≥ l) = 4^-l, integer md5 divisibility — no FP
    * boundary), each upper layer is the same banded-bucket graph build
    * over its exponentially sparser population with the plane ladder
    * re-scaled to that population, and search greedily DESCENDS: narrow
    * beams through the upper layers route the entry toward the query's
    * neighborhood before the base layer runs the full q166 beam — the
    * log-routing that lets graph ANN start near the answer instead of
    * at a fixed global entry. The oracle replays levels, every layer's
    * build, and every descent hop bitwise; recall ≥ the single-layer
    * search is spec-pinned. */
  private val hnswLayerCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[DataFrame]]

  def hnswTopKQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val layers = hnswLayerCache.getOrElseUpdate(dir,
      Similarity.hnswBuildLayers(emb, "vec_id", "embedding",
        m = NswM, numBands = NumBands, dim = Dim))
    e6(Similarity.hnswSearch(layers, emb, queriesOf(emb), "vec_id",
      "embedding", K, beam = NswBeam, hops = NswHops,
      upperBeam = HnswUpperBeam, upperHops = HnswUpperHops))
  }

  private val hnswOracle = Similarity.sqlHnswTopK(k = K, m = NswM,
    beam = NswBeam, hops = NswHops, upperBeam = HnswUpperBeam,
    upperHops = HnswUpperHops, numBands = NumBands, dim = Dim,
    queryPred = "e.vec_id < 20")

  /** q170 — metadata-FILTERED ANN (hybrid search, the production
    * "vector search WHERE label = …" shape): queries search only the
    * corpus subset passing a relational predicate, through the SAME
    * k-means IVF index trained on the FULL corpus — exactly how a real
    * deployment applies a selector to its inverted lists rather than
    * rebuilding the index per predicate (FAISS IDSelector /
    * filtered-HNSW). The filter composes BEFORE cell assignment in the
    * narrow corpus pass, so the probe join scans only qualifying codes;
    * plan shape and oracle machinery are q39's with a filtered corpus
    * CTE swapped in (the q88 `corpusSrc` hook). */
  def filteredIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cents = centroidCache.getOrElseUpdate(dir,
      Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        nCells = 16, iters = 2))
    e6(Similarity.ivfTopKTrained(emb.filter(col("label") % 2 === 0),
      queriesOf(emb), "vec_id", "embedding", K, cents, nProbe = 8))
  }

  private val filteredIvfOracle = Similarity.sqlKmeansIvfTopK(nCells = 16,
    iters = 2, nProbe = 8, k = K, dim = Dim, queryPred = "e.vec_id < 20",
    corpusSrc = "fcorpus",
    extraCtes = """fcorpus AS (SELECT e.vec_id, e.v
        FROM emb e JOIN embeddings r ON r.vec_id = e.vec_id
        WHERE r.label % 2 = 0)""")

  /** 64 dims pack into 2×32-bit words (BIGINT-valued, sign-safe: a full
    * 64-bit word's top bit would overflow the exact-double packing both
    * engines share). */
  private val BqWords = 2
  /** Hamming-stage shortlist size — the recall/cost knob of every
    * two-stage binary-quantization deployment. */
  private val BqShortlist = 20

  /** q211 — BINARY-QUANTIZATION ANN with exact rerank (the 1-bit
    * compression ladder rung below q82's int8 / q158's PQ — what
    * vector stores ship as "BQ + rescore"): each vector compresses to
    * its SIGN BITS packed into [[BqWords]] integer words (32× smaller
    * than float32; 256× smaller than the double form), candidate
    * generation is integer HAMMING distance on the packed words
    * (bit_count(xor) — SIMD-able, no floating point, no corpus
    * shuffle: the same broadcast-queries narrow pass as q24), and only
    * the [[BqShortlist]] best-by-hamming candidates per query are
    * reranked with the exact cosine. Both stages rank through the
    * native O(k) [[graft.functions.TopKPairs]] heap — hamming
    * ascending via negated score, ties by id, exactly the oracle's
    * window order. Every packed bit, xor, popcount and the final
    * cosine is identical integer/IEEE arithmetic in both engines, so
    * the shortlist AND the reranked top-k hash-compare exactly. */
  def bqHammingTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.util.Par.ensure(Tables(spark, dir, "embeddings"))
    def coded(df: DataFrame) = df
      .withColumn("_d", col("embedding").cast("array<double>"))
      .withColumn("code", transform(sequence(lit(0), lit(BqWords - 1)), w =>
        aggregate(sequence(lit(1), lit(32)), lit(0L), (acc, j) =>
          acc + when(element_at(col("_d"), (w * 32 + j).cast("int")) > 0.0,
            pow(lit(2.0), (j - 1).cast("double")).cast("long"))
            .otherwise(lit(0L)))))
      .drop("_d")
    val corpus = coded(emb).select(col("vec_id"), col("embedding"),
      col("code"))
    val q = broadcast(coded(queriesOf(emb))
      .select(col("vec_id").as("query_id"), col("embedding").as("_qv"),
        col("code").as("_qc")))
    val ham = corpus.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("code"), col("_qc"),
            (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("hamming"))
    val short = ham.groupBy("query_id")
      .agg(graft.functions.TopKPairs.column(
        -col("hamming").cast("double"), col("vec_id"), BqShortlist)
        .as("_top"))
      .select(col("query_id"), explode(col("_top")).as("_p"))
      .select(col("query_id"), col("_p.id").as("neighbor_id"),
        (-col("_p.score")).cast("long").as("hamming"))
    // exact rerank touches shortlist-sized data only
    val rer = short
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("_cv")), "neighbor_id")
      .join(q.select(col("query_id"), col("_qv")), "query_id")
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        Similarity.cosine(col("_qv"), col("_cv")).as("cos_sim"))
    rer.groupBy("query_id")
      .agg(graft.functions.TopKPairs.column(
        col("cos_sim"), col("neighbor_id"), K).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_i", "_p")))
      .select(col("query_id"), (col("_i") + 1).cast("long").as("rank"),
        col("_p.id").as("neighbor_id"),
        floor(col("_p.score") * 1000000).as("cos_sim_e6"))
      .join(rer.select(col("query_id"), col("neighbor_id"), col("hamming")),
        Seq("query_id", "neighbor_id"))
      .select("query_id", "rank", "neighbor_id", "cos_sim_e6", "hamming")
  }

  private val bqHammingOracle = {
    val cosRer = Similarity.sqlCosine("qe.embedding", "ce.embedding")
    s"""
      WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS d FROM embeddings),
      coded AS (
        SELECT vec_id,
          list_transform(range(0, $BqWords), w ->
            CAST(list_sum(list_transform(range(1, 33), j ->
              CASE WHEN d[w * 32 + j] > 0 THEN 2.0 ** (j - 1)
                   ELSE 0 END)) AS BIGINT)) AS code
        FROM v),
      ham AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          CAST(bit_count(xor(c.code[1], q.code[1]))
             + bit_count(xor(c.code[2], q.code[2])) AS BIGINT) AS hamming
        FROM coded q JOIN coded c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 20),
      short AS (
        SELECT query_id, neighbor_id, hamming,
          row_number() OVER (PARTITION BY query_id
            ORDER BY hamming, neighbor_id) AS hrank
        FROM ham),
      rer AS (
        SELECT s.query_id, s.neighbor_id, s.hamming, $cosRer AS cos_sim
        FROM short s
        JOIN embeddings qe ON qe.vec_id = s.query_id
        JOIN embeddings ce ON ce.vec_id = s.neighbor_id
        WHERE s.hrank <= $BqShortlist),
      ranked AS (
        SELECT query_id, neighbor_id, hamming, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM rer)
      SELECT query_id, rank, neighbor_id,
        CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6, hamming
      FROM ranked WHERE rank <= $K"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q218_ann_index_delete", annIndexDeleteQ,
      Some(annIndexDeleteOracle)),
    QueryDef("q211_bq_hamming_topk", bqHammingTopK, Some(bqHammingOracle)),
    QueryDef("q170_filtered_ivf_topk", filteredIvfTopK,
      Some(filteredIvfOracle)),
    QueryDef("q166_nsw_graph_topk", nswTopKQ, Some(nswOracle)),
    QueryDef("q321_filtered_nsw_topk", filteredNswTopK,
      Some(filteredNswOracle)),
    QueryDef("q276_nsw_incremental_add", nswIncrementalQ,
      Some(nswIncrementalOracle)),
    QueryDef("q277_hnsw_incremental_add", hnswIncrementalQ,
      Some(hnswIncrementalOracle)),
    QueryDef("q193_hnsw_topk", hnswTopKQ, Some(hnswOracle)),
    QueryDef("q162_pq_kmeans_topk", pqKmeansTopK, Some(pqKmeansOracle)),
    QueryDef("q159_ivf_pq_topk", ivfPqTopKQ, Some(ivfPqOracle)),
    QueryDef("q158_pq_topk", pqTopK, Some(pqOracle)),
    QueryDef("q183_pq_rerank_topk", pqRerankTopKQ, Some(pqRerankOracle)),
    QueryDef("q184_semdedup", semDedupQ, Some(semDedupOracle)),
    QueryDef("q185_incremental_ann_index", incrementalAnnIndexQ,
      Some(incrementalAnnOracle)),
    QueryDef("q82_int8_quantize", int8Quantize, Some(int8QuantizeOracle)),
    QueryDef("q88_ivf_sq8_topk", ivfSq8TopK, Some(ivfSq8Oracle)),
    QueryDef("q83_sq8_topk", sq8TopK, Some(sq8TopKOracle)),
    QueryDef("q232_matryoshka_topk", matryoshkaTopK, Some(matryoshkaOracle)),
    QueryDef("q233_knn_graph", knnGraph, Some(knnGraphOracle)),
    QueryDef("q251_hard_negatives", hardNegatives,
      Some(hardNegativesOracle)),
    QueryDef("q256_ann_group_ingest", annGroupIngestQ,
      Some(annGroupIngestOracle)),
    QueryDef("q280_pca_covariance", pcaCovariance, Some(pcaCovOracle)),
    QueryDef("q299_embedding_drift", embeddingDrift,
      Some(embeddingDriftOracle)),
    QueryDef("q281_ivf_range_search", ivfRangeSearch,
      Some(ivfRangeOracle)),
    QueryDef("q24_cosine_topk", cosineTopK, Some(cosineTopKOracle)),
    QueryDef("q25_lsh_ann_topk", lshTopK, Some(lshTopKOracle)),
    QueryDef("q26_embedding_near_dups", embeddingNearDups,
      Some(embeddingNearDupsOracle)),
    QueryDef("q39_ivf_kmeans_topk", ivfKmeansTopK, Some(ivfKmeansOracle)),
    QueryDef("q57_embedding_dup_clusters", embeddingDupClusters,
      Some(embeddingDupClustersOracle)),
    QueryDef("q306_graph_ann_delete", nswDeleteQ, Some(nswDeleteOracle)),
    QueryDef("q317_ann_maintain", annMaintainQ, Some(annMaintainOracle)),
    QueryDef("q310_mmr_select", mmrSelect, Some(mmrOracle)))
}
