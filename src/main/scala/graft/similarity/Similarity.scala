package graft.similarity

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Par

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus, fold the dot product inside codegen, then
  *    reduce to top-k per query through the O(k) partial-agg
  *    [[graft.functions.TopKPairs]] — never a per-query window sort
  *    of the scored relation. The corpus is never shuffled — at
  *    100 TB this is one scan; cost is O(|corpus|·|queries|·dim).
  *  - [[lshTopK]] — random-hyperplane LSH: bucket every vector by the sign
  *    pattern of `numPlanes` fixed pseudo-random hyperplanes (a literal
  *    matrix, derived deterministically from md5 — no fitted state), then
  *    search only within the query's bucket. One shuffle on the bucket key;
  *    recall trades against bucket count.
  */
object Similarity {

  /** Dot product of two float arrays in double — a native codegen'd
    * Catalyst expression (graft.functions.FloatVecDot). Left-to-right
    * sequential sum, bit-identical to a fold and to DuckDB's
    * list_dot_product element order. */
  def dot(a: Column, b: Column): Column = graft.functions.FloatVecDot(a, b)

  /** The equivalent built-in higher-order-function fold (kept as the
    * reference implementation; interpreted per element, so slower). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * Ranking uses the raw double score with an id tiebreak; the fold-based
    * dot product makes scores engine-reproducible. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv")))
    val scored = Par.ensure(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("_qv"), col("_cv")).as("cos_sim"))
    topK(scored, k)
  }

  /** Per-query top-k of the scored relation via the native bounded-heap
    * aggregate ([[graft.functions.TopKPairs]]), NOT a `row_number()`
    * window: the window form shuffles and sorts EVERY scored row into
    * |queries| reducers — with a handful of queries over a 100 TB corpus
    * that is a per-query single-reducer sort of the whole corpus. The
    * aggregate carries O(k) state per query through partial aggregation,
    * so each map task ships at most k pairs per query and no sort of the
    * scored relation ever exists in the plan (ScaleSpecs-pinned). Unlike
    * the typed `groupByKey`/`Aggregator` form it replaces (VERDICT r10
    * item 2), rows reach the aggregate as Tungsten InternalRows — no
    * per-row tuple deserialization, and the scoring projection fuses
    * into the aggregate's input stage under whole-stage codegen.
    * Ordering matches the oracle's window exactly: cos_sim DESC,
    * neighbor_id ASC on ties. */
  private[graft] def topK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKPairs.column(
        col("cos_sim"), col("neighbor_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_i", "_p")))
      .select(col("query_id"), (col("_i") + 1).cast("long").as("rank"),
        col("_p.id").as("neighbor_id"), col("_p.score").as("cos_sim"))

  /** Each query's `nProbe` best cells, chosen WITHOUT a window: the
    * centroid-score array is ranked inside the row (sort a (score, cell)
    * struct array, slice, explode) — a narrow projection on the tiny
    * query relation, so no sort exchange partitioned by query_id exists
    * anywhere in the IVF plans. Ordering matches the oracle's probe
    * ranking: score DESC, cell ASC on ties. */
  private def probedCells(queries: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], nProbe: Int): DataFrame = {
    val pairs = transform(cellScores(col(vecCol), cents),
      (s, i) => struct(s.as("s"), i.as("c")))
    val ranked = array_sort(pairs, (l, r) =>
      when(l("s") > r("s"), lit(-1)).when(l("s") < r("s"), lit(1))
        .otherwise(l("c") - r("c")))
    queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        explode(slice(ranked, 1, nProbe)).as("_sc"))
      .select(col("query_id"), col("_qv"),
        col("_sc.c").cast("int").as("_cell"))
  }

  /** Deterministic ±1 hyperplane matrix [numPlanes][dim], seeded by md5 of
    * "plane-dim" — reproducible everywhere, including inside oracle SQL. */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { j =>
      (0 until dim).map { d =>
        val digest = MessageDigest.getInstance("MD5")
          .digest(s"$j-$d".getBytes(StandardCharsets.UTF_8))
        if ((digest(0) & 1) == 1) 1.0 else -1.0
      }
    }

  /** Sign-pattern bucket id from the hyperplane dots. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: exact ranking within the query's LSH bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val bucketed = Par.ensure(corpus).select(col(idCol).as("neighbor_id"),
      col(vecCol).as("_cv"), lshBucket(col(vecCol), planes).as("_bucket"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv"), lshBucket(col(vecCol), planes).as("_qbucket")))
    val scored = bucketed.join(q, col("_bucket") === col("_qbucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("_qv"), col("_cv")).as("cos_sim"))
    topK(scored, k)
  }

  /** Deterministic md5-ordered sample of `nCells` corpus vectors as
    * double centroids — the zero-training IVF seed (and the k-means
    * initialization). */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int): Array[Array[Double]] =
    corpus.select(col(vecCol))
      .orderBy(md5(col(idCol).cast("string")))
      .limit(nCells).collect()
      // element-wise dispatch: the corpus may carry float OR double
      // vectors (q281's shifted corpus is double), and Seq's erasure
      // means a typed getSeq would unbox-cast and throw on the mix
      .map(_.getSeq[Any](0).toArray.map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => throw new IllegalArgumentException(
          s"non-numeric vector element $other")
      })

  /** Spherical k-means (Lloyd) refinement of the sampled centroids:
    * assign every corpus vector to its max-cosine centroid, recompute each
    * centroid as the member mean, L2-normalize, repeat. Each iteration is
    * one narrow assignment pass plus one (cell, dim)-keyed hash-agg
    * shuffle of scalar components — the corpus is never collected; only
    * the nCells×dim centroid matrix comes back to the driver. Empty cells
    * keep their previous centroid. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 3): Array[Array[Double]] = {
    var cents = sampleCentroids(corpus, idCol, vecCol, nCells)
      .map(l2Normalize)
    for (_ <- 0 until iters) {
      // argmax-cosine assignment via the native single-loop expression
      // (bitwise-equal scores and first-max ties vs the
      // array_position/array_max form — see PqBestCode's parity note)
      val means = Par.ensure(corpus).select(col(vecCol).as("_v"))
        .select(col("_v"), graft.functions.PqBestCode.column(
          col("_v"), cents, 0, cents(0).length).as("_cell"))
        .select(col("_cell"), posexplode(col("_v")).as(Seq("_pos", "_x")))
        .groupBy("_cell", "_pos").agg(avg(col("_x")).as("_m"))
        .collect()
      val next = cents.map(_.clone())
      means.groupBy(_.getInt(0)).foreach { case (cell, rows) =>
        val m = new Array[Double](cents(cell).length)
        rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
        next(cell) = l2Normalize(m)
      }
      cents = next
    }
    cents
  }

  private def l2Normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Cosine of a vector column against every centroid, as an array. */
  private def cellScores(v: Column, cents: Array[Array[Double]]): Column = {
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    array(cents.zip(norms).map { case (c, n) =>
      dot(v, array(c.map(lit): _*)) / (norm(v) * lit(n))
    }: _*)
  }

  /** IVF-style approximate top-k: the corpus is partitioned into
    * inverted-file cells by nearest centroid; each query searches only its
    * `nProbe` closest cells.
    *
    * Centroids are a deterministic md5-ordered sample of the corpus (no
    * training state); [[ivfTopKTrained]] takes k-means-refined centroids
    * for better recall at the same probe budget. Cell assignment is a
    * narrow map over the corpus; the probe join shuffles on the small
    * (query × probed-cell) side only. Recall trades against
    * nProbe/nCells; the exact path is [[bruteForceTopK]]. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 8): DataFrame =
    ivfTopKTrained(corpus, queries, idCol, vecCol, k,
      sampleCentroids(corpus, idCol, vecCol, nCells), nProbe)

  /** The cell-assignment COLUMN, made NON-NULLABLE via a -1 sentinel
    * (null vectors cannot score, and -1 never matches a probed cell, so
    * semantics are unchanged). The nullability matters for PLAN shape:
    * a nullable join key makes Catalyst infer `IsNotNull(cell)` and
    * push it into the SCAN filter with the whole assignment expression
    * inlined — alias substitution through the pushdown re-inlines any
    * staged upstream columns (the SQ8 dequant's min/max re-evaluated
    * PER LAMBDA ELEMENT — the measured O(d²)-per-row q88 pathology) and
    * evaluates the argmax twice per row everywhere else. */
  private def cellCol(vec: Column, cents: Array[Array[Double]]): Column =
    coalesce(graft.functions.PqBestCode.column(
      vec, cents, 0, cents(0).length), lit(-1))

  /** Max-cosine cell assignment against a centroid matrix — the shared
    * corpus-side step of IVF search and cluster-scoped dedup (the
    * native single-loop argmax, first-max = lowest-cell ties). */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame =
    Par.ensure(df).select(col(idCol), col(vecCol),
      cellCol(col(vecCol), cents).as("cell"))

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means clusters bound
    * the pairwise work, then EXACT cosine within each cluster marks
    * semantic duplicates — a vector is removed iff a LOWER-id cluster
    * member sits above the threshold (the deterministic keep-lowest
    * survivor rule, q21/q65 discipline; the paper keeps one per
    * duplicate set — rule choice documented, not semantic-bearing).
    * Returns one row per vector: (id, cell, kept).
    *
    * Scale shape: the quadratic is confined WITHIN clusters — cost
    * O(Σ|cluster|²), and the cluster count is the knob that bounds it
    * (the paper runs 50k clusters at web scale; cells scale ∝ corpus
    * like [[scaledPlaneCount]] does for buckets). One cell shuffle for
    * the self-join; training cost is shared with the IVF index
    * ([[kmeansCentroids]] — same centroids serve search and dedup). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], threshold: Double): DataFrame = {
    // null vectors are UNASSIGNABLE, not members of a shared sentinel
    // cell: they are excluded before the self-join (the -1 key would
    // otherwise co-locate them) and surface with a null cell, kept —
    // a vector that cannot be scored cannot be proven duplicate
    val valid = df.filter(col(vecCol).isNotNull)
    val cells = assignCells(valid, idCol, vecCol, cents)
    val dups = cells.as("x").join(cells.as("y"),
        col(s"x.cell") === col(s"y.cell") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .filter(cosine(col(s"x.$vecCol"), col(s"y.$vecCol")) >= threshold)
      .select(col(s"y.$idCol").as(idCol)).distinct()
      .withColumn("_dup", lit(true))
    val assigned = cells.select(col(idCol), col("cell").cast("long").as("cell"))
      .join(dups, Seq(idCol), "left_outer")
      .select(col(idCol), col("cell"), col("_dup").isNull.as("kept"))
    val unassignable = df.filter(col(vecCol).isNull)
      .select(col(idCol), lit(null).cast("long").as("cell"),
        lit(true).as("kept"))
    assigned.unionByName(unassignable)
  }

  /** DuckDB replay of [[semDedup]]: the k-means training chain, the
    * assignment, and the within-cluster threshold pairs. */
  def sqlSemDedup(nCells: Int, iters: Int, dim: Int,
      threshold: Double): String = {
    val (kmeansBlock, fin) = sqlKmeansCtes(nCells, iters)
    val cos = sqlCosine("x.v", "y.v")
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      pos AS (SELECT CAST(unnest(range($dim)) AS BIGINT) AS p),
      $kmeansBlock,
      cc AS (SELECT vec_id, v, cell FROM (${sqlAssign("emb", fin)}) WHERE rnk = 1),
      dups AS (SELECT DISTINCT y.vec_id
        FROM cc x JOIN cc y ON x.cell = y.cell AND x.vec_id < y.vec_id
        WHERE ($cos) >= $threshold)
      SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
             (d.vec_id IS NULL) AS kept
      FROM cc c LEFT JOIN dups d ON d.vec_id = c.vec_id"""
  }

  /** IVF probe against a given centroid matrix (sampled or k-means). */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cents: Array[Array[Double]],
      nProbe: Int): DataFrame = {
    // native single-loop argmax assignment (PqBestCode): one expression
    // per row instead of an nCells-wide score-array tree
    val corpusCells = Par.ensure(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
        cellCol(col(vecCol), cents).as("_cell"))

    // each query probes its nProbe best cells (narrow in-row ranking)
    val qCells = broadcast(probedCells(queries, idCol, vecCol, cents, nProbe))

    val scored = corpusCells.join(qCells, Seq("_cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("_qv"), col("_cv")).as("cos_sim"))
    topK(scored, k)
  }

  /** Banded hyperplane matrix: like [[hyperplanes]] but seeded per band
    * (`"band:plane-dim"`), so each band hashes independently. Plane j is
    * independent of how many planes a band uses — truncating to r planes
    * equals generating r. */
  def bandedHyperplanes(band: Int, numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { j =>
      (0 until dim).map { d =>
        val digest = MessageDigest.getInstance("MD5")
          .digest(s"$band:$j-$d".getBytes(StandardCharsets.UTF_8))
        if ((digest(0) & 1) == 1) 1.0 else -1.0
      }
    }

  /** The (id, vector, band, signature) relation shared by the banded
    * near-dup join and the NSW graph build: one posexploded row per
    * (vector, band), so ONE (band, signature)-keyed self-join covers
    * every band. Callers persist/unpersist it — it is self-joined. */
  private def bandedSignatures(df: DataFrame, idCol: String, vecCol: String,
      numBands: Int, r: Int, dim: Int): DataFrame =
    Par.ensure(df)
      .select(col(idCol).as("id"), col(vecCol).as("_v"),
        posexplode(array((0 until numBands).map(b =>
          lshBucket(col(vecCol), bandedHyperplanes(b, r, dim))): _*))
          .as(Seq("_band", "_sig")))

  /** Corpus-scaled planes-per-band: the smallest r in [minPlanes,
    * maxPlanes] with `targetBucketCap · 2^r ≥ n`, so expected bucket
    * occupancy stays ≤ targetBucketCap and the intra-bucket pairwise cost
    * is O(n · targetBucketCap) per band instead of O((n/2^fixed)²).
    * Pure-integer ladder — the SQL oracle derives the identical r with no
    * FP-boundary (`ceil(log2(...))`) divergence risk. */
  def scaledPlaneCount(n: Long, targetBucketCap: Long = 1024L,
      minPlanes: Int = 8, maxPlanes: Int = 24): Int =
    (minPlanes to maxPlanes).find(j => (targetBucketCap << j) >= n)
      .getOrElse(maxPlanes)

  /** Embedding-cosine near-duplicate pairs (a < b): candidates share a
    * sign-LSH bucket in ANY of `numBands` independent bands, kept when
    * cosine ≥ threshold (verified on the original vectors). Multi-band OR
    * restores the recall that longer signatures cost, and the per-band
    * plane count scales with corpus size ([[scaledPlaneCount]]) so bucket
    * count grows ∝ n — at any scale, expected intra-bucket pair work is
    * O(n · targetBucketCap · numBands), never all-pairs. ONE
    * (band, bucket)-keyed shuffle covers every band; pairs found by
    * several bands are collapsed by the final distinct on
    * bitwise-identical cosine rows.
    *
    * This form leaves the internal signature cache to LRU/clearCache
    * (the returned frame is lazy); long-lived sessions should use
    * [[embeddingNearDuplicatesReleasable]] and release() after
    * consumption. */
  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numBands: Int = 4, dim: Int = 64,
      targetBucketCap: Long = 1024L): DataFrame =
    embeddingNearDuplicatesReleasable(df, idCol, vecCol, threshold, numBands,
      dim, targetBucketCap)._1

  /** As [[embeddingNearDuplicates]] with a release handle for the cached
    * per-vector signature relation (self-joined twice per band); call
    * release() once the frame is consumed. */
  def embeddingNearDuplicatesReleasable(df: DataFrame, idCol: String,
      vecCol: String, threshold: Double, numBands: Int = 4, dim: Int = 64,
      targetBucketCap: Long = 1024L): (DataFrame, () => Unit) = {
    // count() is one cheap columnar scan; it sizes the bucket space the
    // same way the SQL oracle does (COALESCE(MIN r: cap·2^r ≥ n, max))
    val r = scaledPlaneCount(df.count(), targetBucketCap)
    // all bands in ONE (band, sig)-keyed relation: the candidate join is
    // a single equi-shuffle instead of one self-join stage per band —
    // identical pair set (multi-band hits collapse in the distinct over
    // bitwise-identical cosine rows)
    val sig = bandedSignatures(df, idCol, vecCol, numBands, r, dim)
      .persist()
    val out = sig.as("x").join(sig.as("y"),
        col("x._band") === col("y._band") && col("x._sig") === col("y._sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        cosine(col("x._v"), col("y._v")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
    (out, () => { sig.unpersist(); () })
  }

  // ---- DuckDB SQL mirrors ----

  def sqlDot(a: String, b: String): String =
    s"list_dot_product($a::DOUBLE[], $b::DOUBLE[])"

  def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"

  def sqlPlaneLiteral(p: Seq[Double]): String =
    p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  def sqlLshBucket(vec: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"CASE WHEN ${sqlDot(vec, sqlPlaneLiteral(p))} > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** The banded-near-dup pipeline ([[embeddingNearDuplicates]]) as a
    * DuckDB CTE chain ending in `bpairs` (DISTINCT verified pairs with
    * their raw cosine) — shared by the pair query's oracle and the
    * cluster oracle's recursive closure. The banded planes are DERIVED
    * in SQL from the same md5 seeds (first digest byte's low bit, the
    * proven cross-engine md5 parity trick) and the per-band plane count
    * r from the same integer ladder over count(*), so one static SQL
    * string mirrors the corpus-scaled bucketing at every scale factor.
    * Cosines are computed on original vectors → bitwise equal →
    * DISTINCT collapses multi-band hits identically in both engines. */
  /** The banded-signature CTE prefix shared by the near-dup oracles and
    * the NSW graph oracle: emb → corpus count → scaled plane count →
    * md5-derived planes → per-(vector, band) signatures → sv
    * (signatures joined back to vectors). */
  def sqlBandSigCtes(numBands: Int, dim: Int, targetBucketCap: Long,
      minPlanes: Int, maxPlanes: Int): String =
    s"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      n AS (SELECT count(*) AS c FROM emb),
      params AS (SELECT COALESCE(MIN(js.j), $maxPlanes) AS r
        FROM (SELECT CAST(unnest(range($minPlanes, ${maxPlanes + 1})) AS INT) AS j) js, n
        WHERE (CAST($targetBucketCap AS BIGINT) << js.j) >= n.c),
      planes AS MATERIALIZED (
        SELECT band, j, list(s ORDER BY d) AS p FROM (
          SELECT b.band, j.j, d.d,
            CASE WHEN ((('0x' || substr(md5(b.band || ':' || j.j || '-' || d.d), 1, 2))::INT & 1) = 1)
                 THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT unnest(range($numBands)) AS band) b,
               (SELECT unnest(range($maxPlanes)) AS j) j,
               (SELECT unnest(range($dim)) AS d) d) t
        GROUP BY band, j),
      sigs AS (
        SELECT e.vec_id, p.band,
          SUM(CASE WHEN list_dot_product(e.v, p.p) > 0
                   THEN (CAST(1 AS BIGINT) << p.j) ELSE CAST(0 AS BIGINT) END) AS sig
        FROM emb e CROSS JOIN planes p
        WHERE p.j < (SELECT r FROM params)
        GROUP BY e.vec_id, p.band),
      sv AS (SELECT s.vec_id, s.band, s.sig, e.v
        FROM sigs s JOIN emb e ON e.vec_id = s.vec_id)"""

  def sqlBandedNearDupCtes(threshold: Double, numBands: Int, dim: Int,
      targetBucketCap: Long, minPlanes: Int, maxPlanes: Int): String = {
    val cos = sqlCosine("x.v", "y.v")
    s"""${sqlBandSigCtes(numBands, dim, targetBucketCap, minPlanes, maxPlanes)},
      bpairs AS (
        SELECT DISTINCT x.vec_id AS a, y.vec_id AS b, ($cos) AS cos_sim
        FROM sv x JOIN sv y
          ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id
        WHERE ($cos) >= $threshold)"""
  }

  def sqlBandedNearDuplicates(threshold: Double, numBands: Int, dim: Int,
      targetBucketCap: Long, minPlanes: Int, maxPlanes: Int): String =
    s"""WITH ${sqlBandedNearDupCtes(threshold, numBands, dim, targetBucketCap, minPlanes, maxPlanes)}
      SELECT a, b, CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
      FROM bpairs"""

  /** DuckDB mirror of the FULL [[kmeansCentroids]] + [[ivfTopKTrained]]
    * pipeline as one CTE chain — training replayed in SQL rather than
    * interpolating dir-dependent centroid literals, so the oracle holds at
    * any scale factor. Step-for-step mirror of the Scala path:
    * md5-ordered seed sample → l2 normalize → per-iteration (argmax-cosine
    * assignment with first-index tiebreak, per-(cell,pos) mean, l2
    * normalize, empty cells keep the previous centroid) → corpus cell
    * assignment → per-query nProbe probe → in-cell exact cosine top-k.
    *
    * FP parity: both engines fold dot products left-to-right, so seed
    * centroids and all cosines over ORIGINAL vectors are bitwise equal.
    * The per-cell means (`avg`) may differ in the last ulp across engines
    * (summation order); means only feed DISCRETE choices — cell argmax,
    * probe ranking — whose score gaps dwarf an ulp, and the emitted
    * cos_sim is computed from original vectors only, so the hash compare
    * is stable. */
  /** `corpusSrc`/`extraCtes` let a caller swap the SEARCHED corpus (cell
    * assignment + in-cell scoring) for a derived relation — e.g. the
    * SQ8-dequantized vectors of q88 — while training still runs on the
    * original `emb` (how a production IVF trains: full precision in,
    * codes stored). `extraCtes` must define `corpusSrc` as
    * `(vec_id, v DOUBLE[])` and ends WITHOUT a trailing comma. */
  // ------------------------------------------------ product quantization

  /** PQ codebooks without training (the q25/q83 zero-fitted-state
    * discipline): the md5-ordered first `nCodes` corpus vectors, SLICED
    * into `nSub` subvectors — codebook(m)(k) is subvector m of sample k.
    * Deterministic, data-dependent, replayable in SQL at any scale
    * factor; a k-means-refined variant would plug in exactly like
    * [[ivfTopKTrained]]'s centroids. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      nSub: Int, nCodes: Int, dim: Int): Array[Array[Array[Double]]] = {
    val subDim = dim / nSub
    val samples = sampleCentroids(corpus, idCol, vecCol, nCodes)
    Array.tabulate(nSub)(m =>
      samples.map(_.slice(m * subDim, (m + 1) * subDim)))
  }

  /** PQ-ADC approximate top-k (the FAISS `IndexPQ` shape): every corpus
    * vector is ENCODED once as `nSub` small code ids (nearest sub-
    * codebook entry per subspace by cosine, ties → lowest code), and
    * queries score candidates through per-subspace LOOKUP TABLES — the
    * asymmetric distance computation: numerator = Σ_m ⟨q_m, cb_m[code]⟩
    * (each term an `element_at` into the query's precomputed dot table),
    * denominator = ‖q‖ · √(Σ_m ‖cb_m[code]‖²) — the reconstructed-vector
    * cosine. Memory: codes are nSub bytes/vector vs 4·dim — a 64× index
    * compression at dim=64/nSub=4.
    *
    * Scale shape: encoding is one narrow corpus pass; search joins the
    * small broadcast query relation (with its dot tables) against the
    * CODE relation only — the float vectors never participate, never
    * shuffle. Every sum is a fixed-order sequential IEEE chain, so the
    * SQL oracle reproduces each score bitwise. */
  private def pqSubCol(v: Column, m: Int, subDim: Int): Column =
    slice(v, m * subDim + 1, subDim)

  /** Encoding columns `_k0.._kN`: argmax sub-cosine per subspace via the
    * native single-loop [[graft.functions.PqBestCode]] (first-max =
    * lowest-code tiebreak, bitwise-equal scores — matching the oracle's
    * row_number order; see PqBestCode's parity note). The expression-tree
    * form (nCodes slice+dot chains per subspace per row) was the measured
    * bottleneck of the whole PQ family. */
  private def pqCodeCols(v: Column, cbs: Array[Array[Array[Double]]],
      dim: Int): Seq[Column] = {
    val nSub = cbs.length
    val subDim = dim / nSub
    (0 until nSub).map { m =>
      graft.functions.PqBestCode.column(v, cbs(m), m * subDim, subDim)
        .as(s"_k$m")
    }
  }

  /** Query-side ADC tables `_qd0.._qdN` (per-subspace dots against every
    * code) and `_cn0.._cnN` (code norm-squares). */
  private def pqQueryCols(qv: Column, cbs: Array[Array[Array[Double]]],
      dim: Int): Seq[Column] = {
    val nSub = cbs.length
    val subDim = dim / nSub
    def cbLit(m: Int, kc: Int): Column = array(cbs(m)(kc).map(lit): _*)
    (0 until nSub).flatMap { m =>
      Seq(array(cbs(m).indices.map(kc =>
          dot(pqSubCol(qv, m, subDim), cbLit(m, kc))): _*).as(s"_qd$m"),
        array(cbs(m).indices.map(kc =>
          dot(cbLit(m, kc), cbLit(m, kc))): _*).as(s"_cn$m"))
    }
  }

  /** Reconstructed-vector cosine from the lookup tables — a fixed-order
    * sequential sum the SQL oracle reproduces bitwise. */
  private def pqAdcScore(nSub: Int): Column = {
    val num = (0 until nSub).map(m =>
      element_at(col(s"_qd$m"), col(s"_k$m") + 1)).reduce(_ + _)
    val reconNormSq = (0 until nSub).map(m =>
      element_at(col(s"_cn$m"), col(s"_k$m") + 1)).reduce(_ + _)
    num / (col("_qn") * sqrt(reconNormSq))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cbs: Array[Array[Array[Double]]],
      dim: Int): DataFrame = {
    val codes = Par.ensure(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .select(col("neighbor_id") +: pqCodeCols(col("_cv"), cbs, dim): _*)
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .select(col("query_id") +: norm(col("_qv")).as("_qn") +:
        pqQueryCols(col("_qv"), cbs, dim): _*))
    val scored = codes.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pqAdcScore(cbs.length).as("cos_sim"))
    topK(scored, k)
  }

  /** Two-stage PQ search with EXACT RERANKING (the FAISS
    * `IndexRefineFlat` serving shape — what a production vector store
    * actually runs): stage 1 ADC-scores the compressed CODE relation for
    * each query's `k·refine` best candidates (cheap, approximate, reads
    * nSub bytes/vector); stage 2 re-scores ONLY those candidates with
    * exact cosine on the ORIGINAL vectors and emits the true top-k of
    * the candidate set. Compression errors that perturb the ADC ranking
    * inside the candidate set are fully repaired; only candidates the
    * ADC stage missed entirely stay missed — recall strictly ≥ the
    * plain PQ search at the same k (spec-pinned).
    *
    * Scale shape: the candidate relation is |queries|·k·refine rows —
    * broadcast; the rerank joins it against the corpus WITHOUT
    * shuffling the corpus (one more narrow scan; a deployment with the
    * q175 bloom index instead point-reads the candidate vectors). */
  def pqRerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cbs: Array[Array[Array[Double]]], dim: Int,
      refine: Int = 4): DataFrame = {
    val cand = pqTopK(corpus, queries, idCol, vecCol, k * refine, cbs, dim)
      .select(col("query_id"), col("neighbor_id"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv")))
    val scored = Par.ensure(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("_qv"), col("_cv")).as("cos_sim"))
    topK(scored, k)
  }

  /** IVF-PQ (the FAISS `IndexIVFPQ` composition): the corpus is
    * partitioned into k-means cells AND compressed to PQ codes; a query
    * probes its `nProbe` best cells and ADC-scores only those cells'
    * CODES. The two index structures compose orthogonally — cells prune
    * candidates, codes shrink what remains — which is exactly why the
    * production index ships this pair: at 100 TB the probed fraction of
    * a 64×-compressed code relation is the only thing the search reads.
    * Plan shape: narrow corpus pass (assign + encode in one projection),
    * broadcast (query × probed-cell) join keyed on the cell — no corpus
    * shuffle, same as q39/q88. */
  /** The IVF-PQ ENCODE half alone — cell assignment + sub-codes as a
    * plain relation `(vec_id, cell, _k0.._kN)`, the PERSISTABLE index
    * payload: an incremental deployment trains once, stores this
    * relation in a versioned table, and appends each arriving batch's
    * codes encoded with the SAME centroids/codebooks (the FAISS `add()`
    * path) — the corpus is never re-encoded. One narrow pass, no
    * shuffle. */
  def ivfPqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], cbs: Array[Array[Array[Double]]],
      dim: Int): DataFrame =
    Par.ensure(corpus)
      .select(col(idCol).as("vec_id"), col(vecCol).as("_cv"),
        cellCol(col(vecCol), cents).as("cell"))
      .select(col("vec_id") +: col("cell") +:
        pqCodeCols(col("_cv"), cbs, dim): _*)

  /** The IVF-PQ SEARCH half over a prebuilt CODE relation (the
    * [[ivfPqEncode]] shape, possibly read back from a versioned index
    * table): probe join + ADC scores + O(k) top-k — the float corpus
    * never participates. */
  def ivfPqSearchCodes(codes: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, cents: Array[Array[Double]],
      nProbe: Int, cbs: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val qCells = broadcast(probedCells(queries, idCol, vecCol, cents, nProbe)
      .select(col("query_id") +: col("_cell") +:
        norm(col("_qv")).as("_qn") +: pqQueryCols(col("_qv"), cbs, dim): _*))
    val scored = codes
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumnRenamed("cell", "_cell")
      .join(qCells, Seq("_cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pqAdcScore(cbs.length).as("cos_sim"))
    topK(scored, k)
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cents: Array[Array[Double]], nProbe: Int,
      cbs: Array[Array[Array[Double]]], dim: Int): DataFrame =
    ivfPqSearchCodes(ivfPqEncode(corpus, idCol, vecCol, cents, cbs, dim),
      queries, idCol, vecCol, k, cents, nProbe, cbs, dim)

  /** The flat-PQ encode + ADC search tail, assuming an `emb` (vec_id, v)
    * and a `cb` (m, kc, c) CTE are in scope. With `rerankTo = Some(kf)`,
    * `k` is the ADC candidate budget and an exact-cosine rerank over the
    * ORIGINAL vectors cuts the final result at `kf` (the
    * [[pqRerankTopK]] replay). */
  private def sqlPqSearchTail(nSub: Int, subDim: Int, k: Int,
      queryPred: String, rerankTo: Option[Int] = None): String = {
    def scoreSub(v: String, c: String) =
      s"${sqlDot(v, c)} / (sqrt(${sqlDot(v, v)}) * sqrt(${sqlDot(c, c)}))"
    val encW = (0 until nSub).map(m =>
      s"MAX(CASE WHEN m = $m THEN kc END) AS k$m").mkString(", ")
    val cbJoins = (0 until nSub).map(m =>
      s"JOIN cb b$m ON b$m.m = $m AND b$m.kc = w.k$m").mkString(" ")
    val numSql = (0 until nSub).map(m =>
      s"${sqlDot(s"q.v[${m * subDim + 1}:${(m + 1) * subDim}]", s"b$m.c")}")
      .mkString(" + ")
    val reconSql = (0 until nSub).map(m =>
      sqlDot(s"b$m.c", s"b$m.c")).mkString(" + ")
    s"""sc AS (SELECT e.vec_id, b.m, b.kc,
          ${scoreSub(s"e.v[b.m * $subDim + 1:(b.m + 1) * $subDim]", "b.c")} AS s
        FROM emb e CROSS JOIN cb b),
      enc AS (SELECT vec_id, m, kc FROM (
          SELECT vec_id, m, kc,
            row_number() OVER (PARTITION BY vec_id, m
              ORDER BY s DESC, kc) AS r
          FROM sc) WHERE r = 1),
      encw AS (SELECT vec_id, $encW FROM enc GROUP BY vec_id),
      scored AS (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
          ($numSql) / (sqrt(${sqlDot("q.v", "q.v")}) * sqrt($reconSql))
            AS cos_sim
        FROM encw w $cbJoins
        CROSS JOIN (SELECT vec_id, v FROM emb e WHERE $queryPred) q
        WHERE w.vec_id <> q.vec_id),
      ranked AS (SELECT query_id, neighbor_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)
      ${rerankTo match {
        case None =>
          s"""SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
            CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
          FROM ranked WHERE rank <= $k"""
        case Some(kf) =>
          val exCos = sqlCosine("q.v", "n.v")
          s""", cand AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $k),
          ex AS (SELECT c.query_id, c.neighbor_id, ($exCos) AS cos_sim
            FROM cand c
            JOIN emb n ON n.vec_id = c.neighbor_id
            JOIN emb q ON q.vec_id = c.query_id),
          rr AS (SELECT query_id, neighbor_id, cos_sim,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM ex)
          SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
            CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
          FROM rr WHERE rank <= $kf"""
      }}"""
  }

  /** DuckDB replay of [[pqTopK]] incl. the codebook construction and
    * encoding — same md5 sample order, same slice boundaries, same
    * fixed-order additions. */
  def sqlPqTopK(nSub: Int, nCodes: Int, k: Int, dim: Int,
      queryPred: String): String = {
    val subDim = dim / nSub
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cbv AS (SELECT CAST(row_number() OVER (ORDER BY h) AS INT) - 1 AS kc, v
        FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, v FROM emb
              ORDER BY h LIMIT $nCodes)),
      cb AS (SELECT m.m, cbv.kc,
          cbv.v[m.m * $subDim + 1:(m.m + 1) * $subDim] AS c
        FROM cbv CROSS JOIN range($nSub) m(m)),
      ${sqlPqSearchTail(nSub, subDim, k, queryPred)}"""
  }

  /** DuckDB replay of [[pqRerankTopK]]: the pqTopK chain at the
    * `k·refine` candidate budget, then the exact-cosine rerank cut at
    * `k`. */
  def sqlPqRerankTopK(nSub: Int, nCodes: Int, k: Int, refine: Int,
      dim: Int, queryPred: String): String = {
    val subDim = dim / nSub
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cbv AS (SELECT CAST(row_number() OVER (ORDER BY h) AS INT) - 1 AS kc, v
        FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, v FROM emb
              ORDER BY h LIMIT $nCodes)),
      cb AS (SELECT m.m, cbv.kc,
          cbv.v[m.m * $subDim + 1:(m.m + 1) * $subDim] AS c
        FROM cbv CROSS JOIN range($nSub) m(m)),
      ${sqlPqSearchTail(nSub, subDim, k * refine, queryPred, Some(k))}"""
  }

  /** DuckDB replay of the k-means-TRAINED PQ search: one spherical
    * k-means chain per subspace over the SLICED vectors (prefixed CTEs),
    * unioned into the codebook relation, then the shared encode + ADC
    * tail. */
  def sqlPqKmeansTopK(nSub: Int, nCodes: Int, iters: Int, k: Int, dim: Int,
      queryPred: String): String = {
    val subDim = dim / nSub
    val subCtes = (0 until nSub).map(m =>
      s"""sub$m AS (SELECT vec_id,
          v[${m * subDim + 1}:${(m + 1) * subDim}] AS v FROM emb)""")
      .mkString(",\n      ")
    val chains = (0 until nSub).map(m =>
      sqlKmeansCtes(nCodes, iters, prefix = s"q$m", src = s"sub$m"))
    val chainCtes = chains.map(_._1).mkString(",\n      ")
    val cbUnion = chains.zipWithIndex.map { case ((_, fin), m) =>
      s"SELECT $m AS m, cell AS kc, c FROM $fin"
    }.mkString(" UNION ALL ")
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      pos AS (SELECT CAST(unnest(range($subDim)) AS BIGINT) AS p),
      $subCtes,
      $chainCtes,
      cb AS ($cbUnion),
      ${sqlPqSearchTail(nSub, subDim, k, queryPred)}"""
  }

  /** k-means-TRAINED PQ sub-codebooks: one spherical-k-means run per
    * subspace over the sliced subvectors (same seeding and iteration
    * discipline as the IVF training, so the oracle replays each chain);
    * plugs into [[pqTopK]]/[[ivfPqTopK]] exactly like the sampled
    * codebooks. */
  def pqCodebooksTrained(corpus: DataFrame, idCol: String, vecCol: String,
      nSub: Int, nCodes: Int, dim: Int, iters: Int): Array[Array[Array[Double]]] = {
    val subDim = dim / nSub
    Array.tabulate(nSub) { m =>
      val sub = corpus.select(col(idCol),
        slice(col(vecCol), m * subDim + 1, subDim).as("_subv"))
      kmeansCentroids(sub, idCol, "_subv", nCodes, iters)
    }
  }

  /** Cell-assignment SELECT fragment shared by the k-means oracle
    * builders: every vector of `src` ranked against every centroid of
    * `cents` by cosine (ties → lowest cell). */
  private def sqlAssign(src: String, cents: String, extra: String = ""): String = {
    def score(v: String, c: String) =
      s"${sqlDot(v, c)} / (sqrt(${sqlDot(v, v)}) * sqrt(${sqlDot(c, c)}))"
    s"""SELECT e.vec_id, e.v, k.cell,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY ${score("e.v", "k.c")} DESC, k.cell) AS rnk
      FROM $src e CROSS JOIN $cents k$extra"""
  }

  /** The spherical-k-means training replay as a WITH-fragment (seed →
    * c0 … c`iters`); returns (fragment, final-centroid CTE name).
    * Requires `$src` (vec_id, v) and `$posSrc` (p) CTEs in scope; a
    * non-empty `prefix` namespaces every intermediate CTE so several
    * chains (e.g. one per PQ subspace) coexist in one query. */
  private def sqlKmeansCtes(nCells: Int, iters: Int, prefix: String = "",
      src: String = "emb", posSrc: String = "pos"): (String, String) = {
    def n(name: String) = s"$prefix$name"
    val iterCtes = (1 to iters).map { i =>
      val prev = n(s"c${i - 1}")
      s"""${n(s"s$i")} AS (${sqlAssign(src, prev)}),
      ${n(s"a$i")} AS (SELECT vec_id, v, cell FROM ${n(s"s$i")} WHERE rnk = 1),
      ${n(s"m$i")} AS (SELECT a.cell, pos.p, avg(a.v[pos.p + 1]) AS m
        FROM ${n(s"a$i")} a CROSS JOIN $posSrc pos GROUP BY a.cell, pos.p),
      ${n(s"n$i")} AS (SELECT cell, list(m ORDER BY p) AS c
        FROM ${n(s"m$i")} GROUP BY cell),
      ${n(s"c$i")} AS (SELECT p.cell,
          CASE WHEN n.cell IS NULL THEN p.c
               ELSE list_transform(n.c, x -> x / sqrt(${sqlDot("n.c", "n.c")})) END AS c
        FROM $prev p LEFT JOIN ${n(s"n$i")} n ON n.cell = p.cell)"""
    }.mkString(",\n      ")
    val block = s"""${n("seed")} AS (SELECT v, CAST(row_number() OVER (ORDER BY h) AS INT) - 1 AS cell
        FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, v FROM $src ORDER BY h LIMIT $nCells)),
      ${n("c0")} AS (SELECT cell, list_transform(v, x -> x / sqrt(${sqlDot("v", "v")})) AS c FROM ${n("seed")}),
      $iterCtes"""
    (block, n(s"c$iters"))
  }

  /** DuckDB replay of [[ivfPqTopK]]: the k-means training chain, the PQ
    * codebook/encoding chain, the probe join, and the ADC scores — all
    * fixed-order arithmetic. `trainPred` restricts the TRAINING corpus
    * (centroid seeding/refinement and codebook sampling) to a subset —
    * the incremental-index replay, where later batches are encoded with
    * the initial corpus's fitted state (q185); encode and search always
    * run over the full `emb`. */
  def sqlIvfPqTopK(nCells: Int, iters: Int, nProbe: Int, nSub: Int,
      nCodes: Int, k: Int, dim: Int, queryPred: String,
      trainPred: String = "true", corpusPred: String = "true"): String = {
    val subDim = dim / nSub
    val (kmeansBlock, fin) = sqlKmeansCtes(nCells, iters, src = "tr")
    def scoreSub(v: String, c: String) =
      s"${sqlDot(v, c)} / (sqrt(${sqlDot(v, v)}) * sqrt(${sqlDot(c, c)}))"
    val encW = (0 until nSub).map(m =>
      s"MAX(CASE WHEN m = $m THEN kc END) AS k$m").mkString(", ")
    val cbJoins = (0 until nSub).map(m =>
      s"JOIN cb b$m ON b$m.m = $m AND b$m.kc = w.k$m").mkString(" ")
    val numSql = (0 until nSub).map(m =>
      s"${sqlDot(s"q.qv[${m * subDim + 1}:${(m + 1) * subDim}]", s"b$m.c")}")
      .mkString(" + ")
    val reconSql = (0 until nSub).map(m =>
      sqlDot(s"b$m.c", s"b$m.c")).mkString(" + ")
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      tr AS (SELECT vec_id, v FROM emb e WHERE $trainPred),
      corp AS (SELECT vec_id, v FROM emb e WHERE $corpusPred),
      pos AS (SELECT CAST(unnest(range($dim)) AS BIGINT) AS p),
      $kmeansBlock,
      cbv AS (SELECT CAST(row_number() OVER (ORDER BY h) AS INT) - 1 AS kc, v
        FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, v FROM tr
              ORDER BY h LIMIT $nCodes)),
      cb AS (SELECT m.m, cbv.kc,
          cbv.v[m.m * $subDim + 1:(m.m + 1) * $subDim] AS c
        FROM cbv CROSS JOIN range($nSub) m(m)),
      psc AS (SELECT e.vec_id, b.m, b.kc,
          ${scoreSub(s"e.v[b.m * $subDim + 1:(b.m + 1) * $subDim]", "b.c")} AS s
        FROM corp e CROSS JOIN cb b),
      enc AS (SELECT vec_id, m, kc FROM (
          SELECT vec_id, m, kc,
            row_number() OVER (PARTITION BY vec_id, m
              ORDER BY s DESC, kc) AS r
          FROM psc) WHERE r = 1),
      encw AS (SELECT vec_id, $encW FROM enc GROUP BY vec_id),
      cc AS (SELECT vec_id, cell FROM (${sqlAssign("corp", fin)}) WHERE rnk = 1),
      ccx AS (SELECT c.vec_id, c.cell, w.* EXCLUDE (vec_id)
        FROM cc c JOIN encw w ON w.vec_id = c.vec_id),
      qc AS (SELECT vec_id AS query_id, v AS qv, cell
        FROM (${sqlAssign("emb", fin, s" WHERE $queryPred")}) WHERE rnk <= $nProbe),
      scored AS (SELECT q.query_id, w.vec_id AS neighbor_id,
          ($numSql) / (sqrt(${sqlDot("q.qv", "q.qv")}) * sqrt($reconSql))
            AS cos_sim
        FROM ccx w $cbJoins
        JOIN qc q ON q.cell = w.cell AND w.vec_id <> q.query_id),
      ranked AS (SELECT query_id, neighbor_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
      FROM ranked WHERE rank <= $k"""
  }

  // --------------------------------------------------- graph ANN (NSW)

  /** Single-layer navigable-small-world graph ANN (the HNSW base
    * layer) — completing the ANN family beyond quantization: IVF prunes
    * by SPACE partition, PQ/SQ8 compress VALUES, a neighbor GRAPH routes
    * greedily through local connectivity.
    *
    * BUILD — deterministic, never all-pairs, never sequential: candidate
    * neighbor pairs come from the multi-band sign-LSH buckets (the
    * corpus-scaled [[scaledPlaneCount]] ladder bounds intra-bucket pair
    * work at O(n·cap·bands), the [[embeddingNearDuplicates]]
    * discipline); each node keeps its `m` best candidates by cosine
    * through the O(m) partial-agg [[graft.functions.TopKPairs]],
    * and the directed top-m lists are symmetrized. One
    * (band, bucket)-keyed shuffle plus one bounded aggregation — the connectivity a
    * real NSW insert loop converges to, without its sequential insert
    * dependency (which cannot scale out).
    *
    * SEARCH — greedy beam search from a fixed entry point (minimum id):
    * `hops` rounds of expand-the-beam-through-the-edge-list, keeping the
    * `beam` best nodes seen so far per query, then top-k of everything
    * seen (self excluded). Each hop joins the edge relation against the
    * BROADCAST (query × beam) frontier and scores new candidates on a
    * broadcast-joined corpus projection — the corpus never shuffles.
    * Each hop reads the edge relation once (the q127 superstep shape);
    * a production deployment persists the edges as a table BUCKETED on
    * `src` so the frontier join bucket-prunes to the touched postings,
    * exactly like the q122 inverted-index lookup.
    *
    * Every score is the shared fixed-order IEEE chain over ORIGINAL
    * vectors and every selection tie-breaks on ids, so the DuckDB
    * oracle ([[sqlNswTopK]]) replays BUILD and SEARCH bitwise. */
  /** The graph build uses a SMALLER bucket capacity than near-dup
    * banding: edge candidates per node ≈ cap·bands, which should be a
    * small multiple of the out-degree m — a 1024-cap bucket space
    * leaves buckets near-empty at modest n and the graph disconnected.
    * Same integer ladder, cap 8, floor 3 planes. */
  val NswPlaneCap = 8L
  val NswMinPlanes = 3
  val NswMaxPlanes = 30

  /** The NSW index BUILD alone — the deterministic banded-bucket edge
    * construction (see [[nswTopK]]'s BUILD notes), returned as a
    * materialized (localCheckpointed) symmetrized edge list. A graph is
    * an INDEX: built once per corpus, probed by every search — callers
    * serving repeated queries cache this (the centroid-cache
    * discipline); [[nswTopK]] composes build + search for one-shot
    * use. */
  def nswBuildEdges(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, numBands: Int = 4, dim: Int = 64): DataFrame = {
    val r = scaledPlaneCount(corpus.count(), NswPlaneCap,
      NswMinPlanes, NswMaxPlanes)
    // all bands in ONE (band, sig)-keyed relation: the candidate join is
    // a single equi-shuffle instead of one self-join stage per band
    // (same pair set — multi-band duplicates collapse in the distinct)
    val sig = bandedSignatures(corpus, idCol, vecCol, numBands, r, dim)
      .persist()
    val cand = sig.as("x").join(sig.as("y"),
        col("x._band") === col("y._band") && col("x._sig") === col("y._sig") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("src"), col("y.id").as("dst"),
        cosine(col("x._v"), col("y._v")).as("w"))
      .distinct()
    val topM = cand.groupBy(col("src"))
      .agg(graft.functions.TopKPairs.column(col("w"), col("dst"), m).as("_top"))
      .select(col("src"), explode(col("_top.id")).as("dst"))
    // symmetrize, then truncate lineage: the edge list is re-joined every
    // hop — localCheckpoint materializes it once (the index build)
    val edges = topM.unionByName(
        topM.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    sig.unpersist()
    edges
  }

  def nswTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, beam: Int = 16, hops: Int = 4,
      numBands: Int = 4, dim: Int = 64): DataFrame =
    nswSearch(nswBuildEdges(corpus, idCol, vecCol, m, numBands, dim),
      corpus, queries, idCol, vecCol, k, beam, hops)

  /** Greedy beam SEARCH over a prebuilt edge list (see [[nswTopK]]'s
    * SEARCH notes). `exclude` (a single-id-column frame, driver-small)
    * anti-joins the FINAL scored set — tombstoned nodes keep ROUTING
    * (they stay in beams and edges until [[nswIndexOptimize]] re-wires,
    * the FreshDiskANN tombstone discipline) but can never be a
    * result. */
  def nswSearch(edges: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, beam: Int = 16,
      hops: Int = 4, exclude: Option[DataFrame] = None): DataFrame = {
    val entryId = corpus.agg(min(col(idCol))).head().getLong(0)
    // the query batch is broadcast-small BY CONTRACT (every hop already
    // broadcasts it); materializing it ONCE as a LocalRelation makes
    // every hop's broadcast JOBLESS (BroadcastExchange over a
    // LocalTableScan collects driver-side) instead of re-executing the
    // queries subplan as its own broadcast job per hop — r19, guide
    // §1.2. Driver memory class is unchanged: the driver already held
    // this exact relation as a broadcast per hop.
    val q = localized(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")))
    val vecs = corpus.select(col(idCol).as("node"), col(vecCol).as("_nv"))
    def score(nodes: DataFrame): DataFrame =
      vecs.join(broadcast(nodes), Seq("node"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("node"),
          cosine(col("_qv"), col("_nv")).as("cos"))
    var seen = score(q.select(col("query_id"), lit(entryId).as("node")))
    var beamDf = seen
    for (_ <- 1 to hops) {
      // no distinct on the frontier: duplicate (query, node) pairs
      // score to the SAME deterministic cosine and the seen-level
      // distinct below already dedups — the frontier exchange was one
      // whole extra job per hop (r19; results bit-identical)
      val frontier = edges.join(broadcast(beamDf
          .select(col("query_id"), col("node").as("src"))), Seq("src"))
        .select(col("query_id"), col("dst").as("node"))
      seen = seen.unionByName(score(frontier)).distinct().localCheckpoint()
      beamDf = topK(seen.select(col("query_id"),
          col("node").as("neighbor_id"), col("cos").as("cos_sim")), beam)
        .select(col("query_id"), col("neighbor_id").as("node"),
          col("cos_sim").as("cos"))
    }
    val fin0 = seen.filter(col("node") =!= col("query_id"))
    val fin = exclude.fold(fin0)(x => fin0.join(
      broadcast(x.select(col(x.columns.head).as("node"))),
      Seq("node"), "left_anti"))
    topK(fin.select(col("query_id"), col("node").as("neighbor_id"),
      col("cos").as("cos_sim")), k)
  }

  /** Materialize a DRIVER-SMALL relation as a LocalRelation: a
    * broadcast of a LocalTableScan collects in the broadcast thread
    * with NO Spark job, where broadcasting the original subplan
    * re-executes it as one job per consuming plan. Only for relations
    * whose broadcast the caller already pays (query batches, beam
    * states) — never corpus data. */
  private def localized(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  // ------------------------------------------- hierarchical graph (HNSW)

  /** P(level ≥ l) = HnswLevelBase^-l — the standard HNSW geometric layer
    * distribution (mL = 1/ln 4), realized as an INTEGER divisibility
    * rule over an md5-derived 60-bit hash instead of -ln(U)·mL: both
    * engines derive bitwise-identical levels with zero FP-boundary risk
    * (the q148 fingerprint discipline). */
  val HnswLevelBase = 4L

  /** The EMISSION bound on layers above the base — the most the oracle's
    * unrolled CTE chain ever carries (layers the corpus hasn't earned
    * are empty and their descent blocks no-op). The LIVE layer count is
    * [[hnswMaxLevelFor]]: log₄-scaled to the corpus, the production
    * discipline VERDICT r15 task 4 asked for. 4 static levels cover
    * corpora to [[HnswLayerFloor]]·4⁴ ≈ 2·10³ at floor 8 — and the
    * bound is one constant (plus the same-shape CTE blocks it emits) to
    * raise for bigger gates. */
  val HnswStaticMaxLevel = 4

  /** Minimum expected TOP-layer population: layer l exists once the
    * corpus reaches [[HnswLayerFloor]]·4^l nodes (so the top layer
    * holds ≥ ~8 expected nodes — enough to route). */
  val HnswLayerFloor = 8L

  /** Live layer count for an n-node corpus: the largest l ≤
    * [[HnswStaticMaxLevel]] with n ≥ [[HnswLayerFloor]]·4^l — integer
    * comparisons only (shift by 2l), zero FP-boundary risk. Layer 3
    * appears exactly when n crosses 4³·floor = 512. */
  def hnswMaxLevelFor(n: Long): Int =
    (0 to HnswStaticMaxLevel).reverse
      .find(l => n >= (HnswLayerFloor << (2 * l))).getOrElse(0)

  /** Deterministic hash-geometric layer of a node: the largest l with
    * hash(id) ≡ 0 (mod base^l), capped at [[HnswStaticMaxLevel]].
    * Membership tests (`level ≥ l`) are cap-insensitive for any l ≤
    * cap, so build/search/entry all agree however many layers are
    * LIVE. */
  def hnswLevel(id: Column): Column = {
    val h = conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long")
    (1 to HnswStaticMaxLevel).foldLeft(lit(0): Column) { (acc, l) =>
      val p = Seq.fill(l)(HnswLevelBase).product
      when(h % p === 0, l).otherwise(acc)
    }
  }

  /** Multi-layer HNSW index BUILD: layer l's graph is the [[nswBuildEdges]]
    * construction over the nodes with level ≥ l — same banded-LSH
    * candidate generation, same per-node top-m, same symmetrization,
    * with the plane ladder re-scaled to EACH layer's population (upper
    * layers are exponentially sparser, so their bucket spaces shrink and
    * candidate work stays O(layer · cap · bands)). Returns base-to-top
    * edge lists; every layer is deterministic and oracle-replayed. */
  def hnswBuildLayers(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, numBands: Int = 4, dim: Int = 64): Seq[DataFrame] =
    (0 to hnswMaxLevelFor(corpus.count())).map { l =>
      val sub =
        if (l == 0) corpus
        else corpus.filter(hnswLevel(col(idCol)) >= l)
      nswBuildEdges(sub, idCol, vecCol, m, numBands, dim)
    }

  /** HNSW SEARCH — greedy descent from the top layer: the entry point is
    * the minimum-id top-layer node (falling back to the global minimum
    * if the top layer is unpopulated at tiny corpora); each upper layer
    * runs a NARROW beam (`upperBeam`, `upperHops`) over its own sparse
    * edge list to carry the beam toward the query's neighborhood, and
    * the base layer finishes with the full q166 beam search seeded from
    * the descent instead of a global entry. Everything scored anywhere
    * in the descent participates in the final top-k (scores are exact
    * cosines — keeping them only helps recall). Per hop the frontier
    * joins the layer's edge relation against a BROADCAST (query × beam)
    * set — the corpus never shuffles, upper layers touch exponentially
    * fewer edges, and the base-layer cost is exactly q166's. Recall ≥
    * the single-layer search is spec-pinned. */
  def hnswSearch(layers: Seq[DataFrame], corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      beam: Int = 16, hops: Int = 4, upperBeam: Int = 4,
      upperHops: Int = 2, exclude: Option[DataFrame] = None): DataFrame = {
    val top = layers.size - 1
    val entryId = corpus.filter(hnswLevel(col(idCol)) >= top)
      .agg(min(col(idCol))).head().get(0) match {
        case null => corpus.agg(min(col(idCol))).head().getLong(0)
        case v: Long => v
      }
    // LocalRelation query batch + no frontier distinct — the same two
    // per-hop job cuts as [[nswSearch]], across every layer's descent
    val q = localized(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")))
    val vecs = corpus.select(col(idCol).as("node"), col(vecCol).as("_nv"))
    def score(nodes: DataFrame): DataFrame =
      vecs.join(broadcast(nodes), Seq("node"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("node"),
          cosine(col("_qv"), col("_nv")).as("cos"))
    var seen = score(q.select(col("query_id"), lit(entryId).as("node")))
    var beamDf = seen
    def expand(edges: DataFrame, nHops: Int, width: Int): Unit =
      for (_ <- 1 to nHops) {
        val frontier = edges.join(broadcast(beamDf
            .select(col("query_id"), col("node").as("src"))), Seq("src"))
          .select(col("query_id"), col("dst").as("node"))
        seen = seen.unionByName(score(frontier)).distinct().localCheckpoint()
        beamDf = topK(seen.select(col("query_id"),
            col("node").as("neighbor_id"), col("cos").as("cos_sim")), width)
          .select(col("query_id"), col("neighbor_id").as("node"),
            col("cos_sim").as("cos"))
      }
    for (l <- top to 1 by -1) expand(layers(l), upperHops, upperBeam)
    expand(layers(0), hops, beam)
    val fin0 = seen.filter(col("node") =!= col("query_id"))
    val fin = exclude.fold(fin0)(x => fin0.join(
      broadcast(x.select(col(x.columns.head).as("node"))),
      Seq("node"), "left_anti"))
    topK(fin.select(col("query_id"), col("node").as("neighbor_id"),
      col("cos").as("cos_sim")), k)
  }

  /** [[sqlBandSigCtes]] generalized to a LAYER: same md5 planes (shared
    * `planes` CTE), ladder and signatures computed over the layer's own
    * node subset, CTE names suffixed. */
  // the heavy relations are marked MATERIALIZED: DuckDB's default CTE
  // inlining re-evaluates a CTE PER REFERENCE, and these chains are
  // referenced across every layer and hop — measured on the q193
  // oracle at sf0.01, materialization is 398 s → seconds with
  // bit-identical results (it only pins evaluation, never semantics)
  private def sqlLayerSigCtes(sfx: String, lvlMin: Int, dim: Int,
      targetBucketCap: Long, minPlanes: Int, maxPlanes: Int): String =
    s"""emb$sfx AS MATERIALIZED (SELECT e.vec_id, e.v FROM emb e
        JOIN lvl ON lvl.vec_id = e.vec_id AND lvl.l >= $lvlMin),
      n$sfx AS (SELECT count(*) AS c FROM emb$sfx),
      params$sfx AS (SELECT COALESCE(MIN(js.j), $maxPlanes) AS r
        FROM (SELECT CAST(unnest(range($minPlanes, ${maxPlanes + 1})) AS INT) AS j) js, n$sfx
        WHERE (CAST($targetBucketCap AS BIGINT) << js.j) >= n$sfx.c),
      sigs$sfx AS MATERIALIZED (
        SELECT e.vec_id, p.band,
          SUM(CASE WHEN list_dot_product(e.v, p.p) > 0
                   THEN (CAST(1 AS BIGINT) << p.j) ELSE CAST(0 AS BIGINT) END) AS sig
        FROM emb$sfx e CROSS JOIN planes p
        WHERE p.j < (SELECT r FROM params$sfx)
        GROUP BY e.vec_id, p.band),
      sv$sfx AS MATERIALIZED (SELECT s.vec_id, s.band, s.sig, e.v
        FROM sigs$sfx s JOIN emb e ON e.vec_id = s.vec_id),
      candE$sfx AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst,
          (${sqlCosine("x.v", "y.v")}) AS w
        FROM sv$sfx x JOIN sv$sfx y
          ON x.band = y.band AND x.sig = y.sig AND x.vec_id <> y.vec_id),
      topm$sfx AS (SELECT src, dst FROM (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM candE$sfx) WHERE rn <= __M__),
      edges$sfx AS MATERIALIZED (SELECT src, dst FROM topm$sfx
        UNION SELECT dst AS src, src AS dst FROM topm$sfx)"""

  /** DuckDB replay of [[hnswBuildLayers]] + [[hnswSearch]] — the integer
    * hash-geometric levels, every layer's banded build at its own ladder
    * scale, and the unrolled greedy descent (upper-layer narrow beams,
    * base-layer full beam), all id-tiebroken and cosine-exact so both
    * engines are bitwise identical. */
  def sqlHnswTopK(k: Int, m: Int, beam: Int, hops: Int, upperBeam: Int,
      upperHops: Int, numBands: Int, dim: Int, queryPred: String,
      targetBucketCap: Long = NswPlaneCap,
      minPlanes: Int = NswMinPlanes, maxPlanes: Int = NswMaxPlanes): String = {
    val sCos = sqlCosine("q.qv", "e.v")
    val base = HnswLevelBase
    val lvlCaseArms = (HnswStaticMaxLevel to 1 by -1).map(l =>
      s"WHEN h % ${Seq.fill(l)(base).product} = 0 THEN $l").mkString(" ")
    // one beam-expansion CTE block; `edges` names the layer's edge CTE
    def hopBlock(tag: String, h: Int, prev: String, edges: String,
        width: Int): String =
      s"""cand$tag$h AS (SELECT DISTINCT b.query_id, ed.dst AS node
        FROM beam$prev b JOIN $edges ed ON ed.src = b.node),
      sc$tag$h AS (SELECT c.query_id, c.node, $sCos AS c
        FROM cand$tag$h c JOIN emb e ON e.vec_id = c.node
        JOIN qs q ON q.query_id = c.query_id),
      seen$tag$h AS MATERIALIZED (SELECT DISTINCT query_id, node, c FROM (
        SELECT * FROM seen$prev UNION ALL SELECT * FROM sc$tag$h)),
      beam$tag$h AS MATERIALIZED (SELECT query_id, node, c FROM (
          SELECT query_id, node, c,
            row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rn
          FROM seen$tag$h) WHERE rn <= $width)"""
    // descent: layer 2 then layer 1 with the narrow beam, then layer 0
    var prev = "0"
    val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
    for (l <- HnswStaticMaxLevel to 1 by -1; h <- 1 to upperHops) {
      blocks += hopBlock(s"L${l}x", h, prev, s"edgesL$l", upperBeam)
      prev = s"L${l}x$h"
    }
    for (h <- 1 to hops) {
      blocks += hopBlock("B", h, prev, "edgesL0", beam)
      prev = s"B$h"
    }
    val layerCtes = (0 to HnswStaticMaxLevel).map(l =>
      sqlLayerSigCtes(s"L$l", l, dim, targetBucketCap, minPlanes, maxPlanes)
        .replace("__M__", m.toString)).mkString(",\n      ")
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      planes AS MATERIALIZED (
        SELECT band, j, list(s ORDER BY d) AS p FROM (
          SELECT b.band, j.j, d.d,
            CASE WHEN ((('0x' || substr(md5(b.band || ':' || j.j || '-' || d.d), 1, 2))::INT & 1) = 1)
                 THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT unnest(range($numBands)) AS band) b,
               (SELECT unnest(range($maxPlanes)) AS j) j,
               (SELECT unnest(range($dim)) AS d) d) t
        GROUP BY band, j),
      nlvl AS (SELECT count(*) AS c FROM emb),
      -- live layer count: largest l with n >= floor * base^l (base = 4,
      -- so base^l = 1 << 2l) -- integer comparisons, no FP boundary
      lmax AS (SELECT COALESCE(MAX(js.j), 0) AS lm
        FROM (SELECT CAST(unnest(range(0, ${HnswStaticMaxLevel + 1})) AS INT) AS j) js, nlvl
        WHERE nlvl.c >= (CAST($HnswLayerFloor AS BIGINT) << (2 * js.j))),
      lvl AS MATERIALIZED (SELECT vec_id,
          LEAST(CASE $lvlCaseArms ELSE 0 END,
            (SELECT lm FROM lmax)) AS l
        FROM (SELECT vec_id,
            ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM emb)),
      $layerCtes,
      en AS (SELECT COALESCE(
          (SELECT MIN(e.vec_id) FROM emb e
            JOIN lvl ON lvl.vec_id = e.vec_id
              AND lvl.l >= (SELECT lm FROM lmax)),
          (SELECT MIN(vec_id) FROM emb)) AS v),
      qs AS (SELECT vec_id AS query_id, v AS qv FROM emb e WHERE $queryPred),
      seen0 AS (SELECT q.query_id, en.v AS node, $sCos AS c
        FROM qs q CROSS JOIN en JOIN emb e ON e.vec_id = en.v),
      beam0 AS (SELECT query_id, node, c FROM seen0),
      ${blocks.mkString(",\n      ")},
      fin AS (SELECT query_id, node AS neighbor_id, c,
          row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rank
        FROM seen$prev WHERE node <> query_id)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        CAST(floor(c * 1000000) AS BIGINT) AS cos_sim_e6
      FROM fin WHERE rank <= $k"""
  }

  /** DuckDB replay of [[nswTopK]] — the banded-bucket candidate pairs,
    * per-node top-m edge selection, symmetrization, and every beam hop,
    * as one CTE chain (hops unrolled; all orderings id-tiebroken). */
  def sqlNswTopK(k: Int, m: Int, beam: Int, hops: Int, numBands: Int,
      dim: Int, queryPred: String,
      targetBucketCap: Long = NswPlaneCap,
      minPlanes: Int = NswMinPlanes, maxPlanes: Int = NswMaxPlanes,
      // metadata filter on the RESULT set only (q321 hybrid search):
      // routing still traverses the full graph — the ACORN /
      // FreshDiskANN-tombstone discipline — so the filter applies at
      // the final scored set, a predicate over the raw embeddings table
      resultPred: String = ""): String = {
    val resultClause =
      if (resultPred.isEmpty) ""
      else s" AND node IN (SELECT vec_id FROM embeddings WHERE $resultPred)"
    val wCos = sqlCosine("x.v", "y.v")
    val sCos = sqlCosine("q.qv", "e.v")
    val hopCtes = (1 to hops).map { h =>
      s"""cand$h AS (SELECT DISTINCT b.query_id, ed.dst AS node
        FROM beam${h - 1} b JOIN edges ed ON ed.src = b.node),
      sc$h AS (SELECT c.query_id, c.node, $sCos AS c
        FROM cand$h c JOIN emb e ON e.vec_id = c.node
        JOIN qs q ON q.query_id = c.query_id),
      seen$h AS MATERIALIZED (SELECT DISTINCT query_id, node, c FROM (
        SELECT * FROM seen${h - 1} UNION ALL SELECT * FROM sc$h)),
      beam$h AS MATERIALIZED (SELECT query_id, node, c FROM (
          SELECT query_id, node, c,
            row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rn
          FROM seen$h) WHERE rn <= $beam)"""
    }.mkString(",\n      ")
    s"""WITH ${sqlBandSigCtes(numBands, dim, targetBucketCap, minPlanes, maxPlanes)},
      candE AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst, ($wCos) AS w
        FROM sv x JOIN sv y
          ON x.band = y.band AND x.sig = y.sig AND x.vec_id <> y.vec_id),
      topm AS (SELECT src, dst FROM (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM candE) WHERE rn <= $m),
      edges AS (SELECT src, dst FROM topm
        UNION SELECT dst AS src, src AS dst FROM topm),
      en AS (SELECT MIN(vec_id) AS v FROM emb),
      qs AS (SELECT vec_id AS query_id, v AS qv FROM emb e WHERE $queryPred),
      seen0 AS (SELECT q.query_id, en.v AS node, $sCos AS c
        FROM qs q CROSS JOIN en JOIN emb e ON e.vec_id = en.v),
      beam0 AS (SELECT query_id, node, c FROM seen0),
      $hopCtes,
      fin AS (SELECT query_id, node AS neighbor_id, c,
          row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rank
        FROM seen$hops WHERE node <> query_id$resultClause)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        CAST(floor(c * 1000000) AS BIGINT) AS cos_sim_e6
      FROM fin WHERE rank <= $k"""
  }

  def sqlKmeansIvfTopK(nCells: Int, iters: Int, nProbe: Int, k: Int,
      dim: Int, queryPred: String, corpusSrc: String = "emb",
      extraCtes: String = ""): String = {
    def score(v: String, c: String) =
      s"${sqlDot(v, c)} / (sqrt(${sqlDot(v, v)}) * sqrt(${sqlDot(c, c)}))"
    def assign(src: String, cents: String, extra: String = "") =
      sqlAssign(src, cents, extra)
    val (kmeansBlock, fin) = sqlKmeansCtes(nCells, iters)
    val extra = if (extraCtes.isEmpty) "" else s"\n      $extraCtes,"
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      pos AS (SELECT CAST(unnest(range($dim)) AS BIGINT) AS p),$extra
      $kmeansBlock,
      cc AS (SELECT vec_id, v, cell FROM (${assign(corpusSrc, fin)}) WHERE rnk = 1),
      qc AS (SELECT vec_id AS query_id, v AS qv, cell
        FROM (${assign("emb", fin, s" WHERE $queryPred")}) WHERE rnk <= $nProbe),
      scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
          ${score("q.qv", "c.v")} AS cos_sim
        FROM qc q JOIN cc c ON c.cell = q.cell AND c.vec_id <> q.query_id),
      ranked AS (SELECT query_id, neighbor_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        CAST(floor(cos_sim * 1000000) AS BIGINT) AS cos_sim_e6
      FROM ranked WHERE rank <= $k"""
  }

  // -------------------------------- incremental graph-ANN index (q276)

  /** Table properties pinning a persisted NSW index's fitted state —
    * the plane ladder is frozen at build time (like FAISS's nlist): a
    * later `add()` MUST hash with the initial r or its signatures live
    * in a different bucket space and never meet the corpus's. */
  val AnnPlanesKey = "graft.ann.planes"
  val AnnBandsKey = "graft.ann.bands"
  val AnnMKey = "graft.ann.m"
  val AnnDimKey = "graft.ann.dim"

  /** Live HNSW layer count, pinned at build time like the plane ladder
    * (growing layers later is a full-rebuild decision — FAISS's nlist
    * discipline): add/search/delete/optimize all read it, so a corpus
    * that has grown past the next 4^l threshold keeps a consistent
    * hierarchy until an explicit rebuild. */
  val AnnLevelsKey = "graft.ann.levels"

  /** Per-src top-m edge selection + symmetrization over a candidate
    * (src, dst, w) relation — the wiring step shared by the one-shot
    * build and the incremental add. */
  private def wireTopM(cand: DataFrame, m: Int): DataFrame = {
    val topM = cand.groupBy(col("src"))
      .agg(graft.functions.TopKPairs.column(col("w"), col("dst"), m)
        .as("_top"))
      .select(col("src"), explode(col("_top.id")).as("dst"))
    topM.unionByName(
        topM.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** The banded index-signature relation for an n-row corpus at the
    * index family's scaled ladder — what [[nswIndexBuild]] computes
    * internally, exposed so a caller building SEVERAL indexes over the
    * SAME corpus (q317's idx/twin pair) hashes it once and passes the
    * shared relation through `knownSigs`. */
  def indexSignatures(corpus: DataFrame, idCol: String, vecCol: String,
      numBands: Int, dim: Int, n: Long): DataFrame =
    bandedSignatures(corpus, idCol, vecCol, numBands,
      scaledPlaneCount(n, NswPlaneCap, NswMinPlanes, NswMaxPlanes), dim)

  /** PERSISTED incremental NSW index (VERDICT r14 task 5 — the q185
    * FAISS-`add()` discipline extended to the GRAPH family): the index
    * is two snapshot tables under `indexDir` —
    *
    *  - `sigs` (id, band, sig, vector): the banded-LSH bucket relation,
    *    the structure an insert probes to find its neighbors (hnswlib's
    *    beam-search insert, re-expressed as the bucket join the
    *    distributed build already uses). The plane ladder is scaled to
    *    the INITIAL corpus and pinned as table properties — add()
    *    batches hash with the same planes, so buckets stay compatible
    *    forever (re-scaling is a full-rebuild decision, like FAISS
    *    nlist).
    *  - `edges` (src, dst): the symmetrized neighbor graph the beam
    *    search walks.
    *
    * Both are ordinary snapshot tables: every add() is ONE O(batch)
    * append to each — the initial corpus's sig/edge FILES carry by
    * reference and are never rewritten or re-encoded. */
  def nswIndexBuild(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, numBands: Int = 4, dim: Int = 64,
      // r18 optimization: a caller that already knows |corpus| (the
      // HNSW build counts every layer in ONE pass) skips this level's
      // count job; the derived plane count is IDENTICAL either way
      knownCount: Long = -1L,
      // r19: precomputed (id, _v, _band, _sig) signatures over ≥ r
      // planes of the SAME banded plane family — plane j is independent
      // of the ladder length ([[bandedHyperplanes]]), so truncating to
      // this build's r bits is EXACTLY the r-plane signature. Lets the
      // HNSW build hash the corpus once instead of once per layer.
      knownSigs: DataFrame = null): Unit = {
    import graft.lake.Snapshots
    val n = if (knownCount >= 0L) knownCount else corpus.count()
    val r = scaledPlaneCount(n, NswPlaneCap,
      NswMinPlanes, NswMaxPlanes)
    // LAZY on purpose (r19, measured): a persisted sig breaks AQE's
    // exchange reuse across the self-join's aliased cache scans — BOTH
    // sides ran as full map stages per build/layer. Un-cached, the
    // join's identical exchanges collapse to ONE map + a
    // ReusedExchange, so the wiring action hashes the corpus once and
    // only the sigs append pays a second (narrow, fully parallel)
    // hashing pass.
    val sig = (if (knownSigs != null)
      knownSigs.select(col("id"), col("_v"), col("_band"),
        col("_sig").bitwiseAND(lit((1L << r) - 1)).as("_sig"))
    else bandedSignatures(corpus, idCol, vecCol, numBands, r, dim))
    val cand = sig.as("x").join(sig.as("y"),
        col("x._band") === col("y._band") && col("x._sig") === col("y._sig") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("src"), col("y.id").as("dst"),
        cosine(col("x._v"), col("y._v")).as("w"))
      .distinct()
    // write-side file sizing (guide §6): Par.ensure keeps the HASHING
    // wide, but letting that width reach the writer emits one near-empty
    // file per core for KB-scale layers — files every later read,
    // footer count and manifest carry forever. Row-derived width
    // (~1M signature rows ≈ 300 MB per file) is scale-adaptive: a
    // 100 TB corpus still fans out, an upper HNSW layer writes ONE file.
    val sigParts = math.min(n * numBands / 1000000L + 1L,
      Int.MaxValue.toLong).toInt
    Snapshots.append(spark, s"$indexDir/sigs",
      sig.select(col("id"), col("_band"), col("_sig"), col("_v"))
        .coalesce(sigParts))
    Snapshots.setTableProperties(spark, s"$indexDir/sigs", Map(
      AnnPlanesKey -> r.toString, AnnBandsKey -> numBands.toString,
      AnnMKey -> m.toString, AnnDimKey -> dim.toString))
    Snapshots.append(spark, s"$indexDir/edges", wireTopM(cand, m))
    ()
  }

  /** Incremental `add()` on a [[nswIndexBuild]] index: the batch hashes
    * with the PINNED plane ladder, its signatures append to `sigs`
    * (one commit), and its wiring is ONE candidate join — the
    * BROADCAST batch signatures against the persisted bucket relation
    * (the index side never exchanges; at cluster scale the sig table
    * is bucketed on the band key and the join prunes to touched
    * buckets, the q172 discipline) — followed by per-NEW-node top-m
    * and symmetrization, appended to `edges` (one commit). Existing
    * nodes gain the reverse edges (degree may exceed m until a rebuild
    * re-prunes — hnswlib's insert behaves the same way); existing
    * edges and vectors are never touched: O(batch·candidates) compute,
    * O(batch) new bytes, O(delta) log metadata. */
  def nswIndexAdd(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame, idCol: String,
      vecCol: String,
      // r19: same precomputed-signature contract as [[nswIndexBuild]] —
      // ≥ r planes of the same family, truncated here to the PINNED r
      knownSigs: DataFrame = null): Unit = {
    import graft.lake.Snapshots
    val props = Snapshots.tableProperties(spark, s"$indexDir/sigs")
    val r = props(AnnPlanesKey).toInt
    val numBands = props(AnnBandsKey).toInt
    val m = props(AnnMKey).toInt
    val dim = props(AnnDimKey).toInt
    val bSig = (if (knownSigs != null)
      knownSigs.select(col("id"), col("_v"), col("_band"),
        col("_sig").bitwiseAND(lit((1L << r) - 1)).as("_sig"))
    else bandedSignatures(batch, idCol, vecCol, numBands, r, dim))
      .persist()
    // sigs append FIRST so batch-internal pairs candidate too
    Snapshots.append(spark, s"$indexDir/sigs",
      bSig.select(col("id"), col("_band"), col("_sig"), col("_v")))
    val index = Snapshots.readLatest(spark, s"$indexDir/sigs").get
    val cand = index.as("y").join(
        broadcast(bSig.select(col("id"), col("_band"), col("_sig"),
          col("_v")).as("x")),
        col("x._band") === col("y._band") && col("x._sig") === col("y._sig") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("src"), col("y.id").as("dst"),
        cosine(col("x._v"), col("y._v")).as("w"))
      .distinct()
    Snapshots.append(spark, s"$indexDir/edges", wireTopM(cand, m))
    bSig.unpersist()
    ()
  }

  /** Beam search over a persisted index ([[nswSearch]] on the `edges`
    * table's live view), honoring any live tombstones: deleted ids can
    * never surface in results, with zero caller coordination. */
  def nswIndexSearch(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, beam: Int = 16,
      hops: Int = 4): DataFrame =
    nswSearch(graft.lake.Snapshots.readLatest(spark, s"$indexDir/edges").get,
      corpus, queries, idCol, vecCol, k, beam, hops,
      exclude = indexTombstones(spark, indexDir))

  /** Live tombstone set of a persisted graph index: None until a
    * delete commits, None again after [[nswIndexOptimize]] truncates
    * (the truncated table reads as typed-empty). Emptiness is decided
    * from LOG METADATA ([[graft.lake.Snapshots.rowCountAt]]) — a
    * per-search `isEmpty` Spark action would tax every search on an
    * index with no live deletes forever after the first truncate; the
    * data-side fallback fires only when the log cannot count (MoR
    * deletes, which delete/optimize never leave on this table). */
  private def indexTombstones(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[DataFrame] = {
    val t = s"$indexDir/tombstones"
    graft.lake.Snapshots.latestVersion(spark, t)
      .filter { v =>
        graft.lake.Snapshots.rowCountAt(spark, t, v).map(_ > 0L)
          .getOrElse(!graft.lake.Snapshots.readLatest(spark, t).get.isEmpty)
      }
      .map(_ => graft.lake.Snapshots.readLatest(spark, t).get)
  }

  /** DELETE from a persisted NSW index — the lifecycle leg q218 proved
    * for IVF-PQ code tables, now for the graph family: ids matching
    * `pred` (spoken over the sigs columns, i.e. `id`) append to a
    * `tombstones` table (one O(batch) commit) and MoR-delete from
    * `sigs`, so no future add() wires to them and no future repair
    * scores them. `edges` is NOT touched: deleted nodes keep serving
    * as ROUTING hops (eagerly unlinking them would orphan their
    * neighborhoods — the FreshDiskANN tombstone discipline) while
    * every search excludes them from RESULTS via the tombstone
    * anti-join; [[nswIndexOptimize]] later repairs the graph and
    * clears the tombstones. */
  def nswIndexDelete(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, pred: org.apache.spark.sql.Column): Unit = {
    import graft.lake.Snapshots
    val ids = Snapshots.readLatest(spark, s"$indexDir/sigs").get
      .filter(pred).select(col("id").as("vec_id")).distinct()
    Snapshots.append(spark, s"$indexDir/tombstones", ids)
    Snapshots.deleteWhere(spark, s"$indexDir/sigs", pred)
    ()
  }

  /** Re-wire one graph table around a tombstone set: every surviving
    * src that lost a neighbor d inherits d's own surviving neighbors
    * as candidates (the bridge src→d→dst — the deleted node's
    * neighborhood keeps its connectivity), scored by exact cosine,
    * per-src top-m, symmetrized, unioned with the untouched live
    * edges — ONE overwrite commit. Cost is O(deleted·degree²), never a
    * rebuild; vectors come from the (already MoR-deleted) sigs table,
    * so a tombstoned id can neither score nor be a repair endpoint. */
  private def repairGraphEdges(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, tomb: DataFrame): Unit = {
    import graft.lake.Snapshots
    def dead = broadcast(tomb.select(col("vec_id")))
    val edges = Snapshots.readLatest(spark, s"$tableDir/edges").get
    val m = Snapshots.tableProperties(spark, s"$tableDir/sigs")(AnnMKey).toInt
    val vecs = Snapshots.readLatest(spark, s"$tableDir/sigs").get
      .groupBy(col("id")).agg(first(col("_v")).as("_v"))
    // survivors that lost a neighbor, with the dead neighbor d
    val lost = edges.join(dead, edges("dst") === col("vec_id"))
      .select(col("src"), col("dst").as("d"))
      .join(dead, col("src") === col("vec_id"), "left_anti")
    // bridge: d's surviving neighbors become src's candidates
    val e2 = edges.select(col("src").as("d"), col("dst").as("nd"))
    val bridge = lost.join(e2, Seq("d"))
      .select(col("src"), col("nd"))
      .filter(col("src") =!= col("nd"))
      .join(dead, col("nd") === col("vec_id"), "left_anti")
      .distinct()
    val cand = bridge
      .join(vecs.select(col("id").as("src"), col("_v").as("_sv")),
        Seq("src"))
      .join(vecs.select(col("id").as("nd"), col("_v").as("_dv")),
        Seq("nd"))
      .select(col("src"), col("nd").as("dst"),
        cosine(col("_sv"), col("_dv")).as("w"))
      .distinct()
    val kept = edges
      .join(dead, edges("src") === col("vec_id"), "left_anti")
      .join(dead, edges("dst") === col("vec_id"), "left_anti")
    Snapshots.overwrite(spark, s"$tableDir/edges",
      kept.unionByName(wireTopM(cand, m)).distinct())
    ()
  }

  /** OPTIMIZE a tombstoned NSW index: [[repairGraphEdges]] re-wires
    * orphaned neighborhoods and drops deleted nodes from the graph,
    * then the tombstone table TRUNCATES (schema intact) so searches
    * stop filtering. A tombstone-free index is a no-op. */
  def nswIndexOptimize(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit =
    indexTombstones(spark, indexDir).foreach { tomb =>
      repairGraphEdges(spark, indexDir, tomb)
      graft.lake.Snapshots.truncate(spark, s"$indexDir/tombstones")
    }

  /** [[nswIndexBuild]] stacked into the HNSW hierarchy: one persisted
    * (sigs, edges) table pair PER LAYER, each layer built over the
    * nodes with [[hnswLevel]] ≥ l and its plane ladder pinned to that
    * layer's initial population. Layer membership is the deterministic
    * hash rule, so an added node's layers need no coordination — the
    * same id always lands the same levels in both engines. */
  def hnswIndexBuild(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, numBands: Int = 4, dim: Int = 64): Unit = {
    // ONE pass counts every layer's population (r18 — guide §1.2,
    // fewer passes): the previous shape scanned the corpus once for
    // the level decision and once more per layer for that layer's
    // plane scaling; the counts (hence every derived plane ladder) are
    // bit-identical.
    import org.apache.spark.sql.functions.{count => fcount, sum => fsum}
    val lvl = hnswLevel(col(idCol))
    val aggs = fcount(lit(1)).as("n0") +: (1 to HnswStaticMaxLevel).map(l =>
      fsum(when(lvl >= l, 1L).otherwise(0L)).as(s"n$l"))
    val row = corpus.agg(aggs.head, aggs.tail: _*).head()
    val nAt = (0 to HnswStaticMaxLevel).map(l =>
      if (row.isNullAt(l)) 0L else row.getLong(l))
    val levels = hnswMaxLevelFor(nAt(0))
    // ONE hashing pass for EVERY layer (r19 — guide §1.2): plane j is
    // independent of the ladder length, and layer populations only
    // shrink upward, so layer 0's ladder is the longest — each upper
    // layer's signatures are the base pass level-filtered and truncated
    // to its own pinned r (bit-identical to hashing that layer alone).
    // The previous shape re-scanned and re-hashed the corpus per layer.
    val rBase = scaledPlaneCount(nAt(0), NswPlaneCap,
      NswMinPlanes, NswMaxPlanes)
    val baseSig = bandedSignatures(corpus, idCol, vecCol, numBands,
      rBase, dim).persist()
    (0 to levels).foreach { l =>
      val sigs =
        if (l == 0) baseSig
        else baseSig.filter(hnswLevel(col("id")) >= l)
      nswIndexBuild(spark, s"$indexDir/l$l", corpus, idCol, vecCol,
        m, numBands, dim, knownCount = nAt(l), knownSigs = sigs)
    }
    baseSig.unpersist()
    graft.lake.Snapshots.setTableProperties(spark, s"$indexDir/l0/sigs",
      Map(AnnLevelsKey -> levels.toString))
    ()
  }

  /** The layer count a persisted hierarchical index was built with. */
  def hnswIndexLevels(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Int =
    graft.lake.Snapshots.tableProperties(spark, s"$indexDir/l0/sigs")(
      AnnLevelsKey).toInt

  /** Incremental HNSW `add()`: per layer, the batch's level-≥l slice
    * wires against THAT layer's persisted buckets exactly like
    * [[nswIndexAdd]] — upper layers see exponentially fewer batch
    * nodes, so the added work stays O(batch·candidates) across the
    * whole hierarchy. Every layer's initial files carry by
    * reference. */
  def hnswIndexAdd(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame, idCol: String,
      vecCol: String): Unit = {
    // one hashing pass for every layer's slice — the add-side twin of
    // the build's shared base signatures (r19): layer 0's pinned ladder
    // is the longest by the build invariant (populations shrink
    // upward), so each layer truncates the base bits to its own r
    val props0 = graft.lake.Snapshots.tableProperties(
      spark, s"$indexDir/l0/sigs")
    val baseSig = bandedSignatures(batch, idCol, vecCol,
      props0(AnnBandsKey).toInt, props0(AnnPlanesKey).toInt,
      props0(AnnDimKey).toInt).persist()
    (0 to hnswIndexLevels(spark, indexDir)).foreach { l =>
      val sigs =
        if (l == 0) baseSig
        else baseSig.filter(hnswLevel(col("id")) >= l)
      nswIndexAdd(spark, s"$indexDir/l$l", batch, idCol, vecCol,
        knownSigs = sigs)
    }
    baseSig.unpersist()
    ()
  }

  /** Greedy descent over a persisted hierarchical index
    * ([[hnswSearch]] on each layer's live edge view), honoring any
    * live tombstones exactly like [[nswIndexSearch]]. */
  def hnswIndexSearch(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, beam: Int = 16,
      hops: Int = 4, upperBeam: Int = 4, upperHops: Int = 2): DataFrame =
    hnswSearch((0 to hnswIndexLevels(spark, indexDir)).map(l =>
      graft.lake.Snapshots.readLatest(spark, s"$indexDir/l$l/edges").get),
      corpus, queries, idCol, vecCol, k, beam, hops, upperBeam, upperHops,
      exclude = indexTombstones(spark, indexDir))

  /** [[nswIndexDelete]] stacked into the hierarchy: ONE shared
    * tombstone table at the index root (results are global — a node
    * deleted anywhere must vanish from every search), plus a
    * MoR-delete on EVERY layer's sigs (upper layers simply match
    * nothing if the node never reached them). */
  def hnswIndexDelete(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, pred: org.apache.spark.sql.Column): Unit = {
    import graft.lake.Snapshots
    val ids = Snapshots.readLatest(spark, s"$indexDir/l0/sigs").get
      .filter(pred).select(col("id").as("vec_id")).distinct()
    Snapshots.append(spark, s"$indexDir/tombstones", ids)
    (0 to hnswIndexLevels(spark, indexDir)).foreach(l =>
      Snapshots.deleteWhere(spark, s"$indexDir/l$l/sigs", pred))
    ()
  }

  /** [[nswIndexOptimize]] stacked into the hierarchy: every layer's
    * graph repairs around the SHARED tombstone set (each with its own
    * pinned m), then the tombstones truncate once. */
  def hnswIndexOptimize(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit =
    indexTombstones(spark, indexDir).foreach { tomb =>
      (0 to hnswIndexLevels(spark, indexDir)).foreach(l =>
        repairGraphEdges(spark, s"$indexDir/l$l", tomb))
      graft.lake.Snapshots.truncate(spark, s"$indexDir/tombstones")
    }

  /** Declared-repair threshold for [[maintainIndex]]: live tombstones
    * at or past this count trigger the graph repair, the way a data
    * table's `graft.maintain.optimizeTargetBytes` triggers compaction.
    * Declared on the index's `sigs` table (`l0/sigs` for HNSW) — the
    * same place the plane/band parameters already live. */
  val MaintainRepairKey = "graft.maintain.annRepairAtTombstones"

  /** POLICY-DRIVEN INDEX MAINTENANCE (the q255 discipline for the ANN
    * family): an index table DECLARES its repair cadence and `MAINTAIN`
    * applies it — repair runs iff the live tombstone count (decided
    * from LOG METADATA, [[indexTombstones]]'s discipline) has reached
    * the declared threshold, producing exactly the state a manual
    * [[nswIndexOptimize]]/[[hnswIndexOptimize]] would. Member tables
    * then get their own [[graft.lake.Snapshots.maintainTable]] pass
    * AFTER the repair (compaction/vacuum cover the repaired layout).
    * Returns the (action, detail) report; a non-index path or an
    * undeclared policy is an empty run, so `MAINTAIN` stays blindly
    * cron-able over every table. */
  def maintainIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Seq[(String, String)] = {
    import graft.lake.Snapshots
    val nsw = Snapshots.latestVersion(spark, s"$indexDir/sigs").isDefined
    val hnsw = !nsw &&
      Snapshots.latestVersion(spark, s"$indexDir/l0/sigs").isDefined
    if (!nsw && !hnsw) return Nil
    val sigs = if (nsw) s"$indexDir/sigs" else s"$indexDir/l0/sigs"
    val report = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    Snapshots.tableProperties(spark, sigs).get(MaintainRepairKey)
      .flatMap(_.toLongOption).foreach { at =>
      val t = s"$indexDir/tombstones"
      val live = Snapshots.latestVersion(spark, t).map { v =>
        Snapshots.rowCountAt(spark, t, v).getOrElse(
          Snapshots.readLatest(spark, t).get.count())
      }.getOrElse(0L)
      if (live > 0 && live >= at) {
        if (nsw) nswIndexOptimize(spark, indexDir)
        else hnswIndexOptimize(spark, indexDir)
        report += ("ann-repair" -> s"tombstones=$live")
      }
    }
    val members =
      if (nsw) Seq("sigs", "edges", "tombstones")
      else (0 to hnswIndexLevels(spark, indexDir))
        .flatMap(l => Seq(s"l$l/sigs", s"l$l/edges")) :+ "tombstones"
    members.filter(m =>
        Snapshots.latestVersion(spark, s"$indexDir/$m").isDefined)
      .foreach { m =>
        Snapshots.maintainTable(spark, s"$indexDir/$m").foreach {
          case (a, d) => report += (s"$m:$a" -> d)
        }
      }
    report.toSeq
  }

  /** The incremental twin of [[sqlLayerSigCtes]]: layer edges = the
    * initial sub-population's self-join wiring UNION the batch slice's
    * wiring against the whole layer — the ladder pinned to the INITIAL
    * layer population, mirroring the persisted properties. */
  private def sqlLayerSigCtesIncremental(sfx: String, lvlMin: Int,
      dim: Int, initialPred: String, batchPred: String,
      targetBucketCap: Long, minPlanes: Int, maxPlanes: Int): String =
    s"""emb$sfx AS MATERIALIZED (SELECT e.vec_id, e.v FROM emb e
        JOIN lvl ON lvl.vec_id = e.vec_id AND lvl.l >= $lvlMin),
      n$sfx AS (SELECT count(*) AS c FROM emb$sfx WHERE $initialPred),
      params$sfx AS (SELECT COALESCE(MIN(js.j), $maxPlanes) AS r
        FROM (SELECT CAST(unnest(range($minPlanes, ${maxPlanes + 1})) AS INT) AS j) js, n$sfx
        WHERE (CAST($targetBucketCap AS BIGINT) << js.j) >= n$sfx.c),
      sigs$sfx AS MATERIALIZED (
        SELECT e.vec_id, p.band,
          SUM(CASE WHEN list_dot_product(e.v, p.p) > 0
                   THEN (CAST(1 AS BIGINT) << p.j) ELSE CAST(0 AS BIGINT) END) AS sig
        FROM emb$sfx e CROSS JOIN planes p
        WHERE p.j < (SELECT r FROM params$sfx)
        GROUP BY e.vec_id, p.band),
      sv$sfx AS MATERIALIZED (SELECT s.vec_id, s.band, s.sig, e.v
        FROM sigs$sfx s JOIN emb e ON e.vec_id = s.vec_id),
      sv0$sfx AS MATERIALIZED (SELECT * FROM sv$sfx WHERE $initialPred),
      svb$sfx AS MATERIALIZED (SELECT * FROM sv$sfx WHERE $batchPred),
      cand0$sfx AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst,
          (${sqlCosine("x.v", "y.v")}) AS w
        FROM sv0$sfx x JOIN sv0$sfx y
          ON x.band = y.band AND x.sig = y.sig AND x.vec_id <> y.vec_id),
      topm0$sfx AS (SELECT src, dst FROM (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM cand0$sfx) WHERE rn <= __M__),
      candb$sfx AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst,
          (${sqlCosine("x.v", "y.v")}) AS w
        FROM svb$sfx x JOIN sv$sfx y
          ON x.band = y.band AND x.sig = y.sig AND x.vec_id <> y.vec_id),
      topmb$sfx AS (SELECT src, dst FROM (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM candb$sfx) WHERE rn <= __M__),
      edges$sfx AS MATERIALIZED (SELECT src, dst FROM topm0$sfx
        UNION SELECT dst AS src, src AS dst FROM topm0$sfx
        UNION SELECT src, dst FROM topmb$sfx
        UNION SELECT dst AS src, src AS dst FROM topmb$sfx)"""

  /** DuckDB replay of [[hnswIndexBuild]] + [[hnswIndexAdd]] +
    * [[hnswIndexSearch]]: levels, every layer's pinned-ladder
    * incremental wiring, and the unrolled descent — bitwise. */
  def sqlHnswIncrementalTopK(k: Int, m: Int, beam: Int, hops: Int,
      upperBeam: Int, upperHops: Int, numBands: Int, dim: Int,
      queryPred: String, initialPred: String, batchPred: String,
      targetBucketCap: Long = NswPlaneCap,
      minPlanes: Int = NswMinPlanes, maxPlanes: Int = NswMaxPlanes): String = {
    val sCos = sqlCosine("q.qv", "e.v")
    val base = HnswLevelBase
    val lvlCaseArms = (HnswStaticMaxLevel to 1 by -1).map(l =>
      s"WHEN h % ${Seq.fill(l)(base).product} = 0 THEN $l").mkString(" ")
    def hopBlock(tag: String, h: Int, prev: String, edges: String,
        width: Int): String =
      s"""cand$tag$h AS (SELECT DISTINCT b.query_id, ed.dst AS node
        FROM beam$prev b JOIN $edges ed ON ed.src = b.node),
      sc$tag$h AS (SELECT c.query_id, c.node, $sCos AS c
        FROM cand$tag$h c JOIN emb e ON e.vec_id = c.node
        JOIN qs q ON q.query_id = c.query_id),
      seen$tag$h AS MATERIALIZED (SELECT DISTINCT query_id, node, c FROM (
        SELECT * FROM seen$prev UNION ALL SELECT * FROM sc$tag$h)),
      beam$tag$h AS MATERIALIZED (SELECT query_id, node, c FROM (
          SELECT query_id, node, c,
            row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rn
          FROM seen$tag$h) WHERE rn <= $width)"""
    var prev = "0"
    val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
    for (l <- HnswStaticMaxLevel to 1 by -1; h <- 1 to upperHops) {
      blocks += hopBlock(s"L${l}x", h, prev, s"edgesL$l", upperBeam)
      prev = s"L${l}x$h"
    }
    for (h <- 1 to hops) {
      blocks += hopBlock("B", h, prev, "edgesL0", beam)
      prev = s"B$h"
    }
    val layerCtes = (0 to HnswStaticMaxLevel).map(l =>
      sqlLayerSigCtesIncremental(s"L$l", l, dim, initialPred, batchPred,
        targetBucketCap, minPlanes, maxPlanes)
        .replace("__M__", m.toString)).mkString(",\n      ")
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      planes AS MATERIALIZED (
        SELECT band, j, list(s ORDER BY d) AS p FROM (
          SELECT b.band, j.j, d.d,
            CASE WHEN ((('0x' || substr(md5(b.band || ':' || j.j || '-' || d.d), 1, 2))::INT & 1) = 1)
                 THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT unnest(range($numBands)) AS band) b,
               (SELECT unnest(range($maxPlanes)) AS j) j,
               (SELECT unnest(range($dim)) AS d) d) t
        GROUP BY band, j),
      nlvl AS (SELECT count(*) AS c FROM emb WHERE $initialPred),
      -- live layer count: largest l with n >= floor * base^l (base = 4,
      -- so base^l = 1 << 2l) -- integer comparisons, no FP boundary
      lmax AS (SELECT COALESCE(MAX(js.j), 0) AS lm
        FROM (SELECT CAST(unnest(range(0, ${HnswStaticMaxLevel + 1})) AS INT) AS j) js, nlvl
        WHERE nlvl.c >= (CAST($HnswLayerFloor AS BIGINT) << (2 * js.j))),
      lvl AS MATERIALIZED (SELECT vec_id,
          LEAST(CASE $lvlCaseArms ELSE 0 END,
            (SELECT lm FROM lmax)) AS l
        FROM (SELECT vec_id,
            ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM emb)),
      $layerCtes,
      en AS (SELECT COALESCE(
          (SELECT MIN(e.vec_id) FROM emb e
            JOIN lvl ON lvl.vec_id = e.vec_id
              AND lvl.l >= (SELECT lm FROM lmax)),
          (SELECT MIN(vec_id) FROM emb)) AS v),
      qs AS (SELECT vec_id AS query_id, v AS qv FROM emb e WHERE $queryPred),
      seen0 AS (SELECT q.query_id, en.v AS node, $sCos AS c
        FROM qs q CROSS JOIN en JOIN emb e ON e.vec_id = en.v),
      beam0 AS (SELECT query_id, node, c FROM seen0),
      ${blocks.mkString(",\n      ")},
      fin AS (SELECT query_id, node AS neighbor_id, c,
          row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rank
        FROM seen$prev WHERE node <> query_id)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        CAST(floor(c * 1000000) AS BIGINT) AS cos_sim_e6
      FROM fin WHERE rank <= $k"""
  }

  /** DuckDB replay of build-then-add-then-search ([[nswIndexBuild]] +
    * [[nswIndexAdd]] + [[nswIndexSearch]]): the plane ladder scales to
    * the INITIAL subset's count (the pinned-property contract), initial
    * edges come from the initial-only self-join, batch wiring from the
    * batch-against-everything join with per-new-node top-m, and the
    * search walks the UNION graph — every ordering id-tiebroken, so
    * both engines are bitwise identical. `initialPred`/`batchPred`
    * speak over `vec_id`. */
  def sqlNswIncrementalTopK(k: Int, m: Int, beam: Int, hops: Int,
      numBands: Int, dim: Int, queryPred: String, initialPred: String,
      batchPred: String,
      targetBucketCap: Long = NswPlaneCap,
      minPlanes: Int = NswMinPlanes, maxPlanes: Int = NswMaxPlanes): String = {
    val wCos = sqlCosine("x.v", "y.v")
    val sCos = sqlCosine("q.qv", "e.v")
    val hopCtes = (1 to hops).map { h =>
      s"""cand$h AS (SELECT DISTINCT b.query_id, ed.dst AS node
        FROM beam${h - 1} b JOIN edges ed ON ed.src = b.node),
      sc$h AS (SELECT c.query_id, c.node, $sCos AS c
        FROM cand$h c JOIN emb e ON e.vec_id = c.node
        JOIN qs q ON q.query_id = c.query_id),
      seen$h AS MATERIALIZED (SELECT DISTINCT query_id, node, c FROM (
        SELECT * FROM seen${h - 1} UNION ALL SELECT * FROM sc$h)),
      beam$h AS MATERIALIZED (SELECT query_id, node, c FROM (
          SELECT query_id, node, c,
            row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rn
          FROM seen$h) WHERE rn <= $beam)"""
    }.mkString(",\n      ")
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      n AS (SELECT count(*) AS c FROM emb WHERE $initialPred),
      params AS (SELECT COALESCE(MIN(js.j), $maxPlanes) AS r
        FROM (SELECT CAST(unnest(range($minPlanes, ${maxPlanes + 1})) AS INT) AS j) js, n
        WHERE (CAST($targetBucketCap AS BIGINT) << js.j) >= n.c),
      planes AS MATERIALIZED (
        SELECT band, j, list(s ORDER BY d) AS p FROM (
          SELECT b.band, j.j, d.d,
            CASE WHEN ((('0x' || substr(md5(b.band || ':' || j.j || '-' || d.d), 1, 2))::INT & 1) = 1)
                 THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT unnest(range($numBands)) AS band) b,
               (SELECT unnest(range($maxPlanes)) AS j) j,
               (SELECT unnest(range($dim)) AS d) d) t
        GROUP BY band, j),
      sigs AS (
        SELECT e.vec_id, p.band,
          SUM(CASE WHEN list_dot_product(e.v, p.p) > 0
                   THEN (CAST(1 AS BIGINT) << p.j) ELSE CAST(0 AS BIGINT) END) AS sig
        FROM emb e CROSS JOIN planes p
        WHERE p.j < (SELECT r FROM params)
        GROUP BY e.vec_id, p.band),
      sv AS (SELECT s.vec_id, s.band, s.sig, e.v
        FROM sigs s JOIN emb e ON e.vec_id = s.vec_id),
      sv0 AS (SELECT * FROM sv WHERE $initialPred),
      svb AS (SELECT * FROM sv WHERE $batchPred),
      cand0 AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst, ($wCos) AS w
        FROM sv0 x JOIN sv0 y
          ON x.band = y.band AND x.sig = y.sig AND x.vec_id <> y.vec_id),
      topm0 AS (SELECT src, dst FROM (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM cand0) WHERE rn <= $m),
      candb AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst, ($wCos) AS w
        FROM svb x JOIN sv y
          ON x.band = y.band AND x.sig = y.sig AND x.vec_id <> y.vec_id),
      topmb AS (SELECT src, dst FROM (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM candb) WHERE rn <= $m),
      edges AS (SELECT src, dst FROM topm0
        UNION SELECT dst AS src, src AS dst FROM topm0
        UNION SELECT src, dst FROM topmb
        UNION SELECT dst AS src, src AS dst FROM topmb),
      en AS (SELECT MIN(vec_id) AS v FROM emb),
      qs AS (SELECT vec_id AS query_id, v AS qv FROM emb e WHERE $queryPred),
      seen0 AS (SELECT q.query_id, en.v AS node, $sCos AS c
        FROM qs q CROSS JOIN en JOIN emb e ON e.vec_id = en.v),
      beam0 AS (SELECT query_id, node, c FROM seen0),
      $hopCtes,
      fin AS (SELECT query_id, node AS neighbor_id, c,
          row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rank
        FROM seen$hops WHERE node <> query_id)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        CAST(floor(c * 1000000) AS BIGINT) AS cos_sim_e6
      FROM fin WHERE rank <= $k"""
  }

  /** DuckDB mirror of the q306 graph-ANN DELETE lifecycle: the one-shot
    * build ([[sqlNswTopK]]'s CTEs), a TOMBSTONED search over the
    * original edges — the deleted set excluded from final results only,
    * tombstoned nodes keep ROUTING — then the bridge repair (for every
    * surviving src that lost a neighbor d, d's surviving neighbors
    * become candidates; per-src top-m by exact cosine; symmetrized;
    * live edges kept verbatim) and a second full search over the
    * repaired graph with SURVIVOR corpus and entry point. Both phases
    * emit tagged rows, so one mis-excluded id or one mis-wired repair
    * edge anywhere fails the hash. */
  def sqlNswDeleteTopK(k: Int, m: Int, beam: Int, hops: Int,
      numBands: Int, dim: Int, queryPred: String, delPred: String,
      targetBucketCap: Long = NswPlaneCap,
      minPlanes: Int = NswMinPlanes, maxPlanes: Int = NswMaxPlanes): String = {
    val wCos = sqlCosine("x.v", "y.v")
    val sCos = sqlCosine("q.qv", "e.v")
    def hopChain(sfx: String, edgesRel: String, embRel: String): String =
      (1 to hops).map { h =>
        s"""cand$h$sfx AS (SELECT DISTINCT b.query_id, ed.dst AS node
        FROM beam${h - 1}$sfx b JOIN $edgesRel ed ON ed.src = b.node),
      sc$h$sfx AS (SELECT c.query_id, c.node, $sCos AS c
        FROM cand$h$sfx c JOIN $embRel e ON e.vec_id = c.node
        JOIN qs q ON q.query_id = c.query_id),
      seen$h$sfx AS MATERIALIZED (SELECT DISTINCT query_id, node, c FROM (
        SELECT * FROM seen${h - 1}$sfx UNION ALL SELECT * FROM sc$h$sfx)),
      beam$h$sfx AS MATERIALIZED (SELECT query_id, node, c FROM (
          SELECT query_id, node, c,
            row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rn
          FROM seen$h$sfx) WHERE rn <= $beam)"""
      }.mkString(",\n      ")
    s"""WITH ${sqlBandSigCtes(numBands, dim, targetBucketCap, minPlanes, maxPlanes)},
      candE AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst, ($wCos) AS w
        FROM sv x JOIN sv y
          ON x.band = y.band AND x.sig = y.sig AND x.vec_id <> y.vec_id),
      topm AS (SELECT src, dst FROM (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM candE) WHERE rn <= $m),
      edges AS MATERIALIZED (SELECT src, dst FROM topm
        UNION SELECT dst AS src, src AS dst FROM topm),
      del AS MATERIALIZED (SELECT vec_id FROM emb WHERE $delPred),
      qs AS (SELECT vec_id AS query_id, v AS qv FROM emb e WHERE $queryPred),
      en AS (SELECT MIN(vec_id) AS v FROM emb),
      seen0 AS (SELECT q.query_id, en.v AS node, $sCos AS c
        FROM qs q CROSS JOIN en JOIN emb e ON e.vec_id = en.v),
      beam0 AS (SELECT query_id, node, c FROM seen0),
      ${hopChain("", "edges", "emb")},
      finD AS (SELECT query_id, node AS neighbor_id, c,
          row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rank
        FROM seen$hops
        WHERE node <> query_id
          AND node NOT IN (SELECT vec_id FROM del)),
      liveE AS (SELECT src, dst FROM edges
        WHERE src NOT IN (SELECT vec_id FROM del)
          AND dst NOT IN (SELECT vec_id FROM del)),
      lost AS (SELECT DISTINCT e.src, e.dst AS d FROM edges e
        WHERE e.dst IN (SELECT vec_id FROM del)
          AND e.src NOT IN (SELECT vec_id FROM del)),
      bridge AS (SELECT DISTINCT l.src, e2.dst AS nd
        FROM lost l JOIN edges e2 ON e2.src = l.d
        WHERE e2.dst NOT IN (SELECT vec_id FROM del) AND e2.dst <> l.src),
      candR AS (SELECT DISTINCT b.src, b.nd AS dst, ($wCos) AS w
        FROM bridge b JOIN emb x ON x.vec_id = b.src
        JOIN emb y ON y.vec_id = b.nd),
      topmR AS (SELECT src, dst FROM (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM candR) WHERE rn <= $m),
      edges2 AS MATERIALIZED (SELECT src, dst FROM liveE
        UNION SELECT src, dst FROM topmR
        UNION SELECT dst AS src, src AS dst FROM topmR),
      embr AS MATERIALIZED (SELECT * FROM emb
        WHERE vec_id NOT IN (SELECT vec_id FROM del)),
      enr AS (SELECT MIN(vec_id) AS v FROM embr),
      seen0r AS (SELECT q.query_id, enr.v AS node, $sCos AS c
        FROM qs q CROSS JOIN enr JOIN embr e ON e.vec_id = enr.v),
      beam0r AS (SELECT query_id, node, c FROM seen0r),
      ${hopChain("r", "edges2", "embr")},
      finR AS (SELECT query_id, node AS neighbor_id, c,
          row_number() OVER (PARTITION BY query_id ORDER BY c DESC, node) AS rank
        FROM seen${hops}r WHERE node <> query_id)
      SELECT 'deleted' AS phase, query_id, CAST(rank AS BIGINT) AS rank,
        neighbor_id, CAST(floor(c * 1000000) AS BIGINT) AS cos_sim_e6
      FROM finD WHERE rank <= $k
      UNION ALL
      SELECT 'repaired' AS phase, query_id, CAST(rank AS BIGINT) AS rank,
        neighbor_id, CAST(floor(c * 1000000) AS BIGINT) AS cos_sim_e6
      FROM finR WHERE rank <= $k"""
  }
}
