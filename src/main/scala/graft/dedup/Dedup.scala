package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.text.TextAnalysis.{tokens, wordHash, P, sqlTokens, sqlWordHash}
import graft.util.Par

/** Near-duplicate detection operators for training-data pipelines.
  *
  * Scale design (100 TB): signatures (minhash/simhash) are narrow,
  * shuffle-free column computations; candidate generation shuffles once on
  * the band/bucket key (tiny rows: id + key); only verified candidates pay
  * the pairwise cost. This is the standard shingle→minhash→band→bucket-join
  * LSH layout — no all-pairs stage ever materializes.
  */
object Dedup {

  // ---- shingling ----

  /** k-word shingles joined with single spaces (empty array when the
    * document has fewer than k words). Prefer [[shinglesOf]] over an
    * already-materialized token ATTRIBUTE: passing raw text here inlines
    * `tokens(text)` into the per-position lambda, re-evaluating the whole
    * split once per shingle (O(n²)). */
  def shingles(text: Column, k: Int): Column = shinglesOf(tokens(text), k)

  /** As [[shingles]] over a token-array column; pass an attribute (a
    * column materialized by its own projection), not an inline
    * expression. */
  def shinglesOf(t: Column, k: Int): Column =
    when(size(t) < k, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + 1, lit(k)))))

  def sqlShingles(expr: String, k: Int): String = {
    val words = sqlTokens(expr)
    s"""CASE WHEN len($words) < $k THEN []
      ELSE list_transform(range(1, len($words) - ${k - 2}),
        i -> concat_ws(' ', ${(0 until k).map(j => s"($words)[i+$j]").mkString(", ")}))
      END"""
  }

  // ---- MinHash ----

  /** Deterministic (a, b) parameters for the i-th minhash permutation
    * h_i(x) = (a_i·x + b_i) mod P. Small a keeps a·x < 2^63. */
  def minhashParams(i: Int): (Long, Long) = ((2 * i + 1).toLong, (7919 * (i + 1)).toLong)

  /** Per-position multiplier for composing word hashes into a shingle
    * hash: 31^(k-1-j), so h(shingle) = (Σ h(word_j)·31^(k-1-j)) mod P.
    * Keeps products under 2^63 (h < 2^31, multiplier ≤ 31^(k-1)). */
  def shingleMultiplier(k: Int, j: Int): Long =
    math.pow(31, (k - 1 - j).toDouble).toLong

  /** Shingle hashes from an already-materialized word-hash array column:
    * pure arithmetic over element lookups. MUST be fed an attribute, not an
    * inline expression — `element_at(<expr>, i)` re-evaluates the whole
    * array expression per lookup, turning shingling O(n²·k). */
  def shingleHashesFromWordHashes(wh: Column, k: Int): Column =
    when(size(wh) < k, array().cast("array<bigint>")).otherwise(
      transform(sequence(lit(0), size(wh) - k), i =>
        pmod((0 until k).map(j =>
          element_at(wh, i + j + 1) * shingleMultiplier(k, j)).reduce(_ + _),
          lit(P))))

  /** The shared relation every minhash stage derives from: one row per
    * (id, distinct shingle hash); shingle-less docs keep a single
    * null-hash row (explode_outer) so they survive to the signature stage.
    * One md5 per word (not per shingle string): word hashes land in their
    * own projection first (CollapseProject keeps expensive multiply-
    * referenced expressions un-inlined), then shingle hashes are composed
    * arithmetically. */
  def hashedShingleSet(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame =
    Par.ensure(df)
      .select(col(idCol).as("id"),
        transform(tokens(col(textCol)), wordHash(_)).as("_wh"))
      .select(col("id"),
        explode_outer(array_distinct(
          shingleHashesFromWordHashes(col("_wh"), shingleK))).as("sh"))

  /** DuckDB mirror of [[shingleHashes]] given a words-hash list column. */
  def sqlShingleHashes(whCol: String, k: Int): String = {
    val terms = (0 until k)
      .map(j => s"$whCol[i+$j] * ${shingleMultiplier(k, j)}").mkString(" + ")
    s"""CASE WHEN len($whCol) < $k THEN []
      ELSE list_transform(range(1, len($whCol) - ${k - 2}), i -> ($terms) % $P)
      END"""
  }

  /** Signatures from a [[hashedShingleSet]] relation: one hash-aggregation
    * computing all n minima (min over the distinct set equals min over the
    * multiset, so dedup upstream is free). */
  def signaturesFrom(ex: DataFrame, idCol: String, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val mhAggs = (0 until numHashes).map { i =>
      val (a, b) = minhashParams(i)
      min(pmod(col("sh") * a + b, lit(P))).as(s"mh$i")
    }
    val sig = ex.groupBy("id").agg(mhAggs.head, mhAggs.tail: _*)
      .withColumnRenamed("id", idCol)
    val bandCols = (0 until numHashes / rowsPerBand).map { bnd =>
      val parts = (0 until rowsPerBand)
        .map(r => col(s"mh${bnd * rowsPerBand + r}").cast("string"))
      md5(concat_ws("-", parts: _*)).as(s"band$bnd")
    }
    sig.select((col(idCol) +: (0 until numHashes).map(i => col(s"mh$i"))) ++ bandCols: _*)
  }

  /** MinHash signature frame: id column + mh0..mh{n-1} + band hashes
    * (md5 over each group of `rowsPerBand` signature values). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4): DataFrame =
    signaturesFrom(hashedShingleSet(df, idCol, textCol, shingleK), idCol,
      numHashes, rowsPerBand)

  /** DuckDB mirror of [[minhashSignatures]] (sans bands), as a CTE body. */
  def sqlMinhashSignatureCte(idCol: String, textExpr: String, table: String,
      shingleK: Int = 3, numHashes: Int = 16): String = {
    val mhs = (0 until numHashes).map { i =>
      val (a, b) = minhashParams(i)
      s"min((_h * $a + $b) % $P) AS mh$i"
    }.mkString(", ")
    s"""wordhashed AS (
        SELECT $idCol,
          list_transform(${sqlTokens(textExpr)}, w -> ${sqlWordHash("w")}) AS wh
        FROM $table),
      hashed AS (
        SELECT $idCol, unnest(CASE WHEN len(wh) < $shingleK THEN [NULL]
          ELSE list_distinct(${sqlShingleHashes("wh", shingleK)}) END) AS _h
        FROM wordhashed),
      sig AS (SELECT $idCol, $mhs FROM hashed GROUP BY $idCol)"""
  }

  /** LSH candidate pairs (a < b) sharing at least one band, verified with
    * exact shingle-set Jaccard, filtered at `threshold`.
    *
    * Plan shape: explode bands (narrow) → self-join on band (one shuffle on
    * the band key) → distinct pairs → explode distinct shingles and join by
    * shingle to count intersections (shuffles on id / shingle keys). */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame =
    minhashNearDuplicatesWithRelease(df, idCol, textCol, shingleK, numHashes,
      rowsPerBand, threshold)._1

  /** As [[minhashNearDuplicates]], also returning a release handle that
    * unpersists the shared cached relations:
    *  - the shingle relation (feeds the signature agg AND the verify
    *    stage — the text is shingled+hashed exactly once end-to-end);
    *  - the exploded band relation (self-joined for candidates — without
    *    the cache the 16-minimum signature aggregation runs once per join
    *    side);
    *  - the per-doc shingle-array relation inside the verifier (joined
    *    once per pair side).
    * Call release() after the returned frame has been consumed
    * (count/collect/write); dropping the handle leaves the caches to LRU
    * eviction / `spark.catalog.clearCache()`, which accumulates across
    * repeated invocations in a long-lived session. */
  def minhashNearDuplicatesWithRelease(df: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3, numHashes: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): (DataFrame, () => Unit) = {
    val numBands = numHashes / rowsPerBand
    val ex = hashedShingleSet(df, idCol, textCol, shingleK).persist()
    val sig = signaturesFrom(ex, idCol, numHashes, rowsPerBand)
      .filter(col("mh0").isNotNull) // shingle-less docs can't be candidates
    val bands = sig.select(col(idCol).as("id"),
      explode(array((0 until numBands).map(b => col(s"band$b")): _*)).as("band"))
      .persist() // self-joined below: one signature agg, not one per side
    val cand = bands.as("x").join(bands.as("y"), col("x.band") === col("y.band"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val (out, releaseSets) =
      jaccardFrom(ex.filter(col("sh").isNotNull), cand, threshold)
    (out, () => { ex.unpersist(); bands.unpersist(); releaseSets() })
  }

  /** Word-k-gram Jaccard for a given candidate-pair frame (a, b).
    *
    * Shingles are compared by their 48-bit [[wordHash]] rather than as
    * strings: the per-pair intersection works on 8-byte keys instead of
    * multi-word text. Hash collisions (~2^-31 per pair) can in principle
    * nudge a Jaccard value; both this and the oracle hash identically, so
    * parity is exact. */
  def verifiedJaccard(df: DataFrame, cand: DataFrame, idCol: String,
      textCol: String, shingleK: Int, threshold: Double): DataFrame =
    // handle dropped: the cached per-doc shingle-set relation is left to
    // LRU / clearCache — long-lived sessions invoking repeatedly should
    // use the WithRelease variant
    verifiedJaccardWithRelease(df, cand, idCol, textCol, shingleK, threshold)._1

  /** As [[verifiedJaccard]] with a release handle for the cached per-doc
    * shingle-set relation; call release() once the frame is consumed. */
  def verifiedJaccardWithRelease(df: DataFrame, cand: DataFrame,
      idCol: String, textCol: String, shingleK: Int,
      threshold: Double): (DataFrame, () => Unit) =
    jaccardFrom(
      hashedShingleSet(df, idCol, textCol, shingleK).filter(col("sh").isNotNull),
      cand, threshold)

  /** Jaccard over a pre-built (id, hashed-shingle) relation.
    *
    * One hash aggregation folds the relation into a per-doc shingle array
    * (set size comes free as the array length); the candidate pairs then
    * join that 1-row-per-doc relation twice and each pair's intersection
    * is computed locally with `array_intersect`. Compared to the exploded
    * (id, shingle) equi-join formulation this shuffles the wide relation
    * once instead of three times (two join sides + re-aggregation), and
    * the per-pair work is O(|A|+|B|) hash-set probing. Pairs with an empty
    * intersection are dropped (matching the inner-join formulation and the
    * oracle), so `threshold = 0` still excludes disjoint pairs. */
  private def jaccardFrom(ex: DataFrame, cand: DataFrame,
      threshold: Double): (DataFrame, () => Unit) = {
    // ex is distinct per (id, sh) — hashedShingleSet array_distincts before
    // exploding — so collect_list preserves set semantics. Persisted: the
    // relation joins once per pair side, and the cache keeps the wide
    // groupBy from running twice (1 small row per doc).
    val sets = ex.groupBy("id").agg(collect_list("sh").as("shs"))
      .select(col("id"), col("shs"), size(col("shs")).as("n"))
      .persist()
    val out = cand
      .join(sets.as("sa"), col("a") === col("sa.id"))
      .join(sets.as("sb"), col("b") === col("sb.id"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sa.shs"), col("sb.shs"))).as("inter"),
        (col("sa.n") + col("sb.n")).as("ntot"))
      .filter(col("inter") > 0)
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("ntot") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    (out, () => { sets.unpersist(); () })
  }

  /** EXACT set-similarity self-join via prefix filtering — the
    * AllPairs/PPJoin family (Bayardo et al. WWW'07; Xiao et al.
    * "Efficient Similarity Joins for Near Duplicate Detection"): the
    * deterministic-complete-recall counterpart to the probabilistic LSH
    * paths (minhash q21, simhash q22). LSH banding can miss a qualifying
    * pair (tunable, but nonzero); the prefix filter CANNOT — pigeonhole,
    * not probability:
    *
    * Order the shingle universe totally (here: global rarity `(df, sh)`,
    * rarest first — any total order is correct; rarity minimizes
    * candidates). For Jaccard ≥ t, a qualifying pair has
    * `c = |A∩B| ≥ ⌈t·|A|⌉` (c ≥ t·(|A|+|B|−c) and |B| ≥ c). If A's
    * prefix — its `|A| − ⌈t·|A|⌉ + 1` smallest elements — contained no
    * intersection element, A would hold ≥ that many non-common elements
    * below the globally-smallest common one, capping c at ⌈t·|A|⌉ − 1:
    * contradiction. So the smallest common element sits in BOTH prefixes
    * and the prefix equi-join sees every qualifying pair.
    *
    * Plan shape at scale: df counts are one hash-agg on the shingle key;
    * the prefix relation is ~half the exploded relation (t = 1/2);
    * candidates come from ONE equi-join on the shingle key — bucketed by
    * construction, never all-pairs — pre-filtered by the size-compat
    * bound max ≤ min/t before the exact verify. Verification reuses the
    * per-doc-array `array_intersect` path shared with the LSH verifier.
    * Exactness of the UNIVERSE: sets are 48-bit hashed shingles, hashed
    * identically by the oracle (the q21 contract — collisions mirror). */
  def prefixFilterNearDuplicates(df: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3,
      threshold: Double = 0.5): (DataFrame, () => Unit) = {
    require(threshold == 0.5, "prefix length is specialized to t = 1/2")
    val ex = hashedShingleSet(df, idCol, textCol, shingleK)
      .filter(col("sh").isNotNull).persist()
    val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    val perDoc = ex.join(dfreq, "sh")
      .groupBy("id")
      .agg(count(lit(1)).as("s"),
        sort_array(collect_list(struct(col("df"), col("sh")))).as("sorted"))
    // π = s − ⌈s/2⌉ + 1 = s DIV 2 + 1, integer arithmetic end to end
    val prefix = perDoc
      .select(col("id"), col("s"),
        explode(expr("slice(sorted, 1, int(s DIV 2 + 1))")).as("p"))
      .select(col("id"), col("s"), col("p.sh").as("sh"))
      .persist() // self-joined below: one prefix build, not one per side
    val cand = prefix.as("x").join(prefix.as("y"), col("x.sh") === col("y.sh"))
      .filter(col("x.id") < col("y.id") &&
        // J ≥ t bounds the size ratio: max ≤ min/t (= 2·min at t = 1/2)
        greatest(col("x.s"), col("y.s")) <= least(col("x.s"), col("y.s")) * 2)
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val (out, releaseSets) = jaccardFrom(ex, cand, threshold)
    (out, () => { ex.unpersist(); prefix.unpersist(); releaseSets() })
  }

  // ---- duplicate clustering ----

  /** Connected components over an undirected pair relation `(a, b)`:
    * returns `(id, cluster_id)` for every node in some pair, where
    * `cluster_id` is the minimum id reachable in the pair graph — the
    * standard "keep one canonical doc per near-dup cluster" step that
    * follows pairwise near-dup detection in a training-data pipeline.
    *
    * Algorithm: min-label propagation with pointer jumping. Each round a
    * node takes the min label among itself and its neighbors (one hop),
    * then adopts its new label's own new label (the jump) — the distance
    * a min travels roughly doubles per round, so convergence is
    * O(log diameter) rounds instead of O(diameter) (the shortcutting idea
    * behind MapReduce-CC formulations such as Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). Each round is two
    * keyed joins + a hash-agg — a handful of shuffles of (id, label)
    * pairs, never the edge payload.
    *
    * Iterative DataFrame algorithms double their lineage every round
    * (labels feeds both join sides), so each round's result is cut off
    * with an eager localCheckpoint — without it the logical plan grows
    * 2^rounds nodes. localCheckpoint trades fault tolerance for speed
    * (executor loss loses blocks); a production run on a real cluster
    * would use reliable `checkpoint()` against the cluster FS instead.
    *
    * Adaptive small-graph path: the pair graph of a near-dup stage is
    * tiny relative to the corpus (|pairs| ≪ |docs| by construction), so
    * when it fits comfortably on the driver (≤ `driverMaxEdges`, counted
    * from the already-materialized edge relation) the components are
    * solved with union-find in O(E·α) instead of scheduling distributed
    * rounds — identical min-id labels either way (spec-pinned).
    *
    * CONTRACT — eager input materialization: `pairs` is consumed into an
    * eager `localCheckpoint(true)` before this method returns, so the
    * returned frame never re-reads the caller's lineage. Callers holding
    * cache-release handles on `pairs`' inputs (e.g.
    * `embeddingNearDuplicatesReleasable`) may therefore release them as
    * soon as this method returns; if this implementation ever becomes
    * lazy, those call sites must defer release until the result is
    * materialized. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50,
      driverMaxEdges: Long = 1000000L): DataFrame = {
    val half = pairs
      .select(col("a").cast(LongType).as("src"), col("b").cast(LongType).as("dst"))
    val edges0 = half
      .union(half.select(col("dst").as("src"), col("src").as("dst")))
    // the common (bounded-batch) case pays count + collect over the
    // lazy union — the eager checkpoint bought nothing the collect
    // doesn't redo, and was one whole extra job per invocation (r19);
    // only the distributed iterative path materializes the edge list
    if (edges0.count() <= driverMaxEdges) return driverUnionFind(edges0)
    val edges = edges0.localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nlabel"))
      // carry the round-entry label as `old` so convergence is a cheap
      // filter over the one checkpointed frame, not an extra join job
      val stepped = labels.withColumnRenamed("label", "old")
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nlabel"), col("old"))).as("label"))
      // jump: my label is a node id; adopt that node's (already stepped)
      // label when smaller. stepped feeds both sides but stays shallow —
      // the recursive variable (labels) is a checkpointed leaf.
      val jumpTable = stepped
        .select(col("id").as("label"), col("label").as("jlabel"))
      val jumped = stepped.join(jumpTable, Seq("label"), "left")
        .select(col("id"), col("old"),
          least(col("label"), coalesce(col("jlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = jumped.filter(col("label") =!= col("old")).count()
      labels = jumped.select(col("id"), col("label"))
      converged = changed == 0L
      i += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Union-find with path compression where roots stay component minima
    * (union attaches the larger root under the smaller), so find(id) IS
    * the min-id cluster label. */
  /** INCREMENTAL connected components over a PERSISTED label table —
    * the lifecycle leg of [[connectedComponents]] (an entity store that
    * ingests new links nightly cannot recompute the whole graph): apply
    * a batch of new edges to `labelTable` (id, cluster_id; min-reachable
    * labels over every edge ever applied) touching only AFFECTED rows.
    *
    *  1. Each new edge lifts to the LABEL level (endpoint labels from
    *     the live table, unseen ids label themselves) — same-component
    *     edges vanish here, so no-op batches cost one lookup join.
    *  2. Components over the label pairs — O(batch), not O(graph):
    *     old labels are their components' minima, so the merged
    *     component's min-id label is the min of the old labels.
    *  3. One [[graft.lake.Snapshots.merge]] upserts ONLY rows whose
    *     label changed plus the new ids — O(affected) data written,
    *     O(delta) log metadata, the unaffected graph never rewrites.
    *
    * The first apply on an empty table IS the full computation (every
    * id is new) — one code path. Returns the published version (the
    * prior version on a no-op batch). */
  def incrementalCC(spark: org.apache.spark.sql.SparkSession,
      labelTable: String, edges: DataFrame): Int = {
    import graft.lake.Snapshots
    val labelSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", LongType),
      org.apache.spark.sql.types.StructField("cluster_id", LongType)))
    def emptyLabels = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      labelSchema)
    val labels = Snapshots.latestVersion(spark, labelTable)
      .flatMap(_ => Snapshots.readLatest(spark, labelTable))
      .getOrElse(emptyLabels)
    val e = edges.select(col("a").cast(LongType).as("a"),
      col("b").cast(LongType).as("b")).distinct().localCheckpoint()
    val pairs = e
      .join(labels.select(col("id").as("a"), col("cluster_id").as("la")),
        Seq("a"), "left")
      .join(labels.select(col("id").as("b"), col("cluster_id").as("lb")),
        Seq("b"), "left")
      .select(coalesce(col("la"), col("a")).as("a"),
        coalesce(col("lb"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    // (id = old label, cluster_id = merged min label). No isEmpty
    // pre-probe and no re-checkpoint (r19): connectedComponents' own
    // edge count IS the emptiness test (empty pairs → empty labels),
    // and its bounded-batch result is a driver-built LocalRelation —
    // re-materializing it was one extra job per batch.
    val mapping = connectedComponents(pairs)
    val remap = mapping.select(col("id").as("_old"),
      col("cluster_id").as("_new"))
    val changedOld = labels
      .join(remap, labels("cluster_id") === remap("_old"))
      .filter(col("cluster_id") =!= col("_new"))
      .select(col("id"), col("_new").as("cluster_id"))
    val ids = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id"))).distinct()
    val newRows = ids.join(labels.select(col("id")), Seq("id"), "left_anti")
      .join(remap, col("id") === col("_old"), "left")
      .select(col("id"), coalesce(col("_new"), col("id")).as("cluster_id"))
    // materialize the change set ONCE: the previous shape computed the
    // 4-join subtree for isEmpty, then AGAIN inside merge's staging
    // write, and a third time for merge's tombstone keys — three
    // executions of the same O(affected) plan per batch (guide §1.2:
    // don't compute things twice). One eager checkpoint feeds all three.
    val changes = changedOld.unionByName(newRows).localCheckpoint(true)
    if (changes.isEmpty)
      Snapshots.latestVersion(spark, labelTable).getOrElse(0)
    else Snapshots.merge(spark, labelTable, changes, Seq("id"))
  }

  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var cur = x
      while (cur != root) { val next = parent(cur); parent(cur) = root; cur = next }
      root
    }
    val nodes = scala.collection.mutable.SortedSet.empty[Long]
    edges.select(col("src"), col("dst")).collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      nodes += a; nodes += b
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    nodes.toSeq.map(id => (id, find(id)))
      .toDF("id", "cluster_id")
  }

  // ---- SimHash ----

  /** 32-bit simhash over whitespace tokens (with multiplicity): bit b is
    * set when the signed sum of token-hash bits at position b is positive.
    * Computed via explode + one hash aggregation keyed on the id — one
    * shuffle of (id, token-hash) pairs. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val h32 = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast(LongType)
    val exploded = Par.ensure(df).select(col(idCol),
        explode(tokens(col(textCol))).as("tok"))
      .select(col(idCol), h32.as("h"))
    val bitSums = (0 until bits).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(1) * 2 - 1).as(s"s$b"))
    exploded.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until bits).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-duplicate pairs (a < b) within `maxHamming` bit flips.
    *
    * Candidate generation is the Manku/Jain/Sarma pigeonhole scheme
    * (WWW'07): the `bits`-bit fingerprint splits into maxHamming+1 bands,
    * and any pair within the distance budget must agree on at least one
    * intact band — so the band equi-join has EXACT recall, not
    * probabilistic. One shuffle on (band position, band value); only
    * intra-bucket pairs pay the bit_count verify, which is codegen'd
    * integer xor/popcount. */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bits: Int = 32): (DataFrame, () => Unit) = {
    val numBands = maxHamming + 1
    val bandBits = bits / numBands
    val mask = (1L << bandBits) - 1
    // the simhash agg feeds both self-join sides: cache it once
    val bands = simhash(df, idCol, textCol, bits)
      .select(col(idCol).as("id"), col("simhash"),
        posexplode(array((0 until numBands).map(i =>
          shiftright(col("simhash"), i * bandBits).bitwiseAND(mask)): _*))
          .as(Seq("pos", "band")))
      .persist()
    val out = bands.as("x").join(bands.as("y"),
        col("x.pos") === col("y.pos") && col("x.band") === col("y.band") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    (out, () => { bands.unpersist(); () })
  }

  def sqlSimhashNearDuplicates(idCol: String, textExpr: String,
      table: String, maxHamming: Int = 3, bits: Int = 32): String = {
    val numBands = maxHamming + 1
    val bandBits = bits / numBands
    val mask = (1L << bandBits) - 1
    val positions = (0 until numBands).mkString("[", ", ", "]")
    s"""WITH sim AS (${sqlSimhash(idCol, textExpr, table, bits)}),
      withpos AS (SELECT $idCol AS id, simhash, unnest($positions) AS pos FROM sim),
      bands AS (
        SELECT id, simhash, pos, (simhash >> (pos * $bandBits)) & $mask AS band
        FROM withpos)
      SELECT DISTINCT x.id AS a, y.id AS b,
        CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
      FROM bands x JOIN bands y
        ON x.pos = y.pos AND x.band = y.band AND x.id < y.id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxHamming"""
  }

  def sqlSimhash(idCol: String, textExpr: String, table: String,
      bits: Int = 32): String = {
    val h = s"(('0x' || substr(md5(tok),1,8))::BIGINT)"
    val sums = (0 until bits)
      .map(b => s"sum((($h >> $b) & 1) * 2 - 1) AS s$b").mkString(", ")
    val combine = (0 until bits)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
        SELECT $idCol, unnest(${sqlTokens(textExpr)}) AS tok FROM $table),
      sums AS (SELECT $idCol, $sums FROM toks GROUP BY $idCol)
      SELECT $idCol, $combine AS simhash FROM sums"""
  }
}
