package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis._

/** Text-analysis operators over the `documents` table, each with an exact
  * DuckDB oracle. All are shuffle-free narrow transforms — at 100 TB they
  * scale linearly with input splits. */
object TextQueries {

  /** Token counting: whitespace tokens + BPE-ish regex pre-tokens. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents")).select(
      col("doc_id"),
      wsTokenCount(col("text")).cast("long").as("ws_tokens"),
      bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))

  /** Document fingerprints: normalized md5 + order-sensitive rolling hash. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents")).select(
      col("doc_id"),
      normalizedFingerprint(col("text")).as("fingerprint_md5"),
      rollingHash(col("text")).as("fingerprint_rolling"))

  /** Language ID heuristic: per-language stopword scores + argmax. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scoreCols = stopwords.keys.toSeq.map(l =>
      langScore(col("text"), l).cast("long").as(s"score_$l"))
    graft.util.Par.ensure(Tables(spark, dir, "documents")).select(
      (col("doc_id") +: scoreCols :+
        predictedLang(col("text")).as("pred_lang")): _*)
  }

  /** Quality scoring: stopword density, punctuation, word-length sanity.
    * Exported at micro-precision via floor(x·1e6): both engines compute the
    * identical double, and floor of an identical double is engine-stable
    * where decimal `round` is not (observed: 0.4284375 rounding 6-dp
    * differently in Spark vs DuckDB). */
  def quality(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents")).select(
      col("doc_id"),
      wsTokenCount(col("text")).cast("long").as("n_words"),
      floor(qualityScore(col("text")) * 1000000).as("quality_e6"))

  /** Deterministic stratified sampling: 30% of English docs, 10% of the
    * rest, keyed on a stable hash of doc_id — replayable anywhere. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Sampling
    Sampling.stratifiedHashSample(Tables(spark, dir, "documents"),
        "doc_id", "lang", Map("en" -> 3000), defaultBp = 1000)
      .select(col("doc_id"), col("lang"))
  }

  /** Leakage-safe GROUP-level train/val/test split (q138): the split key
    * is the document's SOURCE, not the document — every doc from one
    * source lands in the same split, so near-duplicate documents within
    * a crawl/domain can never straddle the train/test boundary (the
    * train-test-contamination failure mode group-aware splitting
    * exists to prevent; doc-level hashing like q32/q79 cannot give this
    * guarantee). Same stable-hash machinery as q32 — a pure function of
    * the source string, replayable on any engine/layout — with 80/10/10
    * basis-point thresholds. Shuffle-free: one narrow projection over
    * the scan; the group-coherence property costs nothing because the
    * assignment never looks at more than the row's own group key. */
  def groupSplit(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Sampling
    val b = Sampling.hashBucket(col("source"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        when(b < 8000, "train").when(b < 9000, "val").otherwise("test")
          .as("split"))
  }

  // q64 mixing parameters — interpolated into BOTH the Spark plan and the
  // oracle so they cannot drift apart
  val MixHighE6 = 600000L
  val MixMidE6 = 400000L
  val MixRates = Map("high" -> 8000, "mid" -> 3000)
  val MixDefaultBp = 500

  /** Weighted corpus mixing (q64): documents bucketed by their q17 quality
    * score, then sampled at per-bucket rates (80% high / 30% mid / 5% low)
    * with the same doc_id hash predicate as q32 — a deterministic training
    * mix that upweights high-quality text. The bucket is a DERIVED stratum
    * (floor'd e6 score, engine-stable), the selection a pure function of
    * (doc_id, bucket): any engine, any run, any cluster layout replays the
    * identical corpus — the property that makes a 100 TB mix resumable and
    * auditable. Shuffle-free: score, bucket, and hash gate are one narrow
    * projection+filter over the scan. */
  def corpusMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Sampling
    val scored = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .withColumn("quality_e6", floor(qualityScore(col("text")) * 1000000))
      .withColumn("q_bucket",
        when(col("quality_e6") >= MixHighE6, "high")
          .when(col("quality_e6") >= MixMidE6, "mid")
          .otherwise("low"))
    Sampling.stratifiedHashSample(scored, "doc_id", col("q_bucket"),
        MixRates, MixDefaultBp)
      .select(col("doc_id"), col("q_bucket"), col("quality_e6"))
  }

  // q70 shard count at oracle/test scale, interpolated into BOTH sides
  private val ShuffleShards = 16

  /** Corpus-scaled shard count for [[deterministicShuffle]]: enough shards
    * that each per-shard `row_number()` window (one task per shard) sorts
    * at most ~`targetShardBytes` of input, floored at `minShards`.
    * Pure-integer ceil-division — no FP-boundary divergence. A fixed shard
    * constant is the "silently caps scale" anti-pattern (16 shards = 16
    * sort tasks at any corpus size); this ladder keeps per-task work
    * constant as the corpus grows (100 TB / 256 MiB ≈ 400k shards). */
  def scaledShardCount(corpusBytes: Long,
      targetShardBytes: Long = 256L << 20, minShards: Int = 16): Int = {
    val need = (corpusBytes + targetShardBytes - 1) / targetShardBytes
    math.max(minShards.toLong, need).min(Int.MaxValue.toLong).toInt
  }

  /** Row-count form of [[scaledShardCount]] — the default path of
    * [[deterministicShuffle]] uses THIS, because (a) the per-shard sort
    * runs over the projected `(doc_id, hv)` relation, whose size is a
    * function of ROW count, not corpus bytes, and (b) row count is a
    * stable corpus property: optimizer scan stats (`sizeInBytes`) vary
    * with compression codec, caching, and session config, so a
    * stats-derived shard count — which is part of the SEMANTIC output —
    * could differ across environments for the same corpus and salt.
    * ~4M rows/shard ≈ 64 MB of (hv, doc_id) pairs per sort task. */
  def scaledShardCountRows(nRows: Long,
      targetShardRows: Long = 4L * 1000 * 1000, minShards: Int = 16): Int = {
    val need = (nRows + targetShardRows - 1) / targetShardRows
    math.max(minShards.toLong, need).min(Int.MaxValue.toLong).toInt
  }

  /** Deterministic global shuffle (q70) — the reproducible "shuffle the
    * corpus before packing/epochs" step: every doc gets a (shard,
    * position) from a salted stable hash, independent of cluster layout,
    * partitioning, or run. One hash-shuffle on the shard key and a
    * per-shard sort — a true global random ORDER would instead serialize
    * 100 TB through a single-partition sort; per-shard positions give the
    * same statistical shuffle with shard-parallel ordering. Re-salting
    * re-shuffles reproducibly (epoch seeds).
    *
    * `shards` is semantic (it appears in the output), so the driver-gate
    * query pins the oracle's constant at test scale, and epoch pipelines
    * should likewise pass an explicit per-epoch value they record; callers
    * that omit it get a corpus-scaled count derived from the ROW count via
    * [[scaledShardCountRows]] — a stable corpus property, unlike optimizer
    * byte stats (compression/caching/config-dependent), so the default
    * output is reproducible across sessions and environments. Costs one
    * metadata-only parquet count() job. */
  def deterministicShuffle(spark: SparkSession, dir: String,
      shards: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val nShards =
      if (shards > 0) shards
      else scaledShardCountRows(docs.count())
    val h = wordHash(concat(lit("shuf:"), col("doc_id").cast("string")))
    val w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    docs
      .select(col("doc_id"), h.as("hv"))
      .withColumn("shard", pmod(col("hv"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** q123 carve bucket count. NON-semantic (unlike q70's shard): the
    * carve's output is bucket-count-invariant, so any deployment can pick
    * buckets from the q70 ladder (corpus bytes / target sort size)
    * without changing the selected set — a spec pins the invariance. */
  val CarveBuckets = 32

  /** Token-budget corpus carve (q123) — "take documents, in a stable
    * pseudo-random order, until the token budget is hit": the step that
    * turns a filtered corpus into a FIXED-SIZE training corpus (a token
    * target, not a doc-rate target — q32/q64 sample at rates and the
    * token yield drifts with doc length; this hits the budget exactly).
    *
    * The cumulative token count is a DISTRIBUTED two-phase prefix sum —
    * the naive formulation (one global window `SUM OVER (ORDER BY h)`)
    * serializes the corpus through a single sort task, the q70 problem
    * again. Here the stable-hash order key is range-split into
    * `buckets` contiguous h-ranges (`bucket = h·B DIV 10000` — a pure
    * function of h, so bucket boundaries are order-prefix boundaries):
    * phase 1 aggregates per-bucket token totals (tiny relation,
    * collected, exclusive-prefixed on the driver); phase 2 runs the
    * within-bucket window cumsum in parallel and adds each bucket's
    * broadcast offset. Budget = 2/5 of the corpus token total, all
    * integer arithmetic; selection keeps documents that START strictly
    * before the budget boundary. Two corpus scans of a 2-column
    * projection (phase 1 + phase 2), one window shuffle on the bucket
    * key. The oracle replays the single global window — proving the
    * distributed decomposition exactly equals the serial semantics. */
  def tokenBudgetCarve(spark: SparkSession, dir: String,
      buckets: Int = CarveBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.text.Sampling
    val weighted = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("h", Sampling.hashBucket(col("doc_id")))
      .withColumn("bucket",
        expr(s"(h * $buckets) DIV ${Sampling.Denominator}"))
    val totals = weighted.groupBy("bucket")
      .agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = (b, acc); acc += t; o }
    val budget = acc * 2 / 5
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("bucket", "offset")
    val w = Window.partitionBy("bucket").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weighted
      .withColumn("run", sum("n_tokens").over(w))
      .join(broadcast(offsetDf), "bucket")
      .withColumn("cum_tokens", col("run") + col("offset"))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
  }

  /** Shard token budget for q298 — sized so every test sf yields a
    * multi-shard manifest (total tokens ÷ 2048 ≈ 13 shards at sf0.01). */
  val ShardBudget = 2048L

  /** q298 — DETERMINISTIC TRAINING-SHARD MANIFEST (the WebDataset-style
    * epoch export every LM training run consumes: the whole corpus,
    * epoch-shuffled and partitioned into ~fixed-token shards, each with
    * a verifiable manifest row): docs order by the salted hash (the q70
    * deterministic shuffle — reproducible epochs), the global token
    * prefix sum assigns each doc's shard by its STARTING offset
    * (shard = start DIV budget, so shards are contiguous hash-order
    * runs), and each shard emits (docs, tokens, id-digest) — the digest
    * is what lets a training job verify it read exactly the manifest's
    * documents.
    *
    * Scale shape: the prefix sum is q123's DISTRIBUTED two-phase
    * decomposition — per-bucket totals to the driver (KB), per-bucket
    * base offsets broadcast back, within-bucket windows parallel across
    * buckets; NO global single-task window exists in the plan (the
    * oracle's global ORDER BY window is the semantics statement, not
    * the plan). */
  def shardManifest(spark: SparkSession, dir: String,
      buckets: Int = CarveBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.text.Sampling
    val weighted = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("h", Sampling.hashBucket(col("doc_id")))
      .withColumn("bucket",
        expr(s"(h * $buckets) DIV ${Sampling.Denominator}"))
    val totals = weighted.groupBy("bucket")
      .agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = (b, acc); acc += t; o }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("bucket", "offset")
    val w = Window.partitionBy("bucket").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weighted
      .withColumn("run", sum("n_tokens").over(w))
      .join(broadcast(offsetDf), "bucket")
      .withColumn("start", col("run") + col("offset") - col("n_tokens"))
      .withColumn("shard_id", expr(s"start DIV $ShardBudget"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum(graft.text.TextAnalysis.wordHash(
          concat(lit("sh:"), col("doc_id").cast("string")))).as("ids_digest"))
  }

  /** q213 — TEMPERATURE-WEIGHTED domain mixture (the multilingual/
    * multi-domain sampling rule every large LM corpus ships: domain
    * weights ∝ size^α with α < 1, so small domains are UP-sampled
    * relative to proportional mixing — here α = 1/2, realized as an
    * INTEGER sqrt so every weight, budget and boundary is exact integer
    * arithmetic in both engines). Per-domain token budgets =
    * global_budget · √T_s / Σ√T, then each domain is carved to its
    * budget in the stable-hash order by q123's DISTRIBUTED two-phase
    * prefix sum — per-(domain, bucket) totals are a tiny driver-side
    * relation, the within-bucket cumsum runs in parallel, and NO
    * global or per-domain single-task window exists in the plan (the
    * naive per-domain `SUM OVER (PARTITION BY domain ORDER BY …)`
    * serializes each domain through one task — exactly the q70 hazard
    * the decomposition removes). Output: per-domain doc/token yield vs
    * budget, zero-budget domains included. The driver-side budget
    * arithmetic uses BigInt (Σtokens·weight overflows a long at
    * ~10 TB of tokens); the oracle's HUGEINT matches exactly. */
  def domainMixtureCarve(spark: SparkSession, dir: String,
      buckets: Int = CarveBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.text.Sampling
    val weighted = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("h", Sampling.hashBucket(col("doc_id")))
      .withColumn("bucket",
        expr(s"(h * $buckets) DIV ${Sampling.Denominator}"))
    val totals = weighted.groupBy("source", "bucket")
      .agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perSource = totals.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      .toMap
    val wgt = perSource.map { case (s, t) =>
      s -> math.floor(math.sqrt(t.toDouble)).toLong }
    val wsum = wgt.values.sum
    val budgetAll = perSource.values.sum * 2 / 5
    val budgets = wgt.map { case (s, ww) =>
      s -> (BigInt(budgetAll) * ww / wsum).toLong }
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (s, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, b, t) =>
        val o = (s, b, acc); acc += t; o }
    }
    import spark.implicits._
    val offsetDf = offsets.toDF("source", "bucket", "offset")
    val budgetDf = budgets.toSeq.toDF("source", "budget")
    val w = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sel = weighted
      .withColumn("run", sum("n_tokens").over(w))
      .join(broadcast(offsetDf), Seq("source", "bucket"))
      .withColumn("cum", col("run") + col("offset"))
      .join(broadcast(budgetDf), Seq("source"))
      .filter(col("cum") - col("n_tokens") < col("budget"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sel_tokens"))
    budgetDf.join(sel, Seq("source"), "left")
      .select(col("source"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"),
        col("budget"))
  }

  /** q128 feature dimension, interpolated into BOTH sides. */
  val FeatureDim = 64

  /** Feature hashing (q128) — the hashing-trick vectorizer: terms hash
    * into a FIXED feature dimension (no vocabulary build, no dictionary
    * broadcast — the property that makes text vectorization a single
    * narrow pass at 100 TB; collisions are the accepted trade, exactly
    * as in scikit/VW/Spark MLlib's HashingTF). Emitted SPARSE: one row
    * per (doc, slot) with the collision-summed count — the layout a
    * downstream trainer consumes; a dense array is `FeatureDim` wide
    * regardless of doc length and would explode storage for short docs.
    * One shuffle (the per-doc-slot count). */
  def featureHashing(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .withColumn("slot", pmod(wordHash(col("term")), lit(FeatureDim)))
      .groupBy("doc_id", "slot")
      .agg(count(lit(1)).as("cnt"))

  /** q130 per-doc distinct-term cap, interpolated into BOTH sides: pair
    * generation is O(cap²) per document REGARDLESS of doc length — the
    * bound that keeps collocation mining linear in corpus size (an
    * uncapped per-doc self-join is quadratic in doc length and melts on
    * the long tail). Deterministic cap: first `SetCap` of the SORTED
    * distinct terms. */
  val SetCap = 16

  /** Collocation mining (q130): corpus-wide co-occurrence counts of
    * unordered term pairs within a document — the association signal
    * under PMI/phrase-table construction. Pairs come from each doc's
    * capped sorted distinct-term set (see [[SetCap]]), counted corpus-
    * wide, top-50 by (count desc, pair asc). One narrow pair expansion
    * (≤ cap² rows per doc) + one pair-keyed aggregate. */
  def collocations(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        slice(array_sort(array_distinct(tokens(col("text")))), 1, SetCap)
          .as("ts"))
      .select(col("doc_id"), explode(col("ts")).as("a"), col("ts"))
      .select(col("a"), explode(col("ts")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("a"), col("b")).limit(50)

  /** q131 dictionary bounds, interpolated into BOTH sides: a term is
    * in-vocabulary iff its document frequency is ≥ MinDf (drops hapax
    * noise) and ≤ MaxDfBp/10000 of the corpus (drops stopword-like
    * terms) — the classic min_df/max_df vectorizer contract. */
  val MinDf = 3
  val MaxDfBp = 5000

  /** Vocabulary pruning + OOV audit (q131): build the bounded dictionary
    * from document frequencies, then score every document's token stream
    * against it — `oov_e6` (floor'd integer rate) is the signal that
    * catches vocabulary drift between a trained tokenizer/embedding table
    * and fresh data. The dictionary is vocabulary-sized → broadcast to
    * the occurrence stream; two aggregates (df, per-doc), no corpus
    * self-join. */
  def vocabOov(spark: SparkSession, dir: String): DataFrame = {
    val occ = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val dfreq = occ.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    val total = Tables(spark, dir, "documents").count()
    val dict = dfreq
      .filter(col("df") >= MinDf && col("df") * 10000 <= lit(total) * MaxDfBp)
      .select(col("term"), lit(true).as("in_vocab"))
    occ.join(broadcast(dict), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_e6", expr("n_oov * 1000000 DIV n_tokens"))
  }

  // q180 duplicated-k-gram width (tokens), interpolated into BOTH sides
  private val LdsK = 8

  /** q180 — LONGEST-duplicated-span detection (the suffix-array exact
    * substring dedup of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", in its distributed k-gram form): a
    * position is duplicated iff some [[LdsK]]-token window covering it
    * occurs ≥2 times CORPUS-WIDE; per document we report the total
    * duplicated-token coverage and the longest contiguous duplicated
    * stretch — the quantities the Lee et al. removal step cuts (their
    * k=50-token criterion, same mechanism). This generalizes q67's
    * fixed non-overlapping 4-word spans to OVERLAPPING windows with
    * exact interval union, so arbitrarily long duplicated passages
    * measure at their true length instead of rounding to span
    * boundaries.
    *
    * Shape: one explode to (doc, start, k-gram) with stride 1; one
    * hash-agg on the k-gram for corpus counts; a semi join back; then a
    * PER-DOCUMENT window merges the fixed-length intervals
    * ([s, s+K-1] ∪ [s', ...] merge iff s' ≤ s + K — same-length
    * intervals sorted by start merge pairwise, so one lag + one running
    * sum suffice). The only corpus-wide exchanges key on the k-gram and
    * doc_id hashes; the interval window is bounded by document length,
    * never corpus length. At 100 TB the gram exchange ships
    * `xxhash64(gram)` instead of text (the q67 `hashKeyedWindow`
    * discipline — identical up to 64-bit collisions); the gate keeps
    * exact text so the oracle replays byte-for-byte. */
  def longestDupSpan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(trim(col("text"))) =!= 0)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n_tokens"))
    val kg = docs.filter(col("n_tokens") >= LdsK)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("n_tokens") - LdsK),
          s => concat_ws(" ", slice(col("t"), (s + 1).cast("int"), lit(LdsK)))))
          .as(Seq("s", "g")))
      .select(col("doc_id"), col("s").cast("long").as("s"), col("g"))
    val dup = kg.groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("g")
    val w = Window.partitionBy("doc_id").orderBy("s")
    val islands = kg.join(dup, Seq("g"), "left_semi")
      .select(col("doc_id"), col("s"))
      .withColumn("prev", lag(col("s"), 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        col("s") > col("prev") + LdsK, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg((max(col("s")) - min(col("s")) + LdsK).as("stretch"))
    val perDoc = islands.groupBy("doc_id")
      .agg(sum(col("stretch")).as("dup_tokens"),
        max(col("stretch")).as("max_dup_span"))
    docs.select(col("doc_id"), col("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("max_dup_span"), lit(0L)).as("max_dup_span"))
  }

  // q67 span width, interpolated into BOTH sides
  private val SpanW = 4

  /** Span-level exact dedup (q67) — the C4/RefinedWeb "remove duplicated
    * spans across the corpus" step at sub-document granularity: documents
    * are chunked into consecutive `SpanW`-word spans, a span occurrence
    * survives iff it is the corpus-wide FIRST occurrence of that exact
    * span text (ordered by doc_id, position — deterministic), and each
    * doc reports how much of it survives. Two shuffles: one window keyed
    * on the span text (first-occurrence flag), one hash-agg on doc_id —
    * both scale-safe.
    *
    * `hashKeyedWindow` keys the first-occurrence window on
    * `xxhash64(span)` and drops the span text BEFORE the shuffle — at
    * 100 TB the window exchange then moves 8-byte keys instead of
    * span-width strings (the downstream agg only needs the flag, never
    * the text). Semantically identical up to 64-bit hash collisions;
    * default stays exact-text so the driver oracle replays byte-for-byte
    * semantics, and a ScaleSpecs test pins the two modes equal. */
  def spanDedup(spark: SparkSession, dir: String,
      hashKeyedWindow: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(trim(col("text"))) =!= 0)
      .select(col("doc_id"), tokens(col("text")).as("t"))
    val nSpans = ceil(size(col("t")).cast("double") / SpanW).cast("long")
    val spans = docs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0L), nSpans - 1),
        i => concat_ws(" ", slice(col("t"), i * SpanW + 1, lit(SpanW)))))
        .as(Seq("span_idx", "span")))
    val keyed =
      if (hashKeyedWindow)
        spans.select(col("doc_id"), col("span_idx"),
          xxhash64(col("span")).as("_k"))
      else spans.withColumnRenamed("span", "_k")
    val w = Window.partitionBy("_k").orderBy("doc_id", "span_idx")
    keyed.withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        floor((col("n_spans") - col("n_dup_spans")).cast("double") /
          col("n_spans").cast("double") * 1000000).as("retained_e6"))
  }

  // q74 rarity threshold, interpolated into BOTH sides
  private val RareMax = 2L

  /** Cross-document rarity scoring (q74) — the integer-exact stand-in for
    * n-gram LM perplexity filtering (the CCNet/KenLM quality step): a
    * document whose bigrams are mostly corpus-rare reads as gibberish /
    * unique noise, one whose bigrams are all common reads as boilerplate.
    * Per-doc output: bigram count, corpus-rare bigram count (corpus
    * frequency ≤ [[RareMax]]), and the e6-floored rare ratio — all exact
    * integers, no libm log anywhere (floor(ln) at a bucket boundary can
    * diverge across engines; integer ratios cannot).
    *
    * Shape: one explode, one (doc, bigram) count aggregation — persisted,
    * because BOTH the corpus-count rollup and the join probe consume it
    * and the optimizer does not share the exchange across a broadcast
    * boundary (measured: without the persist the corpus is scanned and
    * tokenized twice) — then a vocabulary-keyed rollup, a join, and a
    * doc-keyed agg. The persisted relation is (doc, bigram)-distinct,
    * far smaller than the raw bigram stream; like
    * [[graft.similarity.Similarity.embeddingNearDuplicates]], the lazy
    * frame leaves the cache to LRU/`clearCache`. */
  def rareBigramRate(spark: SparkSession, dir: String): DataFrame = {
    val tf = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("_toks"))
      .select(col("doc_id"),
        explode(graft.dedup.Dedup.shinglesOf(col("_toks"), 2)).as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("cnt"))
      .persist()
    val counts = tf.groupBy("bigram").agg(sum(col("cnt")).as("corpus_n"))
    tf.join(counts, "bigram")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(when(col("corpus_n") <= RareMax, col("cnt")).otherwise(0L))
          .as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
        floor(col("n_rare").cast("double") / col("n_bigrams").cast("double")
          * 1000000).as("rare_ratio_e6"))
  }

  /** URL/domain extraction (q75) — the web-corpus domain-filtering pass
    * (allowlist/blocklist by host, per-domain corpus share). The synthetic
    * corpus carries no URLs, so both engines append two deterministic URLs
    * per row first (q40's PII pattern); the per-domain rollup then proves
    * real extraction: scheme-anchored host capture, multiple matches per
    * document, exact per-domain document and occurrence counts. Narrow
    * regex extraction + explode + one hash-agg on a host-cardinality-sized
    * key space. */
  def urlDomains(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), urlAugmentedText.as("_t"))
      .select(col("doc_id"),
        explode(regexp_extract_all(col("_t"), lit(UrlRe), lit(1)))
          .as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))

  // Java∩RE2-safe (no lookaround); group 1 captures the host
  private val UrlRe = "https?://([A-Za-z0-9.-]+)"

  // ONE definition of the deterministic URL augmentation shared by q75 and
  // q81 (Spark side + DuckDB side) — the two gates must test the same
  // corpus, and the Spark/SQL pair must stay byte-identical
  private def urlAugmentedText: org.apache.spark.sql.Column = concat(
    col("text"),
    lit(" see https://site"), (col("doc_id") % 50).cast("string"),
    lit(".example.com/p/"), col("doc_id").cast("string"),
    lit(" and http://cdn"), (col("doc_id") % 7).cast("string"),
    lit(".example.org/x"))
  private val sqlUrlAugmentedText: String =
    """text || ' see https://site' || CAST(doc_id % 50 AS VARCHAR)
            || '.example.com/p/' || CAST(doc_id AS VARCHAR)
            || ' and http://cdn' || CAST(doc_id % 7 AS VARCHAR)
            || '.example.org/x'"""

  // Decomposed combining sequences + a singleton (U+212B ANGSTROM SIGN),
  // each of which NFC rewrites — appended per row so the pure-ASCII
  // corpus actually exercises normalization
  private val NfcVariants =
    Seq("e\u0301", "A\u0300", "o\u0308", "c\u0327", "\u212B")

  /** Unicode NFC normalization (q78) through the native codegen'd
    * [[graft.functions.NfcNormalize]] expression — the canonical-form
    * cleaning step that makes decomposed (`e`+combining accent) and
    * precomposed (`é`) text fingerprint identically before dedup/hashing.
    * Each row gets a decomposed suffix variant; the oracle computes
    * DuckDB's `nfc_normalize` over the identical bytes and compares
    * md5 + codepoint counts. Shuffle-free narrow projection. */
  def unicodeNormalize(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NfcNormalize
    val variant = element_at(array(NfcVariants.map(lit): _*),
      (col("doc_id") % NfcVariants.size).cast("int") + 1)
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        concat(col("text"), lit(" "), variant).as("_raw"))
      .select(col("doc_id"),
        (NfcNormalize(col("_raw")) =!= col("_raw")).as("changed"),
        md5(NfcNormalize(col("_raw"))).as("norm_md5"),
        length(col("_raw")).cast("long").as("len_before"),
        length(NfcNormalize(col("_raw"))).cast("long").as("len_after"))
  }

  // Precomposed accented variants (compile-time \uXXXX escapes — raw
  // UTF-8 in source can be silently NFC'd by tooling), each of which
  // diacritic folding strips to bare ASCII
  private val AccentVariants = Seq(
    "caf\u00e9", "ma\u00f1ana", "\u00fcber", "\u00e0", "\u010deko")

  /** Diacritic folding (q110) through the native codegen'd
    * [[graft.functions.DiacriticFold]] expression — the accent-
    * INSENSITIVE half of text canonicalization (q78's NFC preserves
    * accents; folding removes them), the match-key step for dedup and
    * entity resolution on multilingual corpora. Each row gets a
    * precomposed accented suffix; the oracle computes DuckDB's
    * `strip_accents` over identical bytes (chr()-constructed) and
    * compares md5 + codepoint counts. Shuffle-free narrow projection. */
  def diacriticFold(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DiacriticFold
    val variant = element_at(array(AccentVariants.map(lit): _*),
      (col("doc_id") % AccentVariants.size).cast("int") + 1)
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        concat(col("text"), lit(" "), variant).as("_raw"))
      .select(col("doc_id"),
        (DiacriticFold(col("_raw")) =!= col("_raw")).as("changed"),
        md5(DiacriticFold(col("_raw"))).as("folded_md5"),
        length(col("_raw")).cast("long").as("len_before"),
        length(DiacriticFold(col("_raw"))).cast("long").as("len_after"))
  }

  // q109 chunking geometry, interpolated into BOTH sides
  private val ChunkTokens = 32
  private val ChunkStride = 24

  /** Fixed-token-window document chunking (q109): every document's token
    * sequence split into windows of [[ChunkTokens]] tokens at stride
    * [[ChunkStride]] (8-token overlap) — the context-window chunking
    * step every RAG/pretraining pipeline runs between cleaning and
    * embedding. Distinct from q42's token PACKING (bin-packing whole
    * docs into budgets): chunking SPLITS single documents. Pure
    * codegen'd array ops (sequence → posexplode → slice), shuffle-free;
    * each chunk exports its geometry plus an md5 so a boundary
    * off-by-one anywhere fails the gate. */
  def tokenChunks(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(trim(col("text"))) =!= 0)
      .select(col("doc_id"), tokens(col("text")).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        posexplode(expr(s"sequence(1, size(_toks), $ChunkStride)"))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        expr(s"slice(_toks, start, $ChunkTokens)").as("_chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("_chunk")).cast("long").as("n_tokens"),
        element_at(col("_chunk"), 1).as("first_tok"),
        element_at(col("_chunk"), -1).as("last_tok"),
        md5(array_join(col("_chunk"), " ")).as("chunk_md5"))

  // q79 carve size, interpolated into BOTH sides
  private val EvalK = 50

  /** Deterministic exact-k eval-set carving (q79): exactly `EvalK` docs
    * per language stratum, chosen by a stable content hash — the "hold
    * out a fixed eval set" step. Unlike q32's RATE sampling (expected
    * fraction, count varies), this pins the exact count per stratum, and
    * the hash order makes the same docs win on any engine, any run, any
    * layout. One shuffle (per-stratum window); stratum cardinality is
    * small, so per-stratum ordering parallelizes across strata — for a
    * single giant stratum the q70 shard trick applies instead. */
  def evalCarve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = wordHash(concat(lit("evalk:"), col("doc_id").cast("string")))
    val w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), h.as("hv"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= EvalK)
      .select(col("doc_id"), col("lang"), col("rk"))
  }

  /** Per-domain quality rollup (q81) — the decision table behind a domain
    * allowlist: every URL host joined to its document's q17 quality score,
    * rolled up to exact per-domain occurrence counts and an integer mean
    * quality (sum of e6 scores // count — no FP averaging). ONE corpus
    * scan: score and domains are computed in the same narrow projection
    * and exploded before the single hash-agg; no self-join anywhere. */
  def domainQuality(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        floor(qualityScore(col("text")) * 1000000).as("quality_e6"),
        urlAugmentedText.as("_t"))
      .select(col("quality_e6"),
        explode(regexp_extract_all(col("_t"), lit(UrlRe), lit(1)))
          .as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        sum(col("quality_e6")).as("sum_quality_e6"))
      .select(col("domain"), col("n_urls"), col("sum_quality_e6"),
        // integer DIV, not FP divide-then-cast: exact on any magnitude
        expr("sum_quality_e6 DIV n_urls").as("avg_quality_e6"))

  // Java∩RE2-safe: no lookaround, bounded char classes
  private val TagRe = "<[^>]*>"

  /** HTML/boilerplate stripping (q80) — the markup-removal pass every
    * web-corpus pipeline runs before text analysis. Rows are wrapped in a
    * deterministic HTML scaffold (q40's augmentation pattern — the
    * synthetic corpus carries no markup), then tags are stripped and the
    * common entities decoded; the oracle re-runs the identical regex
    * chain and compares md5 + exact tag counts + markup ratio.
    * Shuffle-free narrow projection. */
  def htmlStrip(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      lit("<html><head><title>T"), col("doc_id").cast("string"),
      lit("</title></head><body><p>"), col("text"),
      lit("</p><a href=\"http://a.example.com/x\">link</a>&amp;&nbsp;</body></html>"))
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), raw.as("_t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("_t"), lit(TagRe), lit(0)))
          .cast("long").as("n_tags"),
        md5(regexp_replace(regexp_replace(regexp_replace(
          col("_t"), TagRe, " "), "&amp;", "&"), "&nbsp;", " "))
          .as("stripped_md5"),
        floor((length(col("_t")) -
          length(regexp_replace(col("_t"), TagRe, ""))).cast("double") /
          length(col("_t")).cast("double") * 1000000).as("markup_ratio_e6"))
  }

  /** q324 thresholds (jusText's shape, deterministic integers): a block
    * whose anchor-text share exceeds the link-density bound is
    * boilerplate outright; shorter-than-minimum blocks defer to
    * context; otherwise stopword density decides. */
  private val BoilerLinkE6 = 400000L
  private val BoilerMinWords = 8
  private val BoilerStopE6 = 20000L
  private val BlockTagRe = "</?(p|div|nav|footer)[^>]*>"
  private val AnchorRe = "<a[^>]*>([^<]*)</a>"

  /** q324 — BOILERPLATE BLOCK CLASSIFICATION (the jusText/trafilatura
    * discipline — the block-level pass every web-scale pretraining
    * corpus runs between raw HTML and text analysis; q80 strips
    * markup, this DECIDES WHICH BLOCKS ARE CONTENT): documents are
    * wrapped in a deterministic multi-block HTML scaffold (nav menu,
    * two content paragraphs, link-dense sidebar, short footer — the
    * q40/q80 augmentation pattern, since the synthetic corpus carries
    * no markup), segmented on block-level tags, and each block is
    * classified from three exact-integer features:
    *
    *  - LINK DENSITY (anchor-text chars ∕ text chars, e6 integer DIV):
    *    above [[BoilerLinkE6]] → bad, the nav/sidebar signature;
    *  - LENGTH: under [[BoilerMinWords]] words → `short`, deferred to
    *    context (jusText's near-good rule): a short block is content
    *    iff its nearest non-short neighbor on EITHER side is — two
    *    IGNORE-NULLS window walks, co-partitioned by document;
    *  - STOPWORD DENSITY (the q16 language-stopword regex, e6 DIV):
    *    at/above [[BoilerStopE6]] → good, else bad — function words
    *    are what separates prose from keyword-stuffed boilerplate.
    *
    * Per document: block counts by final class, the content word
    * total, the boilerplate word share, and the md5 of the extracted
    * content (good blocks' normalized text in document order) — the
    * artifact a downstream pipeline actually consumes. Scale shape:
    * one narrow projection + one bounded explode (blocks per doc is
    * scaffold-constant), two windows and one hash-agg, all
    * co-partitioned by doc_id after the explode's shuffle; no join
    * anywhere. The oracle replays the scaffold, the segmentation, all
    * three densities, the context propagation and the content md5. */
  def boilerplateBlocks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokens(col("text"))
    val h = ((size(t) + 1) / 2).cast("int")
    val raw = concat(
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/contact\">Contact</a> <a href=\"/login\">Login</a>" +
        "</nav><p>"),
      array_join(slice(t, lit(1), h), " "),
      lit("</p><div><a href=\"/m\">more</a> read " +
        "<a href=\"/l\">links</a> here</div><p>"),
      array_join(slice(t, h + 1, size(t) - h), " "),
      lit("</p><footer>copyright 2024 example corp rights reserved" +
        "</footer>"))
    val blocks = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), posexplode(split(raw, BlockTagRe))
        .as(Seq("pos", "block")))
      .select(col("doc_id"), col("pos"), col("block"),
        trim(regexp_replace(regexp_replace(col("block"), TagRe, " "),
          "\\s+", " ")).as("txt"))
      .filter(length(col("txt")) > 0)
      .select(col("doc_id"), col("pos"), col("txt"),
        length(concat_ws("", regexp_extract_all(col("block"),
          lit(AnchorRe), lit(1)))).as("link_chars"),
        size(split(col("txt"), " ")).cast("long").as("n_words"),
        size(regexp_extract_all(col("txt"),
          lit(stopwordPattern("en")), lit(0))).cast("long")
          .as("stop_hits"))
      .select(col("doc_id"), col("pos"), col("txt"), col("n_words"),
        expr("CASE WHEN link_chars * 1000000 DIV length(txt) " +
          s"> $BoilerLinkE6 THEN 'bad' " +
          s"WHEN n_words < $BoilerMinWords THEN 'short' " +
          s"WHEN stop_hits * 1000000 DIV n_words >= $BoilerStopE6 " +
          "THEN 'good' ELSE 'bad' END").as("cls0"))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val nonShort = when(col("cls0") =!= "short", col("cls0"))
    val classified = blocks
      .withColumn("prev_ns", last(nonShort, ignoreNulls = true)
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("next_ns", first(nonShort, ignoreNulls = true)
        .over(byDoc.rowsBetween(1, Window.unboundedFollowing)))
      .withColumn("cls", when(col("cls0") =!= "short", col("cls0"))
        .otherwise(when(col("prev_ns") === "good" ||
          col("next_ns") === "good", "good").otherwise("bad")))
    classified.groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("cls") === "good", 1L).otherwise(0L)).as("n_good"),
        sum(when(col("cls") === "bad", 1L).otherwise(0L)).as("n_bad"),
        sum(when(col("cls") === "good", col("n_words"))
          .otherwise(0L)).as("content_words"),
        sum(col("n_words")).as("total_words"),
        md5(array_join(transform(array_sort(collect_list(
          when(col("cls") === "good", struct(col("pos"), col("txt"))))),
          x => x.getField("txt")), " ")).as("content_md5"))
      .select(col("doc_id"), col("n_blocks"), col("n_good"),
        col("n_bad"), col("content_words"),
        expr("(total_words - content_words) * 1000000 DIV total_words")
          .as("boiler_ratio_e6"),
        col("content_md5"))
  }

  /** Oracle for q324: the scaffold, segmentation, densities, context
    * windows and content digest replayed verbatim in DuckDB. */
  private def boilerplateOracle: String = s"""
      WITH docs AS (
        SELECT doc_id, ${sqlTokens("text")} AS t
        FROM documents WHERE length(trim(text)) > 0),
      raws AS (
        SELECT doc_id,
          '<nav><a href="/">Home</a> <a href="/about">About</a> ' ||
          '<a href="/contact">Contact</a> <a href="/login">Login</a>' ||
          '</nav><p>' ||
          array_to_string(list_slice(t, 1, (len(t) + 1) // 2), ' ') ||
          '</p><div><a href="/m">more</a> read ' ||
          '<a href="/l">links</a> here</div><p>' ||
          array_to_string(
            list_slice(t, (len(t) + 1) // 2 + 1, len(t)), ' ') ||
          '</p><footer>copyright 2024 example corp rights reserved' ||
          '</footer>' AS raw
        FROM docs),
      segs AS (
        SELECT doc_id, i AS pos, l[i] AS block
        FROM (SELECT doc_id,
                string_split_regex(raw, '$BlockTagRe') AS l,
                unnest(range(1, len(string_split_regex(raw,
                  '$BlockTagRe')) + 1)) AS i
              FROM raws)),
      feats AS (
        SELECT doc_id, pos, txt,
          CAST(len(array_to_string(regexp_extract_all(block,
            '$AnchorRe', 1), '')) AS BIGINT) AS link_chars,
          CAST(len(string_split(txt, ' ')) AS BIGINT) AS n_words,
          CAST(len(regexp_extract_all(txt,
            '${stopwordPattern("en")}')) AS BIGINT) AS stop_hits
        FROM (SELECT doc_id, pos, block,
                trim(regexp_replace(regexp_replace(block,
                  '$TagRe', ' ', 'g'), '\\s+', ' ', 'g')) AS txt
              FROM segs)
        WHERE len(txt) > 0),
      pre AS (
        SELECT doc_id, pos, txt, n_words,
          CASE WHEN link_chars * 1000000 // len(txt) > $BoilerLinkE6
              THEN 'bad'
            WHEN n_words < $BoilerMinWords THEN 'short'
            WHEN stop_hits * 1000000 // n_words >= $BoilerStopE6
              THEN 'good'
            ELSE 'bad' END AS cls0
        FROM feats),
      ctx AS (
        SELECT doc_id, pos, txt, n_words, cls0,
          last_value(CASE WHEN cls0 <> 'short' THEN cls0 END
            IGNORE NULLS) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prev_ns,
          first_value(CASE WHEN cls0 <> 'short' THEN cls0 END
            IGNORE NULLS) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS next_ns
        FROM pre),
      fin AS (
        SELECT doc_id, pos, txt, n_words,
          CASE WHEN cls0 <> 'short' THEN cls0
            WHEN prev_ns = 'good' OR next_ns = 'good' THEN 'good'
            ELSE 'bad' END AS cls
        FROM ctx)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        CAST(SUM(CASE WHEN cls = 'good' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_good,
        CAST(SUM(CASE WHEN cls = 'bad' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_bad,
        CAST(SUM(CASE WHEN cls = 'good' THEN n_words ELSE 0 END)
          AS BIGINT) AS content_words,
        CAST((SUM(n_words) - SUM(CASE WHEN cls = 'good' THEN n_words
          ELSE 0 END)) * 1000000 // SUM(n_words) AS BIGINT)
          AS boiler_ratio_e6,
        md5(COALESCE(string_agg(CASE WHEN cls = 'good' THEN txt END,
          ' ' ORDER BY pos), '')) AS content_md5
      FROM fin GROUP BY doc_id"""

  /** q326 span length (tokens) and the eval-slice modulus. */
  private val SpanK = 8
  private val SpanEvalMod = 17

  /** q326 — EXACT-SUBSTRING SPAN DECONTAMINATION (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * production discipline for benchmark leakage: REMOVE every
    * ≥k-token span a training document shares with the held-out set,
    * instead of q43's document-level contamination flag; span surgery
    * keeps the rest of the document, which at pretraining scale is
    * the difference between losing spans and losing corpora):
    *
    *  - the eval slice (`doc_id % 17 = 0`) contributes its distinct
    *    k-grams (k = [[SpanK]] whitespace tokens, matched as exact
    *    joined strings — at 100 TB the equi-join key becomes the q15
    *    rolling hash with a string verify, same shape);
    *  - every train-doc k-gram start that equi-joins the BROADCAST
    *    eval set marks the token interval [i, i+k); overlapping
    *    intervals merge (running-max window per doc — the classic
    *    interval union, co-partitioned after one shuffle);
    *  - removed positions subtract by anti-join and the surviving
    *    tokens reassemble in order — cleaned text digest, token
    *    counts, and merged-span counts per train document (clean docs
    *    attest untouched: digest of the full text, zero spans).
    *
    * Scale shape: one bounded k-gram explode over train docs, one
    * broadcast join against the KB eval synopsis, windows and joins
    * all keyed by doc_id — no all-pairs, no global sort. The oracle
    * replays slicing, matching, interval merge, and the digest. */
  def spanDecontamination(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
    val kgrams = (d: DataFrame) => d.filter(col("n") >= SpanK)
      .select(col("doc_id"),
        explode(sequence(lit(1), (col("n") - (SpanK - 1)).cast("int")))
          .as("i"), col("toks"))
      .select(col("doc_id"), col("i"),
        array_join(slice(col("toks"), col("i"), lit(SpanK)), " ")
          .as("kg"))
    val evalSet = kgrams(docs.filter(col("doc_id") % SpanEvalMod === 0))
      .select(col("kg")).distinct()
    val train = docs.filter(col("doc_id") % SpanEvalMod =!= 0)
    val starts = kgrams(train).join(broadcast(evalSet), "kg")
      .select(col("doc_id"), col("i"))
    val removed = starts
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (SpanK - 1))).as("p"))
      .distinct()
    val nRemoved = removed.groupBy("doc_id")
      .agg(count(lit(1)).as("n_removed"))
    val prevEnd = max(col("i") + (SpanK - 1)).over(Window
      .partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1))
    val nSpans = starts.withColumn("pe", prevEnd)
      .select(col("doc_id"),
        when(col("pe").isNull || col("i") > col("pe"), 1L).otherwise(0L)
          .as("fresh"))
      .groupBy("doc_id").agg(sum(col("fresh")).as("n_spans"))
    val kept = train
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
      .withColumn("p", col("p0") + 1)
      .join(removed, Seq("doc_id", "p"), "left_anti")
    val cleaned = kept.groupBy("doc_id")
      .agg(md5(array_join(transform(array_sort(collect_list(
        struct(col("p"), col("tok")))), x => x.getField("tok")), " "))
        .as("cleaned_md5"))
    train.select(col("doc_id"), col("n").as("n_tokens"))
      .join(nRemoved, Seq("doc_id"), "left")
      .join(nSpans, Seq("doc_id"), "left")
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("cleaned_md5"), md5(lit(""))).as("cleaned_md5"))
  }

  /** Oracle for q326: slicing, eval-set matching, interval merge and
    * the cleaned digest replayed verbatim. */
  private def spanDecontaminationOracle: String = s"""
      WITH docs AS (
        SELECT doc_id, ${sqlTokens("text")} AS l,
          CAST(len(${sqlTokens("text")}) AS BIGINT) AS n
        FROM documents WHERE length(trim(text)) > 0),
      ev AS (
        SELECT DISTINCT array_to_string(list_slice(l, i, i + ${SpanK - 1}),
          ' ') AS kg
        FROM (SELECT l, unnest(range(1, n - ${SpanK - 2})) AS i
              FROM docs WHERE doc_id % $SpanEvalMod = 0 AND n >= $SpanK)),
      train AS (SELECT * FROM docs WHERE doc_id % $SpanEvalMod <> 0),
      starts AS (
        SELECT g.doc_id, g.i
        FROM (SELECT doc_id,
                array_to_string(list_slice(l, i, i + ${SpanK - 1}), ' ')
                  AS kg, i
              FROM (SELECT doc_id, l,
                      unnest(range(1, n - ${SpanK - 2})) AS i
                    FROM train WHERE n >= $SpanK)) g
        JOIN ev ON ev.kg = g.kg),
      removed AS (
        SELECT DISTINCT doc_id, unnest(range(i, i + $SpanK)) AS p
        FROM starts),
      nrem AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed
        FROM removed GROUP BY doc_id),
      nspan AS (
        SELECT doc_id, CAST(SUM(CASE WHEN pe IS NULL OR i > pe THEN 1
          ELSE 0 END) AS BIGINT) AS n_spans
        FROM (SELECT doc_id, i, max(i + ${SpanK - 1}) OVER (
                PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
              FROM starts)
        GROUP BY doc_id),
      toks AS (
        SELECT doc_id, p, l[p] AS tok
        FROM (SELECT doc_id, l, unnest(range(1, n + 1)) AS p FROM train)),
      kept AS (
        SELECT t.doc_id, t.p, t.tok
        FROM toks t ANTI JOIN removed r
          ON r.doc_id = t.doc_id AND r.p = t.p),
      cleaned AS (
        SELECT doc_id,
          md5(COALESCE(string_agg(tok, ' ' ORDER BY p), ''))
            AS cleaned_md5
        FROM kept GROUP BY doc_id)
      SELECT tr.doc_id, tr.n AS n_tokens,
        COALESCE(nrem.n_removed, 0) AS n_removed,
        COALESCE(nspan.n_spans, 0) AS n_spans,
        COALESCE(cleaned.cleaned_md5, md5('')) AS cleaned_md5
      FROM train tr
      LEFT JOIN nrem ON nrem.doc_id = tr.doc_id
      LEFT JOIN nspan ON nspan.doc_id = tr.doc_id
      LEFT JOIN cleaned ON cleaned.doc_id = tr.doc_id"""

  /** C4-style repetition filter signals: top-word share of each document
    * (high share ⇒ boilerplate/spam). One explode + two aggregations. */
  def repetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val counts = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    counts.groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_words"), max(col("cnt")).as("top_count"))
      .select(col("doc_id"), col("n_words"), col("top_count"),
        floor(col("top_count").cast("double") / col("n_words").cast("double")
          * 1000000).as("rep_ratio_e6"),
        (col("top_count").cast("double") / col("n_words").cast("double") > 0.2)
          .as("flag_repetitive"))
  }

  /** Sequence packing for training batches: greedy sequential packing of
    * documents into fixed token budgets, sharded so the running sum is a
    * per-shard window (one shuffle on the shard key; a global ordering
    * would serialize on a single partition). A doc's pack is determined by
    * the tokens accumulated before it within its shard — deterministic and
    * replayable on any cluster layout. */
  // q42 parameters, interpolated into BOTH the Spark plan and the oracle
  // so they cannot drift apart
  private val PackShards = 8
  private val PackBudget = 2048

  def tokenPacking(spark: SparkSession, dir: String, shards: Int = PackShards,
      budget: Int = PackBudget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prefix = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards)).as("shard"),
        wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("prefix_tokens",
        coalesce(sum(col("n_tokens")).over(prefix), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("prefix_tokens") / lit(budget.toDouble)).cast("long")
          .as("pack_id"))
  }

  /** Corpus-wide top-k word bigrams: explode 2-shingles, hash-aggregate,
    * take the global top 50 (compiles to TakeOrderedAndProject over the
    * partial-agg output, not a full sort). Deterministic tiebreak on the
    * bigram text (pure-ASCII corpus ⇒ binary collation agrees across
    * engines). */
  def topBigrams(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      // tokens land in their own projection: inlining them into the
      // shingle lambda re-evaluates the split per position (O(n²))
      .select(tokens(col("text")).as("_toks"))
      .select(explode(graft.dedup.Dedup.shinglesOf(col("_toks"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("bigram")).limit(50)

  /** TF-IDF top-k terms per document. Classic shape: per-(doc, term)
    * counts (one shuffle), document frequency over the tf relation (one
    * more), a term-keyed join — the df side is vocabulary-sized, far
    * smaller than the tf relation — and a per-doc top-k window. The corpus
    * size joins in as a broadcast 1-row aggregate, not a driver action.
    * Ranking is on EXACT INTEGER keys (tf DESC, df ASC, term ASC) — for a
    * fixed doc, higher tf then rarer term is tfidf-monotone per component
    * and, unlike ordering on the double itself, cannot diverge across
    * engines: ln carries no IEEE correct-rounding guarantee (ADVICE r03),
    * so floor(tfidf·1e6) and a tfidf-ORDER tiebreak could flip on another
    * libm. The tfidf double is instead ATTESTED (q54/q56 pattern): each
    * engine checks exp(tfidf/tf)·df/N ≈ 1 within 1e-6 relative — true iff
    * the value really is tf·ln(N/df) under any conforming libm — and the
    * booleans hash-compare. */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
    // tf feeds BOTH the df aggregation and the join; no persist needed —
    // both references sit in one query above the same shuffle, so
    // ReusedExchange shares the materialized tf map output (measured:
    // identical time with and without a cache)
    val tf = docs
      .select(col("doc_id"), tokens(col("text")).as("_toks"))
      .select(col("doc_id"), explode(col("_toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf").cast("double") *
        log(col("n_docs").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("tf"), col("df"), col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        (abs(exp(col("tfidf") / col("tf").cast("double"))
          * col("df").cast("double") / col("n_docs").cast("double")
          - 1.0) < 0.000001).as("tfidf_ok"))
  }

  // PII patterns restricted to syntax Java regex and RE2 evaluate
  // identically (character classes + bounded repeats; no lookaround,
  // which RE2 lacks)
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"

  /** PII scrubbing: count and mask email/phone occurrences. The synthetic
    * corpus carries no PII, so both sides append a deterministic contact
    * string per row first — the oracle then verifies real replacements,
    * not a no-op. Scrubbed text is exported as md5 to keep the dump
    * small. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or 555-867-530"),
        (col("doc_id") % 10).cast("string")).as("_t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("_t"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("_t"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("_t"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("scrubbed_md5"))

  /** BPE merge iterations for q145; interpolated into BOTH sides (the
    * oracle CTE chain replays the same count). */
  val BpeIters = 3

  /** q145 — BPE tokenizer TRAINING: learn the first [[BpeIters]] merge
    * rules from the corpus (the Sennrich et al. algorithm that every
    * production tokenizer trainer runs before a model ever sees data).
    *
    * The training relation is the WORD-FREQUENCY table, not the corpus —
    * the corpus is scanned once, then every iteration is O(vocab), which
    * is how HF `tokenizers` scales too (Zipf: vocab ≪ corpus). One
    * iteration = weighted adjacent-pair counts over the symbol
    * sequences → argmax pair (cnt desc, pair asc — deterministic) →
    * greedy leftmost merge applied to every word.
    *
    * The merge step is the subtle part: BPE applies a merge left-to-
    * right non-overlapping, exactly the semantics of SQL `replace` —
    * EXCEPT that adjacent matches share their separator space. Doubling
    * the separators first (' '→'  ') gives each boundary its own space
    * on both sides, so plain replace-all is exact greedy BPE, engine-
    * portably (no lookbehind, which RE2 lacks). Each output row attests
    * the applied merge end-to-end: `symbols_after` must drop by exactly
    * the count of NON-OVERLAPPING applied occurrences, over the whole
    * corpus, or the hash fails.
    *
    * Scale shape: one corpus tokenize pass → vocab-sized aggregate;
    * per-iteration pair counts are a vocab-sized shuffle; the argmax is
    * TakeOrderedAndProject; the 1-row merge rule re-enters as a
    * broadcast cross join (never a driver constant). */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeLoop(spark, dir)._2

  /** q286 — BPE corpus ENCODING with the trained merge table (the pass
    * that actually tokenizes a training dataset: q145/q194 learn the
    * rules, this APPLIES them to every document). The scale discipline
    * is per-DISTINCT-word encoding: merges apply over the word
    * vocabulary (Zipf: vocab ≪ corpus — HF `tokenizers` caches word
    * encodings the same way), then one equi-join carries each word's
    * encoding back to its corpus positions; corpus-side cost is the
    * join, never the merge chain. Each rank-ordered rule re-enters as a
    * broadcast 1-row cross join (the q145 rule: never a driver
    * constant), applied with the same doubled-separator replace that
    * makes greedy leftmost non-overlapping merging engine-portable.
    * Output per document: word count, BPE token count, and an
    * order-insensitive digest of the encoded word multiset — a
    * mis-merged single word anywhere in the corpus shifts its doc's
    * digest and fails the hash gate. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis.wordHash
    val rules = bpeLoop(spark, dir)._3
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(trim(col("text"))) > 0)
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    var uniq = toks.select(col("tok")).distinct()
      .select(col("tok"),
        trim(regexp_replace(col("tok"), "(.)", "$1 ")).as("seq"))
    rules.foreach { rule =>
      uniq = uniq.crossJoin(broadcast(rule))
        .select(col("tok"), expr("""trim(replace(replace(
            ' ' || replace(seq, ' ', '  ') || ' ',
            ' ' || a || '  ' || b || ' ',
            ' ' || a || b || ' '), '  ', ' '))""").as("seq"))
    }
    toks.join(uniq, Seq("tok"))
      .select(col("doc_id"),
        size(split(col("seq"), " ")).cast("long").as("_n"),
        wordHash(col("seq")).as("_h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("_n").as("n_tokens"),
        sum("_h").as("words_digest"))
  }

  /** q292 — TRIGRAM SELF-ENTROPY quality scoring (the compression-based
    * gibberish/repetition signal beside q198's cross-model perplexity:
    * a document's Shannon code length under its OWN char-trigram
    * distribution — highly repetitive text codes in few bits per
    * trigram, keyboard mash in many; both Gopher-style rule sets and
    * dedup pipelines use exactly this axis). Cost per distinct trigram
    * is the EXACT whole-bit code length ceil(log2(N/c))
    * ([[graft.text.TextAnalysis.ceilLog2Ratio]] — FP only seeds, shift
    * comparisons decide), so totals and the milli-bits-per-trigram
    * ranking field hash-compare bitwise.
    *
    * Scale shape: one narrow trigram expansion (3× chars), a
    * (doc, trigram)-keyed count with map-side combine, a doc-keyed
    * total and join — all co-partitioned by doc after the first
    * shuffle; no global ordering anywhere. */
  def trigramCodeLength(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis.ceilLog2Ratio
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(col("text")) >= 3)
    val counts = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
        .as("tri"))
      .groupBy("doc_id", "tri").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("doc_id").agg(sum("c").as("n_tri"))
    counts.join(totals, Seq("doc_id"))
      .withColumn("_bits",
        col("c") * ceilLog2Ratio(col("n_tri"), col("c")).cast("long"))
      .groupBy("doc_id")
      .agg(first(col("n_tri")).as("n_tri"), sum("_bits").as("bits"))
      .withColumn("millibits_per_tri", expr("(bits * 1000) DIV n_tri"))
  }

  private def trigramEntropyOracle: String = {
    val seed = sqlCeilLog2Seed("n_tri", "c")
    s"""
      WITH d AS (
        SELECT doc_id, text FROM documents WHERE length(text) >= 3),
      pos AS (
        SELECT doc_id, text,
          unnest(range(1, length(text) - 1)) AS i
        FROM d),
      tri AS (SELECT doc_id, substr(text, CAST(i AS INT), 3) AS tri
        FROM pos),
      counts AS (
        SELECT doc_id, tri, COUNT(*) AS c FROM tri GROUP BY 1, 2),
      tot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tri
        FROM counts GROUP BY 1),
      seeded AS (
        SELECT counts.doc_id, c, n_tri, $seed AS k0
        FROM counts JOIN tot ON tot.doc_id = counts.doc_id),
      costed AS (
        SELECT doc_id, n_tri,
          c * (${sqlCeilLog2FromSeed("n_tri", "c", "k0")}) AS bits_t
        FROM seeded)
      SELECT doc_id, max(n_tri) AS n_tri,
        CAST(SUM(bits_t) AS BIGINT) AS bits,
        (CAST(SUM(bits_t) AS BIGINT) * 1000) // max(n_tri)
          AS millibits_per_tri
      FROM costed GROUP BY 1"""
  }

  private def bpeEncodeOracle: String = {
    val encodeStages = (1 to BpeIters).map { i =>
      s"""u$i AS (
        SELECT tok, trim(replace(replace(
            ' ' || replace(seq, ' ', '  ') || ' ',
            ' ' || a || '  ' || b || ' ',
            ' ' || a || b || ' '), '  ', ' ')) AS seq
        FROM u${i - 1}, t$i)"""
    }.mkString(",\n      ")
    s"""
      $bpeCtes,
      d AS (
        SELECT doc_id, unnest(${sqlTokens("text")}) AS tok
        FROM documents WHERE length(trim(text)) > 0),
      u0 AS (
        SELECT DISTINCT tok,
          trim(regexp_replace(tok, '(.)', '\\1 ', 'g')) AS seq
        FROM d),
      $encodeStages
      SELECT d.doc_id, COUNT(*) AS n_words,
        CAST(SUM(len(string_split(u.seq, ' '))) AS BIGINT) AS n_tokens,
        CAST(SUM(${sqlWordHash("u.seq")}) AS BIGINT) AS words_digest
      FROM d JOIN u$BpeIters u USING (tok)
      GROUP BY d.doc_id"""
  }

  /** Shared BPE merge loop: returns (final word-frequency relation after
    * [[BpeIters]] merges, per-iteration merge-rule attestation rows,
    * the per-iteration 1-row rule frames in rank order). q145 grades the
    * rules; q146 grades the encoded vocabulary; q286 APPLIES the rules
    * to encode the corpus. */
  private def bpeLoop(spark: SparkSession,
                      dir: String): (DataFrame, DataFrame, Seq[DataFrame]) = {
    val seqCol = trim(regexp_replace(col("tok"), "(.)", "$1 "))
    var words = Tables(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .select(seqCol.as("seq"), col("freq"))
    var out: DataFrame = null
    val rules = Seq.newBuilder[DataFrame]
    for (i <- 1 to BpeIters) {
      val t = split(col("seq"), " ")
      val pairs = words
        .select(col("freq"), explode(zip_with(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (x, y) => concat(x, lit(" "), y))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      val top = pairs.orderBy(desc("cnt"), asc("pair")).limit(1)
        .select(split(col("pair"), " ").getItem(0).as("a"),
          split(col("pair"), " ").getItem(1).as("b"), col("cnt"))
      words = words.crossJoin(broadcast(top))
        .select(expr("""trim(replace(replace(
            ' ' || replace(seq, ' ', '  ') || ' ',
            ' ' || a || '  ' || b || ' ',
            ' ' || a || b || ' '), '  ', ' '))""").as("seq"), col("freq"))
      val stats = words.agg(
        sum(col("freq") * size(split(col("seq"), " "))).as("symbols_after"))
      val row = top.crossJoin(broadcast(stats))
        .select(lit(i).as("iter"), col("a"), col("b"), col("cnt"),
          col("symbols_after"))
      out = if (out == null) row else out.unionByName(row)
      rules += top.select(col("a"), col("b"))
    }
    (words, out, rules.result())
  }

  /** Vocab budget for q194 and the unroll cap its static oracle carries.
    * The corpus' base character vocabulary is ~24, so budget 36 trains a
    * data-dependent ~17 merges — genuinely "until budget", not a fixed
    * count (a merge can retire a constituent symbol, so vocab does NOT
    * grow by exactly 1 per step: the measured trajectory stalls at 33
    * for three straight merges). The cap bounds the oracle's unrolled
    * CTE chain; training stops at whichever comes first. */
  val BpeVocabBudget = 36
  val BpeBudgetMaxIters = 24

  /** q194 — BPE training TO A VOCAB BUDGET (the production trainer
    * contract: "give me a 32k vocabulary", not "run 3 merges"):
    * generalizes q145's loop to iterate until the encoded corpus'
    * distinct-symbol count reaches [[BpeVocabBudget]]. Same scale shape —
    * the corpus is tokenized ONCE into the word-frequency relation and
    * each iteration is O(vocab): weighted pair counts, deterministic
    * argmax, greedy non-overlapping merge — with the iteration now
    * driver-coordinated (one small agg action per step reads the new
    * vocab size, exactly how HF `tokenizers` coordinates rounds) and the
    * working relation localCheckpointed so lineage stays O(1) deep. Each
    * emitted row attests its merge end-to-end: symbols_after strictly
    * decreases by the applied-occurrence count and vocab_after tracks
    * the ENCODED corpus (applying the learned table is what produces
    * it), so the hash gate pins monotone compression and the final
    * vocab size in one artifact. The oracle unrolls
    * [[BpeBudgetMaxIters]] stages and selects the budget-reaching
    * prefix, replaying the dynamic stopping rule statically. */
  def bpeTrainToBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seqCol = trim(regexp_replace(col("tok"), "(.)", "$1 "))
    var words = Tables(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .select(seqCol.as("seq"), col("freq"))
      .localCheckpoint()
    // Literal-argmax iteration (optimization r18 — results identical,
    // the trajectory is the same deterministic argmax): the 1-row
    // argmax COLLECTS to the driver and re-enters the merge as string
    // LITERALS, so (a) no crossJoin(broadcast) job per step, (b) the
    // emitted attestation rows are literal data — the old lazy
    // `top`/`stats` frames re-executed EVERY iteration's aggregations
    // a second time when the final frame was consumed — and (c) the
    // new-vocab probe and the symbols count fold into ONE agg pass
    // (symbols_after = Σ freq over exploded symbols ≡ Σ freq·len).
    var out = Seq.empty[(Int, String, String, Long, Long, Long)]
    var i = 0
    // fused probe (r19): the per-iteration vocab/symbols job and the
    // next argmax job ride ONE action — probe i carries BOTH iteration
    // i's attestation stats and iteration i+1's merge decision, so each
    // round is one checkpoint + one probe instead of three jobs
    var p = probePairArgmax(words)
    var vocabNow = p._1
    while (vocabNow < BpeVocabBudget && i < BpeBudgetMaxIters &&
        p._3.isDefined) {
      i += 1
      val (a, b, cnt) = p._3.get
      words = words
        .select(mergedSeqCol(a, b, a + b).as("seq"), col("freq"))
        .localCheckpoint()
      p = probePairArgmax(words)
      vocabNow = p._1
      out = out :+ ((i, a, b, cnt, p._2, vocabNow))
    }
    out.toDF("iter", "a", "b", "cnt", "symbols_after", "vocab_after")
  }

  /** ONE-ACTION trainer probe over a (seq, freq) relation: distinct
    * symbols, Σ freq per symbol occurrence (≡ Σ freq·len), and the
    * count-argmax adjacent pair — the stats pass and the argmax pass
    * fused into one job (the 1-row argmax LEFT-joins the 1-row stats
    * agg, so a fully-merged pair-free corpus still reports its vocab;
    * sum over an empty relation is null → 0 mass, not an NPE). */
  private def probePairArgmax(words: DataFrame)
      : (Long, Long, Option[(String, String, Long)]) = {
    val t = split(col("seq"), " ")
    val top = words
      .select(col("freq"), explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (x, y) => concat(x, lit(" "), y))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(desc("cnt"), asc("pair")).limit(1)
    val r = words
      .select(col("freq"), explode(split(col("seq"), " ")).as("s"))
      .agg(countDistinct(col("s")).as("v"), sum(col("freq")).as("sym"))
      .join(top, lit(true), "left")
      .head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) None else Some {
        val Array(a, b) = r.getString(2).split(" ", 2)
        (a, b, r.getLong(3))
      })
  }

  /** The shared greedy leftmost non-overlapping merge rewrite with the
    * rule as LITERALS (`functions.replace` is literal, never regex — a
    * corpus symbol with regex metacharacters or quotes is inert). */
  private def mergedSeqCol(a: String, b: String, m: String)
      : org.apache.spark.sql.Column = {
    val doubled = concat(lit(" "),
      org.apache.spark.sql.functions.replace(
        col("seq"), lit(" "), lit("  ")), lit(" "))
    trim(org.apache.spark.sql.functions.replace(
      org.apache.spark.sql.functions.replace(
        doubled, lit(s" $a  $b "), lit(s" $m ")),
      lit("  "), lit(" ")))
  }

  /** Oracle for q194: [[bpeCtes]]-shaped stages unrolled to the cap,
    * each with its vocab count; the emitted prefix is every iteration up
    * to and including the first whose vocab reaches the budget (or the
    * cap when none does) — the static replay of the dynamic stop. */
  private def bpeBudgetOracle: String = {
    val stages = (1 to BpeBudgetMaxIters).map { i =>
      val prev = s"w${i - 1}"
      s"""p$i AS (
        SELECT l[i] || ' ' || l[i+1] AS pair, freq
        FROM (SELECT string_split(seq, ' ') AS l, freq,
                unnest(range(1, len(string_split(seq, ' ')))) AS i
              FROM $prev)),
      t$i AS MATERIALIZED (
        SELECT string_split(pair, ' ')[1] AS a,
          string_split(pair, ' ')[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM p$i GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
      w$i AS MATERIALIZED (
        SELECT trim(replace(replace(
            ' ' || replace(seq, ' ', '  ') || ' ',
            ' ' || a || '  ' || b || ' ',
            ' ' || a || b || ' '), '  ', ' ')) AS seq, freq
        FROM $prev, t$i),
      s$i AS (
        -- over the exploded symbols, each contributes its word's freq:
        -- SUM(freq) IS the weighted symbol total
        SELECT CAST(SUM(freq) AS BIGINT) AS symbols_after,
          CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab_after
        FROM (SELECT freq, unnest(string_split(seq, ' ')) AS sym FROM w$i))"""
    }.mkString(",\n      ")
    val sumRows = (1 to BpeBudgetMaxIters).map { i =>
      s"SELECT CAST($i AS INTEGER) AS iter, a, b, cnt, symbols_after, vocab_after FROM t$i, s$i"
    }.mkString("\n      UNION ALL ")
    s"""
      WITH w0 AS MATERIALIZED (
        SELECT trim(regexp_replace(tok, '(.)', '\\1 ', 'g')) AS seq,
          COUNT(*) AS freq
        FROM (SELECT unnest(${sqlTokens("text")}) AS tok FROM documents)
        GROUP BY 1),
      $stages,
      sums AS ($sumRows),
      stop AS (SELECT COALESCE(MIN(iter), $BpeBudgetMaxIters) AS s
        FROM sums WHERE vocab_after >= $BpeVocabBudget)
      SELECT iter, a, b, cnt, symbols_after, vocab_after
      FROM sums, stop WHERE iter <= stop.s"""
  }

  /** Net-new-symbol budget and iteration cap for q320. The budget is
    * RELATIVE to the corpus' base byte vocabulary (vocab0 + 12), so the
    * stopping rule is scale-agnostic; the cap bounds the oracle's
    * unrolled CTE chain. */
  val ByteBpeMerges = 12
  val ByteBpeMaxIters = 22

  /** q320 — BYTE-LEVEL BPE with BYTE FALLBACK (the production
    * GPT-2-style tokenizer form — VERDICT r17 task 5): training and
    * encoding run over UTF-8 BYTES, so the base alphabet is at most 256
    * atoms and NO input is ever OOV — an unseen script simply encodes
    * as its raw bytes (the fallback every real pretraining pipeline
    * relies on; a word-level trainer like q145's cannot represent it).
    *
    * Representation: each token's symbol sequence is its UTF-8 bytes as
    * space-separated HEX PAIRS (`hex(encode(tok))` regexp-split at
    * every 2 chars) — merged symbols are plain concatenations of even-
    * length hex, so every merge stays decodable by construction and the
    * round trip is a string equality, engine-portable to the oracle.
    * Same scale shape as q194: the corpus is tokenized ONCE into the
    * word-frequency relation, every iteration is O(vocab) (weighted
    * pair counts → deterministic argmax → greedy leftmost
    * doubled-separator merge), driver-coordinated to the NET-NEW-symbol
    * budget [[ByteBpeMerges]] above the measured base vocabulary with
    * the working relation localCheckpointed.
    *
    * Attested in the row: `round_trip_exact` (EVERY distinct corpus
    * token's merged symbols concatenate back to exactly its original
    * UTF-8 hex — decode == original bytes), `probe_fallback_exact` (a
    * probe string from a script the corpus never saw encodes through
    * the learned table and still round-trips — pure byte fallback),
    * and `base_vocab` (the oracle recomputes it from its own chain). */
  def byteBpe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hexSeq = (c: org.apache.spark.sql.Column) => trim(regexp_replace(
      hex(encode(c, "UTF-8")), "(..)", "$1 "))
    var words = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .select(col("tok"), hexSeq(col("tok")).as("seq"), col("freq"))
      .localCheckpoint()
    // Literal-argmax iteration — see [[bpeTrainToBudget]]: identical
    // trajectory, one collected 1-row argmax + one fused vocab/symbols
    // agg per step, attestation rows as literal data (no re-execution
    // when the final frame is consumed).
    // fused probe per round (r19) — see [[bpeTrainToBudget]]
    var p = probePairArgmax(words)
    val vocab0 = p._1
    val budget = vocab0 + ByteBpeMerges
    var out = Seq.empty[(Int, String, String, Long, Long, Long)]
    val rules = Seq.newBuilder[(String, String)]
    var i = 0
    var vocabNow = vocab0
    while (vocabNow < budget && i < ByteBpeMaxIters && p._3.isDefined) {
      i += 1
      val (a, b, cnt) = p._3.get
      words = words
        .select(col("tok"), mergedSeqCol(a, b, a + b).as("seq"),
          col("freq"))
        .localCheckpoint()
      p = probePairArgmax(words)
      vocabNow = p._1
      out = out :+ ((i, a, b, cnt, p._2, vocabNow))
      rules += ((a, b))
    }
    // round trip over EVERY distinct corpus token: the merged symbols
    // concatenate back to exactly the original UTF-8 hex
    val roundTripExact = words.filter(
      expr("replace(seq, ' ', '')") =!=
        hex(encode(col("tok"), "UTF-8"))).isEmpty
    // byte fallback: a script the corpus never saw encodes through the
    // SAME learned table and still round-trips exactly — the 1-row
    // probe applies the collected rules as a literal expression chain,
    // one job instead of a crossJoin per rule
    var probeSeq = spark.range(1)
      .select(lit("Ωβ✓語").as("tok"))
      .select(col("tok"), hexSeq(col("tok")).as("seq"))
    rules.result().foreach { case (a, b) =>
      probeSeq = probeSeq
        .select(col("tok"), mergedSeqCol(a, b, a + b).as("seq"))
    }
    val probeExact = probeSeq.filter(
      expr("replace(seq, ' ', '')") =!=
        hex(encode(col("tok"), "UTF-8"))).isEmpty
    out.toDF("iter", "a", "b", "cnt", "symbols_after", "vocab_after")
      .withColumn("base_vocab", lit(vocab0))
      .withColumn("round_trip_exact", lit(roundTripExact))
      .withColumn("probe_fallback_exact", lit(probeExact))
  }

  /** Oracle for q320: the q194 unrolled-stage shape over HEX-PAIR byte
    * sequences — w0 from `hex(encode(tok))`, v0 measuring the base byte
    * vocabulary, per-stage MATERIALIZED pair/argmax/merge/stats CTEs,
    * and the stop rule `vocab_after >= v0 + ByteBpeMerges` replayed
    * statically. The attestation flags are literal `true` (the gate's
    * Spark side computed them; the oracle replays the measurable
    * columns — merge rules, counts, vocab trajectory, base vocab). */
  private def byteBpeOracle: String = {
    val stages = (1 to ByteBpeMaxIters).map { i =>
      val prev = s"w${i - 1}"
      s"""p$i AS (
        SELECT l[i] || ' ' || l[i+1] AS pair, freq
        FROM (SELECT string_split(seq, ' ') AS l, freq,
                unnest(range(1, len(string_split(seq, ' ')))) AS i
              FROM $prev)),
      t$i AS MATERIALIZED (
        SELECT string_split(pair, ' ')[1] AS a,
          string_split(pair, ' ')[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM p$i GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
      w$i AS MATERIALIZED (
        SELECT trim(replace(replace(
            ' ' || replace(seq, ' ', '  ') || ' ',
            ' ' || a || '  ' || b || ' ',
            ' ' || a || b || ' '), '  ', ' ')) AS seq, freq
        FROM $prev, t$i),
      s$i AS (
        SELECT CAST(SUM(freq) AS BIGINT) AS symbols_after,
          CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab_after
        FROM (SELECT freq, unnest(string_split(seq, ' ')) AS sym FROM w$i))"""
    }.mkString(",\n      ")
    val sumRows = (1 to ByteBpeMaxIters).map { i =>
      s"SELECT CAST($i AS INTEGER) AS iter, a, b, cnt, symbols_after, vocab_after FROM t$i, s$i"
    }.mkString("\n      UNION ALL ")
    s"""
      WITH w0 AS MATERIALIZED (
        SELECT trim(regexp_replace(hex(encode(tok)), '(..)', '\\1 ', 'g'))
            AS seq,
          COUNT(*) AS freq
        FROM (SELECT unnest(${sqlTokens("text")}) AS tok FROM documents
              WHERE length(trim(text)) > 0)
        GROUP BY 1),
      v0 AS (
        SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) AS v
        FROM (SELECT unnest(string_split(seq, ' ')) AS sym FROM w0)),
      $stages,
      sums AS ($sumRows),
      stop AS (SELECT COALESCE(MIN(iter), $ByteBpeMaxIters) AS s
        FROM sums, v0 WHERE vocab_after >= v0.v + $ByteBpeMerges)
      SELECT iter, a, b, cnt, symbols_after, vocab_after,
        (SELECT v FROM v0) AS base_vocab,
        true AS round_trip_exact, true AS probe_fallback_exact
      FROM sums, stop WHERE iter <= stop.s"""
  }

  /** Net-new-symbol budget, iteration cap, and max-input-chars cap for
    * q322. The budget is relative to the measured base vocabulary
    * (plain and `##`-continuation forms counted separately, exactly as
    * BERT's vocab file lists them), so the stop rule is scale-agnostic;
    * the word-length cap is HF's `max_input_chars_per_word` discipline
    * — longer words become [UNK] instead of unbounded munch walks. */
  val WordPieceMerges = 7
  val WordPieceMaxIters = 22
  val WordPieceMaxWordLen = 24

  /** q322 — WORDPIECE: likelihood-ratio trainer + maximal-munch encoder
    * (Schuster & Nakajima 2012; the BERT/DistilBERT tokenizer — the
    * third member of the production tokenizer family after q145/q194's
    * word-level BPE and q320's byte-level BPE). Differs from BPE in
    * BOTH halves, which is what earns the separate rung:
    *
    *  - TRAINING merges the pair maximizing the likelihood ratio
    *    `count(ab) / (count(a) · count(b))` — "merge what co-occurs
    *    more than chance", not "merge what is frequent" — over symbols
    *    in BERT's surface form (first piece plain, continuations
    *    `##`-prefixed; a merge concatenates and drops the inner `##`).
    *    The score is ONE double division of exactly-represented int64s
    *    (both engines IEEE-round the identical operation order), ties
    *    broken by pair text, so the oracle replays the argmax bitwise
    *    with no fp-accumulation hazard.
    *  - ENCODING is maximal munch over the FINAL vocab (greedy
    *    longest-match-first, `##` forms at non-initial positions) —
    *    the production WordPiece semantic, NOT a replay of the merge
    *    history. Munch is expressed as DATA, never a per-row linear
    *    vocab scan: candidate substrings of each distinct word
    *    EQUI-join the broadcast vocab keyed by (raw text, continuation
    *    flag) — a hash lookup — the longest match per (word, pos) wins
    *    by window, and a bounded path-follow loop (≤ the word-length
    *    cap, over the DISTINCT-words relation only; the corpus is
    *    never re-walked) assembles the pieces. Words over the cap are
    *    [UNK]; an unseen-script probe munches to [UNK] through the
    *    same data path.
    *
    * Scale shape matches the BPE rungs: the corpus is tokenized ONCE
    * into the word-frequency relation; each training iteration is
    * O(vocab) with the symbol-count relation broadcast into pair
    * scoring; the encoder is O(distinct words × cap) candidate rows
    * hash-joined to the vocab. The gate replays merges, counts, the
    * vocab trajectory, the weighted piece total and the [UNK] mass in
    * DuckDB (recursive-CTE munch); piece-reassembly exactness and the
    * probe's [UNK] are attested Spark-side. */
  def wordPiece(spark: SparkSession, dir: String): DataFrame = {
    val seq0 = concat(substring(col("tok"), 1, 1),
      regexp_replace(expr("substring(tok, 2)"), "(.)", " ##$1"))
    val wfreq = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    var words = wfreq.select(seq0.as("seq"), col("freq")).localCheckpoint()
    // Literal-argmax iteration — see [[bpeTrainToBudget]]: identical
    // trajectory (the collected 1-row argmax IS the same deterministic
    // ratio argmax), one fused vocab/symbols agg per step, attestation
    // rows as literal data with no re-execution at consumption.
    // fused probe per round (r19) — like [[probePairArgmax]] but with
    // the WordPiece likelihood-ratio argmax; the vocab/symbol stats ARE
    // the scoring relation's own aggregate (vocab = |syms|, mass = Σ c),
    // so the separate per-iteration stats job fuses away entirely
    def probe(ws: DataFrame): (Long, Long,
        Option[(String, String, Long, String)]) = {
      val t = split(col("seq"), " ")
      // weighted symbol occurrences — the likelihood ratio's denominator
      val syms = ws
        .select(col("freq"), explode(t).as("sym"))
        .groupBy("sym").agg(sum(col("freq")).as("c"))
      val pairs = ws
        .select(col("freq"), explode(zip_with(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (x, y) => concat(x, lit(" "), y))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
        .withColumn("a", split(col("pair"), " ").getItem(0))
        .withColumn("b", split(col("pair"), " ").getItem(1))
      val top = pairs
        .join(broadcast(syms.select(col("sym").as("a"),
          col("c").as("ca"))), "a")
        .join(broadcast(syms.select(col("sym").as("b"),
          col("c").as("cb"))), "b")
        // ONE double division of exact int64s — identical rounding in
        // the oracle's replay; pair text breaks ties deterministically
        .orderBy((col("cnt") / (col("ca") * col("cb"))).desc, asc("pair"))
        .limit(1)
        .select(col("a"), col("b"), col("cnt"),
          concat(col("a"), regexp_replace(col("b"), "^##", "")).as("m"))
      // stats from the exploded symbols DIRECTLY (not via syms): the
      // banded syms relation already executes twice as the scoring
      // broadcasts; a third execution for stats measured slower than
      // this one-pass partial agg
      val r = ws.select(col("freq"), explode(t).as("s"))
        .agg(countDistinct(col("s")).as("v"), sum(col("freq")).as("sym"))
        .join(top, lit(true), "left")
        .head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) None
        else Some((r.getString(2), r.getString(3), r.getLong(4),
          r.getString(5))))
    }
    var p = probe(words)
    val vocab0 = p._1
    val budget = vocab0 + WordPieceMerges
    var out = Seq.empty[(Int, String, String, Long, Long, Long)]
    val rules = Seq.newBuilder[String]
    var i = 0
    var vocabNow = vocab0
    while (vocabNow < budget && i < WordPieceMaxIters && p._3.isDefined) {
      i += 1
      val (a, b, cnt, m) = p._3.get
      words = words
        .select(mergedSeqCol(a, b, m).as("seq"), col("freq"))
        .localCheckpoint()
      p = probe(words)
      vocabNow = p._1
      out = out :+ ((i, a, b, cnt, p._2, vocabNow))
      rules += m
    }
    // ------- maximal-munch encode over the FINAL vocab -------
    import spark.implicits._
    val baseSyms = wfreq.select(split(seq0, " ").as("ss"))
      .select(explode(col("ss")).as("sym"))
    val vocabDf = baseSyms
      .unionByName(rules.result().toDF("sym"))
      .distinct()
      .select(col("sym"),
        when(col("sym").startsWith("##"), expr("substring(sym, 3)"))
          .otherwise(col("sym")).as("raw"),
        col("sym").startsWith("##").as("cont"))
      .localCheckpoint()
    val maxRaw = vocabDf.agg(max(length(col("raw")))).head().getInt(0)
    val probeTok = "Ωβ✓語"
    val munchWords = wfreq
      .filter(length(col("tok")) <= WordPieceMaxWordLen)
      .unionByName(spark.range(1)
        .select(lit(probeTok).as("tok"), lit(0L).as("freq")))
      .localCheckpoint()
    // candidate substrings EQUI-joined to the vocab: O(words × cap)
    // bounded rows, hash lookup — never a per-row vocab scan
    val cand = munchWords
      .select(col("tok"),
        explode(sequence(lit(1), length(col("tok")))).as("pos"))
      .select(col("tok"), col("pos"), explode(sequence(lit(1),
        least(lit(maxRaw), length(col("tok")) - col("pos") + 1))).as("l"))
      .select(col("tok"), col("pos"), col("l"),
        expr("substring(tok, pos, l)").as("raw"),
        (col("pos") > lit(1)).as("cont"))
    val best = cand.join(broadcast(vocabDf), Seq("raw", "cont"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("tok", "pos").orderBy(desc("l"), asc("sym"))))
      .filter(col("rn") === 1)
      .select(col("tok"), col("pos"), col("l"), col("raw"))
      .localCheckpoint()
    val maxLen = munchWords.agg(max(length(col("tok")))).head().getInt(0)
    var fr = munchWords.select(col("tok"), col("freq"),
      length(col("tok")).as("len"), lit(1).as("pos"),
      lit(0L).as("np"), lit("").as("acc"))
    var done: DataFrame = null
    // Checkpoint every few path-follow rounds, not every round: `best`
    // is an eager leaf and each round adds ONE join to the lineage
    // (linear, not exponential growth), so a thinned checkpoint cadence
    // bounds codegen depth while cutting ~cap eager jobs to ~cap/6.
    val munchRounds = math.min(maxLen, WordPieceMaxWordLen) + 1
    for (r <- 1 to munchRounds) {
      val complete = fr.filter(col("pos") > col("len"))
        .select(col("tok"), col("freq"), col("np"),
          lit(false).as("unk"), (col("acc") === col("tok")).as("ok"))
      val j = fr.filter(col("pos") <= col("len"))
        .join(best, Seq("tok", "pos"), "left")
      val stuck = j.filter(col("l").isNull)
        .select(col("tok"), col("freq"), col("np"),
          lit(true).as("unk"), lit(false).as("ok"))
      val doneStep = complete.unionByName(stuck)
      done = if (done == null) doneStep else done.unionByName(doneStep)
      fr = j.filter(col("l").isNotNull)
        .select(col("tok"), col("freq"), col("len"),
          (col("pos") + col("l")).as("pos"), (col("np") + lit(1L)).as("np"),
          concat(col("acc"), col("raw")).as("acc"))
      if (r % 6 == 0 && r < munchRounds) fr = fr.localCheckpoint()
    }
    val doneAll = done.localCheckpoint()
    val tooLong = wfreq.filter(length(col("tok")) > WordPieceMaxWordLen)
      .agg(coalesce(sum(col("freq")), lit(0L))).head().getLong(0)
    // probe-[UNK] attestation folded into the one stats pass
    val stats = doneAll.agg(
      sum(when(col("unk"), col("freq")).otherwise(lit(0L))).as("unk0"),
      sum(when(!col("unk"), col("freq") * col("np")).otherwise(lit(0L)))
        .as("pieces"),
      sum(when(!col("unk") && !col("ok"), lit(1L)).otherwise(lit(0L)))
        .as("bad"),
      sum(when(col("tok") === probeTok && col("unk"), lit(1L))
        .otherwise(lit(0L))).as("probe_unk")).head()
    val unkMass = stats.getLong(0) + tooLong
    val totalPieces = stats.getLong(1)
    val roundTrip = stats.getLong(2) == 0L
    val probeUnk = stats.getLong(3) == 1L
    out.toDF("iter", "a", "b", "cnt", "symbols_after", "vocab_after")
      .withColumn("base_vocab", lit(vocab0))
      .withColumn("unk_mass", lit(unkMass))
      .withColumn("total_pieces", lit(totalPieces))
      .withColumn("round_trip_exact", lit(roundTrip))
      .withColumn("probe_unk", lit(probeUnk))
  }

  /** Oracle for q322: the q194/q320 unrolled-stage shape with the
    * likelihood-ratio argmax (per-stage symbol-count CTE joined into
    * the pair ranking — ONE double division, same operation order as
    * the Spark side), the stop rule replayed statically, then the
    * maximal-munch encoder replayed as a RECURSIVE path-follow: the
    * stop-prefix vocab keyed by (raw, continuation), candidate
    * substrings equi-joined, longest match per (word, pos) by window,
    * and the walk's weighted piece total and [UNK] mass compared
    * exactly. Piece-reassembly and probe flags are literal `true` (the
    * Spark side attests them; the oracle replays the measurable
    * integers). */
  private def wordPieceOracle: String = {
    val stages = (1 to WordPieceMaxIters).map { i =>
      val prev = s"w${i - 1}"
      s"""sc$i AS (
        SELECT sym, CAST(SUM(freq) AS BIGINT) AS c
        FROM (SELECT freq, unnest(string_split(seq, ' ')) AS sym
              FROM $prev)
        GROUP BY sym),
      p$i AS (
        SELECT l[i] || ' ' || l[i+1] AS pair, freq
        FROM (SELECT string_split(seq, ' ') AS l, freq,
                unnest(range(1, len(string_split(seq, ' ')))) AS i
              FROM $prev)),
      t$i AS MATERIALIZED (
        SELECT string_split(pair, ' ')[1] AS a,
          string_split(pair, ' ')[2] AS b, cnt,
          string_split(pair, ' ')[1] ||
            regexp_replace(string_split(pair, ' ')[2], '^##', '') AS m
        FROM (
          SELECT pc.pair, pc.cnt
          FROM (SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
                FROM p$i GROUP BY pair) pc
          JOIN sc$i sa ON sa.sym = string_split(pc.pair, ' ')[1]
          JOIN sc$i sb ON sb.sym = string_split(pc.pair, ' ')[2]
          ORDER BY pc.cnt / (sa.c * sb.c) DESC, pc.pair LIMIT 1)),
      w$i AS MATERIALIZED (
        SELECT trim(replace(replace(
            ' ' || replace(seq, ' ', '  ') || ' ',
            ' ' || a || '  ' || b || ' ',
            ' ' || m || ' '), '  ', ' ')) AS seq, freq
        FROM $prev, t$i),
      s$i AS (
        SELECT CAST(SUM(freq) AS BIGINT) AS symbols_after,
          CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab_after
        FROM (SELECT freq, unnest(string_split(seq, ' ')) AS sym
              FROM w$i))"""
    }.mkString(",\n      ")
    val sumRows = (1 to WordPieceMaxIters).map { i =>
      s"SELECT CAST($i AS INTEGER) AS iter, a, b, cnt, symbols_after, vocab_after FROM t$i, s$i"
    }.mkString("\n      UNION ALL ")
    val mRows = (1 to WordPieceMaxIters).map { i =>
      s"SELECT CAST($i AS INTEGER) AS iter, m FROM t$i"
    }.mkString("\n      UNION ALL ")
    s"""
      WITH RECURSIVE wf AS MATERIALIZED (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(${sqlTokens("text")}) AS tok FROM documents
              WHERE length(trim(text)) > 0)
        GROUP BY 1),
      w0 AS MATERIALIZED (
        SELECT substr(tok, 1, 1) ||
            regexp_replace(substr(tok, 2), '(.)', ' ##\\1', 'g') AS seq,
          freq
        FROM wf),
      v0 AS (
        SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) AS v
        FROM (SELECT unnest(string_split(seq, ' ')) AS sym FROM w0)),
      $stages,
      sums AS ($sumRows),
      stop AS (SELECT COALESCE(MIN(iter), $WordPieceMaxIters) AS s
        FROM sums, v0 WHERE vocab_after >= v0.v + $WordPieceMerges),
      mrows AS ($mRows),
      vocab AS (
        SELECT DISTINCT sym FROM (
          SELECT unnest(string_split(seq, ' ')) AS sym FROM w0
          UNION ALL
          SELECT m AS sym FROM mrows, stop WHERE iter <= stop.s)),
      vkey AS (
        SELECT sym,
          CASE WHEN sym LIKE '##%' THEN substr(sym, 3) ELSE sym END AS raw,
          (sym LIKE '##%') AS cont
        FROM vocab),
      ml AS (SELECT MAX(len(raw)) AS ml FROM vkey),
      mw AS MATERIALIZED (
        SELECT tok, freq FROM wf WHERE len(tok) <= $WordPieceMaxWordLen),
      cand AS (
        SELECT p.tok, p.pos, ls.l, substr(p.tok, p.pos, ls.l) AS raw,
          (p.pos > 1) AS cont
        FROM (SELECT tok, unnest(range(1, len(tok) + 1)) AS pos FROM mw) p,
          (SELECT unnest(range(1, (SELECT ml FROM ml) + 1)) AS l) ls
        WHERE ls.l <= len(p.tok) - p.pos + 1),
      bmatch AS MATERIALIZED (
        SELECT tok, pos, l FROM (
          SELECT c.tok, c.pos, c.l, row_number() OVER (
            PARTITION BY c.tok, c.pos ORDER BY c.l DESC, v.sym) AS rn
          FROM cand c JOIN vkey v ON v.raw = c.raw AND v.cont = c.cont)
        WHERE rn = 1),
      walk AS (
        SELECT tok, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np
        FROM mw
        UNION ALL
        SELECT w.tok, w.pos + b.l, w.np + 1
        FROM walk w JOIN bmatch b ON b.tok = w.tok AND b.pos = w.pos),
      wdone AS (
        SELECT tok, MAX(pos) AS fin, MAX(np) AS np FROM walk GROUP BY tok),
      toolong AS (
        SELECT CAST(COALESCE(SUM(freq), 0) AS BIGINT) AS tl
        FROM wf WHERE len(tok) > $WordPieceMaxWordLen),
      mstats AS (
        SELECT
          CAST(SUM(CASE WHEN d.fin = len(d.tok) + 1 THEN 0 ELSE f.freq END)
            + (SELECT tl FROM toolong) AS BIGINT) AS unk_mass,
          CAST(SUM(CASE WHEN d.fin = len(d.tok) + 1 THEN f.freq * d.np
            ELSE 0 END) AS BIGINT) AS total_pieces
        FROM wdone d JOIN mw f ON f.tok = d.tok)
      SELECT iter, a, b, cnt, symbols_after, vocab_after,
        (SELECT v FROM v0) AS base_vocab,
        (SELECT unk_mass FROM mstats) AS unk_mass,
        (SELECT total_pieces FROM mstats) AS total_pieces,
        true AS round_trip_exact, true AS probe_unk
      FROM sums, stop WHERE iter <= stop.s"""
  }

  /** q146 — BPE ENCODING result: the subword vocabulary produced by
    * applying q145's learned merge table to the whole corpus, i.e. what a
    * tokenizer's `encode` emits in aggregate. Top-50 symbols by weighted
    * occurrence (ties broken by symbol — deterministic); `n_chars` > 1
    * marks learned multi-character subwords vs base characters.
    *
    * Same scale shape as training: the corpus is tokenized once into the
    * word-frequency relation, encoding is O(vocab), and the final explode
    * is a vocab-sized shuffle + TakeOrderedAndProject. */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    bpeLoop(spark, dir)._1
      .select(explode(split(col("seq"), " ")).as("symbol"), col("freq"))
      .groupBy("symbol").agg(sum(col("freq")).as("cnt"))
      .select(col("symbol"), col("cnt"),
        length(col("symbol")).cast("long").as("n_chars"))
      .orderBy(desc("cnt"), asc("symbol")).limit(50)

  /** Shared oracle CTE chain: w0 (character-split word frequencies) plus
    * one (pair-count, argmax, merge, symbol-count) stage per iteration. */
  private def bpeCtes: String = {
    val stages = (1 to BpeIters).map { i =>
      val prev = s"w${i - 1}"
      s"""p$i AS (
        SELECT l[i] || ' ' || l[i+1] AS pair, freq
        FROM (SELECT string_split(seq, ' ') AS l, freq,
                unnest(range(1, len(string_split(seq, ' ')))) AS i
              FROM $prev)),
      t$i AS (
        SELECT string_split(pair, ' ')[1] AS a,
          string_split(pair, ' ')[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM p$i GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
      w$i AS (
        SELECT trim(replace(replace(
            ' ' || replace(seq, ' ', '  ') || ' ',
            ' ' || a || '  ' || b || ' ',
            ' ' || a || b || ' '), '  ', ' ')) AS seq, freq
        FROM $prev, t$i),
      s$i AS (
        SELECT CAST(SUM(freq * len(string_split(seq, ' '))) AS BIGINT)
          AS symbols_after FROM w$i)"""
    }.mkString(",\n      ")
    s"""WITH w0 AS (
        SELECT trim(regexp_replace(tok, '(.)', '\\1 ', 'g')) AS seq,
          COUNT(*) AS freq
        FROM (SELECT unnest(${sqlTokens("text")}) AS tok FROM documents)
        GROUP BY 1),
      $stages"""
  }

  private def bpeOracle: String = {
    val rows = (1 to BpeIters).map { i =>
      s"SELECT CAST($i AS INTEGER) AS iter, a, b, cnt, symbols_after FROM t$i, s$i"
    }.mkString("\n      UNION ALL ")
    s"""
      $bpeCtes
      $rows"""
  }

  private def bpeVocabOracle: String = s"""
      $bpeCtes
      SELECT symbol, CAST(SUM(freq) AS BIGINT) AS cnt,
        CAST(len(symbol) AS BIGINT) AS n_chars
      FROM (SELECT unnest(string_split(seq, ' ')) AS symbol, freq
            FROM w$BpeIters)
      GROUP BY symbol
      ORDER BY cnt DESC, symbol LIMIT 50"""

  /** q198 keep-threshold: documents costing at most this many milli-bits
    * per bigram under the reference model survive (picked to split the
    * synthetic corpus; a production pipeline tunes it on held-out data
    * exactly as CCNet tunes its perplexity buckets). */
  val LmKeepMillibits = 5369L

  /** q198 — n-gram LM corpus filtering (the CCNet/RedPajama perplexity
    * gate, the one canonical curation stage q186's pipeline lacked): a
    * word-bigram model with add-one smoothing is trained on a reference
    * slice (even doc_ids — CCNet trains on Wikipedia), every document is
    * scored by its total Shannon code length under that model, and
    * high-cost (out-of-domain/gibberish) documents are flagged. The
    * per-bigram cost is the EXACT integer `ceil(log2((c1+V)/(c2+1)))` —
    * whole-bit code length, [[TextAnalysis.ceilLog2Ratio]] — instead of a
    * float log-prob, so scores hash-compare bitwise across engines
    * (the q55/q144 no-libm-in-gated-columns discipline); the per-doc
    * ranking field is integer milli-bits per bigram.
    *
    * Scale shape: model training is one groupBy over the reference
    * slice's bigrams (map-side partial aggregation); scoring is two
    * equi-joins of doc bigrams against the model relations — NO
    * broadcast hint, so AQE broadcasts the vocab²-bounded model at small
    * scale and shuffle-joins at 100 TB — plus a broadcast 1-row vocab
    * scalar. Unseen bigrams/contexts cost the full smoothed-miss bits
    * through the same closed form (left joins + coalesce), never a
    * special case. */
  def ngramLmFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(trim(col("text"))) > 0)
    val trainToks = docs.filter(col("doc_id") % 2 === 0)
      .select(tokens(col("text")).as("_toks"))
    val trainBigrams = trainToks
      .select(explode(graft.dedup.Dedup.shinglesOf(col("_toks"), 2))
        .as("bigram"))
    val model2 = trainBigrams.groupBy("bigram").agg(count(lit(1)).as("c2"))
    val model1 = trainBigrams
      .select(split(col("bigram"), " ").getItem(0).as("prev"))
      .groupBy("prev").agg(count(lit(1)).as("c1"))
    val vocab = trainToks.select(explode(col("_toks")).as("tok"))
      .agg(countDistinct(col("tok")).as("v_size"))
    val docBigrams = docs
      .select(col("doc_id"), tokens(col("text")).as("_toks"))
      .select(col("doc_id"),
        explode(graft.dedup.Dedup.shinglesOf(col("_toks"), 2)).as("bigram"))
      .withColumn("prev", split(col("bigram"), " ").getItem(0))
    val scored = docBigrams
      .join(model2, Seq("bigram"), "left")
      .join(model1, Seq("prev"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("a", coalesce(col("c1"), lit(0L)) + col("v_size"))
      .withColumn("b", coalesce(col("c2"), lit(0L)) + lit(1L))
      .withColumn("bits", ceilLog2Ratio(col("a"), col("b")).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("bits").as("bits_total"))
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(scored, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("bits_total", coalesce(col("bits_total"), lit(0L)))
      .withColumn("millibits", expr(
        "CASE WHEN n_bigrams = 0 THEN 0L ELSE (bits_total * 1000) div n_bigrams END"))
      .withColumn("keep", col("millibits") <= lit(LmKeepMillibits))
  }

  private def ngramLmOracle: String = {
    val seed = sqlCeilLog2Seed("a", "b")
    s"""
    WITH docs AS (SELECT * FROM documents WHERE length(trim(text)) > 0),
    train_bi AS (
      SELECT unnest(${graft.dedup.Dedup.sqlShingles("text", 2)}) AS bigram
      FROM docs WHERE doc_id % 2 = 0),
    model2 AS (SELECT bigram, COUNT(*) AS c2 FROM train_bi GROUP BY 1),
    model1 AS (SELECT string_split(bigram, ' ')[1] AS prev, COUNT(*) AS c1
      FROM train_bi GROUP BY 1),
    vocab AS (SELECT COUNT(DISTINCT tok) AS v_size FROM
      (SELECT unnest(${sqlTokens("text")}) AS tok FROM docs
       WHERE doc_id % 2 = 0)),
    doc_bi AS (SELECT doc_id,
      unnest(${graft.dedup.Dedup.sqlShingles("text", 2)}) AS bigram
      FROM docs),
    joined AS (
      SELECT d.doc_id,
        COALESCE(m1.c1, 0) + v.v_size AS a,
        COALESCE(m2.c2, 0) + 1 AS b
      FROM doc_bi d
      LEFT JOIN model2 m2 USING (bigram)
      LEFT JOIN model1 m1 ON string_split(d.bigram, ' ')[1] = m1.prev
      CROSS JOIN vocab v),
    seeded AS (SELECT doc_id, a, b, $seed AS k0 FROM joined),
    costed AS (SELECT doc_id,
      ${sqlCeilLog2FromSeed("a", "b", "k0")} AS bit FROM seeded),
    scored AS (SELECT doc_id, COUNT(*) AS n_bigrams, SUM(bit) AS bits_total
      FROM costed GROUP BY 1)
    SELECT doc_id, lang, source, n_bigrams, bits_total, millibits,
      (millibits <= $LmKeepMillibits) AS keep
    FROM (
      SELECT d.doc_id, d.lang, d.source,
        CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(s.bits_total, 0) AS BIGINT) AS bits_total,
        CAST(CASE WHEN COALESCE(s.n_bigrams, 0) = 0 THEN 0
          ELSE (COALESCE(s.bits_total, 0) * 1000) // s.n_bigrams
          END AS BIGINT) AS millibits
      FROM docs d LEFT JOIN scored s USING (doc_id))"""
  }

  /** q208 knobs, interpolated into BOTH sides. */
  val DsirBuckets = 4096L
  val DsirKeepMillibits = -200L

  /** q208 — DSIR data selection (Xie et al., "Data Selection for
    * Language Models via Importance Resampling" — beside q198's LM
    * perplexity gate, the OTHER canonical selection method: rank raw
    * documents by how much more likely they are under a TARGET
    * distribution than under the RAW distribution, both modeled over
    * HASHED n-gram features): bigrams hash into [[DsirBuckets]] buckets
    * (the paper's hashed generative model — vocabulary-unbounded, fixed
    * model size), per-bucket add-one-smoothed costs are EXACT integer
    * Shannon bits ([[graft.text.TextAnalysis.ceilLog2Ratio]]), and a
    * document's importance is Σ(bits_raw − bits_target) over its
    * bigram occurrences — positive = target-like. Selection compares
    * `net_bits·1000 ≥ T·n_bigrams` as an integer CROSS-MULTIPLY (no
    * division: Spark `div` truncates toward zero while DuckDB `//`
    * floors, so negative-weight quotients would diverge).
    *
    * Scale: two bucket-count aggregates (map-side combined, model size
    * = [[DsirBuckets]] regardless of corpus), scoring = two UNHINTED
    * equi-joins on the bucket key + a broadcast 1-row totals relation —
    * the same 100 TB shape as q198 with a guaranteed-small model side. */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(trim(col("text"))) > 0)
    val docBigrams = docs
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("_toks"))
      .select(col("doc_id"), col("lang"),
        explode(graft.dedup.Dedup.shinglesOf(col("_toks"), 2)).as("bigram"))
      .withColumn("f", wordHash(col("bigram")) % DsirBuckets)
    val targetCounts = docBigrams.filter(col("lang") === "en")
      .groupBy("f").agg(count(lit(1)).as("ct"))
    val rawCounts = docBigrams.groupBy("f").agg(count(lit(1)).as("cr"))
    val totals = docBigrams.agg(
      count(lit(1)).as("nr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"))
    val scored = docBigrams
      .join(rawCounts, Seq("f"))
      .join(targetCounts, Seq("f"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("bits_raw", ceilLog2Ratio(
        col("nr") + lit(DsirBuckets), col("cr") + lit(1L)).cast("long"))
      .withColumn("bits_target", ceilLog2Ratio(
        col("nt") + lit(DsirBuckets),
        coalesce(col("ct"), lit(0L)) + lit(1L)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits_raw") - col("bits_target")).as("net_bits"))
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(scored, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("net_bits", coalesce(col("net_bits"), lit(0L)))
      .withColumn("selected",
        col("net_bits") * 1000 >= lit(DsirKeepMillibits) * col("n_bigrams"))
  }

  private def dsirOracle: String = {
    val f = s"(${sqlWordHash("bigram")} % $DsirBuckets)"
    s"""
    WITH docs AS (SELECT * FROM documents WHERE length(trim(text)) > 0),
    doc_bi AS (
      SELECT doc_id, lang,
        unnest(${graft.dedup.Dedup.sqlShingles("text", 2)}) AS bigram
      FROM docs),
    feats AS (SELECT doc_id, lang, $f AS f FROM doc_bi),
    target_counts AS (SELECT f, COUNT(*) AS ct FROM feats
      WHERE lang = 'en' GROUP BY 1),
    raw_counts AS (SELECT f, COUNT(*) AS cr FROM feats GROUP BY 1),
    totals AS (SELECT COUNT(*) AS nr,
      CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt
      FROM feats),
    joined AS (
      SELECT d.doc_id,
        t.nr + $DsirBuckets AS ar, rc.cr + 1 AS br,
        t.nt + $DsirBuckets AS at_, COALESCE(tc.ct, 0) + 1 AS bt
      FROM feats d
      JOIN raw_counts rc USING (f)
      LEFT JOIN target_counts tc USING (f)
      CROSS JOIN totals t),
    seeded AS (SELECT doc_id, ar, br, at_, bt,
      ${sqlCeilLog2Seed("ar", "br")} AS kr0,
      ${sqlCeilLog2Seed("at_", "bt")} AS kt0 FROM joined),
    costed AS (SELECT doc_id,
      (${sqlCeilLog2FromSeed("ar", "br", "kr0")}) -
        (${sqlCeilLog2FromSeed("at_", "bt", "kt0")}) AS w FROM seeded),
    scored AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      CAST(SUM(w) AS BIGINT) AS net_bits FROM costed GROUP BY 1)
    SELECT d.doc_id, d.lang, d.source,
      CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      CAST(COALESCE(s.net_bits, 0) AS BIGINT) AS net_bits,
      (COALESCE(s.net_bits, 0) * 1000 >=
        $DsirKeepMillibits * COALESCE(s.n_bigrams, 0)) AS selected
    FROM docs d LEFT JOIN scored s USING (doc_id)"""
  }

  /** q231 — NAIVE-BAYES text classifier, trained and applied IN the
    * engine (the fastText-style linear classifier every curation
    * pipeline runs, via the WEAK-SUPERVISION workflow: a cheap labeling
    * rule labels the train split, the model distills it into per-token
    * weights and generalizes to unseen docs — how production quality
    * classifiers are bootstrapped when no human labels exist). The rule
    * here marks docs whose `fast`+`small` counts outweigh `slow`+`big`;
    * the NB sees only the BAG OF ALL TOKENS and must rediscover which
    * of them carry the signal from class-conditional counts alone.
    * Every model weight is an EXACT integer Shannon code length in
    * QUARTER BITS ([[graft.text.TextAnalysis.quarterBitsRatio]] — the
    * q198 no-libm discipline at sub-bit resolution, because NB token
    * ratios live well under one bit and whole-bit ceil() flattens them
    * to noise — measured 51% → 81% held-out accuracy on this corpus):
    * priors cost floor(4·log2((docs+2)/(docs_c+1))), each token
    * floor(4·log2((tokens_c+V)/(count_{tok,c}+1))), prediction = lower
    * total code length (ties → positive), so train, apply and verdict
    * hash bitwise against the oracle's replay. Scale shape: training is
    * one groupBy(token) over the train split (model is vocab-bounded —
    * at 100 TB it lands in the low GBs), scoring is one explode + one
    * UNHINTED equi-join against the model (AQE broadcasts small,
    * shuffle-joins beyond) + one groupBy(doc) — no window, no per-class
    * join (both classes' costs ride the same model row), no driver-side
    * weights. */
  def nbClassifier(spark: SparkSession, dir: String): DataFrame = {
    def nOf(w: String): org.apache.spark.sql.Column =
      size(filter(tokens(col("text")), t => t === w))
    val labeled = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .filter(length(trim(col("text"))) > 0)
      .withColumn("is_pos",
        nOf("fast") + nOf("small") >= nOf("slow") + nOf("big"))
    val train = labeled.filter(col("doc_id") % 2 === 0)
    val trainToks = train.select(col("is_pos"),
      explode(tokens(col("text"))).as("tok"))
    val model = trainToks.groupBy("tok").agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("is_pos"), 0L).otherwise(1L)).as("c_neg"))
    // one broadcast scalar row: class token totals, vocab size, doc priors
    val stats = trainToks.agg(
        sum(when(col("is_pos"), 1L).otherwise(0L)).as("t_pos"),
        sum(when(col("is_pos"), 0L).otherwise(1L)).as("t_neg"),
        countDistinct(col("tok")).as("v"))
      .crossJoin(train.agg(
        sum(when(col("is_pos"), 1L).otherwise(0L)).as("d_pos"),
        count(lit(1)).as("d_all")))
    val test = labeled.filter(col("doc_id") % 2 === 1)
    val scored = test
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .join(model, Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("qb_pos", quarterBitsRatio(col("t_pos") + col("v"),
        coalesce(col("c_pos"), lit(0L)) + lit(1L)))
      .withColumn("qb_neg", quarterBitsRatio(col("t_neg") + col("v"),
        coalesce(col("c_neg"), lit(0L)) + lit(1L)))
      .groupBy("doc_id")
      .agg(sum("qb_pos").as("s_pos"), sum("qb_neg").as("s_neg"))
    test.select(col("doc_id"), col("is_pos").as("actual_pos"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(stats.select(col("d_pos"), col("d_all"))))
      .withColumn("qbits_pos", coalesce(col("s_pos"), lit(0L)) +
        quarterBitsRatio(col("d_all") + lit(2L), col("d_pos") + lit(1L)))
      .withColumn("qbits_neg", coalesce(col("s_neg"), lit(0L)) +
        quarterBitsRatio(col("d_all") + lit(2L),
          col("d_all") - col("d_pos") + lit(1L)))
      .withColumn("predict_pos", col("qbits_pos") <= col("qbits_neg"))
      .withColumn("correct", col("predict_pos") === col("actual_pos"))
      .select("doc_id", "qbits_pos", "qbits_neg", "predict_pos",
        "actual_pos", "correct")
  }

  private def nbOracle: String = {
    val toks = sqlTokens("text")
    def nOf(w: String) = s"len(list_filter($toks, x -> x = '$w'))"
    s"""
    WITH docs AS (SELECT doc_id, text,
        (${nOf("fast")} + ${nOf("small")} >=
         ${nOf("slow")} + ${nOf("big")}) AS is_pos
      FROM documents WHERE length(trim(text)) > 0),
    train AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
    toks AS (SELECT is_pos, unnest($toks) AS tok FROM train),
    model AS (SELECT tok,
        SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS c_pos,
        SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS c_neg
      FROM toks GROUP BY 1),
    stats AS (SELECT
        SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS t_pos,
        SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS t_neg,
        COUNT(DISTINCT tok) AS v
      FROM toks),
    pri AS (SELECT SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS d_pos,
        COUNT(*) AS d_all FROM train),
    test_toks AS (SELECT doc_id, unnest($toks) AS tok
      FROM docs WHERE doc_id % 2 = 1),
    joined AS (SELECT tt.doc_id,
        s.t_pos + s.v AS a_pos, COALESCE(m.c_pos, 0) + 1 AS b_pos,
        s.t_neg + s.v AS a_neg, COALESCE(m.c_neg, 0) + 1 AS b_neg
      FROM test_toks tt LEFT JOIN model m USING (tok) CROSS JOIN stats s),
    seeded AS (SELECT doc_id, a_pos, b_pos, a_neg, b_neg,
        ${sqlFloorLog2Seed("a_pos", "b_pos")} AS k0_pos,
        ${sqlFloorLog2Seed("a_neg", "b_neg")} AS k0_neg
      FROM joined),
    kfixed AS (SELECT doc_id, a_pos, b_pos, a_neg, b_neg,
        ${sqlFloorLog2FromSeed("a_pos", "b_pos", "k0_pos")} AS k_pos,
        ${sqlFloorLog2FromSeed("a_neg", "b_neg", "k0_neg")} AS k_neg
      FROM seeded),
    costed AS (SELECT doc_id,
        ${sqlQuarterBitsFromK("a_pos", "b_pos", "k_pos")} AS qb_pos,
        ${sqlQuarterBitsFromK("a_neg", "b_neg", "k_neg")} AS qb_neg
      FROM kfixed),
    sc AS (SELECT doc_id, SUM(qb_pos) AS s_pos, SUM(qb_neg) AS s_neg
      FROM costed GROUP BY 1),
    pseed AS (SELECT (d_all + 2) AS pa, (d_pos + 1) AS pb_pos,
        (d_all - d_pos + 1) AS pb_neg,
        ${sqlFloorLog2Seed("(d_all + 2)", "(d_pos + 1)")} AS kp0_pos,
        ${sqlFloorLog2Seed("(d_all + 2)", "(d_all - d_pos + 1)")} AS kp0_neg
      FROM pri),
    pfixed AS (SELECT pa, pb_pos, pb_neg,
        ${sqlFloorLog2FromSeed("pa", "pb_pos", "kp0_pos")} AS kp_pos,
        ${sqlFloorLog2FromSeed("pa", "pb_neg", "kp0_neg")} AS kp_neg
      FROM pseed),
    pbits AS (SELECT
        ${sqlQuarterBitsFromK("pa", "pb_pos", "kp_pos")} AS p_pos,
        ${sqlQuarterBitsFromK("pa", "pb_neg", "kp_neg")} AS p_neg
      FROM pfixed)
    SELECT doc_id, qbits_pos, qbits_neg,
      (qbits_pos <= qbits_neg) AS predict_pos, actual_pos,
      ((qbits_pos <= qbits_neg) = actual_pos) AS correct
    FROM (
      SELECT d.doc_id, d.is_pos AS actual_pos,
        CAST(COALESCE(sc.s_pos, 0) + pb.p_pos AS BIGINT) AS qbits_pos,
        CAST(COALESCE(sc.s_neg, 0) + pb.p_neg AS BIGINT) AS qbits_neg
      FROM docs d LEFT JOIN sc USING (doc_id) CROSS JOIN pbits pb
      WHERE d.doc_id % 2 = 1)"""
  }

  private val CdcWindow = 4 // rolling window width, tokens
  private val CdcMask = 16L // boundary when r % 16 == 0 → ~16-token chunks
  private[queries] val CdcAttestK = 24 // absolute attestation sample size

  /** The shift-resilience attestation's document sample: ABSOLUTE-K via
    * TakeOrdered on the key, so the attestation's two collects stay
    * bounded at any corpus size. (Modulo sampling is proportional —
    * 2% of a 100 TB corpus would be a multi-TB driver collect.) */
  private[queries] def cdcAttestSample(docs: DataFrame): DataFrame =
    docs.orderBy(col("doc_id")).limit(CdcAttestK)

  /** Per-token chunk rows for [[cdcChunks]]: token-level rolling hashes
    * (the q15 wordHash vocabulary) over a [[CdcWindow]]-token window,
    * boundary where the window hash ≡ 0 (mod [[CdcMask]]) — a
    * POSITION-LOCAL rule, which is the whole point: a boundary depends
    * only on the window's own tokens, never on where previous chunks
    * ended, so an edit re-chunks only its own neighborhood. One narrow
    * scan + a per-document window prefix-sum (documents are the
    * partition key — no global ordering anywhere). */
  private[queries] def cdcChunkRowsWithText(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("_p")
      .rowsBetween(Long.MinValue, -1)
    val lagW = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("_p")
    docs.filter(length(trim(col("text"))) > 0)
      .withColumn("_tk", tokens(col("text")))
      // each token explodes as a struct carrying ITS OWN hash — O(1)
      // wide per row, ONE md5 per token; the rolling window combines
      // neighbors via lag() over the per-doc window the prefix-sum
      // already pays for. (The r16 weak rode the whole per-doc hash
      // array on every exploded row — O(L²) BYTES; the first r17 cut
      // computed the rolling hash in array land with element_at over a
      // computed array, which Catalyst inlines into the lambda and
      // re-evaluates per element — O(L²) md5 WORK, 68× at sf0.1. The
      // lag form is O(L) in both bytes and work.)
      .withColumn("_ph", expr(
        s"""transform(_tk, t -> named_struct('_tok', t,
          '_h', pmod(CAST(conv(substring(md5(t),1,12),16,10) AS BIGINT),
            ${P}L)))"""))
      .select(col("doc_id"), posexplode(col("_ph")).as(Seq("_p", "_s")))
      .select(col("doc_id"), col("_p"), col("_s._tok").as("_tok"),
        col("_s._h").as("_h"))
      .withColumn("_r",
        when(col("_p") >= CdcWindow - 1,
          pmod(lag(col("_h"), 3).over(lagW) * 29791 +
            lag(col("_h"), 2).over(lagW) * 961 +
            lag(col("_h"), 1).over(lagW) * 31 + col("_h"), lit(P)))
        .otherwise(lit(-1L)))
      .withColumn("_bf",
        when(col("_r") >= 0 && col("_r") % CdcMask === 0, 1L).otherwise(0L))
      .withColumn("chunk_idx", coalesce(sum(col("_bf")).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(struct(col("_p"), col("_tok")))).as("_ts"))
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        array_join(expr("transform(_ts, x -> x._tok)"), " ")
          .as("chunk_text"))
      .withColumn("chunk_md5", md5(col("chunk_text")))
  }

  /** [[cdcChunkRowsWithText]] minus the content column — what q313's
    * duplicate counting needs; the q316 STORE keeps the text. */
  private[queries] def cdcChunkRows(docs: DataFrame): DataFrame =
    cdcChunkRowsWithText(docs).drop("chunk_text")

  /** q313 — CONTENT-DEFINED CHUNKING (the LBFS/rsync boundary rule at
    * word level — the storage-dedup chunking a petabyte corpus store
    * runs, and the shift-RESILIENT alternative to q109's fixed windows:
    * inserting one token at the front of a document shifts EVERY fixed
    * window but re-chunks only the edit's neighborhood here): chunk
    * boundaries where a 4-token rolling hash ≡ 0 mod 16, chunk identity
    * the md5 of its joined tokens, every chunk emitted with its
    * corpus-wide duplicate count (the storage-savings signal: identical
    * boilerplate chunks across documents collapse to one stored copy).
    * `shift_resilient` attests the rsync property in-query: for a
    * bounded document sample, prepending a token leaves every chunk
    * after the first original boundary IDENTICAL (boundaries are
    * position-local, so they all persist, merely shifted). The oracle
    * replays tokens, window hashes, boundary prefix-sums, chunk md5s
    * and duplicate counts bitwise. */
  /** q316 — CONTENT-DEFINED CHUNK STORE (q313's reason to exist — the
    * rsync/LBFS storage layer a petabyte corpus store runs): each
    * distinct chunk is stored ONCE in a persisted `chunks` table and
    * every document becomes a manifest of chunk references, ingested
    * in arriving batches with O(batch) work — a batch's fresh chunks
    * are the anti-join of ITS candidates against the store (the store
    * never re-chunks, one equi-join per batch), exactly q311's
    * incremental discipline. `reconstructed_exact` rebuilds EVERY
    * document from manifests ⋈ store and pins the token-stream md5
    * equal to the original's — the storage layer's only real contract.
    * `store_tokens` < `corpus_tokens` is the dedup savings the store
    * exists for (shared boilerplate chunks collapse to one copy). The
    * oracle replays both batch states — store size, appended-chunk
    * delta, token volumes — from the same closed-form chunking. */
  def cdcChunkStore(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val root = graft.util.Scratch.dir("cdcstore", dir)
    val store = s"$root/chunks"
    val manifests = s"$root/manifests"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("text"))
    val batches = Seq(
      1L -> docs.filter(col("doc_id") % 2 === 0),
      2L -> docs.filter(col("doc_id") % 2 === 1))
    var prevChunks = 0L
    val states = batches.map { case (bn, b) =>
      val rows = cdcChunkRowsWithText(b).localCheckpoint()
      val cands = rows
        .select(col("chunk_md5"), col("chunk_text"), col("n_tokens"))
        .distinct()
      val fresh = Snapshots.readLatest(spark, store) match {
        case Some(st) => cands.join(st.select(col("chunk_md5")),
          Seq("chunk_md5"), "left_anti")
        case None => cands
      }
      Snapshots.append(spark, store, fresh)
      Snapshots.append(spark, manifests,
        rows.select(col("doc_id"), col("chunk_idx"), col("chunk_md5")))
      val st = Snapshots.readLatest(spark, store).get
      val man = Snapshots.readLatest(spark, manifests).get
      val agg = st.agg(count(lit(1)), sum(col("n_tokens"))).head
      val manAgg = man
        .join(st.select(col("chunk_md5"), col("n_tokens")),
          Seq("chunk_md5"))
        .agg(count(lit(1)), sum(col("n_tokens"))).head
      // appended = store-count delta — never re-executes the anti-join
      val appended = agg.getLong(0) - prevChunks
      prevChunks = agg.getLong(0)
      (bn, agg.getLong(0), agg.getLong(1),
        appended, manAgg.getLong(0), manAgg.getLong(1))
    }
    // reconstruction: every document rebuilt from refs ⋈ store must
    // hash token-identical to its original token stream
    val st = Snapshots.readLatest(spark, store).get
    val man = Snapshots.readLatest(spark, manifests).get
    val rebuilt = man
      .join(st.select(col("chunk_md5"), col("chunk_text")),
        Seq("chunk_md5"))
      .groupBy(col("doc_id"))
      .agg(md5(array_join(expr(
        "transform(sort_array(collect_list(struct(chunk_idx, chunk_text)))," +
          " x -> x.chunk_text)"), " ")).as("rb_md5"))
    val orig = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        md5(array_join(tokens(col("text")), " ")).as("o_md5"))
    val mismatches = orig.join(rebuilt, Seq("doc_id"), "full_outer")
      .filter(col("o_md5").isNull || col("rb_md5").isNull ||
        col("o_md5") =!= col("rb_md5")).count()
    val exact = mismatches == 0
    import spark.implicits._
    states.toDF("batch", "store_chunks", "store_tokens",
        "appended_chunks", "manifest_rows", "corpus_tokens")
      .withColumn("reconstructed_exact", lit(exact))
      .withColumn("dedup_saves",
        col("store_tokens") < col("corpus_tokens"))
  }

  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("text"))
    val base = cdcChunkRows(docs).localCheckpoint()
    val sample = cdcAttestSample(docs)
    def seqsOf(df: DataFrame): Map[Long, Seq[String]] =
      cdcChunkRows(df).select("doc_id", "chunk_idx", "chunk_md5")
        .collect().groupBy(_.getLong(0))
        .map { case (k, rows) =>
          k -> rows.sortBy(_.getLong(1)).map(_.getString(2)).toSeq }
    val orig = seqsOf(sample)
    val shifted = seqsOf(
      sample.withColumn("text", concat(lit("PREFIXSHIFT "), col("text"))))
    val shiftOk = orig.nonEmpty && orig.forall { case (k, a) =>
      val b = shifted.getOrElse(k, Seq.empty)
      b.takeRight(a.length - 1) == a.takeRight(a.length - 1)
    }
    val dups = base.groupBy("chunk_md5").agg(count(lit(1)).as("dup_count"))
    base.join(dups, Seq("chunk_md5"))
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("chunk_md5"), col("dup_count"))
      .withColumn("shift_resilient", lit(shiftOk))
  }

  private val cdcChunksOracle: String = {
    def wh(e: String) = sqlWordHash(e)
    s"""
    WITH d AS (SELECT doc_id, ${sqlTokens("text")} AS tk
      FROM documents WHERE trim(text) <> ''),
    t AS (SELECT doc_id, tk, CAST(unnest(range(len(tk))) AS INT) AS p
      FROM d),
    h AS (SELECT doc_id, p, list_extract(tk, p + 1) AS tok,
        CASE WHEN p >= ${CdcWindow - 1} THEN
          ((${wh("list_extract(tk, p - 2)")} * 29791
            + ${wh("list_extract(tk, p - 1)")} * 961
            + ${wh("list_extract(tk, p)")} * 31
            + ${wh("list_extract(tk, p + 1)")}) % $P)
        ELSE -1 END AS r
      FROM t),
    c AS (SELECT doc_id, p, tok,
        COALESCE(SUM(CASE WHEN r >= 0 AND r % $CdcMask = 0 THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY p
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS chunk_idx
      FROM h),
    ch AS (SELECT doc_id, chunk_idx, COUNT(*) AS n_tokens,
        md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_md5
      FROM c GROUP BY 1, 2),
    dups AS (SELECT chunk_md5, COUNT(*) AS dup_count FROM ch GROUP BY 1)
    SELECT ch.doc_id, CAST(ch.chunk_idx AS BIGINT) AS chunk_idx,
      CAST(ch.n_tokens AS BIGINT) AS n_tokens, ch.chunk_md5,
      CAST(d2.dup_count AS BIGINT) AS dup_count, true AS shift_resilient
    FROM ch JOIN dups d2 USING (chunk_md5)"""
  }

  private val cdcChunkStoreOracle: String = {
    def wh(e: String) = sqlWordHash(e)
    s"""
    WITH d AS (SELECT doc_id, ${sqlTokens("text")} AS tk
      FROM documents WHERE trim(text) <> ''),
    t AS (SELECT doc_id, tk, CAST(unnest(range(len(tk))) AS INT) AS p
      FROM d),
    h AS (SELECT doc_id, p, list_extract(tk, p + 1) AS tok,
        CASE WHEN p >= ${CdcWindow - 1} THEN
          ((${wh("list_extract(tk, p - 2)")} * 29791
            + ${wh("list_extract(tk, p - 1)")} * 961
            + ${wh("list_extract(tk, p)")} * 31
            + ${wh("list_extract(tk, p + 1)")}) % $P)
        ELSE -1 END AS r
      FROM t),
    c AS (SELECT doc_id, p, tok,
        COALESCE(SUM(CASE WHEN r >= 0 AND r % $CdcMask = 0 THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY p
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS chunk_idx
      FROM h),
    ch AS MATERIALIZED (SELECT doc_id, chunk_idx, COUNT(*) AS n_tokens,
        md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_md5
      FROM c GROUP BY 1, 2),
    b1 AS MATERIALIZED (SELECT * FROM ch WHERE doc_id % 2 = 0),
    du1 AS MATERIALIZED (SELECT DISTINCT chunk_md5, n_tokens FROM b1),
    duA AS MATERIALIZED (SELECT DISTINCT chunk_md5, n_tokens FROM ch)
    SELECT CAST(1 AS BIGINT) AS batch,
      (SELECT COUNT(*) FROM du1) AS store_chunks,
      CAST((SELECT SUM(n_tokens) FROM du1) AS BIGINT) AS store_tokens,
      (SELECT COUNT(*) FROM du1) AS appended_chunks,
      (SELECT COUNT(*) FROM b1) AS manifest_rows,
      CAST((SELECT SUM(n_tokens) FROM b1) AS BIGINT) AS corpus_tokens,
      true AS reconstructed_exact,
      ((SELECT SUM(n_tokens) FROM du1) < (SELECT SUM(n_tokens) FROM b1))
        AS dedup_saves
    UNION ALL
    SELECT CAST(2 AS BIGINT),
      (SELECT COUNT(*) FROM duA),
      CAST((SELECT SUM(n_tokens) FROM duA) AS BIGINT),
      (SELECT COUNT(*) FROM duA) - (SELECT COUNT(*) FROM du1),
      (SELECT COUNT(*) FROM ch),
      CAST((SELECT SUM(n_tokens) FROM ch) AS BIGINT),
      true,
      ((SELECT SUM(n_tokens) FROM duA) < (SELECT SUM(n_tokens) FROM ch))"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q316_cdc_chunk_store", cdcChunkStore,
      Some(cdcChunkStoreOracle)),
    QueryDef("q313_cdc_chunks", cdcChunks, Some(cdcChunksOracle)),
    QueryDef("q231_nb_classifier", nbClassifier(_, _), Some(nbOracle)),
    QueryDef("q208_dsir_select", dsirSelect(_, _), Some(dsirOracle)),
    QueryDef("q198_ngram_lm_filter", ngramLmFilter(_, _),
      Some(ngramLmOracle)),
    QueryDef("q145_bpe_merges", bpeMerges, Some(bpeOracle)),
    QueryDef("q286_bpe_encode", bpeEncode, Some(bpeEncodeOracle)),
    QueryDef("q292_trigram_entropy", trigramCodeLength,
      Some(trigramEntropyOracle)),
    QueryDef("q146_bpe_vocab", bpeVocab, Some(bpeVocabOracle)),
    QueryDef("q194_bpe_vocab_budget", bpeTrainToBudget(_, _),
      Some(bpeBudgetOracle)),
    QueryDef("q320_byte_bpe", byteBpe(_, _), Some(byteBpeOracle)),
    QueryDef("q322_wordpiece", wordPiece(_, _), Some(wordPieceOracle)),
    QueryDef("q324_boilerplate_blocks", boilerplateBlocks(_, _),
      Some(boilerplateOracle)),
    QueryDef("q326_span_decontamination", spanDecontamination(_, _),
      Some(spanDecontaminationOracle)),
    QueryDef("q55_tfidf_top_terms", tfidfTopTerms(_, _), Some(s"""
      WITH tf AS (
        SELECT doc_id, tok AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(${sqlTokens("text")}) AS tok FROM documents)
        GROUP BY 1, 2),
      dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT t.doc_id, t.term, t.tf, d.df, n.n_docs,
          t.tf::DOUBLE * ln(n.n_docs::DOUBLE / d.df::DOUBLE) AS tfidf
        FROM tf t JOIN dfreq d ON d.term = t.term, n),
      ranked AS (
        SELECT doc_id, term, tf, df, tfidf, n_docs,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY tf DESC, df, term) AS rnk
        FROM scored)
      SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term,
        CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        abs(exp(tfidf / tf::DOUBLE) * df::DOUBLE / n_docs::DOUBLE - 1.0)
          < 0.000001 AS tfidf_ok
      FROM ranked WHERE rnk <= 5""")),
    QueryDef("q50_top_bigrams", topBigrams, Some(s"""
      SELECT bigram, COUNT(*) AS n FROM (
        SELECT unnest(${graft.dedup.Dedup.sqlShingles("text", 2)}) AS bigram
        FROM documents)
      GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""")),
    QueryDef("q42_token_packing", tokenPacking(_, _), Some(s"""
      WITH toks AS (
        SELECT doc_id, doc_id % $PackShards AS shard,
          CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(${sqlTokens("text")}) END AS BIGINT) AS n_tokens
        FROM documents)
      SELECT doc_id, shard, n_tokens,
        CAST(floor(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
          ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          0) / $PackBudget.0) AS BIGINT) AS pack_id
      FROM toks""")),
    QueryDef("q40_pii_scrub", piiScrub, Some(s"""
      WITH aug AS (
        SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@mail.example.com or 555-867-530'
            || CAST(doc_id % 10 AS VARCHAR) AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
        md5(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
          '$PhoneRe', '<PHONE>', 'g')) AS scrubbed_md5
      FROM aug""")),
    QueryDef("q32_stratified_sample", stratifiedSample, Some({
      import graft.text.Sampling
      s"""SELECT doc_id, lang FROM documents
      WHERE ${Sampling.sqlHashBucket("doc_id")} <
        ${Sampling.sqlStratumRate("lang", Map("en" -> 3000), 1000)}"""
    })),
    QueryDef("q138_group_split", groupSplit, Some({
      import graft.text.Sampling
      s"""SELECT doc_id, source,
        CASE WHEN ${Sampling.sqlHashBucket("source")} < 8000 THEN 'train'
          WHEN ${Sampling.sqlHashBucket("source")} < 9000 THEN 'val'
          ELSE 'test' END AS split
      FROM documents"""
    })),
    QueryDef("q70_deterministic_shuffle",
      deterministicShuffle(_, _, shards = ShuffleShards), Some(s"""
      WITH h AS (
        SELECT doc_id,
          ${sqlWordHash("('shuf:' || CAST(doc_id AS VARCHAR))")} AS hv
        FROM documents)
      SELECT doc_id, hv % $ShuffleShards AS shard,
        CAST(row_number() OVER (PARTITION BY hv % $ShuffleShards
          ORDER BY hv, doc_id) AS BIGINT) AS pos
      FROM h""")),
    QueryDef("q213_domain_mixture", domainMixtureCarve(_, _), Some({
      import graft.text.Sampling
      s"""
      WITH w AS (
        SELECT doc_id, source,
          CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(${sqlTokens("text")}) END AS BIGINT) AS n_tokens,
          ${Sampling.sqlHashBucket("doc_id")} AS h
        FROM documents),
      t AS (SELECT source, SUM(n_tokens) AS tot FROM w GROUP BY 1),
      wt AS (SELECT source, tot,
               CAST(floor(sqrt(tot)) AS BIGINT) AS wgt FROM t),
      g AS (SELECT SUM(tot) AS all_tok, SUM(wgt) AS wsum FROM wt),
      b AS (SELECT source,
              CAST(((all_tok * 2) // 5) * wgt // wsum AS BIGINT) AS budget
            FROM wt, g),
      c AS (SELECT doc_id, source, n_tokens,
              SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM w),
      s AS (SELECT c.source, COUNT(*) AS n_docs,
              SUM(c.n_tokens) AS sel_tokens
            FROM c JOIN b ON b.source = c.source
            WHERE c.cum - c.n_tokens < b.budget
            GROUP BY 1)
      SELECT b.source, COALESCE(s.n_docs, 0) AS n_docs,
             CAST(COALESCE(s.sel_tokens, 0) AS BIGINT) AS sel_tokens,
             b.budget
      FROM b LEFT JOIN s ON s.source = b.source"""
    })),
    QueryDef("q298_shard_manifest", shardManifest(_, _), Some({
      import graft.text.Sampling
      s"""
      WITH w AS (
        SELECT doc_id,
          CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(${sqlTokens("text")}) END AS BIGINT) AS n_tokens,
          ${Sampling.sqlHashBucket("doc_id")} AS h
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          SUM(n_tokens) OVER (ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM w)
      SELECT CAST((cum - n_tokens) // $ShardBudget AS BIGINT) AS shard_id,
        COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        CAST(SUM(${sqlWordHash("'sh:' || CAST(doc_id AS VARCHAR)")})
          AS BIGINT) AS ids_digest
      FROM c GROUP BY 1"""
    })),
    QueryDef("q123_token_budget_carve", tokenBudgetCarve(_, _), Some({
      import graft.text.Sampling
      s"""
      WITH w AS (
        SELECT doc_id,
          CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(${sqlTokens("text")}) END AS BIGINT) AS n_tokens,
          ${Sampling.sqlHashBucket("doc_id")} AS h
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          SUM(n_tokens) OVER (ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM w),
      b AS (SELECT (SUM(n_tokens) * 2) // 5 AS budget FROM w)
      SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
      FROM c, b WHERE cum - n_tokens < budget"""
    })),
    QueryDef("q128_feature_hashing", featureHashing, Some(s"""
      SELECT doc_id,
        (${sqlWordHash("tok")} % $FeatureDim) AS slot,
        COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(${sqlTokens("text")}) AS tok
            FROM documents)
      GROUP BY 1, 2""")),
    QueryDef("q130_collocations", collocations, Some(s"""
      WITH ts AS (
        SELECT doc_id,
          list_slice(list_sort(list_distinct(${sqlTokens("text")})),
            1, $SetCap) AS ts
        FROM documents),
      e1 AS (SELECT doc_id, unnest(ts) AS a, ts FROM ts),
      e2 AS (SELECT doc_id, a, unnest(ts) AS b FROM e1)
      SELECT a, b, COUNT(*) AS n FROM e2 WHERE a < b
      GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 50""")),
    QueryDef("q131_vocab_oov", vocabOov, Some(s"""
      WITH occ AS (
        SELECT doc_id, unnest(${sqlTokens("text")}) AS term
        FROM documents),
      dfreq AS (
        SELECT term, COUNT(*) AS df
        FROM (SELECT DISTINCT term, doc_id FROM occ) GROUP BY 1),
      n AS (SELECT COUNT(*) AS total FROM documents),
      dict AS (
        SELECT term FROM dfreq, n
        WHERE df >= $MinDf AND df * 10000 <= total * $MaxDfBp)
      SELECT o.doc_id, COUNT(*) AS n_tokens,
        CAST(SUM(CASE WHEN d.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_oov,
        (CAST(SUM(CASE WHEN d.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          * 1000000) // COUNT(*) AS oov_e6
      FROM occ o LEFT JOIN dict d ON d.term = o.term
      GROUP BY 1""")),
    QueryDef("q180_longest_dup_span", longestDupSpan, Some(s"""
      WITH toks AS (
        SELECT doc_id, ${sqlTokens("text")} AS t FROM documents
        WHERE length(trim(text)) <> 0),
      sized AS (SELECT doc_id, t, len(t) AS n FROM toks),
      ex AS (
        SELECT doc_id, CAST(unnest(range(n - $LdsK + 1)) AS BIGINT) AS s, t
        FROM sized WHERE n >= $LdsK),
      kg AS (
        SELECT doc_id, s,
          array_to_string(list_slice(t, s + 1, s + $LdsK), ' ') AS g
        FROM ex),
      dup AS (SELECT g FROM kg GROUP BY g HAVING count(*) >= 2),
      ds AS (SELECT kg.doc_id, kg.s FROM kg JOIN dup USING (g)),
      isl AS (
        SELECT doc_id, s,
          CASE WHEN lag(s) OVER (PARTITION BY doc_id ORDER BY s) IS NULL
                 OR s > lag(s) OVER (PARTITION BY doc_id ORDER BY s) + $LdsK
               THEN 1 ELSE 0 END AS brk
        FROM ds),
      isl2 AS (
        SELECT doc_id, s,
          SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM isl),
      islands AS (
        SELECT doc_id, island, max(s) - min(s) + $LdsK AS stretch
        FROM isl2 GROUP BY doc_id, island),
      perdoc AS (
        SELECT doc_id, SUM(stretch) AS dup_tokens,
               MAX(stretch) AS max_dup_span
        FROM islands GROUP BY doc_id)
      SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
        CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        CAST(coalesce(p.max_dup_span, 0) AS BIGINT) AS max_dup_span
      FROM sized d LEFT JOIN perdoc p USING (doc_id)""")),
    QueryDef("q67_span_dedup", spanDedup(_, _), Some(s"""
      WITH toks AS (
        SELECT doc_id, ${sqlTokens("text")} AS t FROM documents
        WHERE length(trim(text)) <> 0),
      ex AS (
        SELECT doc_id,
          unnest(range(CAST(ceil(len(t) / $SpanW.0) AS BIGINT))) AS i, t
        FROM toks),
      spans AS (
        SELECT doc_id, i AS span_idx,
          array_to_string(list_slice(t, i*$SpanW + 1, i*$SpanW + $SpanW), ' ')
            AS span
        FROM ex),
      flagged AS (
        SELECT doc_id,
          row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx)
            AS rn
        FROM spans)
      SELECT doc_id, COUNT(*) AS n_spans,
        CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_spans,
        CAST(floor((COUNT(*) - SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END))::DOUBLE
          / COUNT(*)::DOUBLE * 1000000) AS BIGINT) AS retained_e6
      FROM flagged GROUP BY doc_id""")),
    QueryDef("q81_domain_quality", domainQuality, Some(s"""
      WITH aug AS (
        SELECT doc_id, $sqlQualityE6 AS quality_e6,
          $sqlUrlAugmentedText AS t
        FROM documents),
      hosts AS (
        SELECT quality_e6, unnest(regexp_extract_all(t, '$UrlRe', 1)) AS domain
        FROM aug)
      SELECT domain, COUNT(*) AS n_urls,
        CAST(SUM(quality_e6) AS BIGINT) AS sum_quality_e6,
        CAST(SUM(quality_e6) AS BIGINT) // COUNT(*) AS avg_quality_e6
      FROM hosts GROUP BY domain""")),
    QueryDef("q79_eval_carve", evalCarve, Some(s"""
      WITH h AS (
        SELECT doc_id, lang,
          ${sqlWordHash("('evalk:' || CAST(doc_id AS VARCHAR))")} AS hv
        FROM documents),
      ranked AS (
        SELECT doc_id, lang,
          CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
            AS BIGINT) AS rk
        FROM h)
      SELECT doc_id, lang, rk FROM ranked WHERE rk <= $EvalK""")),
    QueryDef("q80_html_strip", htmlStrip, Some(s"""
      WITH aug AS (
        SELECT doc_id,
          '<html><head><title>T' || CAST(doc_id AS VARCHAR)
            || '</title></head><body><p>' || text
            || '</p><a href="http://a.example.com/x">link</a>&amp;&nbsp;</body></html>'
            AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '$TagRe')) AS BIGINT) AS n_tags,
        md5(replace(replace(regexp_replace(t, '$TagRe', ' ', 'g'),
          '&amp;', '&'), '&nbsp;', ' ')) AS stripped_md5,
        CAST(floor((length(t) - length(regexp_replace(t, '$TagRe', '', 'g')))::DOUBLE
          / length(t)::DOUBLE * 1000000) AS BIGINT) AS markup_ratio_e6
      FROM aug""")),
    QueryDef("q78_unicode_normalize", unicodeNormalize, Some("""
      WITH aug AS (
        SELECT doc_id,
          text || ' ' || CASE doc_id % 5
            WHEN 0 THEN 'e' || chr(769)
            WHEN 1 THEN 'A' || chr(768)
            WHEN 2 THEN 'o' || chr(776)
            WHEN 3 THEN 'c' || chr(807)
            ELSE chr(8491) END AS raw
        FROM documents)
      SELECT doc_id,
        nfc_normalize(raw) <> raw AS changed,
        md5(nfc_normalize(raw)) AS norm_md5,
        CAST(length(raw) AS BIGINT) AS len_before,
        CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_after
      FROM aug""")),
    QueryDef("q110_diacritic_fold", diacriticFold, Some("""
      WITH aug AS (
        SELECT doc_id,
          text || ' ' || CASE doc_id % 5
            WHEN 0 THEN 'caf' || chr(233)
            WHEN 1 THEN 'ma' || chr(241) || 'ana'
            WHEN 2 THEN chr(252) || 'ber'
            WHEN 3 THEN chr(224)
            ELSE chr(269) || 'eko' END AS raw
        FROM documents)
      SELECT doc_id,
        strip_accents(raw) <> raw AS changed,
        md5(strip_accents(raw)) AS folded_md5,
        CAST(length(raw) AS BIGINT) AS len_before,
        CAST(length(strip_accents(raw)) AS BIGINT) AS len_after
      FROM aug""")),
    QueryDef("q109_token_chunks", tokenChunks, Some(s"""
      WITH base AS (
        SELECT doc_id, ${sqlTokens("text")} AS toks
        FROM documents WHERE length(trim(text)) <> 0),
      st AS (
        SELECT doc_id, toks, len(toks) AS n,
          unnest(range(1, len(toks) + 1, $ChunkStride)) AS strt
        FROM base),
      ch AS (
        SELECT doc_id, (strt - 1) // $ChunkStride AS chunk_id,
          toks[strt : least(strt + ${ChunkTokens - 1}, n)] AS chunk
        FROM st)
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        CAST(len(chunk) AS BIGINT) AS n_tokens,
        chunk[1] AS first_tok,
        chunk[len(chunk)] AS last_tok,
        md5(array_to_string(chunk, ' ')) AS chunk_md5
      FROM ch""")),
    QueryDef("q74_rare_bigram_rate", rareBigramRate, Some(s"""
      WITH bi AS (
        SELECT doc_id, unnest(${graft.dedup.Dedup.sqlShingles("text", 2)})
          AS bigram
        FROM documents),
      counts AS (SELECT bigram, COUNT(*) AS corpus_n FROM bi GROUP BY 1)
      SELECT b.doc_id, COUNT(*) AS n_bigrams,
        CAST(SUM(CASE WHEN c.corpus_n <= $RareMax THEN 1 ELSE 0 END)
          AS BIGINT) AS n_rare,
        CAST(floor(SUM(CASE WHEN c.corpus_n <= $RareMax THEN 1 ELSE 0 END)::DOUBLE
          / COUNT(*)::DOUBLE * 1000000) AS BIGINT) AS rare_ratio_e6
      FROM bi b JOIN counts c USING (bigram)
      GROUP BY b.doc_id""")),
    QueryDef("q75_url_domains", urlDomains, Some(s"""
      WITH aug AS (
        SELECT doc_id,
          $sqlUrlAugmentedText AS t
        FROM documents),
      hosts AS (
        SELECT doc_id, unnest(regexp_extract_all(t, '$UrlRe', 1)) AS domain
        FROM aug)
      SELECT domain, COUNT(*) AS n_urls,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM hosts GROUP BY domain""")),
    QueryDef("q33_repetition_filter", repetitionFilter, Some(s"""
      WITH counts AS (
        SELECT doc_id, tok, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(${sqlTokens("text")}) AS tok FROM documents)
        GROUP BY doc_id, tok),
      agg AS (
        SELECT doc_id, SUM(cnt) AS n_words, MAX(cnt) AS top_count
        FROM counts GROUP BY doc_id)
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        CAST(top_count AS BIGINT) AS top_count,
        CAST(floor(top_count::DOUBLE / n_words::DOUBLE * 1000000) AS BIGINT) AS rep_ratio_e6,
        top_count::DOUBLE / n_words::DOUBLE > 0.2 AS flag_repetitive
      FROM agg""")),
    QueryDef("q14_token_counts", tokenCounts, Some(s"""
      SELECT doc_id,
        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
          ELSE len(${sqlTokens("text")}) END AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '$bpePattern')) AS BIGINT) AS bpe_tokens
      FROM documents""")),
    QueryDef("q15_fingerprints", fingerprints, Some(s"""
      SELECT doc_id,
        md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint_md5,
        CASE WHEN length(trim(text)) = 0 THEN NULL
          ELSE list_reduce(
            list_transform(${sqlTokens("text")}, w -> ${sqlWordHash("w")}),
            (a, b) -> (a * 31 + b) % $P) END AS fingerprint_rolling
      FROM documents""")),
    QueryDef("q16_lang_id", langId, Some({
      val scores = stopwords.keys.toSeq
        .map(l => s"CAST(${sqlLangScore("text", l)} AS BIGINT) AS score_$l")
        .mkString(", ")
      s"""SELECT doc_id, $scores, ${sqlPredictedLang("text")} AS pred_lang
      FROM documents"""
    })),
    QueryDef("q17_quality", quality, Some(s"""
      SELECT doc_id,
        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
          ELSE len(${sqlTokens("text")}) END AS BIGINT) AS n_words,
        $sqlQualityE6 AS quality_e6
      FROM documents""")),
    QueryDef("q64_corpus_mix", corpusMix, Some({
      import graft.text.Sampling
      s"""
      WITH scored AS (
        SELECT doc_id, $sqlQualityE6 AS quality_e6 FROM documents),
      bucketed AS (
        SELECT doc_id, quality_e6,
          CASE WHEN quality_e6 >= $MixHighE6 THEN 'high'
            WHEN quality_e6 >= $MixMidE6 THEN 'mid'
            ELSE 'low' END AS q_bucket
        FROM scored)
      SELECT doc_id, q_bucket, quality_e6 FROM bucketed
      WHERE ${Sampling.sqlHashBucket("doc_id")} <
        ${Sampling.sqlStratumRate("q_bucket", MixRates, MixDefaultBp)}"""
    })))

  /** The q17 quality score at floor'd e6 precision as a DuckDB fragment —
    * shared by q17 and the q64 mixing buckets so the two oracles cannot
    * drift apart. floor of a bitwise-identical double is engine-stable;
    * the derived bucket thresholds then compare exact BIGINTs. */
  // shared with DedupQueries' q120 keep-best oracle
  def sqlQualityE6: String = s"""
      CAST(floor((CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
        least(${sqlLangScore("text", "en")} / (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(${sqlTokens("text")}) END)::DOUBLE * 2.0, 1.0) * 0.4
        + (1.0 - length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / length(text)::DOUBLE) * 0.3
        + least(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(${sqlTokens("text")}) END)::DOUBLE / 10.0, 1.0) * 0.3
      END) * 1000000) AS BIGINT)"""
}
