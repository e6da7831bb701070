package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.{tokens, sqlTokens}

/** Inverted-index retrieval over the `documents` corpus.
  *
  * The missing half of the text-analysis surface: q55's TF-IDF scores
  * documents it has already scanned, while a retrieval system must answer
  * term queries WITHOUT rescanning the corpus. The index here is the
  * classic flat posting relation `(term, doc_id, tf)` persisted as a
  * bucketed catalog table — flat rather than `term → ARRAY<...>` because
  * a stopword's posting list at 100 TB is itself huge, and flat rows
  * partition/split like any other relation while an array row does not.
  */
object RetrievalQueries {

  /** Bucket count of the postings table. Lookup cost is
    * `selected_buckets/IndexBuckets` of the index, so more buckets =
    * finer pruning; at corpus scale this follows the q70 ladder
    * (buckets ~ index bytes / target file size), at gate scale 16 is
    * enough to demonstrate <100% bucket selection. Non-semantic: the
    * query result is bucket-count-invariant. */
  val IndexBuckets = 16

  /** Query-term selection knobs, interpolated into BOTH sides: the K
    * highest-df terms of length ≥ MinTermLen (df-desc, term-asc ties)
    * form the conjunctive query — deterministic, corpus-derived, and
    * guaranteed to have non-empty postings. */
  val QueryTermK = 5
  val MinTermLen = 4

  /** q122 — inverted index build + conjunctive term lookup.
    *
    * Build: one corpus scan → `(term, doc_id, tf)` → bucketed-by-term
    * catalog table (plus a tiny `(term, df)` stats table, the
    * query-planning relation). Lookup: the query terms go into an `IN`
    * predicate on the bucket column, so Spark's bucket pruning opens at
    * most K of [[IndexBuckets]] buckets (plan-pinned in ScaleSpecs:
    * `SelectedBucketsCount` < total, and the lookup subtree scans ONLY
    * the index — never `documents`). Conjunctive AND semantics: a doc
    * qualifies iff it matched ALL K terms (`n_terms = K` after the
    * per-doc aggregate); score is the summed tf — the exact skeleton
    * under BM25-style rankers.
    *
    * The driver gate rebuilds the index and replays the lookup from the
    * raw corpus in DuckDB — verifying build and lookup composed, the
    * same write-then-read contract as q108's bucketed zone. */
  def invertedIndexLookup(spark: SparkSession, dir: String): DataFrame = {
    val db = "graft_q122"
    val wh = graft.util.Scratch.dir("invidx", dir)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh'")

    val postings = graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    postings.write
      .bucketBy(IndexBuckets, "term").sortBy("term", "doc_id")
      .mode("overwrite").saveAsTable(s"$db.postings")
    spark.table(s"$db.postings")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").saveAsTable(s"$db.term_stats")

    lookup(spark, db)
  }

  /** The lookup half alone (index must exist): query planning reads the
    * small stats table (driver-side, K rows — the literal terms must
    * reach the scan node as an `IN` list for bucket pruning to engage),
    * then one pruned index read + one per-doc aggregate. Exposed
    * separately so specs can pin the lookup plan with no build noise. */
  def lookup(spark: SparkSession, db: String): DataFrame = {
    val qterms = spark.table(s"$db.term_stats")
      .filter(length(col("term")) >= MinTermLen)
      .orderBy(desc("df"), col("term"))
      .limit(QueryTermK)
      .select("term").collect().map(_.getString(0)).toSeq
    spark.table(s"$db.postings")
      .filter(col("term").isin(qterms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("score"))
      .filter(col("n_terms") === qterms.size)
  }

  /** q125 — positional phrase query: the index capability a bag-of-words
    * posting list cannot answer ("new york" ≠ "york new"). The positional
    * index is one row per token OCCURRENCE `(term, doc_id, pos)`,
    * bucketed by term like q122; a two-term phrase query reads each
    * term's postings through bucket pruning (equality → ONE bucket each)
    * and intersects them on `(doc_id, pos+1 = pos)` — the classic
    * positional-intersection, shuffling only the two posting lists,
    * never the corpus. The phrase itself is corpus-derived and
    * deterministic: the top-1 bigram by (count desc, text asc) — q50's
    * selection — so the gate exercises a phrase that actually occurs. */
  def phraseQuery(spark: SparkSession, dir: String): DataFrame = {
    val db = "graft_q125"
    val wh = graft.util.Scratch.dir("posidx", dir)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh'")
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "term")
      .write.bucketBy(IndexBuckets, "term").sortBy("term", "doc_id")
      .mode("overwrite").saveAsTable(s"$db.pos_postings")
    val Array(a, b) = TextQueries.topBigrams(spark, dir)
      .limit(1).collect()(0).getAs[String]("bigram").split(" ", 2)
    val pa = spark.table(s"$db.pos_postings").filter(col("term") === a)
      .select(col("doc_id"), col("pos"))
    val pb = spark.table(s"$db.pos_postings").filter(col("term") === b)
      .select(col("doc_id").as("_doc_b"), col("pos").as("_pos_b"))
    pa.join(pb, pa("doc_id") === pb("_doc_b") &&
        pb("_pos_b") === pa("pos") + 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        min("pos").cast("long").as("first_pos"))
  }

  /** q126 — incremental index maintenance under document UPDATES (the
    * re-crawl case): one fifth of the corpus arrives re-ingested with
    * changed text, and the index must converge to the new corpus WITHOUT
    * a rebuild. Maintenance is CDC on the postings relation: drop the
    * changed documents' old postings (anti-join on the delta's doc ids —
    * at 100 TB the postings store is doc-sharded so this touches only
    * affected shards), append the re-tokenized delta postings, persist
    * v1. Cost O(index + delta), rebuild never re-tokenizes the 4/5
    * unchanged corpus. The gate output is the per-term stats of the
    * MAINTAINED store; the oracle rebuilds them from the updated corpus
    * from scratch — maintenance ≡ rebuild, the q104/q115 contract for
    * the retrieval zone. */
  def incrementalIndexStats(spark: SparkSession, dir: String): DataFrame = {
    def postings(df: DataFrame) = df
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val docs = graft.util.Par.ensure(Tables(spark, dir, "documents"))
    val changed = col("doc_id") % 10 >= 8
    val store = graft.util.Scratch.dir("incidx", dir)
    postings(docs).write.mode("overwrite").parquet(s"$store/v0")
    val delta = docs.filter(changed)
      .select(col("doc_id"), concat(col("text"), lit(" updated")).as("text"))
    val deltaIds = delta.select("doc_id").distinct()
    spark.read.parquet(s"$store/v0")
      .join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
      .unionByName(postings(delta))
      .write.mode("overwrite").parquet(s"$store/v1")
    spark.read.parquet(s"$store/v1")
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))
  }

  /** q144 knobs, interpolated into BOTH sides. The query is the 3 terms
    * ranked 11–13 by df (len ≥ [[MinTermLen]], df-desc term-asc ties) —
    * a deterministic mid-selectivity band: the very top of the df order
    * is stopword-ish and would rank almost purely on length norm. */
  val Bm25K = 3
  val Bm25Offset = 10
  val Bm25TopK = 20

  /** q144 — BM25-ranked disjunctive retrieval in EXACT integer e6
    * arithmetic (the ranked half of q122's boolean lookup).
    *
    * Classic BM25 with k1=1.2, b=0.75, with two deliberate FP-free
    * substitutions, both documented engine-portable rationals:
    * tf-saturation × length-norm is computed EXACTLY — multiplying
    * numerator and denominator by 20·avgdl clears k1 and b to integers
    * (num = 44·avgdl·tf, den = 20·avgdl·tf + 6·avgdl + 18·dl) — and
    * the log-idf is replaced by the rational (N−df+1)/(df+1) at e6
    * (ln at e6 scale differs across engines in ulps, which an exact-
    * hash gate cannot tolerate; the substitution preserves the df
    * ordering that drives the ranking). avgdl is total_tokens DIV N.
    *
    * Scale shape: postings and doc-lengths derive from ONE tokenized
    * corpus pass; the 3-term query relation and the 1-row corpus stats
    * are broadcast; the per-term filter is a broadcast hash join that
    * prunes postings BEFORE the doc-length join; the final top-k is
    * TakeOrderedAndProject (O(k) per partition, no global sort). With
    * the q122 stored index the first join becomes a bucket-pruned scan;
    * here the build is inlined so the gate replays build∘rank. */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val postings = toks.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_tokens"))
      .select(col("n_docs"), expr("total_tokens DIV n_docs").as("avgdl"))
    val dfRel = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = dfRel.filter(length(col("term")) >= MinTermLen)
      .orderBy(desc("df"), asc("term")).offset(Bm25Offset).limit(Bm25K)
      .crossJoin(broadcast(stats))
      .select(col("term"),
        expr("(n_docs - df + 1) * 1000000 DIV (df + 1)").as("idf_e6"))
    postings.join(broadcast(qterms), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        expr("""idf_e6 * ((44 * avgdl * tf * 1000000)
                DIV (20 * avgdl * tf + 6 * avgdl + 18 * dl))
                DIV 1000000""").as("contrib"))
      .groupBy("doc_id").agg(sum(col("contrib")).as("score_e6"))
      .orderBy(desc("score_e6"), asc("doc_id")).limit(Bm25TopK)
  }

  private def bm25Oracle: String = s"""
    WITH toks AS (
      SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
    postings AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS n_docs,
        CAST(SUM(dl) AS BIGINT) // COUNT(*) AS avgdl FROM dl),
    dfr AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1),
    qt AS (SELECT term, df FROM dfr WHERE length(term) >= $MinTermLen
           ORDER BY df DESC, term LIMIT $Bm25K OFFSET $Bm25Offset),
    qi AS (SELECT term,
        CAST((s.n_docs - df + 1) * 1000000 // (df + 1) AS BIGINT) AS idf_e6
      FROM qt, stats s),
    scored AS (
      SELECT p.doc_id,
        qi.idf_e6 * ((44 * s.avgdl * p.tf * 1000000)
          // (20 * s.avgdl * p.tf + 6 * s.avgdl + 18 * d.dl)) // 1000000
          AS contrib
      FROM postings p
      JOIN qi ON qi.term = p.term
      JOIN dl d ON d.doc_id = p.doc_id
      CROSS JOIN stats s)
    SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS score_e6
    FROM scored GROUP BY doc_id
    ORDER BY score_e6 DESC, doc_id LIMIT $Bm25TopK"""

  /** q201 knobs, interpolated into BOTH sides. RRF constant 60 is the
    * original paper's (Cormack et al.); the e9 scale makes the
    * reciprocal contributions exact integers. */
  val HybridQueries = 3      // query docs: ids 0..2 (text AND embedding)
  val HybridTermsPerQuery = 3
  val HybridPoolN = 50       // per-source candidate pool depth
  val RrfKConst = 60
  val RrfScale = 1000000000L
  val HybridTopK = 10

  /** q201 — HYBRID retrieval: BM25 lexical ranking ∪ dense cosine
    * ranking, fused with Reciprocal Rank Fusion (the standard hybrid-
    * search shape every production RAG stack runs; documents and
    * embeddings share the id space, so ids 0..2 act as more-like-this
    * queries with both a text and a vector form). Each source
    * contributes `floor(1e9 / (60 + rank))` for its top-[[HybridPoolN]]
    * candidates — integer RRF, so the fused scores and ordering
    * hash-compare bitwise (the q144 discipline; the float cosine only
    * ever ORDERS the dense pool, exactly as q24 already pins).
    *
    * Scale shape: the dense pool is the q24 broadcast-probe scan with
    * the O(k) native TopKPairs aggregate; the lexical pool prunes
    * postings with a broadcast term join BEFORE any per-doc work and
    * ranks through the same bounded-heap aggregate (score_e6 is exact
    * below 2^53, so the double-scored heap ranks exactly); fusion is a
    * full-outer join of two k-row-per-query relations — O(queries·k),
    * nothing corpus-sized ever sorts or shuffles per query. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Similarity
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    // dense pool: (query_id, rank, neighbor_id) via the pinned q24 path
    val vecRanks = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < HybridQueries),
        "vec_id", "embedding", HybridPoolN)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vec_rank"))
    // lexical pool: per-query distinctive terms → BM25 over the corpus
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val postings = toks.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_tokens"))
      .select(col("n_docs"), expr("total_tokens DIV n_docs").as("avgdl"))
    val dfRel = postings.groupBy("term").agg(count(lit(1)).as("df"))
    // each query doc's HybridTermsPerQuery highest-tf terms (len-gated;
    // tf desc, term asc) — the tiny query relation, ranked in-row
    val qterms = postings
      .filter(col("doc_id") < HybridQueries &&
        length(col("term")) >= MinTermLen)
      .groupBy(col("doc_id").as("query_id"))
      .agg(slice(array_sort(collect_list(struct(
        (-col("tf")).as("negtf"), col("term")))), 1, HybridTermsPerQuery)
        .as("_top"))
      .select(col("query_id"), explode(col("_top")).as("_t"))
      .select(col("query_id"), col("_t.term").as("term"))
      .join(dfRel, "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("term"),
        expr("(n_docs - df + 1) * 1000000 DIV (df + 1)").as("idf_e6"))
    val lexScored = postings.join(broadcast(qterms), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        expr("""idf_e6 * ((44 * avgdl * tf * 1000000)
                DIV (20 * avgdl * tf + 6 * avgdl + 18 * dl))
                DIV 1000000""").as("contrib"))
      .groupBy("query_id", "doc_id").agg(sum(col("contrib")).as("score_e6"))
    val lexRanks = Similarity.topK(
        lexScored.select(col("query_id"), col("doc_id").as("neighbor_id"),
          col("score_e6").cast("double").as("cos_sim")), HybridPoolN)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("lex_rank"))
    // RRF fusion: integer reciprocal contributions, absent source = 0
    val fused = vecRanks.join(lexRanks, Seq("query_id", "doc_id"),
        "full_outer")
      .withColumn("rrf", expr(
        s"""coalesce($RrfScale DIV ($RrfKConst + vec_rank), 0L) +
            coalesce($RrfScale DIV ($RrfKConst + lex_rank), 0L)"""))
    Similarity.topK(
        fused.select(col("query_id"), col("doc_id").as("neighbor_id"),
          col("rrf").cast("double").as("cos_sim")), HybridTopK)
      .select(col("query_id"), col("rank"),
        col("neighbor_id").as("doc_id"),
        col("cos_sim").cast("long").as("rrf_e9"))
  }

  private def hybridRrfOracle: String = {
    val cosSql = graft.similarity.Similarity
      .sqlCosine("q.embedding", "c.embedding")
    s"""
    WITH vec_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id, $cosSql AS cos_sim
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < $HybridQueries),
    vec_ranks AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
          ORDER BY cos_sim DESC, doc_id) AS rank FROM vec_scored)
      WHERE rank <= $HybridPoolN),
    toks AS (
      SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
    postings AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS n_docs,
        CAST(SUM(dl) AS BIGINT) // COUNT(*) AS avgdl FROM dl),
    dfr AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1),
    qt AS (
      SELECT doc_id AS query_id, term FROM (
        SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id
          ORDER BY tf DESC, term) AS r
        FROM postings
        WHERE doc_id < $HybridQueries AND length(term) >= $MinTermLen)
      WHERE r <= $HybridTermsPerQuery),
    qi AS (SELECT query_id, qt.term,
        CAST((s.n_docs - df + 1) * 1000000 // (df + 1) AS BIGINT) AS idf_e6
      FROM qt JOIN dfr ON dfr.term = qt.term CROSS JOIN stats s),
    lex_scored AS (
      SELECT qi.query_id, p.doc_id,
        CAST(SUM(qi.idf_e6 * ((44 * s.avgdl * p.tf * 1000000)
          // (20 * s.avgdl * p.tf + 6 * s.avgdl + 18 * d.dl)) // 1000000)
          AS BIGINT) AS score_e6
      FROM postings p
      JOIN qi ON qi.term = p.term AND p.doc_id <> qi.query_id
      JOIN dl d ON d.doc_id = p.doc_id
      CROSS JOIN stats s
      GROUP BY 1, 2),
    lex_ranks AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
          ORDER BY score_e6 DESC, doc_id) AS rank FROM lex_scored)
      WHERE rank <= $HybridPoolN),
    fused AS (
      SELECT COALESCE(v.query_id, l.query_id) AS query_id,
        COALESCE(v.doc_id, l.doc_id) AS doc_id,
        COALESCE($RrfScale // ($RrfKConst + v.rank), 0) +
          COALESCE($RrfScale // ($RrfKConst + l.rank), 0) AS rrf
      FROM vec_ranks v FULL OUTER JOIN lex_ranks l
        ON v.query_id = l.query_id AND v.doc_id = l.doc_id)
    SELECT query_id, rank, doc_id, CAST(rrf AS BIGINT) AS rrf_e9 FROM (
      SELECT query_id, doc_id, rrf, row_number() OVER (PARTITION BY query_id
        ORDER BY rrf DESC, doc_id) AS rank FROM fused)
    WHERE rank <= $HybridTopK"""
  }

  /** Tokens per late-interaction query; queries are the vec_id<16
    * vectors grouped four-a-piece (query_id = vec_id DIV 4) — fixed,
    * corpus-derived, disjoint from the document side (vec_id ≥ 20). */
  val MaxSimQueryTokens = 4
  val MaxSimTopK = 3

  /** q212 — LATE-INTERACTION retrieval (the ColBERT MaxSim operator):
    * documents are BAGS of token vectors (here: each `label` group of
    * the embeddings table), queries are small bags too, and the score
    * is sum-over-query-tokens of max-over-doc-tokens cosine — the
    * multi-vector semantics single-vector ANN (q24…q193) cannot
    * express, and the reason ColBERT-style engines exist. Plan shape =
    * the scale-correct MaxSim: corpus token vectors stay partitioned
    * and are scored against the BROADCAST query bag in one narrow pass
    * (no corpus shuffle); max-per-(doc, query-token) reduces with
    * map-side partial aggregation (state = one double per group);
    * the per-token maxima are FLOORED TO e6 INTEGERS before the final
    * sum, so the cross-token reduction is order-independent integer
    * arithmetic — bit-equal in any engine at any parallelism (a double
    * sum here would be summation-order-dependent); doc ranking rides
    * the O(k) [[graft.functions.TopKPairs]] heap. */
  def maxsimTopK(spark: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Similarity
    val emb = graft.util.Par.ensure(Tables(spark, dir, "embeddings"))
    val qt = broadcast(emb
      .filter(col("vec_id") < MaxSimQueryTokens * 4)
      .select(expr(s"vec_id DIV $MaxSimQueryTokens").as("query_id"),
        col("vec_id").as("qt_id"), col("embedding").as("_qv")))
    val perToken = emb.filter(col("vec_id") >= 20)
      .crossJoin(qt)
      .groupBy(col("label"), col("query_id"), col("qt_id"))
      .agg(max(Similarity.cosine(col("_qv"), col("embedding"))).as("mx"))
      .select(col("label"), col("query_id"),
        floor(col("mx") * 1000000).as("mxe6"))
    perToken.groupBy("query_id", "label")
      .agg(sum("mxe6").as("score_e6"))
      .groupBy("query_id")
      .agg(graft.functions.TopKPairs.column(
        col("score_e6").cast("double"), col("label").cast("long"),
        MaxSimTopK).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_i", "_p")))
      .select(col("query_id"), (col("_i") + 1).cast("long").as("rank"),
        col("_p.id").as("label"),
        col("_p.score").cast("long").as("score_e6"))
  }

  private val maxsimOracle = {
    import graft.similarity.Similarity
    val cos = Similarity.sqlCosine("q.embedding", "c.embedding")
    s"""
      WITH qt AS (
        SELECT vec_id // $MaxSimQueryTokens AS query_id, vec_id AS qt_id,
               embedding
        FROM embeddings WHERE vec_id < ${MaxSimQueryTokens * 4}),
      mx AS (
        SELECT c.label, q.query_id, q.qt_id,
          CAST(floor(max($cos) * 1000000) AS BIGINT) AS mxe6
        FROM embeddings c JOIN qt q ON c.vec_id >= 20
        GROUP BY 1, 2, 3),
      sc AS (
        SELECT query_id, label, SUM(mxe6) AS score_e6
        FROM mx GROUP BY 1, 2),
      r AS (
        SELECT query_id, label, score_e6,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score_e6 DESC, label) AS rank
        FROM sc)
      SELECT query_id, rank, CAST(label AS BIGINT) AS label,
             CAST(score_e6 AS BIGINT) AS score_e6
      FROM r WHERE rank <= $MaxSimTopK"""
  }

  /** q294 knobs. μ=2000 is the Dirichlet prior the LM-retrieval
    * literature defaults to (Zhai & Lafferty); the query-term window
    * offsets past the BM25 query so the two scorers rank DIFFERENT
    * term sets. */
  val QlMu = 2000L
  val QlOffset = 5
  val QlK = 3
  val QlTopK = 20

  /** q294 — QUERY-LIKELIHOOD retrieval with Dirichlet smoothing (Zhai &
    * Lafferty — the other canonical lexical scorer beside q144's BM25;
    * production IR stacks ship both): score(q,d) = Σ_t −log p(t|d)
    * with p(t|d) = (tf·|C| + μ·cf) / (|C|·(dl+μ)) — numerator and
    * denominator EXACT longs, each term's cost the exact QUARTER-BIT
    * code length ([[graft.text.TextAnalysis.quarterBitsRatio]]: FP only
    * seeds, shifts decide; whole bits would quantize sub-bit ratios to
    * death, the q231 lesson), so ranks hash-compare bitwise. A query
    * term ABSENT from a doc still costs its smoothed background mass —
    * the left join + tf=0 path, not a special case.
    *
    * Scale shape: postings/doc-length/collection stats are the same
    * map-side-combined aggregates the BM25 index uses (one tokenize
    * pass shared at 100 TB); candidates = docs holding ≥1 query term
    * (broadcast semi-join), each scored against the 3-term broadcast —
    * O(candidates), never O(corpus·terms). Overflow headroom: products
    * stay under 2^50 (quarterBitsRatio's shift domain) until |C|·dl
    * tops ~10^15 — rescale cf/|C| by a common 2^k then (documented,
    * cost-free: the ratio is what's coded). */
  def queryLikelihood(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis.quarterBitsRatio
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val postings = toks.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val coll = toks.groupBy("term").agg(count(lit(1)).as("cf"))
    val total = coll.agg(sum(col("cf")).as("c_total"))
    val dfRel = postings.groupBy("term").agg(count(lit(1)).as("df"))
    // the query terms COLLECT to the driver (a real query arrives as
    // literals; TakeOrdered of offset+k rows) — deliberately NOT a
    // plan-internal offset/limit: Spark 4.1's AQE replan mishandled
    // that shape inside the broadcast subtree (nondeterministic row
    // triplication — the q294 gate caught it; see ScaleSpecsR15's
    // limit-elimination pin for the sibling manifestation)
    val termList = dfRel.filter(length(col("term")) >= MinTermLen)
      .orderBy(desc("df"), asc("term")).limit(QlOffset + QlK)
      .collect().map(_.getString(0)).drop(QlOffset).toSeq
    val qterms = coll.filter(col("term").isin(termList: _*))
      .crossJoin(broadcast(total))
      .select(col("term"), col("cf"), col("c_total"))
    val cand = postings
      .join(broadcast(qterms.select("term")), "term")
      .select("doc_id").distinct()
    cand.join(dl, "doc_id")
      .crossJoin(broadcast(qterms))
      .join(postings, Seq("doc_id", "term"), "left")
      .withColumn("tf", coalesce(col("tf"), lit(0L)))
      .withColumn("num",
        col("tf") * col("c_total") + lit(QlMu) * col("cf"))
      .withColumn("den", col("c_total") * (col("dl") + lit(QlMu)))
      .withColumn("qb", quarterBitsRatio(col("den"), col("num")))
      .groupBy("doc_id").agg(sum(col("qb")).as("cost_qb"))
      // global top-k through the bounded heap, NOT orderBy+limit: the
      // heap is the scale-right shape (O(k) state, no global sort) —
      // and on THIS plan Spark 4.1's AQE logical replan erroneously
      // ELIMINATES a GlobalLimit when a Repartition/coalesce sits above
      // it (the verify dump's coalesce(1) returned the full candidate
      // set; found by the q294 gate, pinned in ScaleSpecsR15)
      .agg(graft.functions.TopKPairs.column(
        -col("cost_qb").cast("double"), col("doc_id"), QlTopK).as("_t"))
      .select(explode(col("_t")).as("p"))
      .select(col("p.id").as("doc_id"),
        (-col("p.score")).cast("long").as("cost_qb"))
  }

  private def queryLikelihoodOracle: String = {
    import graft.text.TextAnalysis.{sqlFloorLog2FromSeed, sqlFloorLog2Seed,
      sqlQuarterBitsFromK}
    s"""
    WITH toks AS (
      SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
    postings AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    coll AS (SELECT term, COUNT(*) AS cf FROM toks GROUP BY 1),
    total AS (SELECT CAST(SUM(cf) AS BIGINT) AS c_total FROM coll),
    dfr AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1),
    qt AS (SELECT f.term, c.cf FROM dfr f JOIN coll c ON c.term = f.term
           WHERE length(f.term) >= $MinTermLen
           ORDER BY f.df DESC, f.term LIMIT $QlK OFFSET $QlOffset),
    cand AS (
      SELECT DISTINCT p.doc_id FROM postings p
      JOIN qt ON qt.term = p.term),
    pairs AS (
      SELECT c.doc_id, qt.term, qt.cf, d.dl, t.c_total,
        COALESCE(p.tf, 0) AS tf
      FROM cand c
      CROSS JOIN qt
      JOIN dl d ON d.doc_id = c.doc_id
      CROSS JOIN total t
      LEFT JOIN postings p ON p.doc_id = c.doc_id AND p.term = qt.term),
    nd AS (
      SELECT doc_id, tf * c_total + $QlMu * cf AS num,
        c_total * (dl + $QlMu) AS den
      FROM pairs),
    seeded AS (
      SELECT doc_id, num, den,
        ${sqlFloorLog2Seed("den", "num")} AS k0
      FROM nd),
    kk AS (
      SELECT doc_id, num, den,
        ${sqlFloorLog2FromSeed("den", "num", "k0")} AS k
      FROM seeded),
    costed AS (
      SELECT doc_id, ${sqlQuarterBitsFromK("den", "num", "k")} AS qb
      FROM kk)
    SELECT doc_id, CAST(SUM(qb) AS BIGINT) AS cost_qb
    FROM costed GROUP BY doc_id
    ORDER BY cost_qb, doc_id LIMIT $QlTopK"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q294_query_likelihood", queryLikelihood,
      Some(queryLikelihoodOracle)),
    QueryDef("q212_maxsim_topk", maxsimTopK, Some(maxsimOracle)),
    QueryDef("q201_hybrid_rrf", hybridRrf, Some(hybridRrfOracle)),
    QueryDef("q144_bm25", bm25, Some(bm25Oracle)),
    QueryDef("q125_phrase_query", phraseQuery, Some({
      import graft.dedup.Dedup.sqlShingles
      s"""
      WITH toks AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM documents),
      ex AS (SELECT doc_id, unnest(range(0, len(t))) AS pos, t FROM toks),
      pp AS (SELECT doc_id, pos, t[pos + 1] AS term FROM ex),
      big AS (
        SELECT bigram FROM (
          SELECT unnest(${sqlShingles("text", 2)}) AS bigram FROM documents)
        GROUP BY bigram ORDER BY COUNT(*) DESC, bigram LIMIT 1),
      ab AS (SELECT string_split(bigram, ' ')[1] AS a,
               string_split(bigram, ' ')[2] AS b FROM big)
      SELECT pa.doc_id, COUNT(*) AS n_matches,
        CAST(MIN(pa.pos) AS BIGINT) AS first_pos
      FROM pp pa, pp pb, ab
      WHERE pa.doc_id = pb.doc_id AND pa.term = ab.a AND pb.term = ab.b
        AND pb.pos = pa.pos + 1
      GROUP BY 1"""
    })),
    QueryDef("q126_incremental_index", incrementalIndexStats, Some(s"""
      WITH corpus AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 >= 8 THEN text || ' updated' ELSE text END
            AS text
        FROM documents),
      tf AS (
        SELECT doc_id, tok AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(${sqlTokens("text")}) AS tok
              FROM corpus)
        GROUP BY 1, 2)
      SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
      FROM tf GROUP BY 1""")),
    QueryDef("q122_inverted_index", invertedIndexLookup, Some(s"""
      WITH tf AS (
        SELECT doc_id, tok AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(${sqlTokens("text")}) AS tok
              FROM documents)
        GROUP BY 1, 2),
      stats AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      q AS (SELECT term FROM stats WHERE length(term) >= $MinTermLen
            ORDER BY df DESC, term LIMIT $QueryTermK)
      SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(tf) AS BIGINT) AS score
      FROM tf JOIN q USING (term)
      GROUP BY 1
      HAVING COUNT(*) = (SELECT COUNT(*) FROM q)""")))
}
