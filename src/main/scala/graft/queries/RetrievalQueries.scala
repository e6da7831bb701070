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

  val defs: Seq[QueryDef] = Seq(
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
