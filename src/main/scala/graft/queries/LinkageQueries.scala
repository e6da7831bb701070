package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.{quarterBitsRatio, sqlFloorLog2FromSeed,
  sqlFloorLog2Seed, sqlQuarterBitsFromK}

/** PROBABILISTIC RECORD LINKAGE (Fellegi & Sunter 1969 — the entity-
  * resolution discipline beside the document-dedup family: match noisy
  * STRUCTURED records across sources without a shared key). The classic
  * pipeline, Spark-first:
  *
  *  1. BLOCKING: candidate pairs only within agreeing coarse keys —
  *     two passes unioned, so a record corrupted in one blocking field
  *     is still reachable via the other (the multi-pass discipline
  *     every production linker runs). Pass 1 blocks on nation + segment
  *     + a NAME-PREFIX key (the first [[NamePrefixLen]] characters —
  *     the classic first-k-chars blocking key): the prefix bounds each
  *     block's size by the prefix's key cardinality INDEPENDENT of
  *     corpus size, so pair volume stays O(n·cap), never the n²/|blocks|
  *     a coarse-keys-only pass degrades to as the corpus grows (a
  *     trailing-character mangle keeps its prefix, so corrupted names
  *     still block with their originals). Pass 2 blocks on nation +
  *     balance bucket. Pair volume is Σ|block_A|·|block_B| with block
  *     sizes capped — never |A|·|B|.
  *  2. SCORING: per-field agreement weights from the FREQUENCY of the
  *     agreeing value (the frequency-based u-probability: agreeing on
  *     a value shared by few records is strong evidence, on a common
  *     one weak) — the EXACT quarter-bit code length qb(N/freq), so
  *     scores hash-compare bitwise; disagreement costs a flat penalty.
  *  3. DECISION: total weight ≥ threshold → link.
  *
  * The gate builds a second view of `customer` with DETERMINISTIC
  * corruptions (perturbed balances, relabeled segments, mangled names)
  * and re-keyed ids, links the two views, and emits every decided pair
  * with its exact weight and ground-truth flag — precision/recall are
  * READABLE from the output, and one mis-scored field anywhere shifts
  * a weight and fails the hash.
  */
object LinkageQueries {

  private val BalBucket = 10000L // cents per blocking bucket
  private val DisagreeQb = 8L // flat disagreement penalty, quarter-bits
  private val LinkThreshold = 24L
  private val ReKey = 1000000L

  /** Pass-1 secondary blocking key length: the first 15 characters of
    * the name. For TPC-H `Customer#NNNNNNNNN` names this frees only the
    * last 3 digits, so a (nation, segment, prefix) block holds at most
    * ~1000 records WHATEVER the corpus size — the bounded-block
    * discipline; a decided pair outside the prefix block must agree on
    * the balance and is reached by pass 2. */
  private val NamePrefixLen = 15

  /** Deterministic corruptions: ~1/5 of names mangled, ~1/7 of balances
    * perturbed by 123 cents, ~1/11 of segments relabeled. */
  private[queries] def corrupted(a: DataFrame): DataFrame = a.select(
    (col("c_custkey") + ReKey).as("b_id"),
    when(col("c_custkey") % 5 === 1, concat(col("c_name"), lit("~")))
      .otherwise(col("c_name")).as("b_name"),
    col("c_nationkey").as("b_nation"),
    when(col("c_custkey") % 7 === 0, col("bal_cents") + 123L)
      .otherwise(col("bal_cents")).as("b_bal"),
    when(col("c_custkey") % 11 === 0, lit("CORRUPTED"))
      .otherwise(col("c_mktsegment")).as("b_seg"))

  def recordLinkage(spark: SparkSession, dir: String): DataFrame =
    recordLinkageWith(spark, dir, boundedBlocks = true)

  /** `boundedBlocks = false` reproduces the UNBOUNDED coarse-key pass 1
    * (nation+segment only, candidate volume n²/|blocks|) — kept solely
    * so the equivalence spec can pin that bounding the blocks does not
    * change the decided pairs; production entry points never use it. */
  private[queries] def recordLinkageWith(spark: SparkSession, dir: String,
      boundedBlocks: Boolean): DataFrame = {
    val a0 = graft.util.Par.ensure(Tables(spark, dir, "customer"))
      .withColumn("bal_cents", Num.cents(col("c_acctbal")))
    val a = a0.select(col("c_custkey").as("a_key"),
      col("c_name").as("a_name"), col("c_nationkey").as("a_nation"),
      col("bal_cents").as("a_bal"), col("c_mktsegment").as("a_seg"))
    val b = corrupted(a0)
    // blocking pass 1: nation + segment + name prefix (bounded blocks);
    // pass 2: nation + balance bucket
    val coarse = col("a_nation") === col("b_nation") &&
      col("a_seg") === col("b_seg")
    val p1 = a.join(b,
      if (boundedBlocks) coarse &&
        substring(col("a_name"), 1, NamePrefixLen) ===
          substring(col("b_name"), 1, NamePrefixLen)
      else coarse)
    // balances can be negative: shift into the positive domain before
    // bucketing so Spark's truncating DIV and the oracle's floor //
    // agree (they diverge below zero)
    val p2 = a.join(b, col("a_nation") === col("b_nation") &&
      expr(s"(a_bal + 1000000) DIV $BalBucket") ===
        expr(s"(b_bal + 1000000) DIV $BalBucket"))
    val cand = p1.unionByName(p2)
      .select("a_key", "b_id", "a_name", "b_name", "a_nation", "a_bal",
        "b_bal", "a_seg", "b_seg").distinct()
    // frequency-based u-probabilities from the A side
    val n = a.count()
    def freqOf(c: String, out: String) =
      a.groupBy(col(c)).agg(count(lit(1)).as(out))
    def w(freq: Column): Column =
      quarterBitsRatio(lit(n), freq).cast("long")
    val scored = cand
      .join(broadcast(freqOf("a_name", "f_name")), "a_name")
      .join(broadcast(freqOf("a_nation", "f_nation")), "a_nation")
      .join(broadcast(freqOf("a_bal", "f_bal")), "a_bal")
      .join(broadcast(freqOf("a_seg", "f_seg")), "a_seg")
      .withColumn("weight_qb",
        when(col("a_name") === col("b_name"), w(col("f_name")))
          .otherwise(-DisagreeQb) +
        // nation agrees inside every block by construction — its
        // (weak) frequency weight still counts, as F-S prescribes
        w(col("f_nation")) +
        when(col("a_bal") === col("b_bal"), w(col("f_bal")))
          .otherwise(-DisagreeQb) +
        when(col("a_seg") === col("b_seg"), w(col("f_seg")))
          .otherwise(-DisagreeQb))
    scored.filter(col("weight_qb") >= LinkThreshold)
      .select(col("a_key"), col("b_id"), col("weight_qb"),
        (col("b_id") - ReKey === col("a_key")).as("is_true"))
  }

  private def linkageOracle: String =
    s"WITH $linkageCtes\n    $linkageSelect"

  /** The q295 decided-pair SELECT over [[linkageCtes]] — factored out so
    * q307 can embed the exact same link relation as a CTE. */
  private def linkageSelect: String = s"""
    SELECT a_key, b_id, CAST(weight_qb AS BIGINT) AS weight_qb,
      (b_id - $ReKey = a_key) AS is_true
    FROM weighted WHERE weight_qb >= $LinkThreshold"""

  private def linkageCtes: String = {
    val balCents = Num.sqlCents("c_acctbal")
    // seed/k columns are PER-STAGE names: the stages chain via SELECT *,
    // so a shared name would rebind every later stage to stage 1's seed
    def qb(a: String, b: String, tag: String) = s"""
      k0_$tag AS (SELECT *, ${sqlFloorLog2Seed(a, b)} AS seed_$tag
        FROM in_$tag),
      k_$tag AS (SELECT *,
        ${sqlFloorLog2FromSeed(a, b, s"seed_$tag")} AS kb_$tag
        FROM k0_$tag),
      out_$tag AS (SELECT *,
        ${sqlQuarterBitsFromK(a, b, s"kb_$tag")} AS qb_$tag
        FROM k_$tag)"""
    s"""a AS (
      SELECT c_custkey AS a_key, c_name AS a_name,
        c_nationkey AS a_nation, $balCents AS a_bal,
        c_mktsegment AS a_seg
      FROM customer),
    b AS (
      SELECT c_custkey + $ReKey AS b_id,
        CASE WHEN c_custkey % 5 = 1 THEN c_name || '~' ELSE c_name END
          AS b_name,
        c_nationkey AS b_nation,
        CASE WHEN c_custkey % 7 = 0 THEN $balCents + 123
             ELSE $balCents END AS b_bal,
        CASE WHEN c_custkey % 11 = 0 THEN 'CORRUPTED'
             ELSE c_mktsegment END AS b_seg
      FROM customer),
    nn AS (SELECT COUNT(*) AS n FROM a),
    cand AS (
      SELECT DISTINCT a_key, b_id, a_name, b_name, a_nation, a_bal,
        b_bal, a_seg, b_seg
      FROM (
        SELECT * FROM a JOIN b ON a_nation = b_nation AND a_seg = b_seg
          AND substr(a_name, 1, $NamePrefixLen)
            = substr(b_name, 1, $NamePrefixLen)
        UNION ALL
        SELECT * FROM a JOIN b ON a_nation = b_nation
          AND (a_bal + 1000000) // $BalBucket
            = (b_bal + 1000000) // $BalBucket)),
    fn AS (SELECT a_name, COUNT(*) AS f_name FROM a GROUP BY 1),
    fx AS (SELECT a_nation, COUNT(*) AS f_nation FROM a GROUP BY 1),
    fb AS (SELECT a_bal, COUNT(*) AS f_bal FROM a GROUP BY 1),
    fs AS (SELECT a_seg, COUNT(*) AS f_seg FROM a GROUP BY 1),
    joined AS (
      SELECT c.*, f_name, f_nation, f_bal, f_seg, nn.n
      FROM cand c
      JOIN fn USING (a_name) JOIN fx USING (a_nation)
      JOIN fb USING (a_bal) JOIN fs USING (a_seg)
      CROSS JOIN nn),
    in_name AS (SELECT *, n AS a_f, f_name AS b_f FROM joined),
    ${qb("a_f", "b_f", "name")},
    in_nat AS (SELECT *, n AS a_f2, f_nation AS b_f2 FROM out_name),
    ${qb("a_f2", "b_f2", "nat")},
    in_bal AS (SELECT *, n AS a_f3, f_bal AS b_f3 FROM out_nat),
    ${qb("a_f3", "b_f3", "bal")},
    in_seg AS (SELECT *, n AS a_f4, f_seg AS b_f4 FROM out_bal),
    ${qb("a_f4", "b_f4", "seg")},
    weighted AS (
      SELECT a_key, b_id,
        (CASE WHEN a_name = b_name THEN qb_name ELSE -$DisagreeQb END)
        + qb_nat
        + (CASE WHEN a_bal = b_bal THEN qb_bal ELSE -$DisagreeQb END)
        + (CASE WHEN a_seg = b_seg THEN qb_seg ELSE -$DisagreeQb END)
          AS weight_qb
      FROM out_seg)"""
  }

  /** q307 — ENTITY RESOLUTION (VERDICT r15 task 6 — closing the
    * Fellegi-Sunter pipeline q295 opened): the decided pairs cluster
    * into ENTITIES by connected components (min-reachable-id labels,
    * the [[graft.dedup.Dedup.connectedComponents]] machinery — adaptive
    * union-find above 1M edges, so the clustering survives 100 TB link
    * volumes), and each entity elects ONE canonical SURVIVOR by the
    * q120 argmax shape: highest total link weight (the record most
    * corroborated by its matches — the MDM "most-trusted source"
    * policy), ties to the lowest id. Every record of BOTH sources
    * emits with its entity, survivor, survivorship flag, and entity
    * size — singletons are their own entity. The label and survivor
    * joins are plain equi-joins on record/entity ids (the cluster
    * relation is O(linked records), NOT corpus-small, so nothing here
    * assumes broadcastability); the oracle replays the links, the
    * transitive closure, the strength sums, and the argmax
    * bitwise. */
  def entityResolution(spark: SparkSession, dir: String): DataFrame = {
    val links = recordLinkage(spark, dir).localCheckpoint()
    val cust = Tables(spark, dir, "customer")
    val ids = cust.select(col("c_custkey").as("record_id"))
      .unionByName(cust.select((col("c_custkey") + ReKey).as("record_id")))
    val cc = graft.dedup.Dedup.connectedComponents(
      links.select(col("a_key").as("a"), col("b_id").as("b")))
    val strength = links.select(col("a_key").as("rid"), col("weight_qb"))
      .unionByName(links.select(col("b_id").as("rid"), col("weight_qb")))
      .groupBy("rid").agg(sum("weight_qb").as("strength"))
    val labeled = ids
      .join(cc, ids("record_id") === cc("id"), "left")
      .select(col("record_id"),
        coalesce(col("cluster_id"), col("record_id")).as("entity_id"))
      .join(strength, col("record_id") === strength("rid"), "left")
      .select(col("record_id"), col("entity_id"),
        coalesce(col("strength"), lit(0L)).as("strength"))
    // survivor: argmax(strength, then lowest id) via lexicographic
    // struct max — one agg per entity, re-joined on the entity key
    val surv = labeled.groupBy("entity_id")
      .agg(max(struct(col("strength"), (-col("record_id")).as("nid")))
          .as("m"),
        count(lit(1)).as("entity_size"))
      .select(col("entity_id"), (-col("m.nid")).as("survivor_id"),
        col("entity_size"))
    labeled.join(surv, Seq("entity_id"))
      .select(col("record_id"), col("entity_id"), col("survivor_id"),
        (col("record_id") === col("survivor_id")).as("is_survivor"),
        col("entity_size"))
  }

  private def entityResolutionOracle: String = s"""
    WITH RECURSIVE $linkageCtes,
    links AS ($linkageSelect),
    ids AS (SELECT c_custkey AS record_id FROM customer
      UNION ALL SELECT c_custkey + $ReKey FROM customer),
    edges AS (SELECT a_key AS src, b_id AS dst FROM links
      UNION ALL SELECT b_id AS src, a_key AS dst FROM links),
    reach AS (SELECT src, dst FROM edges
      UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    cc AS (SELECT src AS id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src),
    strength AS (SELECT rid, SUM(weight_qb) AS s FROM (
        SELECT a_key AS rid, weight_qb FROM links
        UNION ALL SELECT b_id AS rid, weight_qb FROM links)
      GROUP BY rid),
    labeled AS (SELECT i.record_id,
        COALESCE(cc.cluster_id, i.record_id) AS entity_id,
        COALESCE(st.s, 0) AS strength
      FROM ids i LEFT JOIN cc ON cc.id = i.record_id
      LEFT JOIN strength st ON st.rid = i.record_id),
    surv AS (SELECT entity_id, record_id AS survivor_id,
        CAST(cnt AS BIGINT) AS entity_size FROM (
        SELECT entity_id, record_id,
          row_number() OVER (PARTITION BY entity_id
            ORDER BY strength DESC, record_id) AS rn,
          COUNT(*) OVER (PARTITION BY entity_id) AS cnt
        FROM labeled) WHERE rn = 1)
    SELECT l.record_id, l.entity_id, s.survivor_id,
      l.record_id = s.survivor_id AS is_survivor, s.entity_size
    FROM labeled l JOIN surv s USING (entity_id)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q295_record_linkage", recordLinkage, Some(linkageOracle)),
    QueryDef("q307_entity_resolution", entityResolution,
      Some(entityResolutionOracle)))
}
