package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{AudioHeaders, FlacCodec, GifCodec, ImageHeaders, MediaSynth, PngCodec, VideoHeaders}

/** Multimodal metadata extraction under the driver's cross-engine gate.
  *
  * q73 probes a binary media column with the REAL container parsers — the
  * [[graft.multimodal.ImageHeaders]] PNG/GIF signature checks + JPEG
  * marker scan, the [[graft.multimodal.AudioHeaders]] RIFF chunk walk,
  * and the [[graft.multimodal.VideoHeaders]] ISO-BMFF box walk — over
  * payloads that are a pure function of `doc_id`
  * ([[graft.multimodal.MediaSynth]]), so the DuckDB oracle can build the
  * identical bytes in SQL and parse them back with independent hex-offset
  * arithmetic. A wrong parser (endianness, offset, marker-walk bug) makes
  * the hash gate fail; a wrong synth template does too.
  *
  * Scale shape: the probe is a narrow mapPartitions over the payload
  * column — no shuffle anywhere; at 100 TB this is the full-corpus
  * pre-decode filter pass (resolution/aspect/sample-rate gating) that
  * runs before any pixel/sample decode.
  */
object MultimodalQueries {

  /** Probe output row; None → NULL for unrecognized/truncated payloads. */
  final case class MediaProbe(
      doc_id: Long,
      media_format: Option[String],
      width: Option[Long],
      height: Option[Long],
      sample_rate: Option[Long],
      channels: Option[Long],
      duration_ms: Option[Long])

  /** The q73 gate path: the ENTIRE probe — payload synthesis and all
    * three container parsers — runs as codegen'd expressions
    * ([[graft.functions.MediaProbeExpressions]]) inside one stage, no
    * object boundary anywhere. Aliased intermediates (`_p`, `_img`, ...)
    * are multiply-referenced non-cheap projections, so CollapseProject
    * keeps them staged and each parser runs once per row (the q82
    * staging discipline). NULL structs from unrecognized payloads
    * compose through plain field access + coalesce. */
  def mediaProbe(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{MediaProbeExpressions => P}
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select(col("doc_id"), P.synthPayload(col("doc_id")).as("_p"))
      .select(col("doc_id"), P.imageDims(col("_p")).as("_img"),
        P.wavInfo(col("_p")).as("_wav"), P.mp4Info(col("_p")).as("_mp4"))
      .select(col("doc_id"),
        coalesce(col("_img.format"),
          when(col("_wav").isNotNull, lit("wav")),
          when(col("_mp4").isNotNull, lit("mp4"))).as("media_format"),
        col("_img.width").as("width"),
        col("_img.height").as("height"),
        col("_wav.sample_rate").as("sample_rate"),
        col("_wav.channels").as("channels"),
        coalesce(col("_wav.duration_ms"), col("_mp4.duration_ms"))
          .as("duration_ms"))
  }

  /** The batch-session mapPartitions form of the same probe — the shape a
    * JNI/FFI parser would use (state amortized per partition). Kept as
    * the cross-checked twin: MultimodalSpec pins it row-identical to the
    * expression path the gate runs. */
  def mediaProbePartitioned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val p = MediaSynth.payload(id)
          val img = ImageHeaders.dims(p)
          val wav = AudioHeaders.wavInfo(p)
          val mp4 = VideoHeaders.mp4Info(p)
          MediaProbe(id,
            img.map(_._1).orElse(wav.map(_ => "wav"))
              .orElse(mp4.map(_ => "mp4")),
            img.map(_._2.toLong), img.map(_._3.toLong),
            wav.map(_.sampleRate.toLong), wav.map(_.channels.toLong),
            wav.map(_.durationMs).orElse(mp4.map(_.durationMs)))
        }
      }
      .toDF()
  }

  // ---- DuckDB hex-arithmetic mirrors (big/little-endian field pieces) ----

  private def beHex(e: String, hexDigits: Int): String =
    s"lpad(hex($e), $hexDigits, '0')"
  private def leHex(e: String, bytes: Int): String = {
    val be = beHex(e, bytes * 2)
    (bytes - 1 to 0 by -1)
      .map(i => s"substr($be, ${i * 2 + 1}, 2)").mkString(" || ")
  }
  /** Parse a little-endian field out of the payload hex at 1-based hex
    * position `pos` spanning `bytes` bytes. */
  private def leField(pos: Int, bytes: Int): String = {
    val parts = (bytes - 1 to 0 by -1)
      .map(i => s"substr(s, ${pos + i * 2}, 2)").mkString(" || ")
    s"('0x' || $parts)::BIGINT"
  }
  private def beField(pos: Int, bytes: Int): String =
    s"('0x' || substr(s, $pos, ${bytes * 2}))::BIGINT"

  private val oracle: String = {
    val pngSig = "89504E470D0A1A0A"
    s"""
      WITH params AS (
        SELECT doc_id, doc_id % 6 AS kind,
          (doc_id % 640) + 16 AS w, (doc_id % 480) + 16 AS h,
          CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
            ELSE 44100 END AS rate,
          (doc_id % 2) + 1 AS ch,
          ((doc_id % 997) + 1) * 100 AS db,
          CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
            ELSE 90000 END AS vts,
          ((doc_id % 5000) + 1) * 37 AS vdur
        FROM documents),
      hx AS (
        SELECT doc_id, CASE kind
          WHEN 0 THEN '${pngSig}0000000D49484452'
            || ${beHex("w", 8)} || ${beHex("h", 8)} || '0806000000'
          WHEN 1 THEN '474946383961'
            || ${leHex("w", 2)} || ${leHex("h", 2)} || 'F70000'
          WHEN 2 THEN 'FFD8FFE000104A46494600010100000100010000FFFE00046766FFC0001108'
            || ${beHex("h", 4)} || ${beHex("w", 4)}
            || '03012200021101031101FFD9'
          WHEN 3 THEN '52494646' || ${leHex("(36 + db)", 4)} || '57415645'
            || '666D74201000000001' || '00' || ${leHex("ch", 2)}
            || ${leHex("rate", 4)} || ${leHex("(rate * ch * 2)", 4)}
            || ${leHex("(ch * 2)", 2)} || '1000'
            || '64617461' || ${leHex("db", 4)}
          WHEN 4 THEN '0000001466747970' || '69736F6D' || '00000200'
            || '69736F6D' || '00000074' || '6D6F6F76' || '0000006C'
            || '6D766864' || '000000000000000000000000'
            || ${beHex("vts", 8)} || ${beHex("vdur", 8)} || repeat('0', 160)
          ELSE '${pngSig}0000000D' END AS s
        FROM params),
      parsed AS (
        SELECT doc_id, s,
          substr(s, 1, 16) = '$pngSig' AND length(s) >= 48
            AND substr(s, 25, 8) = '49484452' AS is_png,
          substr(s, 1, 8) = '47494638' AND substr(s, 9, 2) IN ('37', '39')
            AND substr(s, 11, 2) = '61' AND length(s) >= 20 AS is_gif,
          substr(s, 1, 4) = 'FFD8' AND length(s) >= 70 AS is_jpeg,
          substr(s, 1, 8) = '52494646' AND substr(s, 17, 8) = '57415645'
            AND length(s) >= 88 AS is_wav,
          substr(s, 9, 8) = '66747970' AND substr(s, 65, 8) = '6D766864'
            AND length(s) >= 112 AS is_mp4
        FROM hx)
      SELECT doc_id,
        CASE WHEN is_png THEN 'png' WHEN is_gif THEN 'gif'
          WHEN is_jpeg THEN 'jpeg' WHEN is_wav THEN 'wav'
          WHEN is_mp4 THEN 'mp4' END AS media_format,
        CASE WHEN is_png THEN ${beField(33, 4)}
          WHEN is_gif THEN ${leField(13, 2)}
          WHEN is_jpeg THEN ${beField(67, 2)} END AS width,
        CASE WHEN is_png THEN ${beField(41, 4)}
          WHEN is_gif THEN ${leField(17, 2)}
          WHEN is_jpeg THEN ${beField(63, 2)} END AS height,
        CASE WHEN is_wav THEN ${leField(49, 4)} END AS sample_rate,
        CASE WHEN is_wav THEN ${leField(45, 2)} END AS channels,
        CASE WHEN is_wav
          THEN (${leField(81, 4)} * 1000) // ${leField(57, 4)}
          WHEN is_mp4
          THEN (${beField(105, 4)} * 1000) // ${beField(97, 4)}
          END AS duration_ms
      FROM parsed"""
  }

  /** q85 — REAL pixel decode under the gate. Each doc_id maps to a
    * complete PNG ([[graft.multimodal.MediaSynth.pixelPng]]): real zlib
    * IDAT, real rotating scanline filters. The Spark side must inflate and
    * unfilter genuine compressed bytes ([[graft.multimodal.PngCodec]]) to
    * recover the pixels; the oracle recomputes every statistic from the
    * closed-form pixel function by pure arithmetic — it never sees the
    * bytes. Any decoder defect (wrong predictor, off-by-one stride, bad
    * inflate framing) shifts `sum_v`/`wsum_v` and fails the hash gate;
    * `wsum_v` weights each byte by its raster position, so even a
    * pixel-permuting bug that preserves sums is caught.
    *
    * Scale shape: narrow mapPartitions over the payload column — the same
    * no-shuffle full-corpus decode pass as q73's probe, just with the
    * expensive kernel. At 100 TB the decoder cost dominates and
    * parallelism comes entirely from input splits. */
  final case class PngStats(
      doc_id: Long,
      width: Long,
      height: Long,
      channels: Long,
      n_px: Long,
      sum_v: Long,
      wsum_v: Long,
      decode_ok: Boolean)

  /** q129 — perceptual image hash (aHash) dedup: the image-side
    * near-dup fingerprint a multimodal corpus dedups on (re-encoded or
    * resized copies of one image byte-diverge but hash-collide). The
    * whole pipeline is integer vision over REAL decoded pixels:
    * decode → integer grayscale (channel mean, floor) → 8×8
    * nearest-neighbor resample (the q90 `sx = x·W DIV 8` arithmetic) →
    * strict-greater-than-mean threshold → 64-bit hash carried as two
    * 32-bit halves (no sign-bit games in either engine). Exact-hash
    * group sizes come back as `n_same`; sub-identical similarity
    * (hamming ≤ t) routes through q44's simhash band machinery — same
    * 64-bit shape. Narrow decode pass + one tiny hash-keyed aggregate;
    * the corpus is never shuffled (hashes are 3 longs/doc). */
  final case class PHashRow(doc_id: Long, phash_hi: Long, phash_lo: Long)

  /** The per-image aHash relation shared by q129 (exact-hash groups) and
    * q187 (hamming-banded near-dups): one narrow decode pass, 3 longs
    * per document. */
  private def phashFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          PngCodec.decode(MediaSynth.pixelPng(id)).map { img =>
            val w = img.width; val h = img.height; val ch = img.channels
            def gray(x: Int, y: Int): Long = {
              var s = 0L; var c = 0
              while (c < ch) {
                s += (img.pixels((y * w + x) * ch + c) & 0xff); c += 1
              }
              s / ch
            }
            val g8 = new Array[Long](64)
            var i = 0
            while (i < 64) {
              g8(i) = gray(i % 8 * w / 8, i / 8 * h / 8)
              i += 1
            }
            val mean = g8.sum / 64
            var hi = 0L; var lo = 0L
            i = 0
            while (i < 64) {
              if (g8(i) > mean) {
                if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
              }
              i += 1
            }
            PHashRow(id, hi, lo)
          }
        }
      }.toDF()
  }

  def imagePhash(spark: SparkSession, dir: String): DataFrame = {
    val hashes = phashFrame(spark, dir)
    val sizes = hashes.groupBy("phash_hi", "phash_lo")
      .agg(count(lit(1)).as("n_same"))
    hashes.join(sizes, Seq("phash_hi", "phash_lo"))
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        col("n_same"))
  }

  // q187 hamming budget: 4 pigeonhole bands of 16 bits over the 64-bit
  // hash — a pair within hamming 3 MUST agree on at least one band
  private val ImgMaxHamming = 3

  /** q187 — IMAGE near-duplicate pairs (pHash + pigeonhole hamming
    * bands): the image half of corpus dedup — re-encoded/perturbed
    * copies byte-diverge but land within a few pHash bits, and exact
    * hash equality (q129) misses them. The 64-bit aHash over REAL
    * decoded pixels is banded into `maxHamming+1` disjoint 16-bit bands
    * (Manku/Jain/Sarma pigeonhole: hamming ≤ 3 forces at least one
    * band equal — recall is EXACT, not probabilistic), candidates join
    * band-equal only, and the true bit distance verifies each pair.
    * Plan shape: one narrow decode pass, one (pos, band)-keyed
    * self-join over a 3-longs-per-image relation — pixels never
    * shuffle, never join; identical to the text simhash discipline
    * (q44) with the fingerprint swapped for vision. */
  def imageNearDups(spark: SparkSession, dir: String): DataFrame =
    imageNearDupPairs(phashFrame(spark, dir))

  /** The banded pair join over any (doc_id, phash_hi, phash_lo)
    * relation — the full corpus for q187's pair listing, one
    * representative per distinct hash for q188's clustering. */
  private def imageNearDupPairs(hashes: DataFrame): DataFrame = {
    val numBands = ImgMaxHamming + 1 // 4 × 16-bit bands, 2 per 32-bit half
    val bandBits = 64 / numBands
    // the pigeonhole guarantee needs every hash bit covered by exactly
    // one band, and the per-half arithmetic needs bands that never
    // straddle the 32-bit halves — fail loudly if a future ImgMaxHamming
    // change breaks either (the oracle shares the formula, so the
    // parity gate could NOT catch a silent recall loss)
    require(64 % numBands == 0 && 32 % bandBits == 0,
      s"$numBands bands of $bandBits bits don't tile the 32-bit halves")
    val mask = (1L << bandBits) - 1
    // band over the TWO 32-bit halves directly: combining into one
    // 64-bit long would set the sign bit for half the hashes, and
    // DuckDB rejects the 1<<63 shift the replay would need — per-half
    // arithmetic keeps every intermediate non-negative in both engines
    def bandOf(i: Int) = {
      val bit = i * bandBits
      val (half, off) =
        if (bit < 32) ("phash_lo", bit) else ("phash_hi", bit - 32)
      shiftright(col(half), off).bitwiseAND(mask)
    }
    // the hash relation feeds both self-join sides; cached like q44's
    // band relation (lazy result — cache left to LRU/clearCache)
    val bands = hashes
      .select(col("doc_id").as("id"), col("phash_hi"), col("phash_lo"),
        posexplode(array((0 until numBands).map(bandOf): _*))
          .as(Seq("pos", "band")))
      .persist()
    bands.as("x").join(bands.as("y"),
        col("x.pos") === col("y.pos") && col("x.band") === col("y.band") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        (bit_count(col("x.phash_hi").bitwiseXOR(col("y.phash_hi"))) +
          bit_count(col("x.phash_lo").bitwiseXOR(col("y.phash_lo"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= ImgMaxHamming)
      .distinct()
  }

  private lazy val phashOracle: String = s"""
    WITH ${imageHashCtes("")},
    sizes AS (SELECT hi, lo, COUNT(*) AS n_same FROM hs GROUP BY 1, 2)
    SELECT h.doc_id, h.hi AS phash_hi, h.lo AS phash_lo, s.n_same
    FROM hs h JOIN sizes s ON s.hi = h.hi AND s.lo = h.lo"""

  /** The q129 pixel/hash replay plus the pigeonhole band join as a
    * prefixable CTE chain ending in `${p}ipairs` (a, b, hamming) —
    * bands over the two 32-bit halves (2 per half), hamming as the sum
    * of per-half popcounts; every intermediate stays non-negative.
    * Prefixed so the chain composes with the text-dedup CTEs (q188)
    * without name collisions. */
  /** The per-image hash replay alone — the CTE chain ending in `${p}hs`
    * (doc_id, hi, lo), shared by the q129 exact-group oracle and the
    * banded pair chain: the synthetic-pixel formulas and the
    * grayscale/threshold arithmetic live in ONE place. */
  private def imageHashCtes(p: String): String =
    s"""${p}params AS (
      SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h,
        (doc_id % 2) + 3 AS ch
      FROM documents),
    ${p}gc AS (
      SELECT p.doc_id, i.i, p.ch,
        (3 * (((i.i % 8) * p.w) // 8) + 7 * (((i.i // 8) * p.h) // 8)
          + 11 * c.c + p.doc_id) % 256 AS v
      FROM ${p}params p, range(64) i(i), range(4) c(c)
      WHERE c.c < p.ch),
    ${p}g8 AS (SELECT doc_id, i, SUM(v) // MAX(ch) AS g
      FROM ${p}gc GROUP BY doc_id, i),
    ${p}m AS (SELECT doc_id, SUM(g) // 64 AS mean
      FROM ${p}g8 GROUP BY doc_id),
    ${p}hs AS (
      SELECT g8.doc_id,
        CAST(SUM(CASE WHEN g > mean AND i >= 32
          THEN (CAST(1 AS BIGINT) << CAST(i - 32 AS INT)) ELSE 0 END)
          AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN g > mean AND i < 32
          THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END)
          AS BIGINT) AS lo
      FROM ${p}g8 g8 JOIN ${p}m USING (doc_id) GROUP BY 1)"""

  private[queries] def imagePairCtes(p: String): String = {
    val numBands = ImgMaxHamming + 1
    val bandBits = 64 / numBands
    require(64 % numBands == 0 && 32 % bandBits == 0,
      s"$numBands bands of $bandBits bits don't tile the 32-bit halves")
    val mask = (1L << bandBits) - 1
    s"""${imageHashCtes(p)},
    ${p}withpos AS (
      SELECT doc_id AS id, hi, lo,
        unnest(${(0 until numBands).mkString("[", ", ", "]")}) AS pos
      FROM ${p}hs),
    ${p}bands AS (
      SELECT id, hi, lo, pos,
        CASE WHEN pos * $bandBits < 32
             THEN (lo >> (pos * $bandBits)) & $mask
             ELSE (hi >> (pos * $bandBits - 32)) & $mask END AS band
      FROM ${p}withpos),
    ${p}ipairs AS (
      SELECT DISTINCT x.id AS a, y.id AS b,
        CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
          AS BIGINT) AS hamming
      FROM ${p}bands x JOIN ${p}bands y
        ON x.pos = y.pos AND x.band = y.band AND x.id < y.id
      WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
        <= $ImgMaxHamming)"""
  }

  private val imageNearDupsOracle: String =
    s"""WITH ${imagePairCtes("")}
    SELECT a, b, hamming FROM ipairs"""

  /** q202 — image duplicate GROUPS, the production form of q187's pair
    * listing (VERDICT r11 "what's wrong" 2: the listing is inherently
    * quadratic within identical-hash groups — a viral image with 1M
    * copies would emit 5·10¹¹ pairs). What a curation pipeline actually
    * consumes is per-image GROUP MEMBERSHIP: identical-hash groups
    * collapse to their min-id representative via O(group) star edges,
    * the hamming band join runs over one representative per DISTINCT
    * hash, and connected components label every image with its
    * cluster's canonical id + group sizes. Output is O(corpus) rows and
    * every intermediate is O(distinct hashes ∪ groups) — the quadratic
    * corner is gone while the ORACLE keeps the all-pairs closure as the
    * independent witness that the collapsed graph clusters identically. */
  def imageDupGroups(spark: SparkSession, dir: String): DataFrame = {
    val hashes = phashFrame(spark, dir)
    val reps = hashes.groupBy("phash_hi", "phash_lo")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("exact_n"))
    val withRep = hashes.join(reps, Seq("phash_hi", "phash_lo"))
    val star = withRep.filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a"), col("doc_id").as("b"))
    val crossPairs = imageNearDupPairs(
      reps.select(col("rep").as("doc_id"), col("phash_hi"), col("phash_lo")))
      .select(col("a"), col("b"))
    val cc = graft.dedup.Dedup.connectedComponents(
      star.unionByName(crossPairs).distinct())
    val labeled = withRep
      .join(cc, withRep("doc_id") === cc("id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("canonical"),
        col("exact_n"))
    val sizes = labeled.groupBy("canonical").agg(count(lit(1)).as("group_n"))
    labeled.join(sizes, "canonical")
      .select(col("doc_id"), col("canonical"), col("exact_n"),
        col("group_n"), (col("doc_id") === col("canonical")).as("is_canonical"))
  }

  private val imageDupGroupsOracle: String =
    s"""WITH RECURSIVE ${imagePairCtes("")},
    exact_sizes AS (
      SELECT hi, lo, COUNT(*) AS exact_n FROM hs GROUP BY 1, 2),
    edges AS (
      SELECT a AS src, b AS dst FROM ipairs
      UNION
      SELECT b AS src, a AS dst FROM ipairs),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    cc AS (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src),
    labeled AS (
      SELECT h.doc_id, h.hi, h.lo,
        COALESCE(c.cluster_id, h.doc_id) AS canonical
      FROM hs h LEFT JOIN cc c ON c.id = h.doc_id),
    sizes AS (
      SELECT canonical, COUNT(*) AS group_n FROM labeled GROUP BY 1)
    SELECT l.doc_id, l.canonical, e.exact_n, s.group_n,
      l.doc_id = l.canonical AS is_canonical
    FROM labeled l
    JOIN exact_sizes e ON e.hi = l.hi AND e.lo = l.lo
    JOIN sizes s USING (canonical)"""

  /** q188 — MULTIMODAL dedup clusters: a document pair is a duplicate
    * if its TEXT is near-identical (q21's verified minhash/LSH pairs)
    * OR its IMAGE is (q187's hamming-banded pHash pairs) — the edge
    * sets union and connected components collapse the combined graph,
    * which is how a real multimodal corpus dedups: a re-captioned image
    * post and a re-imaged text post are both duplicates even though
    * each single modality misses one of them. Both pair generators keep
    * their banded (never all-pairs) shapes; the union adds no new
    * shuffle class, and the shared adaptive CC (driver union-find
    * small, pointer-jumping at scale) labels the result. The oracle
    * composes both CTE chains (prefix-namespaced) and replays the
    * recursive closure. */
  def multimodalDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val (textPairs, release) = graft.dedup.Dedup
      .minhashNearDuplicatesWithRelease(docs, "doc_id", "text",
        DedupQueries.K, DedupQueries.NH, DedupQueries.RPB, threshold = 0.5)
    // the image side does NOT enumerate pairs (q187's listing semantic
    // is inherently quadratic within identical-hash groups — a viral
    // image with 1M copies would emit 5·10¹¹ pairs): clustering only
    // needs CONNECTIVITY, so identical-hash groups collapse via
    // O(group) STAR edges to the group minimum, and the hamming band
    // join runs over one representative per DISTINCT hash. Connected
    // components are identical to the all-pairs formulation (the
    // oracle keeps the quadratic form as the independent witness).
    val hashes = phashFrame(spark, dir)
    val reps = hashes.groupBy("phash_hi", "phash_lo")
      .agg(min(col("doc_id")).as("rep"))
    val star = hashes.join(reps, Seq("phash_hi", "phash_lo"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a"), col("doc_id").as("b"))
    val crossPairs = imageNearDupPairs(
      reps.select(col("rep").as("doc_id"), col("phash_hi"), col("phash_lo")))
    val edges = textPairs.select(col("a"), col("b"))
      .unionByName(star)
      .unionByName(crossPairs.select(col("a"), col("b")))
      .distinct()
    // safe by connectedComponents' eager-materialization contract
    val cc = graft.dedup.Dedup.connectedComponents(edges)
    release()
    cc
  }

  private val multimodalDedupOracle: String =
    s"""WITH RECURSIVE ${DedupQueries.lshPairCtesFor("documents")},
    ${imagePairCtes("img_")},
    alledges AS (
      SELECT a, b FROM jac WHERE jaccard >= 0.5
      UNION
      SELECT a, b FROM img_ipairs),
    edges AS (
      SELECT a AS src, b AS dst FROM alledges
      UNION ALL
      SELECT b AS src, a AS dst FROM alledges),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src AS id, LEAST(src, MIN(dst)) AS cluster_id
    FROM reach GROUP BY src"""

  def pngDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          PngCodec.decode(MediaSynth.pixelPng(id)) match {
            case Some(img) =>
              val n = img.pixels.length
              var sum = 0L; var wsum = 0L; var i = 0
              while (i < n) {
                val v = img.pixels(i) & 0xff
                sum += v; wsum += i.toLong * v
                i += 1
              }
              PngStats(id, img.width.toLong, img.height.toLong,
                img.channels.toLong, img.width.toLong * img.height,
                sum, wsum, decode_ok = true)
            case None =>
              PngStats(id, -1L, -1L, -1L, -1L, -1L, -1L, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  private val pngOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h,
        (doc_id % 2) + 3 AS ch
      FROM documents),
    px AS (
      SELECT p.doc_id, p.w, p.h, p.ch, x.x, y.y, c.c,
        (3 * x.x + 7 * y.y + 11 * c.c + p.doc_id) % 256 AS v
      FROM params p, range(20) x(x), range(16) y(y), range(4) c(c)
      WHERE x.x < p.w AND y.y < p.h AND c.c < p.ch)
    SELECT doc_id,
      CAST(MAX(w) AS BIGINT) AS width,
      CAST(MAX(h) AS BIGINT) AS height,
      CAST(MAX(ch) AS BIGINT) AS channels,
      CAST(MAX(w) * MAX(h) AS BIGINT) AS n_px,
      CAST(SUM(v) AS BIGINT) AS sum_v,
      CAST(SUM(((y * w + x) * ch + c) * v) AS BIGINT) AS wsum_v,
      TRUE AS decode_ok
    FROM px GROUP BY doc_id"""

  /** q90 — REAL resize under the gate: decode → nearest-neighbor resample
    * (longer side capped at [[ResizeMaxSide]], integer arithmetic) →
    * RE-ENCODE → decode again, stats over the final pixels. The full
    * decode→transform→encode cycle must round-trip exactly; the oracle
    * recomputes every resampled pixel from the closed form
    * (`source x = x·W / w'`, floor division — [[PngCodec.resizeNearest]])
    * without ever touching bytes. Same narrow no-shuffle corpus pass as
    * q85 with the transform kernel in the middle — the thumbnail/
    * resolution-bucketing stage of a multimodal training pipeline. */
  private val ResizeMaxSide = 8

  final case class PngResizeStats(
      doc_id: Long,
      width: Long,
      height: Long,
      channels: Long,
      resized: Boolean,
      sum_v: Long,
      wsum_v: Long)

  def pngResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val img = PngCodec.decode(MediaSynth.pixelPng(id)).get
          val (nw, nh) = PngCodec.capDims(img.width, img.height, ResizeMaxSide)
          val changed = (nw, nh) != (img.width, img.height)
          val out0 =
            if (changed) PngCodec.resizeNearest(img, nw, nh) else img
          // prove the cycle: re-encode with rotating filters, decode back
          val out = PngCodec.decode(
            PngCodec.encode(out0, y => ((id + y) % 5).toInt)).get
          val n = out.pixels.length
          var sum = 0L; var wsum = 0L; var i = 0
          while (i < n) {
            val v = out.pixels(i) & 0xff
            sum += v; wsum += i.toLong * v
            i += 1
          }
          PngResizeStats(id, out.width.toLong, out.height.toLong,
            out.channels.toLong, changed, sum, wsum)
        }
      }
      .toDF()
  }

  private val pngResizeOracle: String = s"""
    WITH params AS (
      SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h,
        (doc_id % 2) + 3 AS ch,
        greatest((doc_id % 16) + 4, (doc_id % 12) + 4) AS m
      FROM documents),
    dims AS (
      SELECT doc_id, w, h, ch, m > $ResizeMaxSide AS resized,
        CASE WHEN m > $ResizeMaxSide
          THEN greatest(1, (w * $ResizeMaxSide) // m) ELSE w END AS w2,
        CASE WHEN m > $ResizeMaxSide
          THEN greatest(1, (h * $ResizeMaxSide) // m) ELSE h END AS h2
      FROM params),
    px AS (
      SELECT d.doc_id, d.w2, d.h2, d.ch, d.resized, x.x, y.y, c.c,
        (3 * ((x.x * d.w) // d.w2) + 7 * ((y.y * d.h) // d.h2)
          + 11 * c.c + d.doc_id) % 256 AS v
      FROM dims d, range(20) x(x), range(16) y(y), range(4) c(c)
      WHERE x.x < d.w2 AND y.y < d.h2 AND c.c < d.ch)
    SELECT doc_id,
      CAST(MAX(w2) AS BIGINT) AS width,
      CAST(MAX(h2) AS BIGINT) AS height,
      CAST(MAX(ch) AS BIGINT) AS channels,
      bool_or(resized) AS resized,
      CAST(SUM(v) AS BIGINT) AS sum_v,
      CAST(SUM(((y * w2 + x) * ch + c) * v) AS BIGINT) AS wsum_v
    FROM px GROUP BY doc_id"""

  /** q91 — REAL audio sample decode under the gate, the PCM sibling of
    * q85: each doc maps to a complete 16-bit PCM WAV whose interleaved
    * samples follow a closed form ([[graft.multimodal.MediaSynth.pcmWav]]);
    * Spark must walk the RIFF chunks and extract signed little-endian
    * samples ([[graft.multimodal.AudioHeaders.pcm16]]) while the oracle
    * recomputes the position-weighted sample sums by pure arithmetic.
    * PCM is lossless sample extraction — exactly why a pure-JVM decode is
    * COMPLETE for this subset, unlike the entropy-coded formats that stay
    * stubbed. Narrow no-shuffle corpus pass. */
  final case class PcmStats(
      doc_id: Long,
      sample_rate: Long,
      channels: Long,
      n_samples: Long,
      duration_ms: Long,
      sum_s: Long,
      wsum_s: Long)

  def pcmDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val a = AudioHeaders.pcm16(MediaSynth.pcmWav(id)).get
          var sum = 0L; var wsum = 0L; var i = 0
          while (i < a.samples.length) {
            sum += a.samples(i)
            wsum += i.toLong * a.samples(i)
            i += 1
          }
          PcmStats(id, a.info.sampleRate.toLong, a.info.channels.toLong,
            a.samples.length.toLong, a.info.durationMs, sum, wsum)
        }
      }
      .toDF()
  }

  private val pcmOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 2) + 1 AS ch,
        CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
          ELSE 44100 END AS rate,
        ((doc_id % 50) + 10) * ((doc_id % 2) + 1) AS n
      FROM documents),
    s AS (
      SELECT p.doc_id, p.ch, p.rate, p.n, i.i,
        ((2293 * i.i + 7919 * p.doc_id) % 65536) - 32768 AS v
      FROM params p, range(120) i(i)
      WHERE i.i < p.n)
    SELECT doc_id,
      CAST(MAX(rate) AS BIGINT) AS sample_rate,
      CAST(MAX(ch) AS BIGINT) AS channels,
      CAST(MAX(n) AS BIGINT) AS n_samples,
      CAST((MAX(n) * 2 * 1000) // (MAX(rate) * MAX(ch) * 2) AS BIGINT)
        AS duration_ms,
      CAST(SUM(v) AS BIGINT) AS sum_s,
      CAST(SUM(i * v) AS BIGINT) AS wsum_s
    FROM s GROUP BY doc_id"""

  /** q92 — REAL audio decimation under the gate, the audio twin of q90's
    * resize cycle: decode → keep every 2nd frame
    * ([[graft.multimodal.AudioOps.decimate]]) → RE-ENCODE to WAV → decode
    * again, stats over the final samples. Exactly replayable because
    * filterless decimation is `out frame f = in frame 2f` (the aliasing
    * trade-off is documented on the op — a production resampler low-pass
    * filters first, which would not be integer-replayable). */
  final case class PcmDecimateStats(
      doc_id: Long,
      sample_rate: Long,
      n_frames: Long,
      duration_ms: Long,
      sum_s: Long,
      wsum_s: Long)

  def pcmDecimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val ch = MediaSynth.pcmChannels(id)
          val a = AudioHeaders.pcm16(MediaSynth.pcmWav(id)).get
          val d = graft.multimodal.AudioOps.decimate(a, ch, factor = 2)
          // prove the cycle: back through the container and out again
          val rt = AudioHeaders.pcm16(
            graft.multimodal.AudioOps.wavBytes(d.info, d.samples, ch)).get
          var sum = 0L; var wsum = 0L; var i = 0
          while (i < rt.samples.length) {
            sum += rt.samples(i)
            wsum += i.toLong * rt.samples(i)
            i += 1
          }
          PcmDecimateStats(id, rt.info.sampleRate.toLong,
            (rt.samples.length / ch).toLong, rt.info.durationMs, sum, wsum)
        }
      }
      .toDF()
  }

  private val pcmDecimateOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 2) + 1 AS ch,
        CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
          ELSE 44100 END AS rate,
        (doc_id % 50) + 10 AS frames
      FROM documents),
    dims AS (
      SELECT doc_id, ch, rate // 2 AS rate2,
        (frames + 1) // 2 AS frames2
      FROM params),
    s AS (
      SELECT d.doc_id, d.ch, d.rate2, d.frames2, j.j,
        ((2293 * ((j.j // d.ch) * 2 * d.ch + (j.j % d.ch))
          + 7919 * d.doc_id) % 65536) - 32768 AS v
      FROM dims d, range(60) j(j)
      WHERE j.j < d.frames2 * d.ch)
    SELECT doc_id,
      CAST(MAX(rate2) AS BIGINT) AS sample_rate,
      CAST(MAX(frames2) AS BIGINT) AS n_frames,
      CAST((MAX(frames2) * MAX(ch) * 2 * 1000)
        // (MAX(rate2) * MAX(ch) * 2) AS BIGINT) AS duration_ms,
      CAST(SUM(v) AS BIGINT) AS sum_s,
      CAST(SUM(j * v) AS BIGINT) AS wsum_s
    FROM s GROUP BY doc_id"""

  /** q151 — REAL anti-aliased resampling under the gate, the filtered
    * successor to q92's filterless decimation: decode → 7-tap integer
    * halfband FIR downsample-by-2
    * ([[graft.multimodal.AudioOps.halfbandDownsample]]) → re-encode to
    * WAV → decode again, stats over the final samples. Every output
    * sample is a 5-sample integer convolution with floor rounding and a
    * 16-bit clamp, all replayed by the oracle from the q91 closed form —
    * a wrong tap, edge-replication off-by-one, rounding direction, or
    * phase error (centering on odd instead of even frames) shifts
    * `sum_s`/`wsum_s` and fails the hash. Narrow no-shuffle corpus
    * pass. */
  def pcmHalfband(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val ch = MediaSynth.pcmChannels(id)
          val a = AudioHeaders.pcm16(MediaSynth.pcmWav(id)).get
          val d = graft.multimodal.AudioOps.halfbandDownsample(a, ch)
          val rt = AudioHeaders.pcm16(
            graft.multimodal.AudioOps.wavBytes(d.info, d.samples, ch)).get
          var sum = 0L; var wsum = 0L; var i = 0
          while (i < rt.samples.length) {
            sum += rt.samples(i)
            wsum += i.toLong * rt.samples(i)
            i += 1
          }
          PcmDecimateStats(id, rt.info.sampleRate.toLong,
            (rt.samples.length / ch).toLong, rt.info.durationMs, sum, wsum)
        }
      }
      .toDF()
  }

  private val pcmHalfbandOracle: String = {
    // closed-form input sample at clamped frame (2n + off), channel c —
    // n = j // ch, c = j % ch over the OUTPUT interleaved index j
    def vAt(off: Int): String = {
      val f = s"GREATEST(0, LEAST(d.frames - 1, 2 * (j.j // d.ch) + ($off)))"
      s"(((2293 * ($f * d.ch + (j.j % d.ch)) + 7919 * d.doc_id) % 65536) - 32768)"
    }
    val acc = s"(- ${vAt(-3)} + 9 * ${vAt(-1)} + 16 * ${vAt(0)}" +
      s" + 9 * ${vAt(1)} - ${vAt(3)})"
    val v = s"GREATEST(-32768, LEAST(32767, (($acc + 16 + 2097152) // 32) - 65536))"
    s"""
    WITH params AS (
      SELECT doc_id, (doc_id % 2) + 1 AS ch,
        CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
          ELSE 44100 END AS rate,
        (doc_id % 50) + 10 AS frames
      FROM documents),
    dims AS (
      SELECT doc_id, ch, frames, rate // 2 AS rate2,
        (frames + 1) // 2 AS frames2
      FROM params),
    s AS (
      SELECT d.doc_id, d.ch, d.rate2, d.frames2, j.j, $v AS v
      FROM dims d, range(60) j(j)
      WHERE j.j < d.frames2 * d.ch)
    SELECT doc_id,
      CAST(MAX(rate2) AS BIGINT) AS sample_rate,
      CAST(MAX(frames2) AS BIGINT) AS n_frames,
      CAST((MAX(frames2) * MAX(ch) * 2 * 1000)
        // (MAX(rate2) * MAX(ch) * 2) AS BIGINT) AS duration_ms,
      CAST(SUM(v) AS BIGINT) AS sum_s,
      CAST(SUM(j * v) AS BIGINT) AS wsum_s
    FROM s GROUP BY doc_id"""
  }

  /** q275 — ARBITRARY-RATIO POLYPHASE RESAMPLE under the gate
    * ([[graft.multimodal.AudioOps.polyphaseResample]] — VERDICT r14
    * task 7, q151's integer halfband generalized from ÷2 to rational
    * L/M): the classic 48 kHz → 32 kHz (3:2 down, L=2 M=3) over the
    * synth PCM corpus — decode → polyphase triangular-kernel FIR
    * (every branch's taps sum to exactly D=K²/L, so DC gain is exactly
    * 1 in integer arithmetic) → re-encode to WAV → decode → stats. The
    * oracle replays BOTH polyphase branches from the q91 closed form
    * (even outputs: taps 2/4/2; odd: 1/3/3/1, offset-nonnegative floor
    * division, 16-bit clamp, edge replication) — a wrong tap, phase,
    * rounding direction or edge clamp shifts `sum_s`/`wsum_s` and
    * fails the hash. Narrow no-shuffle corpus pass, like every codec
    * kernel here. */
  def pcmPolyphase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val ch = MediaSynth.pcmChannels(id)
          val a0 = AudioHeaders.pcm16(MediaSynth.pcmWav(id)).get
          // the ratio is the subject; pin the nominal rate to the
          // classic 48 kHz so 2/3 of it is integral for every doc
          val a = a0.copy(info = a0.info.copy(sampleRate = 48000))
          val d = graft.multimodal.AudioOps.polyphaseResample(a, ch, 2, 3)
          val rt = AudioHeaders.pcm16(
            graft.multimodal.AudioOps.wavBytes(d.info, d.samples, ch)).get
          var sum = 0L; var wsum = 0L; var i = 0
          while (i < rt.samples.length) {
            sum += rt.samples(i)
            wsum += i.toLong * rt.samples(i)
            i += 1
          }
          PcmDecimateStats(id, rt.info.sampleRate.toLong,
            (rt.samples.length / ch).toLong, rt.info.durationMs, sum, wsum)
        }
      }
      .toDF()
  }

  private val pcmPolyphaseOracle: String = {
    // closed-form input sample at clamped frame f, channel c = j % ch;
    // output frame n = j // ch sits at fine-grid position 3n (L=2, M=3,
    // K=4, D=8): even n touches frames base±1 with taps 2/4/2, odd n
    // frames base-1..base+2 with taps 1/3/3/1, base = (3n) // 2
    def vAt(fExpr: String): String = {
      val f = s"GREATEST(0, LEAST(d.frames - 1, $fExpr))"
      s"(((2293 * ($f * d.ch + (j.j % d.ch)) + 7919 * d.doc_id) % 65536) - 32768)"
    }
    val base = "((3 * (j.j // d.ch)) // 2)"
    val accEven = s"(2 * ${vAt(s"$base - 1")} + 4 * ${vAt(base)}" +
      s" + 2 * ${vAt(s"$base + 1")})"
    val accOdd = s"(${vAt(s"$base - 1")} + 3 * ${vAt(base)}" +
      s" + 3 * ${vAt(s"$base + 1")} + ${vAt(s"$base + 2")})"
    val acc = s"(CASE WHEN (j.j // d.ch) % 2 = 0 THEN $accEven" +
      s" ELSE $accOdd END)"
    val v = s"GREATEST(-32768, LEAST(32767, (($acc + 4 + 524288) // 8) - 65536))"
    s"""
    WITH params AS (
      SELECT doc_id, (doc_id % 2) + 1 AS ch,
        (doc_id % 50) + 10 AS frames
      FROM documents),
    dims AS (
      SELECT doc_id, ch, frames,
        ((frames - 1) * 2) // 3 + 1 AS frames2
      FROM params),
    s AS (
      SELECT d.doc_id, d.ch, d.frames2, j.j, $v AS v
      FROM dims d, range(80) j(j)
      WHERE j.j < d.frames2 * d.ch)
    SELECT doc_id,
      CAST(32000 AS BIGINT) AS sample_rate,
      CAST(MAX(frames2) AS BIGINT) AS n_frames,
      CAST((MAX(frames2) * MAX(ch) * 2 * 1000)
        // (32000 * MAX(ch) * 2) AS BIGINT) AS duration_ms,
      CAST(SUM(v) AS BIGINT) AS sum_s,
      CAST(SUM(j * v) AS BIGINT) AS wsum_s
    FROM s GROUP BY doc_id"""
  }

  /** q308 — REAL FLAC DECODE under the gate (VERDICT r15 task 5 — the
    * audio family's first COMPRESSED codec, integer-exact like the
    * JPEG ladder): each doc maps to a complete FLAC stream
    * ([[graft.multimodal.MediaSynth.flacBytes]] — real STREAMINFO,
    * multi-frame fixed-blocksize layout, per-channel best FIXED
    * predictor, Rice-coded residuals, true CRC-8/CRC-16/MD5). Spark
    * must parse the metadata walk, every frame header, subframe type
    * and Rice partition, reconstruct through the polynomial predictors,
    * and VERIFY all three integrity fields
    * ([[graft.multimodal.FlacCodec.decode]]); the oracle replays the
    * decoded samples by pure arithmetic — losslessness is exactly what
    * makes a closed form possible. `md5_ok` attests the verified
    * signature; `truncation_declines` that a cut stream returns None
    * like [[graft.multimodal.AudioHeaders.pcm16]], never a throw.
    * Narrow no-shuffle corpus pass. */
  final case class FlacStats(
      doc_id: Long,
      sample_rate: Long,
      channels: Long,
      n_samples: Long,
      sum_s: Long,
      wsum_s: Long,
      md5_ok: Boolean,
      truncation_declines: Boolean)

  def flacDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val bytes = MediaSynth.flacBytes(id)
          val a = FlacCodec.decode(bytes).get
          val declines =
            FlacCodec.decode(bytes.dropRight(3)).isEmpty
          var sum = 0L; var wsum = 0L; var i = 0
          while (i < a.samples.length) {
            sum += a.samples(i)
            wsum += i.toLong * a.samples(i)
            i += 1
          }
          FlacStats(id, a.sampleRate.toLong, a.channels.toLong,
            a.samples.length.toLong, sum, wsum, a.md5Ok, declines)
        }
      }
      .toDF()
  }

  private val flacOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 2) + 1 AS ch,
        CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
          ELSE 44100 END AS rate,
        ((doc_id % 40) + 20) * ((doc_id % 2) + 1) AS n
      FROM documents),
    s AS (
      SELECT p.doc_id, p.ch, p.rate, p.n, i.i,
        ((2293 * i.i + 7919 * p.doc_id) % 4096) - 2048 AS v
      FROM params p, range(120) i(i)
      WHERE i.i < p.n)
    SELECT doc_id,
      CAST(MAX(rate) AS BIGINT) AS sample_rate,
      CAST(MAX(ch) AS BIGINT) AS channels,
      CAST(MAX(n) AS BIGINT) AS n_samples,
      CAST(SUM(v) AS BIGINT) AS sum_s,
      CAST(SUM(i * v) AS BIGINT) AS wsum_s,
      true AS md5_ok, true AS truncation_declines
    FROM s GROUP BY doc_id"""

  /** q93 — windowed audio energy features under the gate: non-overlapping
    * 16-frame windows over the decoded samples, each exporting the EXACT
    * sum of squared samples and negative-sample count
    * ([[graft.multimodal.AudioOps.windowedEnergy]]) — the integer
    * skeleton of RMS/VAD feature extraction (loudness is a downstream
    * `sqrt(sumSq/n)`); keeping integers is what lets the gate
    * hash-compare the whole feature tensor. One row per (doc, window). */
  private val EnergyWindowFrames = 16

  final case class PcmEnergyRow(
      doc_id: Long,
      window_id: Long,
      n_frames: Long,
      sum_sq: Long,
      n_neg: Long)

  def pcmEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val ch = MediaSynth.pcmChannels(id)
          val a = AudioHeaders.pcm16(MediaSynth.pcmWav(id)).get
          graft.multimodal.AudioOps.windowedEnergy(a, ch, EnergyWindowFrames)
            .map(w => PcmEnergyRow(id, w.window_id.toLong,
              w.nFrames.toLong, w.sumSq, w.nNeg))
        }
      }
      .toDF()
  }

  private val pcmEnergyOracle: String = s"""
    WITH params AS (
      SELECT doc_id, (doc_id % 2) + 1 AS ch, (doc_id % 50) + 10 AS frames
      FROM documents),
    s AS (
      SELECT p.doc_id, p.ch, p.frames,
        (i.i // p.ch) // $EnergyWindowFrames AS window_id,
        i.i // p.ch AS frame,
        ((2293 * i.i + 7919 * p.doc_id) % 65536) - 32768 AS v
      FROM params p, range(120) i(i)
      WHERE i.i < p.frames * p.ch)
    SELECT doc_id,
      CAST(window_id AS BIGINT) AS window_id,
      CAST(COUNT(DISTINCT frame) AS BIGINT) AS n_frames,
      CAST(SUM(v * v) AS BIGINT) AS sum_sq,
      CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
    FROM s GROUP BY doc_id, window_id"""

  /** VAD threshold and hangover: a window is SPEECH-ACTIVE when its
    * energy clears the threshold (≈ the corpus median, measured), and a
    * segment keeps running through up to [[VadHangover]] sub-threshold
    * windows after an active one — the hangover smoothing every
    * production VAD applies so trailing fricatives/pauses don't shatter
    * an utterance into fragments. */
  private val VadThreshold = 8000000000L
  private val VadHangover = 1

  /** q282 — VOICE-ACTIVITY SEGMENT EXTRACTION over the PCM corpus: the
    * speech-segmentation pass an audio training pipeline runs before
    * transcription/embedding (energy gate → hangover smoothing →
    * maximal-run merge). Builds on q93's exact per-window energies;
    * activity, hangover, and the gaps-and-islands merge are all integer
    * window functions PARTITIONED BY CLIP — per-clip state never leaves
    * its partition, so 100 TB of audio segments with one doc-keyed
    * shuffle and no global ordering anywhere. Output: one row per
    * (clip, segment) with its window span and exact energy mass.
    *
    * (A production VAD swaps the energy gate for a model score per
    * window; the segmentation lattice — threshold, hangover, merge —
    * is exactly this query.) */
  def vadSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("window_id")
    pcmEnergy(spark, dir)
      .withColumn("active",
        when(col("sum_sq") >= VadThreshold, 1L).otherwise(0L))
      // window ids are dense per clip, so a ROWS frame IS the
      // H-window hangover lookback
      .withColumn("kept",
        max("active").over(byDoc.rowsBetween(-VadHangover, 0)))
      .filter(col("kept") === 1)
      .withColumn("grp", col("window_id") - row_number().over(byDoc))
      .groupBy("doc_id", "grp")
      .agg(min("window_id").as("seg_start"),
        max("window_id").as("seg_end"),
        count(lit(1)).as("n_windows"),
        sum("active").as("n_active"),
        sum("sum_sq").as("sum_energy"))
      .select("doc_id", "seg_start", "seg_end", "n_windows", "n_active",
        "sum_energy")
  }

  private val vadSegmentsOracle: String = s"""
    WITH params AS (
      SELECT doc_id, (doc_id % 2) + 1 AS ch, (doc_id % 50) + 10 AS frames
      FROM documents),
    s AS (
      SELECT p.doc_id,
        (i.i // p.ch) // $EnergyWindowFrames AS window_id,
        ((2293 * i.i + 7919 * p.doc_id) % 65536) - 32768 AS v
      FROM params p, range(120) i(i)
      WHERE i.i < p.frames * p.ch),
    w AS (
      SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
        SUM(v * v) AS sum_sq
      FROM s GROUP BY 1, 2),
    a AS (
      SELECT *, CASE WHEN sum_sq >= $VadThreshold THEN 1 ELSE 0 END
        AS active
      FROM w),
    k AS (
      SELECT *, max(active) OVER (PARTITION BY doc_id ORDER BY window_id
        ROWS BETWEEN $VadHangover PRECEDING AND CURRENT ROW) AS kept
      FROM a),
    g AS (
      SELECT *, window_id - row_number() OVER (PARTITION BY doc_id
        ORDER BY window_id) AS grp
      FROM k WHERE kept = 1)
    SELECT doc_id,
      MIN(window_id) AS seg_start,
      MAX(window_id) AS seg_end,
      COUNT(*) AS n_windows,
      CAST(SUM(active) AS BIGINT) AS n_active,
      CAST(SUM(sum_sq) AS BIGINT) AS sum_energy
    FROM g GROUP BY doc_id, grp"""

  /** q195 — integer-DFT SPECTRAL energy bins over the q93 windows
    * ([[graft.multimodal.AudioOps.spectralBins]]), the MFCC-skeleton
    * step after raw energy: per 16-frame window, the channel-0 DFT at
    * bins 1..4 using the hardcoded 6-bit fixed-point twiddle table
    * (round(cos·64) — the integer form an embedded Goertzel runs;
    * hardcoding removes ALL trig/rounding boundary risk between
    * engines). re/im/energy are pure integer product-sums — re²+im²
    * stays inside a long by the Q=64 bound — so the gate hash-compares
    * the whole spectral tensor bitwise against the oracle's replay from
    * the closed-form sample generator. A real MFCC pipeline follows
    * with mel pooling + log + DCT (floating point by nature); the
    * integer bins are the part a hash gate can pin exactly. */
  private val SpectralBins = 4

  final case class SpectralRow(
      doc_id: Long,
      window_id: Long,
      bin: Long,
      re_q: Long,
      im_q: Long,
      energy_q: Long)

  def pcmSpectral(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val ch = MediaSynth.pcmChannels(id)
          val a = AudioHeaders.pcm16(MediaSynth.pcmWav(id)).get
          graft.multimodal.AudioOps
            .spectralBins(a, ch, EnergyWindowFrames, SpectralBins)
            .map(b => SpectralRow(id, b.window_id.toLong, b.bin.toLong,
              b.reQ, b.imQ, b.reQ * b.reQ + b.imQ * b.imQ))
        }
      }
      .toDF()
  }

  private val pcmSpectralOracle: String = {
    val qc = graft.multimodal.AudioOps.QCos16.zipWithIndex
      .map { case (c, i) => s"($i, $c)" }.mkString(", ")
    s"""
    WITH params AS (
      SELECT doc_id, (doc_id % 2) + 1 AS ch, (doc_id % 50) + 10 AS frames
      FROM documents),
    qc(i, c) AS (VALUES $qc),
    s AS (
      SELECT p.doc_id, f.f // $EnergyWindowFrames AS window_id,
        f.f % $EnergyWindowFrames AS n,
        ((2293 * (f.f * p.ch) + 7919 * p.doc_id) % 65536) - 32768 AS v
      FROM params p, range(60) f(f)
      WHERE f.f < p.frames),
    b AS (SELECT CAST(unnest(range(1, ${SpectralBins + 1})) AS BIGINT) AS bin),
    scored AS (
      SELECT s.doc_id, s.window_id, b.bin,
        SUM(s.v * cc.c) AS re_q,
        -SUM(s.v * cs.c) AS im_q
      FROM s CROSS JOIN b
      JOIN qc cc ON cc.i = (b.bin * s.n) % 16
      JOIN qc cs ON cs.i = ((b.bin * s.n - 4) % 16 + 16) % 16
      GROUP BY 1, 2, 3)
    SELECT doc_id, CAST(window_id AS BIGINT) AS window_id, bin,
      CAST(re_q AS BIGINT) AS re_q, CAST(im_q AS BIGINT) AS im_q,
      CAST(re_q * re_q + im_q * im_q AS BIGINT) AS energy_q
    FROM scored"""
  }

  /** q94 — REAL video frame extraction under the gate: each doc maps to a
    * complete ISO-BMFF file with an uncompressed RGB track
    * ([[graft.multimodal.MediaSynth.rawVideoMp4]]); Spark must resolve
    * the stsd/stsz/stco sample table and slice every frame out of mdat by
    * absolute offset ([[graft.multimodal.VideoHeaders.rawVideoFrames]]),
    * keep every 2nd frame (the keyframe-ish sampling pass), and export
    * per-frame position-weighted pixel stats the oracle recomputes from
    * the closed form. Wrong box walk, off-by-one offset, or size-table
    * misread ⇒ different bytes ⇒ hash mismatch. Entropy-coded tracks
    * remain out of subset (documented) — sample-table addressing is the
    * demuxer work and involves no codec. */
  final case class FrameStats(
      doc_id: Long,
      frame_index: Long,
      width: Long,
      height: Long,
      sum_v: Long,
      wsum_v: Long)

  def videoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val rv = VideoHeaders.rawVideoFrames(MediaSynth.rawVideoMp4(id)).get
          rv.frames.zipWithIndex
            .filter(_._2 % 2 == 0) // stride-2 sampling
            .map { case (frame, f) =>
              var sum = 0L; var wsum = 0L; var i = 0
              while (i < frame.length) {
                val v = frame(i) & 0xff
                sum += v; wsum += i.toLong * v
                i += 1
              }
              FrameStats(id, f.toLong, rv.width.toLong, rv.height.toLong,
                sum, wsum)
            }
        }
      }
      .toDF()
  }

  private val videoFramesOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 4) + 2 AS w, (doc_id % 3) + 2 AS h,
        (doc_id % 5) + 2 AS nf
      FROM documents),
    px AS (
      SELECT p.doc_id, p.w, p.h, 2 * k.k AS f, x.x, y.y, c.c,
        (3 * x.x + 7 * y.y + 11 * c.c + 13 * (2 * k.k) + p.doc_id) % 256 AS v
      FROM params p, range(3) k(k), range(6) x(x), range(5) y(y), range(3) c(c)
      WHERE 2 * k.k < p.nf AND x.x < p.w AND y.y < p.h)
    SELECT doc_id,
      CAST(f AS BIGINT) AS frame_index,
      CAST(MAX(w) AS BIGINT) AS width,
      CAST(MAX(h) AS BIGINT) AS height,
      CAST(SUM(v) AS BIGINT) AS sum_v,
      CAST(SUM(((y * w + x) * 3 + c) * v) AS BIGINT) AS wsum_v
    FROM px GROUP BY doc_id, f"""

  /** q95 — the grayscale (color type 0) half of the PNG decode subset:
    * same inflate+unfilter kernel as q85 at bpp=1, where the Sub/Paeth
    * predictors reference the immediately preceding byte — a distinct
    * arithmetic path a truecolor-only gate would never execute. Same
    * closed-form oracle shape with the channel fixed at 0. */
  def pngGrayDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          PngCodec.decode(MediaSynth.grayPng(id)) match {
            case Some(img) =>
              val n = img.pixels.length
              var sum = 0L; var wsum = 0L; var i = 0
              while (i < n) {
                val v = img.pixels(i) & 0xff
                sum += v; wsum += i.toLong * v
                i += 1
              }
              PngStats(id, img.width.toLong, img.height.toLong,
                img.channels.toLong, img.width.toLong * img.height,
                sum, wsum, decode_ok = true)
            case None =>
              PngStats(id, -1L, -1L, -1L, -1L, -1L, -1L, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  private val pngGrayOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h
      FROM documents),
    px AS (
      SELECT p.doc_id, p.w, p.h, x.x, y.y,
        (3 * x.x + 7 * y.y + p.doc_id) % 256 AS v
      FROM params p, range(20) x(x), range(16) y(y)
      WHERE x.x < p.w AND y.y < p.h)
    SELECT doc_id,
      CAST(MAX(w) AS BIGINT) AS width,
      CAST(MAX(h) AS BIGINT) AS height,
      CAST(1 AS BIGINT) AS channels,
      CAST(MAX(w) * MAX(h) AS BIGINT) AS n_px,
      CAST(SUM(v) AS BIGINT) AS sum_v,
      CAST(SUM((y * w + x) * v) AS BIGINT) AS wsum_v,
      TRUE AS decode_ok
    FROM px GROUP BY doc_id"""

  /** q96 — REAL GIF LZW decode under the gate, the indexed-color sibling
    * of q85: each doc maps to a complete GIF89a
    * ([[graft.multimodal.MediaSynth.gifPayload]]) with genuine
    * variable-width LZW image data (periodic CLEAR resets included);
    * Spark must run the full LZW inflater ([[graft.multimodal.GifCodec]])
    * to recover the palette indices, then resolve each through the global
    * color table, while the oracle recomputes both the index and RGB
    * statistics from the closed forms by pure arithmetic. A wrong code
    * width, broken KwKwK case, or mishandled CLEAR shifts
    * `sum_idx`/`wsum_idx`; a palette-offset bug shifts `sum_rgb`/
    * `wsum_rgb`. Palette sizes sweep all seven GIF code sizes (4..256
    * colors). Same narrow no-shuffle full-corpus decode pass as q85. */
  final case class GifStats(
      doc_id: Long,
      width: Long,
      height: Long,
      n_colors: Long,
      n_px: Long,
      sum_idx: Long,
      wsum_idx: Long,
      sum_rgb: Long,
      wsum_rgb: Long)

  def gifDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          GifCodec.decode(MediaSynth.gifPayload(id)) match {
            case Some(img) =>
              var sumI = 0L; var wsumI = 0L; var sumC = 0L; var wsumC = 0L
              var p = 0
              while (p < img.indices.length) {
                val k = img.indices(p) & 0xff
                val rgb = (img.palette(3 * k) & 0xff) +
                  (img.palette(3 * k + 1) & 0xff) +
                  (img.palette(3 * k + 2) & 0xff)
                sumI += k; wsumI += p.toLong * k
                sumC += rgb; wsumC += p.toLong * rgb
                p += 1
              }
              GifStats(id, img.width.toLong, img.height.toLong,
                img.nColors.toLong, img.indices.length.toLong,
                sumI, wsumI, sumC, wsumC)
            case None =>
              GifStats(id, -1L, -1L, -1L, -1L, -1L, -1L, -1L, -1L)
          }
        }
      }
      .toDF()
  }

  private val gifOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h,
        CASE doc_id % 7 WHEN 0 THEN 4 WHEN 1 THEN 8 WHEN 2 THEN 16
          WHEN 3 THEN 32 WHEN 4 THEN 64 WHEN 5 THEN 128 ELSE 256 END AS nc
      FROM documents),
    px AS (
      SELECT p.doc_id, p.w, p.h, p.nc, x.x, y.y,
        (3 * x.x + 7 * y.y + p.doc_id) % p.nc AS k
      FROM params p, range(20) x(x), range(16) y(y)
      WHERE x.x < p.w AND y.y < p.h),
    rgb AS (
      SELECT doc_id, w, h, nc, x, y, k,
        (5 * k + doc_id) % 256 + (7 * k + 2 * doc_id) % 256
          + (11 * k + 3 * doc_id) % 256 AS v
      FROM px)
    SELECT doc_id,
      CAST(MAX(w) AS BIGINT) AS width,
      CAST(MAX(h) AS BIGINT) AS height,
      CAST(MAX(nc) AS BIGINT) AS n_colors,
      CAST(MAX(w) * MAX(h) AS BIGINT) AS n_px,
      CAST(SUM(k) AS BIGINT) AS sum_idx,
      CAST(SUM((y * w + x) * k) AS BIGINT) AS wsum_idx,
      CAST(SUM(v) AS BIGINT) AS sum_rgb,
      CAST(SUM((y * w + x) * v) AS BIGINT) AS wsum_rgb
    FROM rgb GROUP BY doc_id"""

  /** q97 — indexed-color PNG decode under the gate: color type 3 with a
    * PLTE table, palette sizes sweeping 6..255 (mostly non-powers-of-two,
    * which GIF's 2^n tables can never produce) and the rotating scanline
    * filters of q85 running at bpp=1 over index data. Exercises
    * [[graft.multimodal.PngCodec.decodePaletted]]: PLTE capture in the
    * chunk walk, index-bounds validation, palette resolution. Same stats
    * contract and scale shape as q96. */
  def palettedPngDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          PngCodec.decodePaletted(MediaSynth.palettePng(id)) match {
            case Some(img) =>
              var sumI = 0L; var wsumI = 0L; var sumC = 0L; var wsumC = 0L
              var p = 0
              while (p < img.indices.length) {
                val k = img.indices(p) & 0xff
                val rgb = (img.palette(3 * k) & 0xff) +
                  (img.palette(3 * k + 1) & 0xff) +
                  (img.palette(3 * k + 2) & 0xff)
                sumI += k; wsumI += p.toLong * k
                sumC += rgb; wsumC += p.toLong * rgb
                p += 1
              }
              GifStats(id, img.width.toLong, img.height.toLong,
                img.nColors.toLong, img.indices.length.toLong,
                sumI, wsumI, sumC, wsumC)
            case None =>
              GifStats(id, -1L, -1L, -1L, -1L, -1L, -1L, -1L, -1L)
          }
        }
      }
      .toDF()
  }

  private val palettedOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h,
        (doc_id % 250) + 6 AS nc
      FROM documents),
    px AS (
      SELECT p.doc_id, p.w, p.h, p.nc, x.x, y.y,
        (5 * x.x + 3 * y.y + p.doc_id) % p.nc AS k
      FROM params p, range(20) x(x), range(16) y(y)
      WHERE x.x < p.w AND y.y < p.h),
    rgb AS (
      SELECT doc_id, w, h, nc, x, y, k,
        (3 * k + doc_id) % 256 + (5 * k + 2 * doc_id) % 256
          + (7 * k + 3 * doc_id) % 256 AS v
      FROM px)
    SELECT doc_id,
      CAST(MAX(w) AS BIGINT) AS width,
      CAST(MAX(h) AS BIGINT) AS height,
      CAST(MAX(nc) AS BIGINT) AS n_colors,
      CAST(MAX(w) * MAX(h) AS BIGINT) AS n_px,
      CAST(SUM(k) AS BIGINT) AS sum_idx,
      CAST(SUM((y * w + x) * k) AS BIGINT) AS wsum_idx,
      CAST(SUM(v) AS BIGINT) AS sum_rgb,
      CAST(SUM((y * w + x) * v) AS BIGINT) AS wsum_rgb
    FROM rgb GROUP BY doc_id"""

  /** q114 — image patch extraction (the ViT "patchify" step): each
    * decoded PNG splits into 4×4 pixel tiles (edge tiles truncated), one
    * row per patch with exact per-patch statistics weighted by the
    * GLOBAL raster position — a patch-boundary off-by-one anywhere
    * shifts `wsum_v` and fails the gate. Runs the REAL q85 decode first,
    * so this is decode → patchify end-to-end, the input layout a vision
    * tower trains on. Narrow flatMap, no shuffle; patch count per image
    * is ceil(w/4)·ceil(h/4). */
  private val PatchSide = 4

  final case class PatchStats(
      doc_id: Long,
      patch_id: Long,
      px_x: Long,
      px_y: Long,
      n_px: Long,
      sum_v: Long,
      wsum_v: Long)

  def imagePatches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val img = PngCodec.decode(MediaSynth.pixelPng(id)).get
          val npx = (img.width + PatchSide - 1) / PatchSide
          val npy = (img.height + PatchSide - 1) / PatchSide
          for {
            py <- (0 until npy).iterator
            px <- 0 until npx
          } yield {
            var sum = 0L; var wsum = 0L; var n = 0L
            var y = py * PatchSide
            while (y < math.min((py + 1) * PatchSide, img.height)) {
              var x = px * PatchSide
              while (x < math.min((px + 1) * PatchSide, img.width)) {
                var c = 0
                while (c < img.channels) {
                  val i = (y * img.width + x) * img.channels + c
                  val v = img.pixels(i) & 0xff
                  sum += v; wsum += i.toLong * v
                  c += 1
                }
                n += 1
                x += 1
              }
              y += 1
            }
            PatchStats(id, (py.toLong * npx) + px, px.toLong, py.toLong,
              n, sum, wsum)
          }
        }
      }
      .toDF()
  }

  private val patchOracle: String = s"""
    WITH params AS (
      SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h,
        (doc_id % 2) + 3 AS ch
      FROM documents),
    px AS (
      SELECT p.doc_id, p.w, p.h, p.ch, x.x, y.y, c.c,
        x.x // $PatchSide AS px, y.y // $PatchSide AS py,
        (p.w + ${PatchSide - 1}) // $PatchSide AS npx,
        (3 * x.x + 7 * y.y + 11 * c.c + p.doc_id) % 256 AS v
      FROM params p, range(20) x(x), range(16) y(y), range(4) c(c)
      WHERE x.x < p.w AND y.y < p.h AND c.c < p.ch)
    SELECT doc_id,
      CAST(py * npx + px AS BIGINT) AS patch_id,
      CAST(px AS BIGINT) AS px_x,
      CAST(py AS BIGINT) AS px_y,
      CAST(COUNT(*) / MAX(ch) AS BIGINT) AS n_px,
      CAST(SUM(v) AS BIGINT) AS sum_v,
      CAST(SUM(((y * w + x) * ch + c) * v) AS BIGINT) AS wsum_v
    FROM px GROUP BY doc_id, py, npx, px"""

  /** q121 — heterogeneous decode dispatch, the capstone of the media
    * family: ONE corpus where each document carries a different
    * container (truecolor PNG, grayscale PNG, paletted PNG, GIF, or PCM
    * WAV by doc decile) and one pass that probes the format and routes
    * each payload through the right real decoder — the end-to-end shape
    * of an actual multimodal ingest, where formats arrive mixed and the
    * router must not mis-dispatch (a wrong branch produces a None or
    * wrong-format stats and fails the hash gate on every row of that
    * decile). Unified per-doc stats: `n_units` is decoded pixels or
    * sample frames, `sum_v`/`wsum_v` the position-weighted content sums
    * (palette formats resolve indices through their color tables
    * first). Narrow mapPartitions, no shuffle — decoder cost dominates
    * and parallelism is input splits, as q85. */
  final case class DispatchStats(
      doc_id: Long,
      media_format: String,
      n_units: Long,
      sum_v: Long,
      wsum_v: Long)

  def decodeDispatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          def byteStats(fmt: String, px: Array[Byte], units: Long) = {
            var sum = 0L; var wsum = 0L; var i = 0
            while (i < px.length) {
              val v = px(i) & 0xff
              sum += v; wsum += i.toLong * v
              i += 1
            }
            DispatchStats(id, fmt, units, sum, wsum)
          }
          def indexedStats(fmt: String, img: GifCodec.IndexedImage) = {
            var sum = 0L; var wsum = 0L; var p = 0
            while (p < img.indices.length) {
              val k = img.indices(p) & 0xff
              val rgb = (img.palette(3 * k) & 0xff) +
                (img.palette(3 * k + 1) & 0xff) +
                (img.palette(3 * k + 2) & 0xff)
              sum += rgb; wsum += p.toLong * rgb
              p += 1
            }
            DispatchStats(id, fmt, img.indices.length.toLong, sum, wsum)
          }
          (id % 5) match {
            case 0 =>
              val img = PngCodec.decode(MediaSynth.pixelPng(id)).get
              byteStats("png", img.pixels, img.width.toLong * img.height)
            case 1 =>
              val img = PngCodec.decode(MediaSynth.grayPng(id)).get
              byteStats("png_gray", img.pixels, img.width.toLong * img.height)
            case 2 =>
              indexedStats("png_paletted",
                PngCodec.decodePaletted(MediaSynth.palettePng(id)).get)
            case 3 =>
              indexedStats("gif", GifCodec.decode(MediaSynth.gifPayload(id)).get)
            case _ =>
              val a = AudioHeaders.pcm16(MediaSynth.pcmWav(id)).get
              var sum = 0L; var wsum = 0L; var i = 0
              while (i < a.samples.length) {
                sum += a.samples(i); wsum += i.toLong * a.samples(i)
                i += 1
              }
              DispatchStats(id, "wav",
                a.samples.length.toLong / MediaSynth.pcmChannels(id), sum, wsum)
          }
        }
      }
      .toDF()
  }

  private val dispatchOracle: String = """
    WITH png AS (
      SELECT p.doc_id, 'png' AS media_format,
        CAST(MAX(p.w) * MAX(p.h) AS BIGINT) AS n_units,
        CAST(SUM((3 * x.x + 7 * y.y + 11 * c.c + p.doc_id) % 256) AS BIGINT)
          AS sum_v,
        CAST(SUM(((y.y * p.w + x.x) * p.ch + c.c)
          * ((3 * x.x + 7 * y.y + 11 * c.c + p.doc_id) % 256)) AS BIGINT)
          AS wsum_v
      FROM (SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h,
          (doc_id % 2) + 3 AS ch FROM documents WHERE doc_id % 5 = 0) p,
        range(20) x(x), range(16) y(y), range(4) c(c)
      WHERE x.x < p.w AND y.y < p.h AND c.c < p.ch
      GROUP BY p.doc_id),
    gray AS (
      SELECT p.doc_id, 'png_gray',
        CAST(MAX(p.w) * MAX(p.h) AS BIGINT),
        CAST(SUM((3 * x.x + 7 * y.y + p.doc_id) % 256) AS BIGINT),
        CAST(SUM((y.y * p.w + x.x)
          * ((3 * x.x + 7 * y.y + p.doc_id) % 256)) AS BIGINT)
      FROM (SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h
          FROM documents WHERE doc_id % 5 = 1) p,
        range(20) x(x), range(16) y(y)
      WHERE x.x < p.w AND y.y < p.h
      GROUP BY p.doc_id),
    pal AS (
      SELECT doc_id, 'png_paletted',
        CAST(COUNT(*) AS BIGINT),
        CAST(SUM((3 * k + doc_id) % 256 + (5 * k + 2 * doc_id) % 256
          + (7 * k + 3 * doc_id) % 256) AS BIGINT),
        CAST(SUM((y * w + x) * ((3 * k + doc_id) % 256
          + (5 * k + 2 * doc_id) % 256
          + (7 * k + 3 * doc_id) % 256)) AS BIGINT)
      FROM (
        SELECT p.doc_id, p.w, x.x, y.y,
          (5 * x.x + 3 * y.y + p.doc_id) % p.nc AS k
        FROM (SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h,
            (doc_id % 250) + 6 AS nc FROM documents WHERE doc_id % 5 = 2) p,
          range(20) x(x), range(16) y(y)
        WHERE x.x < p.w AND y.y < p.h)
      GROUP BY doc_id),
    gif AS (
      SELECT doc_id, 'gif',
        CAST(COUNT(*) AS BIGINT),
        CAST(SUM((5 * k + doc_id) % 256 + (7 * k + 2 * doc_id) % 256
          + (11 * k + 3 * doc_id) % 256) AS BIGINT),
        CAST(SUM((y * w + x) * ((5 * k + doc_id) % 256
          + (7 * k + 2 * doc_id) % 256
          + (11 * k + 3 * doc_id) % 256)) AS BIGINT)
      FROM (
        SELECT p.doc_id, p.w, x.x, y.y,
          (3 * x.x + 7 * y.y + p.doc_id) % p.nc AS k
        FROM (SELECT doc_id, (doc_id % 16) + 4 AS w, (doc_id % 12) + 4 AS h,
            CASE doc_id % 7 WHEN 0 THEN 4 WHEN 1 THEN 8 WHEN 2 THEN 16
              WHEN 3 THEN 32 WHEN 4 THEN 64 WHEN 5 THEN 128 ELSE 256 END AS nc
          FROM documents WHERE doc_id % 5 = 3) p,
          range(20) x(x), range(16) y(y)
        WHERE x.x < p.w AND y.y < p.h)
      GROUP BY doc_id),
    wav AS (
      SELECT p.doc_id, 'wav',
        CAST(MAX(p.frames) AS BIGINT),
        CAST(SUM(((2293 * i.i + 7919 * p.doc_id) % 65536) - 32768) AS BIGINT),
        CAST(SUM(i.i * (((2293 * i.i + 7919 * p.doc_id) % 65536) - 32768))
          AS BIGINT)
      FROM (SELECT doc_id, (doc_id % 2) + 1 AS ch,
          (doc_id % 50) + 10 AS frames,
          ((doc_id % 50) + 10) * ((doc_id % 2) + 1) AS n
          FROM documents WHERE doc_id % 5 = 4) p,
        range(120) i(i)
      WHERE i.i < p.n
      GROUP BY p.doc_id)
    SELECT doc_id, media_format, n_units, sum_v, wsum_v FROM png
    UNION ALL SELECT * FROM gray
    UNION ALL SELECT * FROM pal
    UNION ALL SELECT * FROM gif
    UNION ALL SELECT * FROM wav"""

  /** q149 — REAL baseline-JPEG entropy decode under the gate, closing the
    * repo's last stubbed image family: each doc maps to a complete JFIF
    * ([[graft.multimodal.MediaSynth.jpegPayload]]) with genuine huffman
    * entropy coding — per-block DC difference coding, AC (run,size) pairs
    * with a ZRL in every block, byte stuffing, restart markers on a third
    * of the corpus — that [[graft.multimodal.JpegCodec.decode]] must
    * marker-walk, huffman-decode, dequantize and IDCT. The corpus lives in
    * the frequency domain (coefficients only on ±1/8-valued DCT bases, 8·d
    * dequantized magnitudes) so the decoded pixels are exact integers the
    * oracle replays by pure arithmetic; a wrong huffman bound, EXTEND sign,
    * zigzag slot, dequant index, IDCT scale, restart realign or edge crop
    * all shift `sum_v`/`wsum_v` and fail the hash. Same narrow no-shuffle
    * full-corpus decode pass as q85. */
  def jpegDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          graft.multimodal.JpegCodec.decode(MediaSynth.jpegPayload(id)) match {
            case Some(img) =>
              val n = img.pixels.length
              var sum = 0L; var wsum = 0L; var i = 0
              while (i < n) {
                val v = img.pixels(i) & 0xff
                sum += v; wsum += i.toLong * v
                i += 1
              }
              PngStats(id, img.width.toLong, img.height.toLong,
                img.channels.toLong, img.width.toLong * img.height,
                sum, wsum, decode_ok = true)
            case None =>
              PngStats(id, -1L, -1L, -1L, -1L, -1L, -1L, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  private val jpegOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 24) + 9 AS w, (doc_id % 20) + 9 AS h
      FROM documents),
    px AS (
      SELECT p.doc_id, p.w, p.h, x.x, y.y,
        ((3 * (x.x // 8) + 5 * (y.y // 8) + p.doc_id) % 128) - 64 AS da,
        ((7 * (x.x // 8) + 11 * (y.y // 8) + 2 * p.doc_id) % 32) - 16 AS db,
        ((13 * (x.x // 8) + 17 * (y.y // 8) + 3 * p.doc_id) % 32) - 16 AS dc,
        ((19 * (x.x // 8) + 23 * (y.y // 8) + 5 * p.doc_id) % 16) - 8 AS dd,
        CASE WHEN (x.x % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END AS sx,
        CASE WHEN (y.y % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END AS sy
      FROM params p, range(32) x(x), range(28) y(y)
      WHERE x.x < p.w AND y.y < p.h),
    v AS (
      SELECT doc_id, w, h, x, y,
        128 + da + db * sx + dc * sy + dd * sx * sy AS v
      FROM px)
    SELECT doc_id,
      CAST(MAX(w) AS BIGINT) AS width,
      CAST(MAX(h) AS BIGINT) AS height,
      CAST(1 AS BIGINT) AS channels,
      CAST(MAX(w) * MAX(h) AS BIGINT) AS n_px,
      CAST(SUM(v) AS BIGINT) AS sum_v,
      CAST(SUM((y * w + x) * v) AS BIGINT) AS wsum_v,
      TRUE AS decode_ok
    FROM v GROUP BY doc_id"""

  /** q160 — PROGRESSIVE JPEG decode under the gate (the multi-scan SOF2
    * form web encoders emit): the q149 corpus re-encoded as a DC scan
    * plus two spectral-selection AC bands, so the decoder must run the
    * progressive entropy surface — per-scan coefficient accumulation,
    * band-limited run/size pairs, and EOBn codes whose run-lengths skip
    * whole band-empty BLOCKS — before the shared dequant/IDCT assembly.
    * Same closed forms as q149, so the oracle is LITERALLY q149's: a
    * progressive stream must decode to exactly what its baseline twin
    * decodes to (also spec-pinned pixel-for-pixel). */
  def jpegProgressiveDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          graft.multimodal.JpegCodec.decode(
            MediaSynth.jpegProgressivePayload(id)) match {
            case Some(img) =>
              val n = img.pixels.length
              var sum = 0L; var wsum = 0L; var i = 0
              while (i < n) {
                val v = img.pixels(i) & 0xff
                sum += v; wsum += i.toLong * v
                i += 1
              }
              PngStats(id, img.width.toLong, img.height.toLong,
                img.channels.toLong, img.width.toLong * img.height,
                sum, wsum, decode_ok = true)
            case None =>
              PngStats(id, -1L, -1L, -1L, -1L, -1L, -1L, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** q161 — SUCCESSIVE-APPROXIMATION progressive decode under the gate,
    * completing the full web-encoder progressive form on top of q160's
    * spectral selection: coarse scans at point-transform level 1, then
    * refinement scans delivering the low bits — correction bits for
    * already-significant coefficients woven between newly-significant
    * size-1 codes and buffered behind EOB runs (spec G.1.2.3/G.2). The
    * oracle is again q149's: five approximation scans must reconstruct
    * exactly what one baseline scan carries. */
  def jpegApproxDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          graft.multimodal.JpegCodec.decode(
            MediaSynth.jpegApproxPayload(id)) match {
            case Some(img) =>
              val n = img.pixels.length
              var sum = 0L; var wsum = 0L; var i = 0
              while (i < n) {
                val v = img.pixels(i) & 0xff
                sum += v; wsum += i.toLong * v
                i += 1
              }
              PngStats(id, img.width.toLong, img.height.toLong,
                img.channels.toLong, img.width.toLong * img.height,
                sum, wsum, decode_ok = true)
            case None =>
              PngStats(id, -1L, -1L, -1L, -1L, -1L, -1L, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** q168 — INTER-FRAME (predicted) video decode under the gate: the q94
    * container with a `pvid` PREDICTED track
    * ([[graft.multimodal.MediaSynth.predVideoMp4]]) — sample 0 a full
    * intra frame, every later sample per-pixel signed residuals, so
    * frame f only exists by reconstructing through every prior sample
    * ([[graft.multimodal.VideoHeaders.predictedVideoFrames]]): the
    * temporal-dependency chain MJPEG's intra-only samples never
    * exercised. ALL frames are exported (each depends on the whole
    * prefix of residual samples); the oracle replays the closed form
    * base + Σ residuals in pure integer arithmetic — a decoder that
    * dropped, reordered, or double-applied one residual sample shifts
    * every later frame's sums and fails the hash. Narrow no-shuffle
    * corpus pass, same as q94/q150. */
  def predictedFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val rv = VideoHeaders.predictedVideoFrames(
            MediaSynth.predVideoMp4(id)).get
          rv.frames.zipWithIndex.map { case (frame, f) =>
            var sum = 0L; var wsum = 0L; var i = 0
            while (i < frame.length) {
              val v = frame(i) & 0xff
              sum += v; wsum += i.toLong * v
              i += 1
            }
            FrameStats(id, f.toLong, rv.width.toLong, rv.height.toLong,
              sum, wsum)
          }
        }
      }
      .toDF()
  }

  private val predictedFramesOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 4) + 2 AS w, (doc_id % 3) + 2 AS h,
        (doc_id % 5) + 2 AS nf
      FROM documents),
    res AS (
      -- cumulative residual Σ_{j=1..f} ((s+j)%7 + 1) for every position
      -- sum s = x+y+c (≤ 11) and frame f (≤ 5), enumerated uncorrelated
      SELECT s.s, f.f,
        SUM(CASE WHEN j.j <= f.f THEN ((s.s + j.j) % 7) + 1 ELSE 0 END) AS cum
      FROM range(12) s(s), range(6) f(f), range(1, 6) j(j)
      GROUP BY s.s, f.f),
    px AS (
      SELECT p.doc_id, p.w, p.h, f.f, x.x, y.y, c.c,
        (3 * x.x + 7 * y.y + 11 * c.c + p.doc_id) % 220 + r.cum AS v
      FROM params p, range(6) f(f), range(6) x(x), range(5) y(y), range(3) c(c)
      JOIN res r ON r.s = x.x + y.y + c.c AND r.f = f.f
      WHERE f.f < p.nf AND x.x < p.w AND y.y < p.h)
    SELECT doc_id,
      CAST(f AS BIGINT) AS frame_index,
      CAST(MAX(w) AS BIGINT) AS width,
      CAST(MAX(h) AS BIGINT) AS height,
      CAST(SUM(v) AS BIGINT) AS sum_v,
      CAST(SUM(((y * w + x) * 3 + c) * v) AS BIGINT) AS wsum_v
    FROM px GROUP BY doc_id, f"""

  /** q150 — REAL compressed-video frame decode under the gate: the q94
    * container with a motion-JPEG track
    * ([[graft.multimodal.MediaSynth.mjpegMp4]]) — every sample a complete
    * baseline JFIF of genuinely different entropy-coded length (real stsz
    * table addressing), demuxed by the same stsd/stsz/stco walk as q94 and
    * then ENTROPY-DECODED per frame by the q149 kernel
    * ([[graft.multimodal.VideoHeaders.mjpegVideoFrames]]). Stride-2 frame
    * sampling, per-frame position-weighted stats over the DECODED pixels,
    * recomputed by the oracle from the per-frame-seeded closed form. Wrong
    * demux offset, a frame decoded with another frame's seed, or any q149
    * decoder defect shifts the sums and fails the hash. Narrow no-shuffle
    * corpus pass; decoder cost dominates, parallelism = input splits. */
  def mjpegFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val rv = VideoHeaders.mjpegVideoFrames(MediaSynth.mjpegMp4(id)).get
          rv.frames.zipWithIndex
            .filter(_._2 % 2 == 0) // stride-2 sampling
            .map { case (frame, f) =>
              var sum = 0L; var wsum = 0L; var i = 0
              while (i < frame.length) {
                val v = frame(i) & 0xff
                sum += v; wsum += i.toLong * v
                i += 1
              }
              FrameStats(id, f.toLong, rv.width.toLong, rv.height.toLong,
                sum, wsum)
            }
        }
      }
      .toDF()
  }

  private val mjpegOracle: String = """
    WITH params AS (
      SELECT doc_id, (doc_id % 16) + 9 AS w, (doc_id % 12) + 9 AS h,
        (doc_id % 4) + 2 AS nf
      FROM documents),
    px AS (
      SELECT p.doc_id, p.w, p.h, 2 * k.k AS f,
        p.doc_id + 131 * (2 * k.k) AS seed, x.x, y.y
      FROM params p, range(3) k(k), range(24) x(x), range(20) y(y)
      WHERE 2 * k.k < p.nf AND x.x < p.w AND y.y < p.h),
    v AS (
      SELECT doc_id, w, h, f, x, y,
        128
        + ((3 * (x // 8) + 5 * (y // 8) + seed) % 128) - 64
        + (((7 * (x // 8) + 11 * (y // 8) + 2 * seed) % 32) - 16)
          * (CASE WHEN (x % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END)
        + (((13 * (x // 8) + 17 * (y // 8) + 3 * seed) % 32) - 16)
          * (CASE WHEN (y % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END)
        + (((19 * (x // 8) + 23 * (y // 8) + 5 * seed) % 16) - 8)
          * (CASE WHEN (x % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END)
          * (CASE WHEN (y % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END) AS v
      FROM px)
    SELECT doc_id,
      CAST(f AS BIGINT) AS frame_index,
      CAST(MAX(w) AS BIGINT) AS width,
      CAST(MAX(h) AS BIGINT) AS height,
      CAST(SUM(v) AS BIGINT) AS sum_v,
      CAST(SUM((y * w + x) * v) AS BIGINT) AS wsum_v
    FROM v GROUP BY doc_id, f"""

  /** q152 — chroma-subsampled COLOR JPEG decode under the gate: a
    * 3-component 4:2:0 baseline JFIF per doc
    * ([[graft.multimodal.MediaSynth.jpegColorPayload]]) forces the full
    * sampling-grid decode — four luma data units per MCU interleaved with
    * half-resolution chroma, per-component DC predictor chains, the
    * chrominance huffman tables, replication upsampling, and the integer
    * fixed-point YCbCr→RGB transform — with every RGB channel value
    * replayed by the oracle in exact arithmetic (clamps included). A
    * block placed in the wrong plane slot, a luma/chroma table swap, an
    * upsampling phase error, or a color-transform constant off by one
    * all shift `sum_v`/`wsum_v`. The dominant real-corpus JPEG form;
    * same narrow no-shuffle decode pass as q85/q149. */
  def jpegColorDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.util.Par.ensure(Tables(spark, dir, "documents"))
      .select("doc_id").as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          graft.multimodal.JpegCodec.decode(MediaSynth.jpegColorPayload(id)) match {
            case Some(img) =>
              val n = img.pixels.length
              var sum = 0L; var wsum = 0L; var i = 0
              while (i < n) {
                val v = img.pixels(i) & 0xff
                sum += v; wsum += i.toLong * v
                i += 1
              }
              PngStats(id, img.width.toLong, img.height.toLong,
                img.channels.toLong, img.width.toLong * img.height,
                sum, wsum, decode_ok = true)
            case None =>
              PngStats(id, -1L, -1L, -1L, -1L, -1L, -1L, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** q149's frequency-domain closed form as SQL: decoded sample at
    * (`xe`, `ye`) of the plane seeded by `s`. */
  private def jpegSampleSql(s: String, xe: String, ye: String): String = {
    val bx = s"(($xe) // 8)"; val by = s"(($ye) // 8)"
    val sx = s"(CASE WHEN (($xe) % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END)"
    val sy = s"(CASE WHEN (($ye) % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END)"
    s"""(128 + ((3 * $bx + 5 * $by + ($s)) % 128) - 64
      + (((7 * $bx + 11 * $by + 2 * ($s)) % 32) - 16) * $sx
      + (((13 * $bx + 17 * $by + 3 * ($s)) % 32) - 16) * $sy
      + (((19 * $bx + 23 * $by + 5 * ($s)) % 16) - 8) * $sx * $sy)"""
  }

  private val jpegColorOracle: String = {
    // the decoder's fixed-point convert: floor((n + 32768) / 65536) via
    // offset-nonnegative truncating division (DuckDB // truncates)
    def fdiv(n: String) = s"((($n) + 32768 + 16777216) // 65536) - 256"
    def clamp(v: String) = s"GREATEST(0, LEAST(255, $v))"
    val r = clamp(s"yv + ${fdiv("91881 * (crv - 128)")}")
    val g = clamp(s"yv + ${fdiv("-22554 * (cbv - 128) - 46802 * (crv - 128)")}")
    val b = clamp(s"yv + ${fdiv("116130 * (cbv - 128)")}")
    s"""
    WITH params AS (
      SELECT doc_id, (doc_id % 28) + 9 AS w, (doc_id % 24) + 9 AS h
      FROM documents),
    px AS (
      SELECT p.doc_id, p.w, p.h, x.x, y.y,
        ${jpegSampleSql("p.doc_id", "x.x", "y.y")} AS yv,
        ${jpegSampleSql("p.doc_id + 1009", "x.x // 2", "y.y // 2")} AS cbv,
        ${jpegSampleSql("p.doc_id + 2018", "x.x // 2", "y.y // 2")} AS crv
      FROM params p, range(36) x(x), range(32) y(y)
      WHERE x.x < p.w AND y.y < p.h),
    rgb AS (
      SELECT doc_id, w, h, x, y, $r AS r, $g AS g, $b AS b
      FROM px)
    SELECT doc_id,
      CAST(MAX(w) AS BIGINT) AS width,
      CAST(MAX(h) AS BIGINT) AS height,
      CAST(3 AS BIGINT) AS channels,
      CAST(MAX(w) * MAX(h) AS BIGINT) AS n_px,
      CAST(SUM(r + g + b) AS BIGINT) AS sum_v,
      CAST(SUM((y * w + x) * 3 * r + ((y * w + x) * 3 + 1) * g
        + ((y * w + x) * 3 + 2) * b) AS BIGINT) AS wsum_v,
      TRUE AS decode_ok
    FROM rgb GROUP BY doc_id"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q73_media_probe", mediaProbe, Some(oracle)),
    QueryDef("q85_png_decode", pngDecode, Some(pngOracle)),
    QueryDef("q90_png_resize", pngResize, Some(pngResizeOracle)),
    QueryDef("q91_pcm_decode", pcmDecode, Some(pcmOracle)),
    QueryDef("q92_pcm_decimate", pcmDecimate, Some(pcmDecimateOracle)),
    QueryDef("q93_pcm_energy", pcmEnergy, Some(pcmEnergyOracle)),
    QueryDef("q282_vad_segments", vadSegments, Some(vadSegmentsOracle)),
    QueryDef("q195_pcm_spectral", pcmSpectral, Some(pcmSpectralOracle)),
    QueryDef("q94_video_frames", videoFrames, Some(videoFramesOracle)),
    QueryDef("q95_png_gray_decode", pngGrayDecode, Some(pngGrayOracle)),
    QueryDef("q96_gif_decode", gifDecode, Some(gifOracle)),
    QueryDef("q97_paletted_png_decode", palettedPngDecode, Some(palettedOracle)),
    QueryDef("q114_image_patches", imagePatches, Some(patchOracle)),
    QueryDef("q121_decode_dispatch", decodeDispatch, Some(dispatchOracle)),
    QueryDef("q129_image_phash", imagePhash, Some(phashOracle)),
    QueryDef("q187_image_near_dups", imageNearDups, Some(imageNearDupsOracle)),
    QueryDef("q202_image_dup_groups", imageDupGroups,
      Some(imageDupGroupsOracle)),
    QueryDef("q188_multimodal_dedup_clusters", multimodalDedupClusters,
      Some(multimodalDedupOracle)),
    QueryDef("q149_jpeg_decode", jpegDecode, Some(jpegOracle)),
    QueryDef("q150_mjpeg_frames", mjpegFrames, Some(mjpegOracle)),
    QueryDef("q168_predicted_frames", predictedFrames,
      Some(predictedFramesOracle)),
    QueryDef("q151_pcm_halfband", pcmHalfband, Some(pcmHalfbandOracle)),
    QueryDef("q275_pcm_polyphase", pcmPolyphase, Some(pcmPolyphaseOracle)),
    QueryDef("q308_flac_decode", flacDecode, Some(flacOracle)),
    QueryDef("q152_jpeg_color_decode", jpegColorDecode, Some(jpegColorOracle)),
    QueryDef("q160_jpeg_progressive_decode", jpegProgressiveDecode,
      Some(jpegOracle)),
    QueryDef("q161_jpeg_approx_decode", jpegApproxDecode, Some(jpegOracle)))
}
