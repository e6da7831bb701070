package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.lake.{SnapshotCatalog, Snapshots}

/** Round-17 hardening pins, one per adjudicated r16 ADVICE finding:
  *
  *  1. Tombstoned column names (a rename's OLD name) may never be
  *     recycled by ADD COLUMN — neither through the catalog's atomic
  *     ALTER pre-validation nor through [[Snapshots.addColumn]]
  *     directly. (A recycled name could never receive data: every
  *     later append would throw via guardRecycledNames.)
  *  2. FLAC encode emits the standard UTF-8-coded frame number, so
  *     streams beyond 128 frames (>2032 samples/channel at the
  *     default blockSize) round-trip instead of throwing.
  *  3. REPLACE WHERE qualifier stripping resolves by SCHEMA WALK, not
  *     first-name-match: an alias spelled like a scalar column still
  *     strips, and a genuine struct path is kept whole.
  *  4. Graph-index tombstone emptiness is answered from LOG METADATA
  *     (rowCountAt) in every lifecycle state this table reaches, so
  *     searches never pay a per-search isEmpty Spark action.
  */
class R17AdviceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def orders = graft.queries.Tables(spark, sfDir, "orders")

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_r17_$tag").toString

  private def freshCatalog(tag: String): (String, String) = {
    val root = fresh(tag)
    val cat = s"r17_${tag}_${System.nanoTime().toHexString}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  // ----------------------------------------------- 1. tombstone recycling

  test("ADD COLUMN refuses a tombstoned (renamed-away) name everywhere") {
    val (cat, root) = freshCatalog("recycle")
    val t = s"$root/t"
    Snapshots.append(spark, t, orders.limit(20))
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN o_orderstatus TO o_status")
    val before = Snapshots.latestVersion(spark, t).get
    // standalone ADD of the tombstoned name: refused, no version burned
    val e1 = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t ADD COLUMNS (o_orderstatus STRING)"))
    assert(e1.getMessage.contains("recycled"), e1.getMessage)
    assert(Snapshots.latestVersion(spark, t).contains(before))
    // mixed statement (valid add + recycled add): NOTHING applies
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t ADD COLUMNS (fine INT, o_orderstatus STRING)"))
    assert(Snapshots.latestVersion(spark, t).contains(before))
    assert(!Snapshots.readLatest(spark, t).get
      .schema.fieldNames.contains("fine"))
    // rename a→b then add a IN ONE change set: pre-validation sees the
    // IN-FLIGHT tombstone and applies nothing
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val catalog = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[SnapshotCatalog]
    intercept[Exception](catalog.alterTable(
      Identifier.of(Array.empty[String], "t"),
      TableChange.renameColumn(Array("o_orderpriority"), "o_prio"),
      TableChange.addColumn(Array("o_orderpriority"), IntegerType)))
    assert(Snapshots.latestVersion(spark, t).contains(before))
    assert(Snapshots.readLatest(spark, t).get
      .schema.fieldNames.contains("o_orderpriority"))
    // the direct API refuses the head tombstone too
    val e2 = intercept[Exception](Snapshots.addColumn(
      spark, t, "o_orderstatus", "STRING"))
    assert(e2.getMessage.contains("recycled"), e2.getMessage)
    assert(Snapshots.latestVersion(spark, t).contains(before))
    // the RENAMED-TO name keeps working normally after all refusals
    Snapshots.addColumn(spark, t, "extra", "INT", Some("1"))
    assert(Snapshots.readLatest(spark, t).get
      .schema.fieldNames.contains("extra"))
  }

  // --------------------------------------------- 2. FLAC frame numbers

  test("FLAC encode past 128 frames round-trips via UTF-8 frame numbers") {
    import graft.multimodal.FlacCodec
    // 3000 samples/channel at blockSize 16 → 188 frames (was a throw)
    val n = 3000 * 2
    val src = Array.tabulate(n)(i => ((i * 131 + 7) % 4000 - 2000).toShort)
    val enc = FlacCodec.encode(src, 2, 22050, 16)
    val dec = FlacCodec.decode(enc).get
    assert(dec.md5Ok, "md5 failed on a multi-byte-frame-number stream")
    assert(dec.channels == 2 && dec.samples.toSeq == src.toSeq)
    // two-byte boundary exactly: frame 128 present (129 frames)
    val m = 129 * 16
    val src2 = Array.tabulate(m)(i => ((i * 37) % 2000 - 1000).toShort)
    val dec2 = FlacCodec.decode(FlacCodec.encode(src2, 1, 44100, 16)).get
    assert(dec2.md5Ok && dec2.samples.toSeq == src2.toSeq)
  }

  // ------------------------------------------- 3. qualifier schema walk

  test("predicate qualifier stripping walks the schema, not name sets") {
    val o = AttributeReference("o", IntegerType)()
    val ox = AttributeReference("o_x", IntegerType)()
    val st = AttributeReference("s",
      StructType(Seq(StructField("f", IntegerType))))()
    def strip(parts: String*) = SnapshotDmlRewrite
      .stripPredicateQualifiers(Seq(o, ox, st),
        EqualTo(UnresolvedAttribute(parts.toSeq), Literal(1)))
      .asInstanceOf[EqualTo].left
      .asInstanceOf[UnresolvedAttribute].nameParts
    // alias spelled like a SCALAR column: `o.o_x` must strip to `o_x`
    // (dropWhile on first name-match kept it qualified and failed)
    assert(strip("o", "o_x") == Seq("o_x"))
    // a genuine struct path is kept whole
    assert(strip("s", "f") == Seq("s", "f"))
    // table qualifier ahead of a struct path strips exactly the qualifier
    assert(strip("t", "s", "f") == Seq("s", "f"))
    // plain table-qualified scalar strips to the bare column
    assert(strip("t", "o_x") == Seq("o_x"))
    // nothing resolves → left untouched (loud failure downstream)
    assert(strip("a", "b") == Seq("a", "b"))
    // resolved refs re-speak as their bare name
    val resolved = SnapshotDmlRewrite.stripPredicateQualifiers(
      Seq(o, ox, st), EqualTo(ox, Literal(1)))
      .asInstanceOf[EqualTo].left
    assert(resolved.asInstanceOf[UnresolvedAttribute].nameParts
      == Seq("o_x"))
  }

  // ------------------------------------- 4. tombstone metadata emptiness

  test("index tombstone emptiness answers from log metadata all lifecycle") {
    import graft.similarity.Similarity
    val root = fresh("nswmeta") + "/idx"
    val emb = graft.queries.Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") % 7 === 0).limit(5)
    Similarity.nswIndexBuild(spark, root, emb, "vec_id", "embedding")
    val tomb = s"$root/tombstones"
    // after a delete: the log answers the count, no scan needed
    Similarity.nswIndexDelete(spark, root, col("id") % 9 === 3)
    val vDel = Snapshots.latestVersion(spark, tomb).get
    val nDel = Snapshots.rowCountAt(spark, tomb, vDel)
    assert(nDel.exists(_ > 0L),
      s"delete left a tombstones version the log cannot count: $nDel")
    // after optimize (truncate): the log answers ZERO — the state the
    // old isEmpty action paid a Spark job for on every later search
    Similarity.nswIndexOptimize(spark, root)
    val vOpt = Snapshots.latestVersion(spark, tomb).get
    assert(Snapshots.rowCountAt(spark, tomb, vOpt).contains(0L))
    // and searches on the optimized index still behave
    val res = Similarity.nswIndexSearch(spark, root,
      emb.filter(col("vec_id") % 9 =!= 3), queries,
      "vec_id", "embedding", 5).collect()
    assert(res.nonEmpty &&
      res.forall(_.getAs[Long]("neighbor_id") % 9 != 3))
  }
}
