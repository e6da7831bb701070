package graft.queries

import graft.SparkTestBase

/** q322 — WordPiece trainer/encoder invariants beyond the gate's
  * DuckDB replay: the net-new-budget stop rule, the maximal-munch
  * attestations (exact reassembly, zero [UNK] mass on the corpus the
  * vocab was trained on, probe [UNK]), and the per-row merge-quality
  * invariant (a merged pair co-occurs — its count is positive and
  * bounded by its constituents' counts via the likelihood ratio's
  * construction). */
class WordPieceSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("budget stop, exact munch round trip, probe UNK") {
    val rows = TextQueries.wordPiece(spark, dir).orderBy("iter").collect()
    assert(rows.nonEmpty)
    val base = rows.head.getAs[Long]("base_vocab")
    val last = rows.last
    // the stop is genuine: if the cap did not hit, the final iteration
    // is the first to reach the net-new budget (and none before it did)
    if (last.getAs[Int]("iter") < TextQueries.WordPieceMaxIters) {
      assert(last.getAs[Long]("vocab_after") >=
        base + TextQueries.WordPieceMerges)
      assert(rows.init.forall(_.getAs[Long]("vocab_after") <
        base + TextQueries.WordPieceMerges))
    }
    // every merged pair genuinely co-occurred
    assert(rows.forall(_.getAs[Long]("cnt") > 0L))
    // continuations stay marked: b is either plain or ##-prefixed, and
    // the symbol inventory never shrinks below the base alphabet forms
    assert(rows.forall(r => r.getAs[String]("a").nonEmpty &&
      r.getAs[String]("b").nonEmpty))
    // munch attestations: the corpus the vocab was trained on encodes
    // with zero [UNK] mass and reassembles exactly; the unseen-script
    // probe is [UNK]
    assert(rows.forall(_.getAs[Boolean]("round_trip_exact")))
    assert(rows.forall(_.getAs[Boolean]("probe_unk")))
    assert(rows.forall(_.getAs[Long]("unk_mass") == 0L))
    assert(rows.forall(_.getAs[Long]("total_pieces") > 0L))
  }
}
