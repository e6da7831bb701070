package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.SparkTestBase

/** Plan-shape and scale-contract pins for the round-17 changes. */
class ScaleSpecsR17 extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q313: exploded rows are O(1)-wide — no array survives the explode") {
    // the r16 weak: the per-doc hash array rode along on EVERY exploded
    // token row (O(L²) bytes per document through the exchange feeding
    // the window). The rolling hash must be computed in array land, so
    // nothing array-typed is live past the Generate.
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val plan = TextQueries.cdcChunkRows(docs).queryExecution.optimizedPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty, "cdcChunkRows no longer explodes?")
    gens.foreach { g =>
      val wide = g.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(wide.isEmpty,
        s"exploded relation carries array columns: ${wide.map(_.name)}")
    }
  }

  test("q316: store reconstructs exactly and dedups at small scale") {
    val out = TextQueries.cdcChunkStore(spark, dir).collect()
      .sortBy(_.getAs[Long]("batch"))
    assert(out.length == 2)
    assert(out.forall(_.getAs[Boolean]("reconstructed_exact")),
      "manifests ⋈ store failed to rebuild the corpus token-exactly")
    assert(out.last.getAs[Boolean]("dedup_saves"),
      "store no smaller than the corpus — chunk dedup did nothing")
    // O(batch) shape: batch 2 appended strictly fewer chunks than its
    // manifest rows (existing chunks carried by REFERENCE) and the
    // store grew monotonically, never rebuilt
    assert(out.last.getAs[Long]("appended_chunks")
      < out.last.getAs[Long]("manifest_rows"))
    assert(out.last.getAs[Long]("store_chunks")
      >= out.head.getAs[Long]("store_chunks"))
  }

  test("q313: attestation sample is an absolute-K TakeOrdered") {
    // modulo sampling is PROPORTIONAL (2% of 100 TB → a multi-TB driver
    // collect); the sample must be a fixed-K top-k whatever the corpus
    assert(TextQueries.CdcAttestK <= 64,
      "attestation K must stay a small absolute bound")
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val p = TextQueries.cdcAttestSample(docs)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"attestation sample is not a bounded top-k:\n${p.take(1200)}")
  }
}
