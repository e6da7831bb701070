package graft.similarity

import graft.SparkTestBase
import graft.queries.SimilarityQueries

/** q280's output is the reduce step of distributed PCA: the exact d×d
  * centered covariance numerator. This spec runs the DRIVER-SIDE solve on
  * top of it (the part that is O(d³), independent of corpus size) and pins
  * that the pair is actually usable as PCA:
  *
  *  - the matrix is symmetric by construction (upper triangle emitted;
  *    mirrored here) and its diagonal is the per-dimension variance
  *    numerator — strictly positive on real data;
  *  - power iteration converges to a dominant eigenvector whose Rayleigh
  *    quotient (variance along it) is ≥ the variance of every coordinate
  *    axis — the defining property of the top principal component. */
final class PcaSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("covariance output solves to a dominant principal component") {
    val rows = SimilarityQueries.pcaCovariance(spark, dir).collect()
    val d = 64
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getLong(0).toInt - 1
      val j = r.getLong(1).toInt - 1
      val v = r.getLong(2).toDouble
      cov(i)(j) = v
      cov(j)(i) = v
    }
    assert(rows.length == d * (d + 1) / 2)
    (0 until d).foreach(i => assert(cov(i)(i) > 0.0,
      s"variance numerator of dim $i must be positive"))

    // power iteration (fixed start, 200 steps — plenty at d=64)
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    for (_ <- 1 to 200) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / n)
    }
    val rayleigh = (0 until d).map(i =>
      v(i) * (0 until d).map(j => cov(i)(j) * v(j)).sum).sum
    val maxAxis = (0 until d).map(i => cov(i)(i)).max
    assert(rayleigh >= maxAxis - 1e-6,
      s"top-PC variance $rayleigh must dominate best axis $maxAxis")
  }
}
