package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.BloomMightContain

/** Semi-join reduction: shrink the FACT side of a large⋈large join before
  * its shuffle by probing a bloom filter built from the (already reduced)
  * build side's keys.
  *
  * The scale problem this solves: when a selective predicate lands on one
  * side of a key join (orders filtered to one priority, say), the other
  * side still shuffles in full — at 100 TB the fact shuffle dominates the
  * query even though most fact rows join to nothing. The build side is
  * small enough to summarize but NOT small enough to broadcast-hash-join
  * (its rows carry payload columns; at scale even its key set may be
  * hundreds of millions). A bloom filter over the keys is bounded by BITS
  * (`-n·ln(fpp)/ln2²` ≈ 9.6 bits/key at 1% — ~120 MB for 100M keys,
  * independent of row width), survives a driver hop, and prunes the fact
  * scan down to ~selectivity·|fact| + fpp·|fact| rows BEFORE the
  * exchange. False positives are eliminated by the exact join that
  * follows, so results are exact regardless of fpp.
  *
  * This is the same mechanism as Spark's AQE runtime bloom filter
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`), exposed as
  * an explicit operator: the optimizer's version only fires on plans it
  * can introspect, while a library caller can build once and reuse the
  * sketch across many queries, push it into a different session, or
  * apply it before a sink.
  *
  * Driver-side state is the sketch alone (bits, not rows) — the build
  * side is aggregated distributedly by Spark's `stat.bloomFilter`
  * (a treeAggregate of partial sketches). The build side is scanned
  * twice (count for sizing + sketch build); it is cached between the two
  * and is, by contract, the already-reduced side.
  */
object BloomSemiJoin {

  /** Keep only fact rows whose `factKey` might appear in `build`'s
    * `buildKey` column. Exact-superset guarantee: every fact row that
    * joins survives; ~fpp of non-joining rows leak through. */
  def prune(fact: DataFrame, factKey: Column, build: DataFrame,
      buildKey: String, fpp: Double = 0.01): DataFrame = {
    val cached = build.select(col(buildKey).cast(LongType).as(buildKey)).cache()
    try {
      val n = math.max(1L, cached.count())
      val bloom = cached.stat.bloomFilter(buildKey, n, fpp)
      fact.filter(BloomMightContain(factKey.cast(LongType), bloom))
    } finally cached.unpersist(blocking = false)
  }

  /** The full reduced join: prune `fact`, then exact-inner-join to
    * `build` on the keys. Result is identical to the unreduced join. */
  def join(fact: DataFrame, factKey: Column, build: DataFrame,
      buildKey: String, fpp: Double = 0.01): DataFrame =
    prune(fact, factKey, build, buildKey, fpp)
      .join(build, factKey === col(buildKey))
}
