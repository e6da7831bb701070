package graft.queries

import graft.SparkTestBase

/** q180's duplicated-span detection against an INDEPENDENT in-memory
  * brute force: per document, mark every token position covered by a
  * corpus-duplicated k-gram with plain boolean arrays, then measure
  * coverage and the longest contiguous run — no windows, no intervals,
  * no Spark. The distributed interval-merging pipeline must reproduce
  * both numbers exactly for every document. */
class LongestDupSpanSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 8

  test("interval-merged coverage equals the boolean-array brute force") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim)
      .filter(_._2.nonEmpty)
      .map { case (id, t) => id -> t.split("\\s+") }
    // corpus k-gram counts
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    for ((_, toks) <- docs; s <- 0 to toks.length - K)
      counts.updateWith(toks.slice(s, s + K).mkString(" ")) {
        c => Some(c.getOrElse(0) + 1)
      }
    // per-doc coverage via boolean arrays
    val want = docs.map { case (id, toks) =>
      val covered = new Array[Boolean](toks.length)
      for (s <- 0 to toks.length - K
           if counts(toks.slice(s, s + K).mkString(" ")) >= 2;
           i <- s until s + K) covered(i) = true
      var total = 0L; var best = 0L; var run = 0L
      covered.foreach { c =>
        if (c) { total += 1; run += 1; best = math.max(best, run) }
        else run = 0
      }
      id -> ((toks.length.toLong, total, best))
    }.toMap
    val got = TextQueries.longestDupSpan(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == want.keySet)
    val diffs = want.collect {
      case (id, w) if got(id) != w => s"doc $id: got ${got(id)}, want $w"
    }
    assert(diffs.isEmpty, diffs.take(5).mkString("; "))
    // the corpus genuinely exercises the path: some doc has a duplicated
    // stretch LONGER than one k-gram (so interval merging mattered)
    assert(want.values.exists(_._3 > K), "no multi-gram duplicated stretch")
  }
}
