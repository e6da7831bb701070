package graft

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall-clock seconds.
  *
  * Timing action is a `noop`-format write: every projected expression is
  * evaluated and every row crosses the sink boundary, but nothing lands on
  * disk. A bare `count()` (rounds 1-3) let Catalyst prune the projected
  * expressions under pure-projection queries (q07-q17, q27, q40), timing
  * scan+count instead of md5/regex/cleaning evaluation — VERDICT_r03's one
  * measurement weakness. BASELINE.md re-records the affected queries.
  */
object Bench {
  private def loadAvg: Double = {
    val l = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    math.round(l * 100) / 100.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Settle-guard: the 1-min load average decays with a ~60 s time
    // constant, so a bench launched right after `sbt test` (or any busy
    // process) reads a load that is HISTORY, not contention — and the
    // absolute-2.0 flag below would mark an idle run unreliable. Wait
    // (bounded) for the average to drain before sampling loadStart; a
    // genuinely contended box never drops, pays the cap once, and still
    // gets flagged by the load it then shows.
    val settleDeadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    while (loadAvg > 2.0 && System.nanoTime() < settleDeadline)
      Thread.sleep(5000)
    val loadStart = loadAvg
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .appName("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on the smallest sf so per-query numbers measure
    // steady-state throughput, not first-query classloading.
    try SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    // p9x entries are the file-ingest pipeline (fixed-size sample corpus,
    // not sf-scaled) — excluded from throughput timing. Each query runs
    // twice and reports the faster pass: single-shot numbers on a shared
    // JVM carry multi-hundred-ms GC/codegen noise.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // SPARK_GRAFT_BENCH_ONLY: comma-separated name prefixes for iterating
    // on a subset locally; the driver never sets it (full run).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // empty/blank var = no filter, not "nothing"
    def onePass(name: String, fn: (org.apache.spark.sql.SparkSession,
        String) => org.apache.spark.sql.DataFrame): Double = {
      // isolate passes: queries that persist internal relations would
      // otherwise leak caches that CacheManager substitutes into the
      // next pass and into LATER queries sharing a subplan, timing
      // cache scans instead of the operator
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // full-plan execution: unlike count(), a noop write cannot have
      // its projections pruned, so narrow per-row operators are timed
      // NonFatal only: after an OOM/fatal JVM error the process is in an
      // undefined state — subsequent pass timings and the reliability
      // verdict would be silently corrupted; let fatal errors abort
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case scala.util.control.NonFatal(_) => failed += name }
      (System.nanoTime() - t0) / 1e9
    }
    // A pass pair disagreeing by >3× on a non-trivial query is a
    // scheduling artifact, not a property of the plan (round-10's driver
    // run recorded 17× pairs like [48.4, 2.8] under `reliable:true`).
    // Such queries get a THIRD pass — one clean measurement usually
    // exists among three even on a busy box — and the min is reported.
    // The reliability verdict then checks the TWO CLOSEST (smallest)
    // passes: a clean agreeing pair clears the query no matter how bad
    // the outlier was (a max/min test over all passes could never be
    // cleared by a good third pass); only queries whose best two
    // measurements STILL disagree >3× count as contention evidence.
    // Sub-300ms BEST passes are ignored either way — that scale spreads
    // on GC noise alone.
    val SpreadRatio = 3.0
    val SpreadFloorSec = 0.3
    def spreadBad(ts: Seq[Double]): Boolean =
      ts.size >= 2 && ts.min > SpreadFloorSec &&
        ts.max / ts.min > SpreadRatio
    def stillSpread(ts: Seq[Double]): Boolean = {
      val best = ts.sorted.take(2)
      best.size >= 2 && best.head > SpreadFloorSec &&
        best(1) / best.head > SpreadRatio
    }
    // mid-run load ceiling: a box that gets contended AFTER the start
    // sample (the r16 driver run: load 1.86 at start, 66 rows ≥2× their
    // minima) leaves its trace here even when the start gate passed
    var loadMax = loadAvg
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      // q87 is the p9x sample-file pipeline composed end-to-end — same
      // fixed-size corpus, same exclusion rationale
      .filterNot(q => q._1.startsWith("p9") || q._1.startsWith("q87"))
      .filter(q => only.forall(_.exists(q._1.startsWith)))
      .map { case (name, fn) =>
      val two = (1 to 2).flatMap { _ =>
        if (failed.contains(name)) None // don't pay a failing query twice
        else Some(onePass(name, fn))
      }
      loadMax = math.max(loadMax, loadAvg)
      val times =
        if (!failed.contains(name) && spreadBad(two)) two :+ onePass(name, fn)
        else two
      // A query that threw reports -1, never a misleading wall time.
      (name, if (failed.contains(name)) -1.0 else times.min, times)
    }
    // Per-query minima self-adjudication (the round-13 q105 episode:
    // sustained co-load inflated one query ~2.6x with BOTH passes
    // agreeing, evading the spread detector entirely — the recorded
    // minimum is the only reference that catches consistent inflation).
    // BENCH_MINIMA.json keeps the best time each query has ever shown
    // per sf dir; this run emits ratio_vs_min per query into
    // BENCH_DETAIL, names >2x rows in the headline, then lowers any
    // minima it beat. Wall-clock contention only ever INFLATES, so
    // min-updates are safe from any run, contended or not; a real code
    // regression also flags >2x — in both cases the row deserves a
    // re-measure before anyone believes it.
    val minimaPath = java.nio.file.Paths.get(
      sys.props("user.dir"), "BENCH_MINIMA.json")
    val sfKey = new java.io.File(sfDir).getName
    val priorAll: Map[String, Any] =
      if (!java.nio.file.Files.exists(minimaPath)) Map.empty
      else try graft.lake.Json.parseObject(new String(
        java.nio.file.Files.readAllBytes(minimaPath), "UTF-8"))
      catch { case scala.util.control.NonFatal(_) => Map.empty }
    val prior: Map[String, Double] = priorAll.get(sfKey)
      .map(_.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.toString.toDouble })
      .getOrElse(Map.empty)
    val ratios = results.collect {
      case (n, best, _) if !failed.contains(n) && prior.get(n).exists(_ > 0) =>
        n -> math.round(best / prior(n) * 100) / 100.0
    }
    val inflated = ratios.collect {
      case (n, r) if r > 2.0 && results
        .exists(x => x._1 == n && x._2 > SpreadFloorSec) => n
    }
    val newMinima = (prior.keySet ++ results.collect {
      case (n, best, _) if !failed.contains(n) && best > 0 => n }.toSet)
      .map { n =>
        val measured = results.collectFirst {
          case (`n`, best, _) if !failed.contains(n) && best > 0 => best }
        n -> ((prior.get(n), measured) match {
          case (Some(p), Some(m)) => math.min(p, m)
          case (p, m) => p.orElse(m).get
        })
      }.toMap
    java.nio.file.Files.write(minimaPath, graft.lake.Json.render(
      priorAll + (sfKey -> newMinima)).getBytes("UTF-8"))
    val ratioJson = ratios.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val inflatedJson = inflated.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Contention evidence (a round-2 driver run recorded 7× inflated
    // times on a loaded machine with nothing in the JSON to show it):
    // both raw pass times per query, plus the 1-min system load average
    // before and after. An idle local[N] box shows load ≲ N and pass
    // times within ~2× of each other; a contended run shows load ≫ N
    // and erratic per-pass spreads.
    val passes = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (n, v, _) if !failed.contains(n) => v }.sum
    // A machine already under load before the first query starts cannot
    // produce comparable wall-clock numbers (round-6's driver bench ran at
    // load 5–12 and showed 10× pass spreads that read as regressions).
    // The run still completes — smoke coverage is unaffected — but the
    // headline is explicitly flagged so a contended total can never
    // masquerade as a throughput signal again.
    //
    // TWO independent contention signals, either one flags the run:
    //  - pre-run load: round 10 proved load 4.26 (< the old cpus/4 = 8
    //    threshold) still produced 17× pass spreads — the threshold is
    //    now an absolute 2.0, load a local[32] JVM alone never shows
    //    before its first query;
    //  - observed spread: queries whose three passes STILL disagree >3×
    //    are direct evidence of a scheduler fighting another process,
    //    whatever the load average claims. A handful can be GC accidents;
    //    more than 5 cannot.
    val spreadQueries = results.collect {
      case (n, _, ts) if !failed.contains(n) && stillSpread(ts) => n
    }
    val MaxSpreadQueries = 5
    //  - inflation vs committed minima: the r16 driver run passed BOTH
    //    gates above (start load 1.86, agreeing pass pairs — both
    //    passes inflated together) yet showed 66 rows ≥2× their minima.
    //    Broad inflation against the per-query minima ledger is direct
    //    evidence of mid-run contention (or a broad regression — either
    //    way the totals deserve a re-measure, not belief). A handful of
    //    >2× rows is normal excursion noise; dozens are not.
    val MaxInflatedQueries = 10
    val loadContended = loadStart > 2.0
    val spreadContended = spreadQueries.size > MaxSpreadQueries
    val inflationContended = inflated.size > MaxInflatedQueries
    val caveat =
      if (loadContended || spreadContended || inflationContended) {
        val why = Seq(
          if (loadContended) Some(s"load_avg_start $loadStart > 2.0") else None,
          if (spreadContended) Some(s"${spreadQueries.size} queries kept " +
            s">${SpreadRatio}x pass spread after a 3rd pass " +
            spreadQueries.take(8).mkString("(", ",", ")")) else None,
          if (inflationContended) Some(s"${inflated.size} queries ran " +
            ">2x their committed minima " +
            inflated.take(8).mkString("(", ",", ")") +
            " - mid-run contention or a broad regression") else None
        ).flatten.mkString("; ")
        s""","reliable":false,"caveat":"$why: machine was contended; totals are noise, compare idle runs only""""
      } else ""","reliable":true"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passes,"ratio_vs_min":$ratioJson,"inflated_vs_min":$inflatedJson,"load_avg_start":$loadStart,"load_avg_end":$loadAvg,"load_avg_max":$loadMax,"cpus":$cpus$caveat,"errors":$errs,"sf":"$sfDir"}"""
    // The driver captures only the LAST ~2000 chars of output and parses
    // the metric line out of that window. With 150 queries the full line is
    // ~10 KB, so its head (and the parse) was lost every round since r3.
    // Ship the full record to a file and print a compact line LAST that is
    // guaranteed to fit the window: headline total + the slowest queries.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_DETAIL.json"),
      full.getBytes("UTF-8"))
    val slow = results.filterNot(r => failed.contains(r._1))
      .sortBy(-_._2).take(20)
      .map { case (k, v, _) => "\"" + k + "\":" + math.round(v * 100) / 100.0 }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","n_queries":${results.size},"queries":$slow,"detail":"BENCH_DETAIL.json","inflated_vs_min":$inflatedJson,"load_avg_start":$loadStart,"cpus":$cpus$caveat,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
