package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline workload on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Headliners cover each engine area: TPC-H joins/aggs, window dedup,
  * LSH dedup, ANN, text stats, windowed events, sessionization.
  *
  * Contention guard: this box is shared. r5's official bench ran 14x slow
  * purely from external load, and r6's ran at loadavg 20 yet still reported
  * `contended:false` because the old fixed 1.0 s sentinel bound left room
  * for a 0.661 s probe. The guard now lives in [[BenchGuard]] (unit-tested
  * against r6's exact telemetry) and gates on BOTH signals: 1-min loadavg
  * vs core count AND a CPU-bound sentinel vs a recorded idle calibration.
  * Every tier is probed before AND after it runs; a tier whose post-probe
  * comes back hot is re-run once after the load subsides, and the JSON
  * carries per-tier probes + a per-tier `clean` flag, so `contended:false`
  * is earned, never defaulted.
  */
object Bench {
  private val headliners = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q_window_dedup", "q_v4_ml_dataset", "q_dedup_exact",
    "q_ann_bruteforce", "q_token_count",
    "q_quality_score", "q_event_windows", "q_sessionize",
    "q_medallion_silver", "q_corpus_prep", "q_asof_join", "q_range_join",
    "q_window_analytics", "q_dedup_clusters",
    // round-5 additions: token-shuffle analytics (tf-idf, unigram LM),
    // passage-grid dedup, rolling range-frame windows
    "q_tfidf", "q_unigram_logprob", "q_passage_dedup", "q_rolling_agg")

  // Timed every tier but EXCLUDED from the headline totals: these have
  // no DuckDB oracle (not SQL-expressible), so including them would make
  // every Spark-vs-baseline total need a "comparable subset" footnote
  // (r7 verdict item 8). Reported under "extras" in each tier block.
  private val extras = Seq("q_dedup_minhash")

  private def loadavg1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").head.toDouble
    catch { case _: Throwable => -1.0 }

  /** Fixed CPU-bound probe: 200M-row codegen'd sum over 32 partitions.
    * ~0.27 s on this box when idle; external load inflates it
    * proportionally (it needs all cores), which is exactly the signal.
    */
  private def sentinel(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 200000000L, 1L, 32).selectExpr("sum(id * 3 + 1)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  private case class Probe(load1: Double, sentinelSec: Double, waits: Int) {
    def quiet(cores: Int, idleSec: Double): Boolean =
      BenchGuard.quiet(load1, cores, sentinelSec, idleSec)
    def json: String = f"""{"load1":$load1%.2f,"sentinel_sec":$sentinelSec%.3f,"waits":$waits}"""
  }

  /** Probe, and while the box is hot, wait out the spike (bounded). */
  private def waitQuiet(spark: SparkSession, cores: Int, idleSec: Double,
                        maxWaits: Int = 8): Probe = {
    var p = Probe(loadavg1(), sentinel(spark), 0)
    while (!p.quiet(cores, idleSec) && p.waits < maxWaits) {
      Thread.sleep(20000L)
      p = Probe(loadavg1(), sentinel(spark), p.waits + 1)
    }
    p
  }

  /** Time each query as the `agg` of `runs` cache-cleared executions. */
  private def timeQueries(spark: SparkSession, dir: String, names: Seq[String],
                          runs: Int, agg: Seq[Double] => Double)
      : Seq[(String, Double)] =
    names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val samples = (1 to runs).map { _ =>
          // drop plan-level caches so each run pays the query's full
          // cost (some pipelines cache internally); repeated runs then
          // control for CPU noise only, not for cached reuse
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, dir).count(); true }
                   catch { case _: Throwable => false }
          (ok, (System.nanoTime() - t0) / 1e9)
        }
        // a query that threw must not report its (near-zero) elapsed
        // time as a success — sentinel -1 and a `failed` list instead
        name -> (if (samples.forall(_._1)) agg(samples.map(_._2)) else -1.0)
      }
    }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private case class Tier(results: Seq[(String, Double)], clean: Boolean,
                          retried: Boolean, pre: Probe, post: Probe) {
    // headline entries feed "total"/"queries" (baseline-comparable);
    // `extras` entries are split out so the total never needs a
    // comparable-subset footnote
    def headline: Seq[(String, Double)] = results.filterNot(r => extras.contains(r._1))
    def extraResults: Seq[(String, Double)] = results.filter(r => extras.contains(r._1))
    def json: String = {
      val failed = results.collect { case (k, v) if v < 0 => k }
      def obj(rs: Seq[(String, Double)]) =
        rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val total = headline.filter(_._2 >= 0).map(_._2).sum
      f""""total":$total%.3f,"clean":$clean,"retried":$retried,"pre":${pre.json},"post":${post.json},"queries":${obj(headline)},"extras":${obj(extraResults)},"failed":$failedJson"""
    }
  }

  /** Run one tier bracketed by probes. If the post-probe comes back hot the
    * timings are suspect (load ramped up mid-tier — r6 observed 1.8 -> 22):
    * wait the spike out and, once quiet, re-run the tier and keep the more
    * trustworthy attempt ([[BenchGuard.pickCleaner]]). `clean` means the
    * kept attempt ran between two quiet probes.
    */
  private def runTier(spark: SparkSession, cores: Int, idleSec: Double)
                     (run: () => Seq[(String, Double)]): Tier = {
    // post-tier probes gate on the SENTINEL only: loadavg right after
    // a tier reflects the tier's own 32-thread work (BenchGuard.quietPost)
    def postQuiet(p: Probe) = BenchGuard.quietPost(p.sentinelSec, idleSec)
    val pre = waitQuiet(spark, cores, idleSec)
    var r = run()
    var post = Probe(loadavg1(), sentinel(spark), 0)
    var retried = false
    var clean = pre.quiet(cores, idleSec) && postQuiet(post)
    if (!postQuiet(post)) {
      val pre2 = waitQuiet(spark, cores, idleSec)
      if (pre2.quiet(cores, idleSec)) {
        val r2 = run()
        val post2 = Probe(loadavg1(), sentinel(spark), 0)
        retried = true
        if (postQuiet(post2)) { r = r2; post = post2; clean = true }
        else { r = BenchGuard.pickCleaner(r, r2); post = post2; clean = false }
      }
    }
    Tier(r, clean, retried, pre, post)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val idleSec = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_IDLE",
      BenchGuard.DefaultIdleSentinelSec.toString).toDouble
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sentinel(spark) // first call pays JIT for the probe itself: discard

    // Warm JIT + whole-stage-codegen caches by running every headliner
    // once against the smallest SF (different data files, same generated
    // code). Steady-state throughput is the number that projects to a
    // long-running 100 TB job; a cold JVM's first-compile cost does not.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      (headliners ++ extras).foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
      }
    else spark.read.parquet(s"$sfDir/nation.parquet").count()

    // ---- sf0.1 tier: median of 3 (discards one contended run AND one
    // anomalously fast one) --------------------------------------------------
    val t0 = runTier(spark, cpus, idleSec) { () =>
      timeQueries(spark, sfDir, headliners ++ extras, runs = 3, median)
    }

    // ---- optional sf1 tier -------------------------------------------------
    // at sf0.1 all headliners sit inside the ~0.2 s/job scheduling floor,
    // so per-query ratios vs the baseline engine are noise; the sf1 tier
    // (DataGen output, 10x) puts the big ones seconds deep where the
    // ratio measures the plan, not the scheduler. min-of-2 is stable
    // because runTier brackets the tier with quiet probes.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "testdata/sf1")
    val sf1Tier =
      if (new java.io.File(s"$sf1Dir/lineitem.parquet").exists && sf1Dir != sfDir)
        Some(runTier(spark, cpus, idleSec) { () =>
          timeQueries(spark, sf1Dir, headliners ++ extras, runs = 2, _.min)
        })
      else None
    val sf1Json = sf1Tier.map(t => s""","sf1":{"dir":"$sf1Dir","runs":2,${t.json}}""").getOrElse("")

    // ---- optional sf10 tier: the FULL headliner set (r7 verdict item 2 —
    // the 5-query tier settled its borderliners decisively, so every
    // headliner now gets the seconds-deep trial instead of a "floor"
    // presumption) -----------------------------------------------------------
    val sf10Dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "testdata/sf10")
    val sf10Tier =
      if (new java.io.File(s"$sf10Dir/lineitem.parquet").exists && sf10Dir != sfDir)
        Some(runTier(spark, cpus, idleSec) { () =>
          timeQueries(spark, sf10Dir, headliners ++ extras, runs = 2, _.min)
        })
      else None
    val sf10Json = sf10Tier.map(t => s""","sf10":{"dir":"$sf10Dir","runs":2,${t.json}}""").getOrElse("")

    val allClean = (Seq(t0) ++ sf1Tier ++ sf10Tier).forall(_.clean)
    // top-level total/queries are headline-only (baseline-comparable);
    // the per-tier blocks carry the "extras" timings
    val total = t0.headline.filter(_._2 >= 0).map(_._2).sum
    val qs = t0.headline.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = t0.results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")

    // top-level fields keep the legacy shape the driver parses
    // (metric/value/queries/failed/contended); tier blocks carry the probes
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","idle_calibration_sec":$idleSec%.3f,"load_gate":${BenchGuard.LoadFraction * cpus}%.1f,"sentinel_bound_sec":${BenchGuard.SentinelSlack * idleSec}%.3f,"contended":${!allClean},"sf01":{${t0.json}}$sf1Json$sf10Json}"""
    // stdout goes through sbt's logger ([info] prefixes broke the
    // driver's parse in r1) — the file copy is the machine-readable one
    println(json)
    val out = new java.io.PrintWriter("BENCH_LAST.json")
    try out.println(json) finally out.close()
    spark.stop()
  }
}
