package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline workload on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Headliners cover each engine area: TPC-H joins/aggs, window dedup,
  * LSH dedup, ANN, text stats, windowed events, sessionization.
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    // median of 3 runs per query: this box shares CPU with other
    // tenants and single-shot timings swing 2x; the median discards
    // one contended run AND one anomalously fast one, where min-of-2
    // (used through r4) still reported pure noise when both samples
    // landed in a loaded window
    val results = headliners.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val runs = (1 to 3).map { _ =>
          // drop plan-level caches so each run pays the query's full
          // cost (some pipelines cache internally); the median then
          // controls for CPU noise only, not for cached reuse
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
                   catch { case _: Throwable => false }
          (ok, (System.nanoTime() - t0) / 1e9)
        }
        // a query that threw must not report its (near-zero) elapsed
        // time as a success — sentinel -1 and a `failed` list instead
        name -> (if (runs.forall(_._1)) runs.map(_._2).sorted.apply(1) else -1.0)
      }
    }
    val failed = results.collect { case (k, v) if v < 0 => k }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    // stdout goes through sbt's logger ([info] prefixes broke the
    // driver's parse in r1) — the file copy is the machine-readable one
    println(json)
    val out = new java.io.PrintWriter("BENCH_LAST.json")
    try out.println(json) finally out.close()
    spark.stop()
  }
}
