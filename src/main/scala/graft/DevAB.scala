package graft

import org.apache.spark.sql.functions._

/** Scratch A/B decomposition harness (not part of the driver
  * contract; deleted after use).
  */
object DevAB {
  /** Stage decomposition of q_bloom_ingest_dedup (r9 verdict item 2):
    * sketch build vs probe+verify vs the oracle-equivalent bare
    * anti-join, each timed against materialized caches.
    */
  def bloomStages(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.operators.BloomDedup
    def t[A](tag: String)(f: => A): A = {
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); val r = f
      println(f"DEVAB $tag ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val docs = Tables.documents(spark, dir).select("doc_id", "text", "source").cache()
      val incoming = docs.filter(pmod(col("doc_id"), lit(10L)) === 3L)
        .unionByName(docs.select(col("doc_id"),
          concat(lit("fresh "), col("doc_id").cast("string"), lit(" "), col("text")).as("text"),
          col("source"))).cache()
      t(s"r$i cache_mat") { exec(docs); exec(incoming) }
      val est = math.min(math.max(Tables.bytesOnDisk(spark, dir, "documents") / 64L, 1024L), 1L << 26)
      val bloom = t(s"r$i sketch_build") { BloomDedup.buildBloom(docs, "text", est, est * 10L) }
      val hit = call_function("bloom_might_contain", lit(bloom), xxhash64(col("text")))
      t(s"r$i probe_verify") {
        val misses = incoming.filter(!hit)
        val verified = incoming.filter(hit)
          .withColumn("__dig", md5(col("text").cast("binary")))
          .join(docs.select(md5(col("text").cast("binary")).as("__dig")).distinct(),
            Seq("__dig"), "left_anti").drop("__dig")
        exec(misses.unionByName(verified).groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars")))
      }
      t(s"r$i bare_antijoin") {
        exec(incoming.withColumn("__dig", md5(col("text").cast("binary")))
          .join(docs.select(md5(col("text").cast("binary")).as("__dig")).distinct(),
            Seq("__dig"), "left_anti").drop("__dig")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars")))
      }
      docs.unpersist(); incoming.unpersist()
    }
  }

  /** Interleaved A/B: exact overlap matrix, cached-shingleSets vs
    * raw-reuse forms, same session, alternating to cancel load drift.
    */
  def overlapAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.operators.SourceOverlap
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def one(tag: String)(f: => Unit): Double = {
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"DEVAB $tag $t%.3f"); t
    }
    val docs = Tables.documents(spark, dir)
    (1 to 3).foreach { i =>
      one(s"r$i uncached") {
        exec(SourceOverlap.matrixFromSets(
          SourceOverlap.shingleSets(docs, "source", col("text"), 3)))
      }
      one(s"r$i cached") {
        val bySh = SourceOverlap.shingleSets(docs, "source", col("text"), 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try SourceOverlap.materialized(SourceOverlap.matrixFromSets(bySh))
        finally bySh.unpersist(blocking = false)
      }
      one(s"r$i sketch_standalone") {
        exec(SourceOverlap.sketchMatrix(docs, "source", col("text"), 3))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata/sf30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime()
        exec(mk)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DEVAB $tag min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    if (args.contains("bloom")) { bloomStages(spark, dir); spark.stop(); return }
    if (args.contains("overlap")) { overlapAB(spark, dir); spark.stop(); return }

    val ev = Tables.events(spark, dir)
    // a) bare scan + ts conversion, 4 needed columns, no agg
    time("scan4")(ev.select(col("ts"), col("event_type"), col("user_id"), col("value")))
    // b) scan + window bucketing projection only
    time("scan_window")(ev.select(window(col("ts"), "1 hour"), col("event_type"),
      col("user_id"), col("value")))
    // c) date_trunc instead of window()
    time("scan_trunc")(ev.select(date_trunc("hour", col("ts")), col("event_type"),
      col("user_id"), col("value")))
    // d) full agg via date_trunc + two-level
    time("trunc_twolevel")(
      ev.groupBy(date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
        .groupBy(col("window_start"), col("event_type"))
        .agg(sum(col("n")).as("n_events"), round(sum(col("sv")), 2).as("sum_value"),
          count(lit(1)).as("n_users")))
    // e) full agg via window() + count_distinct (the r9 shape)
    time("window_expand")(
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"),
          count_distinct(col("user_id")).as("n_users")))
    // f) agg without the distinct at all (lower bound for agg cost)
    time("window_nodistinct")(
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value")))
    // h) bitmap exact-distinct: map-side bitmap_construct_agg per
    // (w, t, 32k-id bucket) collapses raw rows into blob partials
    time("window_bitmap")(
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type"),
          expr("bitmap_bucket_number(user_id + 1)").as("b"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
          expr("bitmap_construct_agg(bitmap_bit_position(user_id + 1))").as("bm"))
        .groupBy(col("window"), col("event_type"))
        .agg(sum(col("n")).as("n_events"), round(sum(col("sv")), 2).as("sum_value"),
          sum(expr("bitmap_count(bm)")).as("n_users")))
    // g) raw long ts: group on ns-div directly, no timestamp conversion
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      time("rawlong_twolevel")(
        raw.groupBy((col("ts") divide lit(3600000000000L)).cast("long").as("h"),
            col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
          .groupBy(col("h"), col("event_type"))
          .agg(sum(col("n")).as("n_events"), round(sum(col("sv")), 2).as("sum_value"),
            count(lit(1)).as("n_users")))
    spark.stop()
  }
}
