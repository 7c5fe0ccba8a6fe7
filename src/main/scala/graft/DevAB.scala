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

  /** MAD report decomposition: histogram pass vs the full report. */
  def madAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    def one(tag: String)(f: => Unit): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); f
      println(f"DEVAB $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    val ev = Tables.events(spark, dir).withColumn("value",
      when(pmod(col("event_id"), lit(97L)) === 0, col("value") * 50)
        .otherwise(col("value")))
    (1 to 3).foreach { i =>
      one(s"r$i hist_only") {
        exec(ev.select(floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("c"))
          .groupBy("c").agg(count(lit(1)).as("n")))
      }
      one(s"r$i full_report") {
        exec(graft.operators.RobustStats.madReport(ev, "value"))
      }
    }
  }

  /** Burstiness A/B: window-lag form vs collect_list + HOF fold. */
  def burstAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    def one(tag: String)(f: => Unit): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); f
      println(f"DEVAB $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    val ev = Tables.events(spark, dir)
    val sec = expr(
      "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', " +
        "cast(ts as timestamp_ntz))").cast("long")
    (1 to 3).foreach { i =>
      one(s"r$i window_lag") {
        exec(graft.operators.Burstiness.report(ev, "user_id", "ts", "event_id",
          minGaps = 8, cvBelow = 0.3))
      }
      one(s"r$i collect_hof") {
        val agg = ev.select(col("user_id"), sec.as("s"), col("event_id"))
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("s"), col("event_id")))).as("arr"))
          .select(col("user_id"),
            (size(col("arr")) - 1).cast("long").as("n_gaps"),
            (element_at(col("arr"), -1)("s") - element_at(col("arr"), 1)("s")).as("sg"),
            aggregate(
              zip_with(slice(col("arr"), lit(1), size(col("arr")) - 1),
                slice(col("arr"), lit(2), size(col("arr")) - 1),
                (a, b) => (b("s") - a("s")) * (b("s") - a("s"))),
              lit(0L).cast("decimal(38,0)"),
              (acc, x) => acc + x.cast("decimal(38,0)")).as("qg"))
          .filter(col("n_gaps") >= 8)
        exec(agg)
      }
    }
  }

  /** Decompose q_heavy_hitters_sketch: sketch pass alone vs exact
    * top-k alone vs the full check harness.
    */
  def hhAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.operators.HeavyHitters
    def one(tag: String)(f: => Unit): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); f
      println(f"DEVAB $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    val docs = Tables.documents(spark, dir)
    (1 to 3).foreach { i =>
      one(s"r$i sketch_only") {
        docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
          .agg(count_min_sketch(col("term"), lit(0.0001), lit(0.99), lit(42)))
          .head()
      }
      one(s"r$i sketch_eps1e3") {
        docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
          .agg(count_min_sketch(col("term"), lit(0.001), lit(0.99), lit(42)))
          .head()
      }
      one(s"r$i exact_only") { exec(HeavyHitters.topTerms(docs, "text", 20)) }
      one(s"r$i full_harness") {
        exec(HeavyHitters.topTermsSketchCheck(spark, docs, "text", 20))
      }
    }
  }

  /** Decompose q_embedding_standardize: moments pass vs z-pass vs
    * long-multiply square variant.
    */
  def stdAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def one(tag: String)(f: => Unit): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); f
      println(f"DEVAB $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    val emb = Tables.embeddings(spark, dir)
    def ix(x: org.apache.spark.sql.Column) =
      floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long")
    (1 to 3).foreach { i =>
      one(s"r$i moments_decimal") {
        exec(graft.ann.Standardize.dimMoments(emb, "embedding"))
      }
      one(s"r$i moments_longmul") {
        exec(emb.select(posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy("pos")
          .agg(count(lit(1)).as("n"),
            sum(ix(col("x")).cast("decimal(38,0)")).as("s"),
            sum(when(abs(ix(col("x"))) < lit(3000000000L),
                (ix(col("x")) * ix(col("x"))).cast("decimal(38,0)"))
              .otherwise(ix(col("x")).cast("decimal(38,0)") *
                ix(col("x")).cast("decimal(38,0)"))).as("q")))
      }
      one(s"r$i full_zreport") {
        exec(graft.ann.Standardize.zReport(emb, "vec_id", "embedding"))
      }
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

  /** q_hll_store_check stage decomposition (r10 verdict item 2): the
    * gate regressed 1.39x r9->r10 after the cache rework. Stages:
    * cache materialization, each delta build, merge+estimates, exact
    * per-part, exact global, full gate cached vs UNcached vs a
    * one-pass restructure (both deltas from one exchange; both exact
    * sides from one distinct (part,key) frame).
    */
  def hllAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.operators.SketchStore
    import org.apache.spark.sql.{Column, DataFrame}
    def exec(df: DataFrame): Unit = df.queryExecution.toRdd.foreach(_ => ())
    def one(tag: String)(f: => Unit): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); f
      println(f"DEVAB $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    def proj = Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("long").as("part"),
        col("o_orderkey"), col("o_custkey"))
    val bound = (est: Column, exact: Column) =>
      (abs(est - exact).cast("double") / exact <= 0.1).as("within_10pct")
    def gate(o: DataFrame): DataFrame = {
      def delta(parity: Int) =
        SketchStore.build(o.filter(pmod(col("o_orderkey"), lit(2)) === parity),
          "part", col("o_custkey"))
      val store = SketchStore.mergeIncremental(delta(0), delta(1), "part")
      val perPart = SketchStore.estimates(store)
        .join(o.groupBy("part").agg(count_distinct(col("o_custkey")).as("exact_distinct")), "part")
        .select(col("part"), col("n_rows"), col("exact_distinct"),
          bound(col("distinct_est"), col("exact_distinct")))
      val global = SketchStore.estimates(SketchStore.rollup(store))
        .crossJoin(o.agg(count_distinct(col("o_custkey")).as("exact_distinct")))
        .select(lit(-1L).as("part"), col("n_rows"), col("exact_distinct"),
          bound(col("distinct_est"), col("exact_distinct")))
      perPart.unionByName(global)
    }
    def gateOnePass(o: DataFrame): DataFrame = {
      // both deltas in ONE exchange (parity inside the group key),
      // then a KB-sized merge; exact sides from ONE distinct
      // (part, custkey) frame
      val both = o.groupBy(col("part"), pmod(col("o_orderkey"), lit(2)).as("__p"))
        .agg(count(lit(1)).as("n_rows"),
          hll_sketch_agg(col("o_custkey"), lit(12)).as("sketch"))
        .cache()
      val store = SketchStore.mergeIncremental(
        both.filter(col("__p") === 0).drop("__p"),
        both.filter(col("__p") === 1).drop("__p"), "part")
      val pc = o.select(col("part"), col("o_custkey")).distinct().cache()
      val perPartExact = pc.groupBy("part").agg(count(lit(1)).as("exact_distinct"))
      val globalExact = pc.select("o_custkey").distinct()
        .agg(count(lit(1)).as("exact_distinct"))
      val perPart = SketchStore.estimates(store)
        .join(perPartExact, "part")
        .select(col("part"), col("n_rows"), col("exact_distinct"),
          bound(col("distinct_est"), col("exact_distinct")))
      val global = SketchStore.estimates(SketchStore.rollup(store))
        .crossJoin(globalExact)
        .select(lit(-1L).as("part"), col("n_rows"), col("exact_distinct"),
          bound(col("distinct_est"), col("exact_distinct")))
      perPart.unionByName(global)
    }
    (1 to 3).foreach { i =>
      one(s"r$i full_gate_cached") {
        val o = proj.cache()
        try exec(gate(o)) finally o.unpersist(blocking = true)
      }
      one(s"r$i full_gate_uncached") { exec(gate(proj)) }
      one(s"r$i full_gate_onepass_uncached") { exec(gateOnePass(proj)) }
      one(s"r$i cache_mat_only") {
        val o = proj.cache()
        try exec(o) finally o.unpersist(blocking = true)
      }
      one(s"r$i delta_build_one") {
        exec(SketchStore.build(
          proj.filter(pmod(col("o_orderkey"), lit(2)) === 0), "part", col("o_custkey")))
      }
      one(s"r$i exact_perpart") {
        exec(proj.groupBy("part").agg(count_distinct(col("o_custkey")).as("x")))
      }
      one(s"r$i exact_global") {
        exec(proj.agg(count_distinct(col("o_custkey")).as("x")))
      }
    }
  }

  /** Flat-floor evidence for the r10 newborn sub-second laggards
    * (r10 verdict item 5) + the q_robust_scale decomposition (item 4):
    * for each gate, time the MANDATORY input stage (the scan/exchange
    * any engine answering the question pays) against the full gate,
    * at sf10 and sf30 — a remainder that stays flat while data grows
    * 3x is per-stage scheduling floor, not plan waste (the
    * mad_outliers method).
    */
  def floorsAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def one(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DEVAB $tag min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def gate(name: String): Unit = exec(SparkEntry.queries(name)(spark, dir))

    // q_dedup_keep_best: mandatory = scan + per-row content digest
    val docs = Tables.documents(spark, dir)
    one("keepbest_scan_digest")(exec(docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("d"), length(col("text")).as("s"))))
    one("keepbest_full")(gate("q_dedup_keep_best"))

    // q_change_points: mandatory = events scan + daily per-type agg
    val ev = Tables.events(spark, dir)
    one("changepoints_daily_agg")(exec(ev.groupBy(to_date(col("ts")).as("day"),
      col("event_type")).agg(count(lit(1)).as("n"))))
    one("changepoints_full")(gate("q_change_points"))

    // q_domain_policy: mandatory = url synth + host parse + host agg
    one("domain_host_agg")(exec(docs.withColumn("url",
        concat(lit("https://"),
          when(pmod(col("doc_id"), lit(5L)) === 0, lit("cdn.")).otherwise(lit("")),
          col("source"), lit("-"), pmod(col("doc_id"), lit(7L)).cast("string"),
          lit(".example.com/p/"), col("doc_id").cast("string")))
      .select(regexp_extract(col("url"), "^https?://([^/]+)", 1).as("host"))
      .groupBy("host").agg(count(lit(1)).as("n"))))
    one("domain_full")(gate("q_domain_policy"))

    // q_drift_summary: mandatory = two corpus scans + global extremes
    one("drift_scan_extremes") {
      exec(docs.filter(pmod(col("doc_id"), lit(2L)) === 0L)
        .agg(min("n_chars"), max("n_chars"), count(lit(1))))
      exec(docs.filter(pmod(col("doc_id"), lit(2L)) === 1L)
        .agg(min((col("n_chars") * lit(1.25)).as("c")), count(lit(1))))
    }
    one("drift_full")(gate("q_drift_summary"))

    // q_outlier_threshold_check: mandatory = embeddings scan + the
    // integer score fold over every vector (the HOF is the data pass)
    val emb = Tables.embeddings(spark, dir)
    one("outlier_score_fold")(exec(emb.select(col("vec_id"),
      pmod(col("vec_id"), lit(16L)).as("cell"),
      aggregate(col("embedding"), lit(0L), (acc, x) =>
        acc + floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long")).as("score"))))
    one("outlier_full")(gate("q_outlier_threshold_check"))

    // q_robust_scale stages: integerized per-dim histogram exchange;
    // + rank windows (stats only); full gate adds the broadcast-stats
    // HOF scale pass over every vector
    one("robust_hist_exchange")(exec(emb
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"), floor(col("x").cast("double") * lit(1e6) + lit(0.5))
        .cast("long").as("ix"))
      .agg(count(lit(1)).as("n"))))
    one("robust_full")(gate("q_robust_scale"))
  }

  /** r10 verdict item 8: the one-more-lever A/Bs for the q3/q5 sf30
    * residuals. q3: re-measure Spark's runtime bloom filter on the
    * fact side at sf30 (r9 rejected it at sf10; the shuffle-payload
    * term it saves grows with SF). q5: measure the persisted
    * orders-map lever — build+write the (o_orderkey, c_nationkey)
    * map once, bucket it by orderkey, and time the query that reads
    * it back vs the from-raw gate.
    */
  def tpchAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def one(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DEVAB $tag min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def withConfs(kv: (String, String)*)(f: => Unit): Unit = {
      val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    one("q3_current")(exec(SparkEntry.queries("q3_shipping_priority")(spark, dir)))
    one("q3_bloom")(withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1g",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      exec(SparkEntry.queries("q3_shipping_priority")(spark, dir))
    })

    one("q5_current")(exec(SparkEntry.queries("q5_local_supplier")(spark, dir)))
    // the persisted-map lever: one-time build of the asian-orders map
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val asianNations = broadcast(n.join(broadcast(r),
      col("n_regionkey") === col("r_regionkey")))
    val asianCust = Tables.customer(spark, dir)
      .join(asianNations, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val mapPath = "/tmp/graft_q5_ordersmap"
    one("q5_map_build_write") {
      broadcast(asianCust).join(o, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
        .write.mode("overwrite").parquet(mapPath)
    }
    one("q5_from_staged_map") {
      val asianOrders = spark.read.parquet(mapPath)
      val out = Tables.lineitem(spark, dir)
        .join(broadcast(asianOrders), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy("c_nationkey")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), round(col("rev"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
      exec(out)
    }
  }

  /** r12 optimization-round A/B: single-row-group tier files scan as
    * ONE task, so corpus HOF passes (tokenize/shingle) run serial on a
    * 32-core box — measure a post-scan round-robin fan-out, and the
    * hash-keyed (shingle_hash64) exchange for the overlap matrix.
    */
  def fanoutAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.functions.{TextFunctions => TF}
    import graft.operators.{SourceOverlap, Cooccur}
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DEVAB $tag min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val warm = "/root/testdata/sf0.001"
    def ov(docs: org.apache.spark.sql.DataFrame) =
      SourceOverlap.matrix(docs, "source", col("text"), 3)
    def ovHash(docs: org.apache.spark.sql.DataFrame) = {
      val bySh = docs.select(col("source").as("src"),
          explode(call_function("shingle_hash64", TF.tokens(col("text")), lit(3))).as("sh"))
        .groupBy("sh").agg(sort_array(collect_set(col("src"))).as("srcs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try SourceOverlap.materialized(SourceOverlap.matrixFromSets(bySh))
      finally { bySh.unpersist(blocking = false); () }
    }
    def pmi(docs: org.apache.spark.sql.DataFrame) =
      Cooccur.pmi(docs.select(col("doc_id"), col("text")), "doc_id",
        TF.tokens(col("text")), 5, 5, 40)
    exec(ov(Tables.documents(spark, warm)))
    exec(ovHash(Tables.documents(spark, warm)))
    exec(pmi(Tables.documents(spark, warm)))
    val docs = Tables.documents(spark, dir)
    val n = spark.sparkContext.defaultParallelism
    time("overlap_current")(exec(ov(docs)))
    time("overlap_fanout")(exec(ov(docs.repartition(n))))
    time("overlap_hash")(exec(ovHash(docs)))
    time("overlap_hash_fanout")(exec(ovHash(docs.repartition(n))))
    time("pmi_current")(exec(pmi(docs)))
    time("pmi_fanout")(exec(pmi(docs.repartition(n))))
  }

  /** A/B a session conf across gate queries (r12 opt): each named
    * query timed min-of-3 with the conf OFF then ON, interleaved.
    */
  def confAB(spark: org.apache.spark.sql.SparkSession, dir: String,
             key: String, value: String, names: Seq[String]): Unit = {
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def one(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    val warm = "/root/testdata/sf0.001"
    val orig = spark.conf.getOption(key)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (new java.io.File(warm).isDirectory)
        try exec(fn(spark, warm)) catch { case _: Throwable => () }
      val off = one(exec(fn(spark, dir)))
      spark.conf.set(key, value)
      // restore in finally: a throwing ON-measurement must not leave
      // the A/B conf set for every later query in the run (r12 advice)
      val on = try {
        try exec(fn(spark, warm)) catch { case _: Throwable => () }
        one(exec(fn(spark, dir)))
      } finally {
        orig match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
      }
      println(f"DEVAB conf $name off=$off%.3f on=$on%.3f delta=${(off - on) / off * 100}%.0f%%")
    }
  }

  /** Backoff-LM decomposition (r12 opt): where do the 1.7 s at sf0.1
    * go — the two doc-side corpus HOF passes, the three model-side
    * scans, or the five type-keyed joins?
    */
  def backoffAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.functions.{TextFunctions => TF}
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DEVAB $tag min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def trigramHashArr(textCol: org.apache.spark.sql.Column) =
      TF.bindOnce(TF.tokens(textCol), toks =>
        when(size(toks) < 3,
            array().cast(
              "array<struct<h3:bigint,h12:bigint,h23:bigint,hw2:bigint,hw3:bigint>>"))
          .otherwise(transform(sequence(lit(1), size(toks) - 2), i => {
            val (w1, w2, w3) =
              (element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))
            struct(
              xxhash64(w1, w2, w3).as("h3"),
              xxhash64(w1, w2).as("h12"),
              xxhash64(w2, w3).as("h23"),
              xxhash64(w2).as("hw2"),
              xxhash64(w3).as("hw3"))
          })))
    val n = spark.sparkContext.defaultParallelism
    val warmD = Tables.documents(spark, "/root/testdata/sf0.001")
    exec(graft.operators.BackoffLm.scores(warmD,
      warmD.filter(col("doc_id") % 3 === 0), "doc_id", "text"))
    val docs = Tables.documents(spark, dir)
    val model = docs.filter(col("doc_id") % 3 === 0)
    val docsS = docs.repartition(n)
    val modelS = docsS.filter(col("doc_id") % 3 === 0)
    // stage: one doc-side trigram pass (the tfd aggregate), serial vs spread
    val docTri = docs.select(col("doc_id"), explode(trigramHashArr(col("text"))).as("t"))
    val docTriS = docsS.select(col("doc_id"), explode(trigramHashArr(col("text"))).as("t"))
    time("bk_doctri_agg_serial")(exec(docTri.groupBy(col("t.h3").as("h3"), col("doc_id")).agg(count(lit(1)).as("tf"))))
    time("bk_doctri_agg_spread")(exec(docTriS.groupBy(col("t.h3").as("h3"), col("doc_id")).agg(count(lit(1)).as("tf"))))
    // stage: model unigram counts serial vs spread
    time("bk_uni_serial")(exec(model.select(explode(TF.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).groupBy(xxhash64(col("w")).as("hw")).agg(count(lit(1)).as("c1"))))
    time("bk_uni_spread")(exec(modelS.select(explode(TF.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).groupBy(xxhash64(col("w")).as("hw")).agg(count(lit(1)).as("c1"))))
    // full gate current vs spread-input
    time("bk_full_current")(exec(graft.operators.BackoffLm.scores(docs, model, "doc_id", "text")))
    time("bk_full_spread_inputs")(exec(graft.operators.BackoffLm.scores(docsS, modelS, "doc_id", "text")))
    // one-scan doc side: tfd carries the sibling hashes through the
    // (h3, doc) agg; types folds off THAT (type×doc-bounded rows)
    // instead of a second corpus HOF pass
    def pround = graft.functions.Rounding.pround _
    def scoresOneScan(docsI: org.apache.spark.sql.DataFrame,
                      modelI: org.apache.spark.sql.DataFrame,
                      spread: Int): org.apache.spark.sql.DataFrame = {
      val uni = modelI
        .select(explode(TF.tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(xxhash64(col("w")).as("hw"))
        .agg(count(lit(1)).as("c1"))
      val totals = uni.agg(sum("c1").as("n_tok"), count(lit(1)).as("v"))
      def bigramHashArr(textCol: org.apache.spark.sql.Column) =
        TF.bindOnce(TF.tokens(textCol), toks =>
          when(size(toks) < 2, array().cast("array<bigint>"))
            .otherwise(transform(sequence(lit(1), size(toks) - 1),
              i => xxhash64(element_at(toks, i), element_at(toks, i + 1)))))
      def trigramHashArr2(textCol: org.apache.spark.sql.Column) =
        TF.bindOnce(TF.tokens(textCol), toks =>
          when(size(toks) < 3,
              array().cast(
                "array<struct<h3:bigint,h12:bigint,h23:bigint,hw2:bigint,hw3:bigint>>"))
            .otherwise(transform(sequence(lit(1), size(toks) - 2), i => {
              val (w1, w2, w3) =
                (element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))
              struct(
                xxhash64(w1, w2, w3).as("h3"),
                xxhash64(w1, w2).as("h12"),
                xxhash64(w2, w3).as("h23"),
                xxhash64(w2).as("hw2"),
                xxhash64(w3).as("hw3"))
            })))
      val big = modelI.select(explode(bigramHashArr(col("text"))).as("hb"))
        .groupBy("hb").agg(count(lit(1)).as("c2"))
      val tri = modelI.select(explode(trigramHashArr2(col("text"))).as("t"))
        .groupBy(col("t.h3").as("h3")).agg(count(lit(1)).as("c3"))
      val docTriI = docsI
        .select(col("doc_id"), explode(trigramHashArr2(col("text"))).as("t"))
      val tfd0 = docTriI.groupBy(col("t.h3").as("h3"), col("doc_id"))
        .agg(count(lit(1)).as("tf"),
          first(col("t.h12")).as("h12"), first(col("t.h23")).as("h23"),
          first(col("t.hw2")).as("hw2"), first(col("t.hw3")).as("hw3"))
      val tfd = tfd0.select("h3", "doc_id", "tf")
      val types = tfd0.groupBy(col("h3"))
        .agg(first(col("h12")).as("h12"), first(col("h23")).as("h23"),
          first(col("hw2")).as("hw2"), first(col("hw3")).as("hw3"))
      val types2 = if (spread > 0) types.repartition(spread) else types
      val scored = types2
        .join(tri, Seq("h3"), "left")
        .join(big.select(col("hb").as("h12"), col("c2").as("c12")), Seq("h12"), "left")
        .join(big.select(col("hb").as("h23"), col("c2").as("c23")), Seq("h23"), "left")
        .join(uni.select(col("hw").as("hw2"), col("c1").as("c_w2")), Seq("hw2"), "left")
        .join(uni.select(col("hw").as("hw3"), col("c1").as("c_w3")), Seq("hw3"), "left")
        .crossJoin(broadcast(totals))
        .select(col("h3"),
          when(col("c3").isNotNull, lit(3))
            .when(col("c23").isNotNull, lit(2))
            .otherwise(lit(1)).as("level"),
          floor(log(
            when(col("c3").isNotNull,
              col("c3").cast("double") / col("c12"))
            .when(col("c23").isNotNull,
              lit(0.4) * col("c23") / col("c_w2"))
            .otherwise(lit(0.16) * (coalesce(col("c_w3"), lit(0L)) + lit(1L))
              / (col("n_tok") + col("v"))))
            * lit(1e6) + lit(0.5)).cast("long").as("lns"))
      val perDoc = tfd.join(scored, Seq("h3"))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_trigrams"),
          sum(when(col("level") === 3, col("tf")).otherwise(lit(0L))).as("n_hit3"),
          sum(when(col("level") === 2, col("tf")).otherwise(lit(0L))).as("n_hit2"),
          sum(when(col("level") === 1, col("tf")).otherwise(lit(0L))).as("n_hit1"),
          sum(col("tf") * col("lns")).as("s"))
      docsI.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
          coalesce(col("n_hit3"), lit(0L)).as("n_hit3"),
          coalesce(col("n_hit2"), lit(0L)).as("n_hit2"),
          coalesce(col("n_hit1"), lit(0L)).as("n_hit1"),
          when(col("n_trigrams").isNull, lit(0.0)).otherwise(
            pround(col("s").cast("double") / (col("n_trigrams") * lit(1000000.0)), 4))
            .as("backoff_mean"))
    }
    exec(scoresOneScan(warmD, warmD.filter(col("doc_id") % 3 === 0), 0))
    time("bk_full_onescan")(exec(scoresOneScan(docs, model, 0)))
    time("bk_full_onescan_spreadin")(exec(scoresOneScan(docsS, modelS, 0)))
    time("bk_full_onescan_spreadtypes")(exec(scoresOneScan(docs, model, n)))
    time("bk_full_onescan_both")(exec(scoresOneScan(docsS, modelS, n)))
    // equality of spread-input variant and one-scan variant
    val a = graft.operators.BackoffLm.scores(docs, model, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = graft.operators.BackoffLm.scores(docsS, modelS, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val c = scoresOneScan(docs, model, n).orderBy("doc_id").collect().toSeq
    println(s"DEVAB bk_equal=${a == b} onescan_equal=${a == c} n=${a.size}")
  }

  /** NgramJaccard spread A/B (r12 opt): pairs pipeline with the
    * shingle exchange AQE-managed (0) vs explicit-width, interleaved.
    */
  def jaccardAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DEVAB $tag min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    import graft.dedup.{NgramJaccard, Components}
    val n = spark.sparkContext.defaultParallelism
    val warm = Tables.documents(spark, "/root/testdata/sf0.001")
    exec(NgramJaccard.pairs(warm, "doc_id", "text", 3, 0.5, 20))
    exec(NgramJaccard.pairs(warm, "doc_id", "text", 3, 0.5, 20, spreadN = n))
    val docs = Tables.documents(spark, dir)
    time("jacc_pairs_aqe")(exec(NgramJaccard.pairs(docs, "doc_id", "text", 3, 0.5, 20)))
    time("jacc_pairs_spread")(exec(NgramJaccard.pairs(docs, "doc_id", "text", 3, 0.5, 20, spreadN = n)))
    time("clusters_aqe")(exec(Components.clusters(docs, "doc_id",
      NgramJaccard.pairs(docs, "doc_id", "text", 3, 0.5, 20), "id_a", "id_b")))
    time("clusters_spread")(exec(Components.clusters(docs, "doc_id",
      NgramJaccard.pairs(docs, "doc_id", "text", 3, 0.5, 20, spreadN = n), "id_a", "id_b")))
    val a = NgramJaccard.pairs(docs, "doc_id", "text", 3, 0.5, 20)
      .orderBy("id_a", "id_b").collect().toSeq
    val b = NgramJaccard.pairs(docs, "doc_id", "text", 3, 0.5, 20, spreadN = n)
      .orderBy("id_a", "id_b").collect().toSeq
    println(s"DEVAB jacc_equal=${a == b} n=${a.size}")
  }

  /** PMI decomposition + hash-keyed pair-grid variant (r12 opt). */
  def pmiAB(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.functions.{TextFunctions => TF}
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DEVAB $tag min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def pmiHash(docs0: org.apache.spark.sql.DataFrame,
                minDf: Int, minPairCount: Int, topK: Int): org.apache.spark.sql.DataFrame = {
      val docs = docs0.select(col("doc_id"), col("text"))
      val pres = docs.select(col("doc_id"),
          explode(array_distinct(TF.tokens(col("text")))).as("token"))
        .filter(length(col("token")) > 0)
        .select(col("doc_id"), col("token"), xxhash64(col("token")).as("h"))
      val dfTab = pres.groupBy(col("h")).agg(first(col("token")).as("token"),
          count(lit(1)).as("df"))
        .filter(col("df") >= minDf)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val docToks = pres.join(broadcast(dfTab.select("h")), "h")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("h"))).as("toks"))
      val pairs = docToks.select(explode(flatten(
        transform(col("toks"), (t, i) =>
          transform(slice(col("toks"), i + lit(2), size(col("toks")) - i - lit(1)),
            u => struct(t.as("h_a"), u.as("h_b")))))).as("p"))
        .select(col("p.h_a"), col("p.h_b"))
      val pairCounts = pairs.groupBy("h_a", "h_b")
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= minPairCount)
      val scored = pairCounts
        .join(broadcast(dfTab.select(col("h").as("h_a"), col("token").as("tok_x"),
          col("df").as("df_x"))), "h_a")
        .join(broadcast(dfTab.select(col("h").as("h_b"), col("token").as("tok_y"),
          col("df").as("df_y"))), "h_b")
        .crossJoin(broadcast(nDocs))
        .select(
          least(col("tok_x"), col("tok_y")).as("tok_a"),
          greatest(col("tok_x"), col("tok_y")).as("tok_b"),
          when(col("tok_x") <= col("tok_y"), col("df_x")).otherwise(col("df_y")).as("df_a"),
          when(col("tok_x") <= col("tok_y"), col("df_y")).otherwise(col("df_x")).as("df_b"),
          col("n_pair"),
          (col("n_pair").cast("double") * col("n_docs")
            / (col("df_x") * col("df_y")).cast("double")).as("__lift"))
      scored
        .orderBy(col("__lift").desc, col("tok_a"), col("tok_b"))
        .limit(topK)
        .select(col("tok_a"), col("tok_b"), col("n_pair"), col("df_a"), col("df_b"),
          (floor(log(col("__lift")) * 1e4 + lit(0.5)) / 1e4).as("pmi"))
    }
    val warm = Tables.documents(spark, "/root/testdata/sf0.001")
    exec(pmiHash(warm, 5, 5, 40))
    val docs = Tables.documents(spark, dir)
    // stage decomposition of the CURRENT operator
    val pres = docs.select(col("doc_id"), explode(array_distinct(TF.tokens(col("text")))).as("token"))
      .filter(length(col("token")) > 0)
    time("pmi_pres_count")(exec(pres.groupBy("token").agg(count(lit(1)).as("df")).filter(col("df") >= 5)))
    val dfTab = pres.groupBy("token").agg(count(lit(1)).as("df")).filter(col("df") >= 5)
    val docToks = pres.join(broadcast(dfTab), "token")
      .groupBy(col("doc_id")).agg(sort_array(collect_set(col("token"))).as("toks"))
    time("pmi_doctoks")(exec(docToks))
    val pairs = docToks.select(explode(flatten(
      transform(col("toks"), (t, i) =>
        transform(slice(col("toks"), i + lit(2), size(col("toks")) - i - lit(1)),
          u => struct(t.as("tok_a"), u.as("tok_b")))))).as("p"))
      .select(col("p.tok_a"), col("p.tok_b"))
    time("pmi_paircounts")(exec(pairs.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_pair")).filter(col("n_pair") >= 5)))
    time("pmi_full_current")(exec(graft.operators.Cooccur.pmi(
      docs.select(col("doc_id"), col("text")), "doc_id", TF.tokens(col("text")), 5, 5, 40)))
    time("pmi_full_hash")(exec(pmiHash(docs, 5, 5, 40)))
    val n = spark.sparkContext.defaultParallelism
    time("pmi_full_hash_fanout")(exec(pmiHash(docs.repartition(n), 5, 5, 40)))
    // grid-parallelism probe: repartition the doc-token frame between
    // the agg and the pair grid so AQE's size-based coalesce (tiny
    // aggregated rows) can't serialize the O(k²) explode stage
    def pmiHashSpread(docs0: org.apache.spark.sql.DataFrame,
                      minDf: Int, minPairCount: Int, topK: Int): org.apache.spark.sql.DataFrame = {
      val docs = docs0.select(col("doc_id"), col("text"))
      val pres = docs.select(col("doc_id"),
          explode(array_distinct(TF.tokens(col("text")))).as("token"))
        .filter(length(col("token")) > 0)
        .select(col("doc_id"), col("token"), xxhash64(col("token")).as("h"))
      val dfTab = pres.groupBy(col("h")).agg(first(col("token")).as("token"),
          count(lit(1)).as("df"))
        .filter(col("df") >= minDf)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val docToks = pres.join(broadcast(dfTab.select("h")), "h")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("h"))).as("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
      val pairs = docToks.select(explode(flatten(
        transform(col("toks"), (t, i) =>
          transform(slice(col("toks"), i + lit(2), size(col("toks")) - i - lit(1)),
            u => struct(t.as("h_a"), u.as("h_b")))))).as("p"))
        .select(col("p.h_a"), col("p.h_b"))
      val pairCounts = pairs.groupBy("h_a", "h_b")
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= minPairCount)
      val scored = pairCounts
        .join(broadcast(dfTab.select(col("h").as("h_a"), col("token").as("tok_x"),
          col("df").as("df_x"))), "h_a")
        .join(broadcast(dfTab.select(col("h").as("h_b"), col("token").as("tok_y"),
          col("df").as("df_y"))), "h_b")
        .crossJoin(broadcast(nDocs))
        .select(
          least(col("tok_x"), col("tok_y")).as("tok_a"),
          greatest(col("tok_x"), col("tok_y")).as("tok_b"),
          when(col("tok_x") <= col("tok_y"), col("df_x")).otherwise(col("df_y")).as("df_a"),
          when(col("tok_x") <= col("tok_y"), col("df_y")).otherwise(col("df_x")).as("df_b"),
          col("n_pair"),
          (col("n_pair").cast("double") * col("n_docs")
            / (col("df_x") * col("df_y")).cast("double")).as("__lift"))
      scored
        .orderBy(col("__lift").desc, col("tok_a"), col("tok_b"))
        .limit(topK)
        .select(col("tok_a"), col("tok_b"), col("n_pair"), col("df_a"), col("df_b"),
          (floor(log(col("__lift")) * 1e4 + lit(0.5)) / 1e4).as("pmi"))
    }
    exec(pmiHashSpread(warm, 5, 5, 40))
    time("pmi_full_hash_spread")(exec(pmiHashSpread(docs, 5, 5, 40)))
    // value equality vs current
    val a = graft.operators.Cooccur.pmi(docs.select(col("doc_id"), col("text")), "doc_id",
      TF.tokens(col("text")), 5, 5, 40).collect().toSeq
    val b = pmiHash(docs, 5, 5, 40).collect().toSeq
    val c = pmiHashSpread(docs, 5, 5, 40).collect().toSeq
    println(s"DEVAB pmi_equal=${a == b} spread_equal=${a == c} n=${a.size}")
  }

  /** Write `.explain("formatted")` of each named gate query (all
    * bench headliners+extras when `names` is empty) to
    * `<outDir>/<name>_<tag>.txt` — the plan evidence the optimization
    * rounds commit under plans/r12/.
    */
  def dumpPlans(spark: org.apache.spark.sql.SparkSession, dir: String,
                outDir: String, tag: String, names: Seq[String]): Unit = {
    new java.io.File(outDir).mkdirs()
    val all = if (names.nonEmpty) names else Bench.benchedNames
    all.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try {
          // each query's plan must be the one Bench times: no cache
          // entries leaked from a prior gate's construction
          spark.sharedState.cacheManager.clearCache()
          val plan = fn(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
            plan.getBytes("UTF-8"))
        } catch { case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata/sf30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `DevAB <dir> plans <outDir> <tag> [name1,name2]`
    args.indexOf("plans") match {
      case i if i >= 0 && args.length > i + 2 =>
        val names = if (args.length > i + 3) args(i + 3).split(",").toSeq else Nil
        dumpPlans(spark, dir, args(i + 1), args(i + 2), names)
        spark.stop(); return
      case _ => ()
    }
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

    // stage decomposition of q_vocab_drift: planted transform vs the
    // token exchange vs the full JS matrix
    if (args.contains("vdrift")) {
      import graft.functions.{TextFunctions => TF}
      val docs0 = Tables.documents(spark, dir)
      val docs = docs0.select(
        when(pmod(col("doc_id"), lit(7L)) === 3L, lit("drifted"))
          .otherwise(col("source")).as("fam"),
        when(pmod(col("doc_id"), lit(7L)) === 3L,
          concat_ws(" ", transform(TF.tokens(col("text")), t => reverse(t))))
          .otherwise(col("text")).as("text"))
      time("plain_tok_groupby")(
        docs0.select(col("source").as("fam"),
            explode(TF.tokens(col("text"))).as("t"))
          .filter(length(col("t")) > 0).groupBy("fam", "t").count())
      time("planted_tok_groupby")(
        docs.select(col("fam"), explode(TF.tokens(col("text"))).as("t"))
          .filter(length(col("t")) > 0).groupBy("fam", "t").count())
      time("full_gate")(SparkEntry.queries("q_vocab_drift")(spark, dir))
      // finer: checkpoint alone, totals collect, downstream given ckpt
      def t[A](tag: String)(f: => A): A = {
        System.gc(); Thread.sleep(300)
        val t0 = System.nanoTime(); val r = f
        println(f"DEVAB $tag ${(System.nanoTime() - t0) / 1e9}%.3f"); r
      }
      val cnt0 = docs
        .select(col("fam"), explode(TF.tokens(col("text"))).as("t"))
        .filter(length(col("t")) > 0)
        .groupBy("fam", "t").agg(count(lit(1)).as("c"))
      val ck = t("ckpt_eager")(cnt0.localCheckpoint(true))
      val tot = t("totals_collect")(ck.groupBy("fam")
        .agg(sum(col("c")).as("tc")).collect().length)
      println(s"DEVAB totals_rows $tot")
      t("downstream")(exec(ck.groupBy("t")
        .agg(map_from_entries(collect_list(struct(col("fam"), col("c"))))
          .as("byFam"))))
      spark.stop(); return
    }
    // generic gate-query timer: `DevAB <dir> q name1,name2` — min-of-3
    // with a sf0.001 JIT warm pass, the Bench measurement discipline,
    // for spot-checking a newborn's tier time before its first bench
    args.sliding(2).collectFirst { case Array("q", names) => names } match {
      case Some(names) =>
        val warm = "/root/testdata/sf0.001"
        names.split(",").foreach { name =>
          if (new java.io.File(warm).isDirectory)
            try exec(SparkEntry.queries(name)(spark, warm))
            catch { case _: Throwable => () }
          time(name)(SparkEntry.queries(name)(spark, dir))
        }
        spark.stop(); return
      case None => ()
    }
    if (args.contains("fanout")) { fanoutAB(spark, dir); spark.stop(); return }
    if (args.contains("pmi2")) { pmiAB(spark, dir); spark.stop(); return }
    if (args.contains("backoff")) { backoffAB(spark, dir); spark.stop(); return }
    if (args.contains("jaccard")) { jaccardAB(spark, dir); spark.stop(); return }
    // `DevAB <dir> conf <key> <value> name1,name2,...`
    args.indexOf("conf") match {
      case i if i >= 0 && args.length > i + 3 =>
        confAB(spark, dir, args(i + 1), args(i + 2), args(i + 3).split(",").toSeq)
        spark.stop(); return
      case _ => ()
    }
    if (args.contains("tpch")) { tpchAB(spark, dir); spark.stop(); return }
    if (args.contains("floors")) { floorsAB(spark, dir); spark.stop(); return }
    if (args.contains("hll")) { hllAB(spark, dir); spark.stop(); return }
    if (args.contains("bloom")) { bloomStages(spark, dir); spark.stop(); return }
    if (args.contains("overlap")) { overlapAB(spark, dir); spark.stop(); return }
    if (args.contains("std")) { stdAB(spark, dir); spark.stop(); return }
    if (args.contains("hh")) { hhAB(spark, dir); spark.stop(); return }
    if (args.contains("burst")) { burstAB(spark, dir); spark.stop(); return }
    if (args.contains("mad")) { madAB(spark, dir); spark.stop(); return }

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
