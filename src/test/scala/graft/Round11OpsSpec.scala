package graft

import org.apache.spark.sql.functions._

/** Round-11 operator-form gates: the persisted HLL store benched
  * alone (q_hll_store) and the standalone sketch-overlap matrix
  * (q_overlap_sketch) — both split out of their exact-envelope check
  * harnesses per the r10 verdict.
  */
class Round11OpsSpec extends SparkSpec {

  test("q_hll_store: merged delta estimates are lossless vs a from-scratch build") {
    val out = SparkEntry.queries("q_hll_store")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // from-scratch single-pass store over the SAME projection: union
    // at fixed lgK is register-wise max, so estimates must be
    // IDENTICAL, not merely close
    val o = Tables.orders(spark, sf())
      .select(year(col("o_orderdate")).cast("long").as("part"),
        col("o_orderkey"), col("o_custkey"))
    val scratch = graft.operators.SketchStore.estimates(
      graft.operators.SketchStore.build(o, "part", col("o_custkey")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val perPart = out.filter(_._1 >= 0)
    assert(perPart.nonEmpty)
    perPart.foreach { case (p, n, est) =>
      val (sn, sest) = scratch(p)
      assert(n == sn, s"part $p n_rows $n != $sn")
      assert(est == sest, s"part $p merged est $est != from-scratch $sest")
    }
    // the rollup row: n_rows sums the store, estimate within the
    // 10%-envelope of the exact global distinct
    val global = out.filter(_._1 == -1L)
    assert(global.length == 1)
    assert(global.head._2 == perPart.map(_._2).sum)
    val exact = o.select("o_custkey").distinct().count()
    assert(math.abs(global.head._3 - exact).toDouble / exact <= 0.1)
  }

  test("ewma: alpha=1/2 prefix recursion and relative-jump spikes, hand-checked") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("ts", TimestampNTZType)))
    def t(day: Int, h: Int) = java.time.LocalDateTime.of(2024, 1, day, h, 0)
    // day counts for key a: 4, 8, 2, 2 -> ewma 4, 6, 4, 3
    val rows = (Seq.fill(4)(1) ++ Seq.fill(8)(2) ++ Seq.fill(2)(3) ++ Seq.fill(2)(4))
      .zipWithIndex.map { case (day, i) =>
        org.apache.spark.sql.Row("a", t(day, i % 24))
      }
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = graft.operators.Ewma.dailySpikes(df, "k", "ts")
      .orderBy("day")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 4L, 4.0, false),   // seed day never flags
      ("2024-01-02", 8L, 6.0, true),    // |8-4| = 4 > 0.5*4
      ("2024-01-03", 2L, 4.0, true),    // |2-6| = 4 > 3
      ("2024-01-04", 2L, 3.0, false)))  // |2-4| = 2 > 2 is false (strict)
  }

  test("chat assembly: gap split, deterministic turn order, ties by tiebreak") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampNTZType), StructField("event_id", LongType),
      StructField("txt", StringType)))
    def t(h: Int, m: Int) = java.time.LocalDateTime.of(2024, 1, 1, h, m)
    val rows = Seq(
      // session 1: two turns 10 min apart; same-ts pair ordered by event_id
      (1L, t(10, 0), 5L, "a"), (1L, t(10, 0), 4L, "z"), (1L, t(10, 10), 6L, "b"),
      // 50-min gap > 30 -> session 2
      (1L, t(11, 0), 7L, "c"),
      // another user entirely
      (2L, t(10, 0), 8L, "x"))
      .map(r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4))
    val out = graft.operators.ChatAssembly.transcripts(
      spark.createDataFrame(rows.asJava, schema),
      "user_id", "ts", "event_id", turn = col("txt"), gapMinutes = 30, sep = "|")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out((1L, 1L)) == (3L, 5L, md5("z|a|b"))) // event_id 4 ("z") before 5 ("a")
    assert(out((1L, 2L)) == (1L, 1L, md5("c")))
    assert(out((2L, 1L)) == (1L, 1L, md5("x")))
  }

  test("IVF append: batch visible through the pruned scan; stamp skips rebuild") {
    val emb = Tables.embeddings(spark, sf()).select("vec_id", "embedding")
    val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 0L)
    val batch = emb.filter(pmod(col("vec_id"), lit(5L)) === 0L)
    val tmp = "/tmp/graft_ivfapp_spec"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    assert(graft.ann.Ivf.ensureAppendedIndex(base, batch, tmp, c = 8))
    // idempotence: the stamp must skip the rebuild AND the re-append
    assert(!graft.ann.Ivf.ensureAppendedIndex(base, batch, tmp, c = 8))
    val nCells = spark.read.parquet(s"$tmp/cells").count()
    assert(nCells == emb.count(), s"cells hold $nCells rows") // base + batch, no dups
    // a shifted-id copy of an appended vector finds its original at 1.0
    val q = batch.limit(2)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val top1 = graft.ann.Ivf.topKIndexed(tmp, q, k = 3, nprobe = 8)
      .filter(col("rank") === 1)
      .select("query_id", "nbr_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(top1.nonEmpty)
    top1.foreach { case (qid, nbr, sim) =>
      assert(nbr == qid - 1000000L && sim == 1.0, s"($qid, $nbr, $sim)")
    }
  }

  test("hist store: merged deltas equal a from-scratch build exactly") {
    import graft.operators.HistStore
    val o = Tables.orders(spark, sf()).select(
      year(col("o_orderdate")).cast("long").as("part"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      col("o_orderkey"))
    val width = 1000L
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val merged = HistStore.mergeIncremental(
      HistStore.build(o.filter(pmod(col("o_orderkey"), lit(2)) === 0), "part", col("cents"), width),
      HistStore.build(o.filter(pmod(col("o_orderkey"), lit(2)) === 1), "part", col("cents"), width),
      "part")
    val scratch = HistStore.build(o, "part", col("cents"), width)
    assert(rows(merged) == rows(scratch)) // count ADDITION: exact, not approximate
    // estimates land within one bucket of a value that exists
    val est = HistStore.percentileEstimates(merged, "part", Seq(0.5), width)
      .collect().map(r => r.getLong(2))
    assert(est.nonEmpty && est.forall(_ > 0))
  }

  test("url canonicalize: case/www/port/slash/tracking/fragment/sort rules") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("u", StringType)))
    val in = Seq(
      "HTTPS://WWW.Ex.COM:443/Path/A/",        // case+www+port+slash; path case KEPT
      "https://ex.com/Path/A?utm_source=x&gclid=1", // tracking dropped
      "https://ex.com/Path/A?b=2&a=1#frag",    // kept params sorted, fragment dropped
      "https://ex.com/Path/A",                 // already canonical
      "not a url at all")                      // unparseable -> NULL
    val out = spark.createDataFrame(
      in.map(org.apache.spark.sql.Row(_)).asJava, schema)
      .select(graft.operators.UrlCanonical.canonicalize(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0).contains("https://ex.com/Path/A"))
    assert(out(1).contains("https://ex.com/Path/A"))
    assert(out(2).contains("https://ex.com/Path/A?a=1&b=2"))
    assert(out(3).contains("https://ex.com/Path/A"))
    assert(out(4).isEmpty)
  }

  test("verbatim contamination: planted snippet flags, clean doc survives") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val train = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "the quick brown fox PLANTED EVAL ANSWER HERE jumps"),
      org.apache.spark.sql.Row(2L, "an entirely unrelated training document")).asJava,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val snippets = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row("PLANTED EVAL ANSWER HERE")).asJava,
      StructType(Seq(StructField("snippet", StringType))))
    val flagged = graft.pipeline.Decontaminate
      .verbatimFlagged(train, snippets, "text", "snippet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(flagged == Seq(1L))
  }

  test("matryoshka recall: identity dim is exact, truncations bounded") {
    val emb = Tables.embeddings(spark, sf()).select("vec_id", "embedding")
    val dim = emb.selectExpr("size(embedding)").limit(1)
      .collect().head.getInt(0)
    val out = graft.ann.Knn.truncatedRecall(emb,
        emb.filter(col("vec_id") < 4), k = 3, dims = Seq(dim / 4, dim))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val (nTrue, nHitsFull, recFull) = out(dim.toLong)
    assert(nTrue == 4 * 3 && nHitsFull == nTrue && recFull == 1.0,
      s"identity dim must reproduce the full ranking: $out")
    val (_, hitsT, recT) = out((dim / 4).toLong)
    assert(hitsT <= nTrue && recT >= 0.0 && recT <= 1.0, s"$out")
  }

  test("q_overlap_sketch: estimates sit inside the check harness envelope") {
    // the standalone operator must estimate the same matrix the
    // exact+sketch harness (q_source_overlap_sketch, oracle-green)
    // checks: for every pair, |est_shared - exact_shared| within
    // 5% of (n_a + n_b) + 50 — the harness's own tolerance
    val est = SparkEntry.queries("q_overlap_sketch")(spark, sf())
      .select("src_a", "src_b", "est_shared")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val exact = graft.operators.SourceOverlap.matrix(
      Tables.documents(spark, sf()), "source", col("text"), k = 3)
      .select("src_a", "src_b", "shared_shingles", "n_a", "n_b")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(exact.nonEmpty)
    assert(est.keySet == exact.map(_._1).toSet)
    exact.foreach { case (k, (shared, na, nb)) =>
      assert(math.abs(est(k) - shared) <= 0.05 * (na + nb) + 50,
        s"pair $k est ${est(k)} vs exact $shared (n_a=$na n_b=$nb)")
    }
  }
}
