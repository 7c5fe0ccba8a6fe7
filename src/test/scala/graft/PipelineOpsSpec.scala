package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Decontaminate

/** Specs for the round-4 pipeline operators (decontamination, PII,
  * repetition stats, domain mixing, incremental dedup).
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, "columnar storage engines use vectorized execution for speed"),
    (3L, ""),                                  // zero-shingle doc
    (4L, "short doc")                          // < k words: whole-text shingle
  ).toDF("doc_id", "text")

  private lazy val eval = Seq(
    // shares the full leading 3-grams of doc 1, nothing of doc 2
    (100L, "the quick brown fox jumps over a fence"),
    (101L, "short doc")
  ).toDF("doc_id", "text")

  test("prepClustered keeps only the cluster min on a near-dup chain") {
    // A~B and B~C overlap pairwise above 0.5 Jaccard, but A and C share
    // too little: pairwise removal (prepFull's policy) would keep A AND
    // C; cluster-canonical keeps only A. Text passes every prep gate
    // (en stopwords, >=10 tokens); doc 9 is an unrelated singleton.
    val base = "the cat and the dog walked to a house in town today"
    val chain = Seq(
      (1L, base + " alpha beta gamma delta"),
      (2L, base + " alpha beta epsilon zeta"),
      (3L, base + " epsilon zeta eta theta"),
      (9L, "a completely different story of the sea and the old ship sails"))
      .toDF("doc_id", "text")
    val args = (chain, "doc_id", "text",
      Seq("the", "a", "of", "and", "to", "in"), Seq("en" -> Seq("the", "a")))
    val clustered = graft.pipeline.CorpusPrep.prepClustered(args._1, args._2,
      args._3, args._4, args._5, minQuality = 0.0, allowedLangs = Seq("en"),
      minTokens = 5, jaccardThreshold = 0.5, shingleK = 3, maxDf = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(clustered == Set(1L, 9L))
    val pairwise = graft.pipeline.CorpusPrep.prepFull(args._1, args._2,
      args._3, args._4, args._5, minQuality = 0.0, allowedLangs = Seq("en"),
      minTokens = 5, jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(pairwise.contains(1L) && !pairwise.contains(2L))
  }

  test("Decontaminate.stats flags overlapping docs, preserves all rows") {
    val s = Decontaminate.stats(train, eval, "doc_id", "text", k = 3, threshold = 0.3)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_hit", "contaminated")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(s.map(_._1) == Seq(1L, 2L, 3L, 4L))          // every train row present
    val byId = s.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 >= 4L && byId(1L)._4 == 1L)      // doc 1 contaminated
    assert(byId(2L)._3 == 0L && byId(2L)._4 == 0L)      // doc 2 clean
    assert(byId(3L)._2 == 0L && byId(3L)._3 == 0L && byId(3L)._4 == 0L) // empty doc
    assert(byId(4L)._3 == 1L && byId(4L)._4 == 1L)      // exact short-doc leak
  }

  test("Decontaminate.clean drops exactly the contaminated ids") {
    val kept = Decontaminate.clean(train, eval, "doc_id", "text", k = 3, threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("Decontaminate plan broadcasts the eval side, never the corpus") {
    // disable auto-broadcast so ONLY the explicit broadcast() hint can
    // produce a BroadcastExchange — with it on, Spark could broadcast
    // the tiny TRAIN side here and mask a regression
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = Decontaminate.stats(train, eval, "doc_id", "text")
      df.collect()
      val exchanges = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
        def all = collect(df.queryExecution.executedPlan) {
          case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
        }
      }.all
      assert(exchanges.nonEmpty, "expected the hinted broadcast of eval shingles")
      // the broadcast subtree is the eval-shingle plan (it aggregates
      // distinct shingles), never the train relation
      assert(exchanges.forall(_.child.toString.contains("shingle")))
      assert(!exchanges.exists(_.child.toString.contains("n_shingles")))
    } finally spark.conf.set(key, prev)
  }

  test("Decontaminate shingles the corpus exactly once") {
    val plan = Decontaminate.stats(train, eval, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    // one Generate over the train side (explode_outer of the shingle
    // array) + the eval-side explode: never a second pass re-deriving
    // n_shingles from the raw text
    assert(plan.sliding("explode".length).count(_ == "explode") <= 2,
      s"extra shingling pass in:\n$plan")
  }

  test("CorpusShuffle: deterministic, contiguous per-shard positions, no global sort") {
    import graft.operators.CorpusShuffle
    val docs = spark.range(0L, 300L).toDF("doc_id")
    val a = CorpusShuffle.shuffle(docs, "doc_id", nShards = 8)
    val rows = a.collect()
    assert(rows.length == 300, "every doc gets an assignment")
    // shard range and contiguous 1..n positions per shard
    val byShard = rows.groupBy(_.getAs[Int]("shard"))
    assert(byShard.keySet.forall(s => s >= 0 && s < 8))
    assert(byShard.size > 1, "md5 bits must actually spread the shards")
    byShard.foreach { case (s, rs) =>
      val ps = rs.map(_.getAs[Long]("pos_in_shard")).sorted.toSeq
      assert(ps == (1L to rs.length).toSeq, s"shard $s positions not contiguous: $ps")
    }
    // deterministic: an independent plan reproduces the assignment
    val b = CorpusShuffle.shuffle(spark.range(0L, 300L).toDF("doc_id"),
      "doc_id", nShards = 8).collect()
    assert(rows.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    // a different salt produces a different order (it is a shuffle,
    // not the identity)
    val c = CorpusShuffle.shuffle(docs, "doc_id", nShards = 8, salt = 1).collect()
    assert(rows.map(_.toString).sorted.toSeq != c.map(_.toString).sorted.toSeq)
    // scale guard: every Window in the plan is partitioned — a global
    // row_number would funnel the corpus through one task
    val wins = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
      def all = collect(a.queryExecution.executedPlan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    }.all
    assert(wins.nonEmpty, "expected the per-shard position window")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "unpartitioned (corpus-wide) window in the shuffle plan")
  }

  test("LineDedup: first occurrence kept, boilerplate df dropped, order preserved") {
    import graft.operators.LineDedup
    // 10 docs; 'FOOTER' on all (df 100%), 'BANNER' on half (df 50%),
    // doc 0 repeats its first line, doc 1 has an internal unique order
    val docs = (0L until 10L).map { i =>
      val own = s"unique line of doc $i"
      val text =
        if (i == 0) s"$own\nBANNER\n$own\nzz tail of doc 0\nFOOTER"
        else if (i % 2 == 0) s"$own\nBANNER\nFOOTER"
        else s"$own\nzz tail of doc $i\nFOOTER"
      (i, text)
    }.toDF("doc_id", "text")
    val out = LineDedup.clean(docs, maxDfPct = 30).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("text_clean"))).toMap
    assert(out.size == 10, "every doc keeps at least its unique line")
    // FOOTER (10/10 docs) and BANNER (6/10 docs) exceed 30% df: gone
    out.values.foreach { case (_, t) =>
      assert(!t.contains("FOOTER") && !t.contains("BANNER"), t)
    }
    // doc 0: repeated first line deduped to ONE copy, original order kept
    assert(out(0L) == (2L, "unique line of doc 0\nzz tail of doc 0"), out(0L))
    // odd docs keep both unique lines in order
    assert(out(3L) == (2L, "unique line of doc 3\nzz tail of doc 3"), out(3L))
    // even docs (except 0) had only unique + boilerplate: one line left
    assert(out(4L) == (1L, "unique line of doc 4"), out(4L))
    // a doc of pure boilerplate drops out entirely
    val all = docs.union(Seq((99L, "FOOTER\nBANNER")).toDF("doc_id", "text"))
    val cleaned = LineDedup.clean(all, maxDfPct = 30)
    assert(cleaned.filter(col("doc_id") === 99L).isEmpty)
  }
}
