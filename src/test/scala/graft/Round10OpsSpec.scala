package graft

import graft.operators.{Deduplicator, Novelty}
import org.apache.spark.sql.functions._

/** Round-10 operators: canonical keep-best dedup, n-gram novelty. */
class Round10OpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava, schema)
  }

  test("keepBest: highest score wins the group, lowest id breaks ties") {
    val df = docsDf(Seq(
      (1L, "same text", "src9"),   // low priority (score -9)
      (2L, "same text", "src1"),   // high priority -> keeper
      (3L, "same text", "src1"),   // ties with 2 on score -> id 2 keeps
      (10L, "unique a", "src5"),   // singleton survives untouched
      (11L, "tie text", "src2"),
      (12L, "tie text", "src2")))  // pure id tiebreak -> 11 keeps
    val kept = Deduplicator.keepBest(df, "doc_id", "text",
      score = lit(0) - substring(col("source"), 4, 6).cast("int"))
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    assert(kept == Seq(2L, 10L, 11L))
  }

  test("keepBest plans the partial top-1 below the shuffle (WindowGroupLimit)") {
    val p = Deduplicator.keepBest(
      Tables.documents(spark, sf()).select("doc_id", "text", "source"),
      "doc_id", "text", score = length(col("text")))
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("robustReport: rank-exact quartiles; a planted outlier cannot move the scale") {
    import graft.ann.Standardize
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    def df(rows: Seq[(Long, Seq[Float])]) = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)
    // dim0: values 1..5 -> q1=2, med=3, q3=4, IQR=2 (rank rule: cum-1 >=
    // floor(p*4) -> ranks 1,2,3). dim1: constant -> IQR 0 -> r=0
    val base = df(Seq(
      (1L, Seq(1f, 7f)), (2L, Seq(2f, 7f)), (3L, Seq(3f, 7f)),
      (4L, Seq(4f, 7f)), (5L, Seq(5f, 7f))))
    val out = Standardize.robustReport(base, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // r(dim0) = floor((x-3)*1e6/2e6*1e4+0.5) = (x-3)*5000; r(dim1)=0
    assert(out(1L) == ((2L, -10000L, 0L)))
    assert(out(3L) == ((2L, 0L, 0L)))
    assert(out(5L) == ((2L, 10000L, 10000L)))
    // plant a wild outlier in dim0: median and IQR are 50/25% breakdown
    // estimators, so one corrupt row cannot move the other rows' scale
    // (the z-score form would drag every mean/std with it)
    val poisoned = base.unionByName(df(Seq((99L, Seq(1e6f, 7f)))))
    val out2 = Standardize.robustReport(poisoned, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out2(1L) == -10000L && out2(3L) == 0L && out2(5L) == 10000L)
  }

  test("charDiversity: run-length fold matches hand counts; floods flag") {
    import graft.functions.CharDiversity
    val df = docsDf(Seq(
      (1L, "aaa", "s"),    // n=3 dist=1 max=3 simpson=9/9=1.0
      (2L, "abab", "s"),   // n=4 dist=2 max=2 simpson=8/16=0.5
      (3L, "abcd", "s"),   // n=4 dist=4 max=1 simpson=4/16=0.25
      (4L, "", "s")))      // empty -> zeros
    val out = CharDiversity.report(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((3L, 1L, 3L, 1.0)))
    assert(out(2L) == ((4L, 2L, 2L, 0.5)))
    assert(out(3L) == ((4L, 4L, 1L, 0.25)))
    assert(out(4L) == ((0L, 0L, 0L, 0.0)))
    // flag thresholds are sized for documents, so the diverse case
    // must be long enough that its modal char sits under maxFrac
    val flags = CharDiversity.flagged(
      df.unionByName(docsDf(Seq((5L, "abcdefghij klmno", "s")))),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(flags(1L) && !flags(5L) && !flags(4L))
  }

  test("char_diversity_stats native expression is bit-identical to the HOF fold") {
    import graft.functions.CharDiversity
    // the whole sf0.001 corpus plus adversarial literals: empty,
    // single char, runs, multi-byte code points (é = 2 UTF-8 bytes,
    // 汉 = 3, 𝄞 = a surrogate pair — n_chars counts CODE POINTS)
    val corpus = Tables.documents(spark, sf()).select("doc_id", "text")
      .unionByName(docsDf(Seq(
        (9000001L, "", "s"), (9000002L, "x", "s"), (9000003L, "aaaabbb", "s"),
        (9000004L, "héllo héllo", "s"), (9000005L, "汉字 汉字 汉字", "s"),
        (9000006L, "a𝄞b𝄞c", "s"))).select("doc_id", "text"))
    val native = CharDiversity.report(corpus, "doc_id", "text")
    val hof = CharDiversity.reportHof(corpus, "doc_id", "text")
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      native.exceptAll(hof).unionByName(hof.exceptAll(native)).collect().take(5).mkString("\n"))
  }

  test("novelty: identical doc scores 0, disjoint doc scores 1, mixed in between") {
    val ref = docsDf(Seq((100L, "a b c d e", "r")))
    val cand = docsDf(Seq(
      (1L, "a b c d e", "c"),   // 3-gram set identical to ref -> 0.0
      (2L, "x y z w v", "c"),   // fully disjoint -> 1.0
      // 3-grams: "c d e" (seen), "d e q" "e q r" (novel) -> 2/3
      (3L, "c d e q r", "c"),
      (4L, "a b", "c"),         // <= k tokens: whole text = 1 novel shingle
      (5L, "", "c")))           // no tokens -> 0 grams, novelty 0.0
    val out = Novelty.report(cand, ref, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(2L) == ((3L, 3L, 1.0)))
    assert(out(3L) == ((3L, 2L, 0.6667)))
    assert(out(4L) == ((1L, 1L, 1.0)))
    assert(out(5L) == ((0L, 0L, 0.0)))
  }
}
