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
