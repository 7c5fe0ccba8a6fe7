package graft

import graft.dedup.LshIngest
import org.apache.spark.sql.functions._

/** Ground truth for the incremental LSH near-dup ingest: exact
  * flag/survive sets on planted constructions, and the incremental
  * property (batch 2 must catch dups of batch 1 after the delta
  * append) that is the operator's whole point.
  */
class LshIngestSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))

  private def df(rows: Seq[(Long, String)]) = spark.createDataFrame(
    rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)

  // 30+ token docs over disjoint-ish vocabularies so shingle sets are
  // controlled: near-dups append one token (J = s/(s+1) >= 0.9),
  // novel docs use fresh words
  private def words(tag: String, n: Int): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("recrawls flag against their original; fresh docs survive; append is incremental") {
    val idx = s"/tmp/graft_lshingest_spec_${System.nanoTime()}"
    val corpus = df(Seq(
      (1L, words("alpha", 40)),
      (2L, words("beta", 40)),
      (3L, words("gamma", 40))))
    LshIngest.writeIndex(corpus, "doc_id", "text", idx)

    val batch1 = df(Seq(
      (101L, words("alpha", 40) + " extrapad"), // near-dup of 1
      (102L, words("delta", 40))))              // novel vocabulary
    val (novel1, dups1, bandsDelta, sigsDelta) =
      LshIngest.screen(spark, batch1, "doc_id", "text", idx)
    val flagged1 = dups1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged1 == Map(101L -> 1L), s"batch1 verdicts: $flagged1")
    assert(novel1.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq == Seq(102L))
    // jaccard of the one-token append is s/(s+1): 38 shared 3-grams
    // of 39 candidate grams on the recrawl side vs 38 on the original
    val j = dups1.filter(col("doc_id") === 101L).select("jaccard").head().getDouble(0)
    assert(j > 0.9, s"jaccard $j")

    // append the batch-1 delta, then a batch-2 recrawl OF BATCH 1
    // must flag against 102 — the incremental property
    bandsDelta.write.mode("append").parquet(s"$idx/bands")
    sigsDelta.select("doc_id", "sh_hashes").write.mode("append").parquet(s"$idx/sigs")
    val batch2 = df(Seq(
      (201L, words("delta", 40) + " morepad"),  // near-dup of 102 (batch 1!)
      (202L, words("epsilon", 40))))            // still novel
    val (novel2, dups2, _, _) =
      LshIngest.screen(spark, batch2, "doc_id", "text", idx)
    val flagged2 = dups2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged2 == Map(201L -> 102L), s"batch2 verdicts: $flagged2")
    assert(novel2.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq == Seq(202L))
  }

  test("oversized buckets are dropped at build time, bounding every probe") {
    val idx = s"/tmp/graft_lshingest_hot_${System.nanoTime()}"
    // 80 byte-identical docs: every band bucket would hold 80 members
    val corpus = df((1L to 80L).map(i => (i, words("same", 40))))
    LshIngest.writeIndex(corpus, "doc_id", "text", idx, maxBucket = 64)
    assert(spark.read.parquet(s"$idx/bands").count() == 0L)
    // a singleton corpus alongside keeps its buckets
    val idx2 = s"/tmp/graft_lshingest_ok_${System.nanoTime()}"
    LshIngest.writeIndex(df(Seq((1L, words("solo", 40)))), "doc_id", "text", idx2)
    assert(spark.read.parquet(s"$idx2/bands").count() > 0L)
  }
}
