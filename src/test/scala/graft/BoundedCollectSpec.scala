package graft

import org.apache.spark.sql.functions._
import graft.dedup.{MinHashLSH, SimHash}

/** The capped-bucket mechanism: collect_min_k must return exactly what
  * slice(sort_array(collect_list(...)), 1, k) returns — while its
  * aggregation buffer is a size-k heap, so a degenerate hot key can
  * never materialize its full bucket in one reducer.
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("collect_min_k == slice(sort_array(collect_list)) on longs (with duplicates)") {
    val df = (1 to 500).map(i => ((i * 37) % 17, (i * 7919L) % 100L)).toDF("key", "v")
    val bounded = df.groupBy("key")
      .agg(call_function("collect_min_k", col("v"), lit(5)).as("xs"))
    val unbounded = df.groupBy("key")
      .agg(slice(sort_array(collect_list(col("v"))), 1, 5).as("xs"))
    val a = bounded.orderBy("key").as[(Int, Seq[Long])].collect().toSeq
    val b = unbounded.orderBy("key").as[(Int, Seq[Long])].collect().toSeq
    assert(a == b)
  }

  test("collect_min_k == slice(sort_array(collect_list)) on structs") {
    val df = (1 to 300).map(i => (i % 7, (i * 131L) % 50L, s"p${i % 13}"))
      .toDF("key", "a", "b")
    val bounded = df.groupBy("key")
      .agg(call_function("collect_min_k", struct(col("a"), col("b")), lit(4)).as("xs"))
    val unbounded = df.groupBy("key")
      .agg(slice(sort_array(collect_list(struct(col("a"), col("b")))), 1, 4).as("xs"))
    val a = bounded.orderBy("key").as[(Int, Seq[(Long, String)])].collect().toSeq
    val b = unbounded.orderBy("key").as[(Int, Seq[(Long, String)])].collect().toSeq
    assert(a == b)
  }

  test("collect_min_k skips nulls and caps oversized groups at k") {
    val df = Seq[(Int, java.lang.Long)]((1, 5L), (1, null), (1, 3L), (1, 9L), (1, 1L))
      .toDF("key", "v")
    val xs = df.groupBy("key")
      .agg(call_function("collect_min_k", col("v"), lit(3)).as("xs"))
      .select("xs").as[Seq[Long]].head()
    assert(xs == Seq(1L, 3L, 5L))
  }

  test("degenerate hot bucket: ALL docs identical — capped, zero pair blow-up") {
    // every band of every doc hashes identically, so each (band_id,
    // band_hash) bucket holds the ENTIRE corpus; the cap must drop
    // those buckets (bounded buffer + bounded fan-out), not OOM
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      lit("same text for every single document in this degenerate corpus").as("text"))
    val sigs = MinHashLSH.signatures(docs, "doc_id", "text")
    val pairs = MinHashLSH.candidatePairs(
      MinHashLSH.bands(sigs, numBands = 16, rowsPerBand = 4), maxBucket = 64)
    assert(pairs.count() == 0)

    // SimHash: same degenerate shape through the chunk index
    val sp = SimHash.nearDupPairs(docs, "doc_id", "text", maxHamming = 3, maxBucket = 64)
    assert(sp.count() == 0)
  }

  test("hot bucket below the cap still pairs up") {
    val docs = spark.range(10).select(col("id").as("doc_id"),
      lit("same text for every single document in this tiny corpus").as("text"))
    val pairs = MinHashLSH.candidatePairs(
      MinHashLSH.bands(MinHashLSH.signatures(docs, "doc_id", "text"), 16, 4), maxBucket = 64)
    assert(pairs.count() == 45) // C(10,2)
  }
}
