package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle + sharding — the "randomize the
  * training order" step of an LLM data pipeline, expressed so that the
  * order is reproducible on any engine and at any scale.
  *
  * Every doc gets a portable pseudo-random key (the md5 ordering used
  * across the sampling family — [[Sampling.portableOrdering]]), a shard
  * from the key's leading 32 bits, and a position within its shard from
  * a per-shard window sort. Properties:
  *
  *  - DETERMINISTIC: no RNG state — same corpus + salt ⇒ the same
  *    (shard, pos) assignment under task retries, re-partitioning, or a
  *    different engine (the DuckDB oracle reproduces it exactly).
  *  - SCALABLE: there is NO corpus-wide total order anywhere (a global
  *    row_number would funnel 100 TB through one window partition —
  *    the same trap SequencePacker's two-level design avoids). The
  *    only sort is per-shard; `nShards` is the scale knob: size it so
  *    a shard matches the training loader's file-size target (at
  *    100 TB that is hundreds of thousands of shards, each a bounded
  *    window partition; the write side is a plain
  *    `partitionBy("shard")`).
  *  - UNBIASED: shard and in-shard order both derive from md5 bits of
  *    the id+salt, so any contiguous read order over shards is a
  *    uniform draw of the corpus — which is the property a training
  *    run actually needs from "shuffled" data.
  */
object CorpusShuffle {

  /** md5-hex shuffle key for `idCol` under `salt`. */
  def shuffleKey(idCol: String, salt: Int): Column =
    Sampling.portableOrdering(idCol, salt)

  /** Assign (shard, pos_in_shard) to every row. Keeps all input
    * columns; `pos_in_shard` is 1-based and contiguous per shard.
    */
  def shuffle(docs: DataFrame, idCol: String = "doc_id",
              nShards: Int = 32, salt: Int = 0): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val k = shuffleKey(idCol, salt)
    docs
      .withColumn("__k", k)
      // leading 32 bits of the key as an integer: portable across
      // engines (the oracle mirrors ('0x'||substr(md5,1,8))::BIGINT)
      .withColumn("shard",
        (conv(substring(col("__k"), 1, 8), 16, 10).cast("long")
          % nShards).cast("int"))
      .withColumn("pos_in_shard",
        row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("__k"), col(idCol))).cast("long"))
      .drop("__k")
  }
}
