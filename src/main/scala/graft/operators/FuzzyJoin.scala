package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked approximate string join (entity resolution / fuzzy dedup).
  *
  * The classic record-linkage shape: a cheap high-recall BLOCKING key
  * (first token, phonetic code, length bucket, …) generates candidate
  * pairs via an equi-join — hash-partitioned, never a cartesian — and
  * an exact edit-distance verify keeps true matches. The same
  * candidates-then-verify architecture as MinHash-LSH, with a string
  * metric instead of set Jaccard.
  *
  * Scale: the shuffle is keyed by the blocking key; per-block pair
  * fanout is O(block²), so the blocking function's selectivity — not
  * the corpus size — bounds the work. `maxBlock` drops degenerate
  * blocks (the "SMITH" problem) BEFORE the self-join, with a count
  * pre-pass rather than any collected posting list, so a hot block
  * costs one filtered aggregation row, never a reducer buffer.
  */
object FuzzyJoin {

  /** Pairs (id_a < id_b) whose strings are within `maxDist` edits,
    * among candidates sharing `blockExpr`.
    */
  def pairs(df: DataFrame, idCol: String, strCol: String, blockExpr: Column,
            maxDist: Int, maxBlock: Int = 1000): DataFrame = {
    val t = df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"),
      blockExpr.as("blk"))
    val ok = t.groupBy("blk").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBlock).select("blk")
    val bounded = t.join(ok, Seq("blk"), "left_semi")
    val a = bounded.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
    val b = bounded.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
    // blockExpr is one key per row, so a pair occurs in exactly one
    // block — no distinct needed. Multi-key blocking = union the runs
    // of several block functions, then distinct on (id_a, id_b).
  }
}
