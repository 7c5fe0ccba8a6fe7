package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Distributed BPE tokenizer training — the vocabulary-induction step
  * of an LLM data pipeline (the `q_token_count` BPE-ish regex is the
  * cheap *apply-time* proxy; this is where the merge table it proxies
  * comes from).
  *
  * Like production trainers (HuggingFace tokenizers, SentencePiece in
  * BPE mode), training runs on the WORD-FREQUENCY table, not the
  * corpus: the one corpus-sized pass is the word count (explode +
  * partial-agg'd sum — the same shape as `q_vocab`), after which the
  * working set is |distinct words| rows regardless of corpus size.
  * Each merge round is one aggregation over that compressed table
  * (adjacent-pair counts weighted by word frequency, partial-agg'd)
  * plus a 1-row TakeOrdered argmax to the driver — the same bounded
  * driver involvement as connected components' convergence checksum.
  * Plan depth is truncated per round with a localCheckpoint, so round
  * N never re-embeds rounds 1..N−1.
  *
  * Determinism: argmax ties break lexicographically (count desc,
  * left asc, right asc), so the merge table is a pure function of the
  * corpus.
  */
object Bpe {

  /** End-of-word marker (distinguishes "est</w>" in "widest" from
    * "est" mid-word — standard BPE practice).
    */
  val EndMark = "</w>"

  /** Greedy left-to-right single-pair merge over a symbol array:
    * every non-overlapping adjacent (a, b) becomes `ab`. Pure HOF —
    * one pass with a skip flag, no UDF.
    */
  def mergeOnce(sym: Column, a: Column, b: Column, ab: Column): Column = {
    val n = size(sym)
    val folded = aggregate(
      sequence(lit(1), n),
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (acc, i) => {
        val cur = try_element_at(sym, i)
        val nxt = try_element_at(sym, i + 1)
        val isPair = !acc("skip") && cur === a &&
          coalesce(nxt === b, lit(false))
        struct(
          when(acc("skip"), acc("out"))
            .otherwise(concat(acc("out"),
              array(when(isPair, ab).otherwise(cur)))).as("out"),
          isPair.as("skip"))
      },
      acc => acc("out"))
    when(n === 0, array().cast("array<string>")).otherwise(folded)
  }

  /** (word, freq, sym) — the compressed training table: distinct words
    * with corpus frequencies, each split to characters + [[EndMark]].
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("sym",
        concat(filter(split(col("w"), ""), c => length(c) > 0), array(lit(EndMark))))

  /** Adjacent-pair counts weighted by word frequency. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(when(size(col("sym")) < 2,
          array().cast("array<struct<l:string,r:string>>"))
        .otherwise(transform(sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("l"),
            element_at(col("sym"), i + 1).as("r"))))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train `nMerges` BPE merges. Returns the ordered merge table
    * (rank, left, right, merged, pair_count). Stops early when no
    * pair occurs at least `minCount` times.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).localCheckpoint(true)
    val merges = Vector.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // 1-row argmax: TakeOrdered over the vocab-sized pair table
      val top = pairCounts(words)
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).as[(String, String, Long)].collect()
      top.headOption match {
        case Some((l, r, cnt)) =>
          merges += ((rank, l, r, l + r, cnt))
          words = words.withColumn("sym",
              mergeOnce(col("sym"), lit(l), lit(r), lit(l + r)))
            .localCheckpoint(true)
          rank += 1
        case None => exhausted = true
      }
    }
    merges.result().toDF("rank", "left", "right", "merged", "pair_count")
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Apply a trained merge table: encode the DISTINCT-WORD table by
    * replaying the merges in rank order — `nMerges` chained HOFs in
    * one narrow projection (the merge table is tiny and baked into
    * the plan as literals). This is the practical 100 TB apply path:
    * encode the vocabulary once, then the corpus pass is a token→word
    * join (or a broadcast map lookup), never a per-document replay.
    */
  def encodeWords(words: DataFrame, wordCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val base: Column = concat(
      filter(split(col(wordCol), ""), c => length(c) > 0), array(lit(EndMark)))
    val sym = merges.foldLeft(base) { case (s, (l, r)) =>
      mergeOnce(s, lit(l), lit(r), lit(l + r))
    }
    words.withColumn("bpe_sym", sym)
      .withColumn("n_bpe_tokens", size(col("bpe_sym")).cast("long"))
  }
}
