package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-association mining over a document corpus: doc-level
  * co-occurrence counts and pointwise mutual information,
  *   pmi(a,b) = ln( n_pair(a,b) * n_docs / (df(a) * df(b)) )
  * where n_pair counts documents containing BOTH tokens and df counts
  * documents containing each token (presence, not multiplicity — the
  * collocation form used for phrase/association discovery in corpus
  * prep, cf. Church & Hanks 1990).
  *
  * Scale design (100 TB corpus):
  *  - the pair grid is generated PER DOCUMENT from the doc's sorted
  *    distinct-token array via nested array HOFs — a narrow, codegen'd
  *    explosion bounded by O(distinct_tokens_per_doc²), never a join
  *    operator and never corpus-quadratic;
  *  - `minDf` prunes the long rare-token tail BEFORE the grid (rare
  *    tokens dominate vocabulary but cannot reach `minPairCount`
  *    anyway), which is what keeps the df table vocab-bounded and
  *    broadcastable at any corpus size;
  *  - exchanges: one doc-keyed (distinct-token sets), one pair-keyed
  *    (co-occurrence counts); df and n_docs ride along as broadcasts;
  *  - top-k by association is TakeOrderedAndProject over the
  *    pair-count table (vocab-bounded), not a global sort of docs.
  */
object Cooccur {

  /** (doc_id, token) presence pairs: distinct tokens per doc. */
  private def presence(docs: DataFrame, idCol: String, tokensCol: Column): DataFrame =
    docs.select(col(idCol), explode(array_distinct(tokensCol)).as("token"))
      .filter(length(col("token")) > 0)

  /** Top-`topK` token pairs by PMI (ties broken lexicographically).
    * Returns (tok_a, tok_b, n_pair, df_a, df_b, pmi) with tok_a <
    * tok_b and pmi rounded to 4 decimals; pairs below `minPairCount`
    * or with a token below `minDf` documents are dropped.
    *
    * r12 optimization (guide §2.3, measured sf0.1 1.69 s → 0.75 s at
    * identical output):
    *  - the pair grid and its exchange run on 8-byte `xxhash64` token
    *    keys, never strings — the grid is O(Σ distinct_tokens²) rows,
    *    by far the widest frame of the query, and each row shrank
    *    from two UTF8 copies to two longs (strings come back at the
    *    end via the broadcast df table, which the query joins anyway;
    *    a collision would need two kept tokens in one 2⁶⁴ cell —
    *    the BackoffLm/NgramJaccard bound applies);
    *  - `spreadPairGrid` > 0 re-spreads the doc-token frame BEFORE
    *    the grid explode: the frame is KBs after aggregation, so
    *    AQE's size-based coalesce folds it to ONE partition and the
    *    whole O(k²) grid+count stage runs serial (measured: the grid
    *    stage was 1.5 s of the 1.69 s total, 31 cores idle). Gates
    *    pass a width only in the small-corpus regime
    *    (SparkEntry.scanFanout); at scale the aggregated frame is
    *    TBs, AQE keeps full parallelism, and no extra exchange runs.
    */
  def pmi(docs: DataFrame, idCol: String, tokensCol: Column,
          minDf: Int = 2, minPairCount: Int = 2, topK: Int = 50,
          spreadPairGrid: Int = 0): DataFrame = {
    val pres = presence(docs, idCol, tokensCol)
      .select(col(idCol), col("token"), xxhash64(col("token")).as("h"))
    // df per token; minDf prunes the rare tail before any pair work.
    // Vocab-bounded after the prune → broadcastable by construction.
    // Keyed by hash; the token string rides along (any row of a hash
    // group carries the same string w.h.p., so first() is a value
    // function of the key).
    val dfTab = pres.groupBy("h")
      .agg(first(col("token")).as("token"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))

    // doc-keyed exchange: each doc's kept token HASHES as ONE sorted
    // array (hash order, not lexicographic — orientation is restored
    // at decoration)
    val docToks0 = pres.join(broadcast(dfTab.select("h")), "h")
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("h"))).as("toks"))
    val docToks =
      if (spreadPairGrid > 0) docToks0.repartition(spreadPairGrid) else docToks0

    // narrow pair grid: for token i, pair with every later token —
    // flatten(transform_i(transform_j>i)) stays inside codegen and is
    // bounded by the doc's own distinct-token count
    val pairs = docToks.select(explode(flatten(
      transform(col("toks"), (t, i) =>
        transform(slice(col("toks"), i + lit(2), size(col("toks")) - i - lit(1)),
          u => struct(t.as("h_a"), u.as("h_b")))))).as("p"))
      .select(col("p.h_a"), col("p.h_b"))

    val pairCounts = pairs.groupBy("h_a", "h_b")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)

    // order by the LIFT RATIO, not the ln: the ratio is one IEEE
    // division of exact small integers (bit-identical in any engine),
    // while ln differs in the last ulp across libms — sorting on the
    // ratio (ln is monotone, same order) keeps the top-k boundary
    // engine-independent; ln only decorates the output, rounded.
    // Strings and df counts come back from the broadcast df table;
    // (tok_a, tok_b) re-orients to lexicographic (hash order differs),
    // with dfs swapped to follow — the lift product is symmetric.
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
}
