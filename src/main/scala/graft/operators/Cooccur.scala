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
    */
  def pmi(docs: DataFrame, idCol: String, tokensCol: Column,
          minDf: Int = 2, minPairCount: Int = 2, topK: Int = 50): DataFrame = {
    val pres = presence(docs, idCol, tokensCol)
    // df per token; minDf prunes the rare tail before any pair work.
    // Vocab-bounded after the prune → broadcastable by construction.
    val dfTab = pres.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))

    // doc-keyed exchange: each doc's kept tokens as ONE sorted array
    val docToks = pres.join(broadcast(dfTab), "token")
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("token"))).as("toks"))

    // narrow pair grid: for token i, pair with every later token —
    // flatten(transform_i(transform_j>i)) stays inside codegen and is
    // bounded by the doc's own distinct-token count
    val pairs = docToks.select(explode(flatten(
      transform(col("toks"), (t, i) =>
        transform(slice(col("toks"), i + lit(2), size(col("toks")) - i - lit(1)),
          u => struct(t.as("tok_a"), u.as("tok_b")))))).as("p"))
      .select(col("p.tok_a"), col("p.tok_b"))

    val pairCounts = pairs.groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)

    // order by the LIFT RATIO, not the ln: the ratio is one IEEE
    // division of exact small integers (bit-identical in any engine),
    // while ln differs in the last ulp across libms — sorting on the
    // ratio (ln is monotone, same order) keeps the top-k boundary
    // engine-independent; ln only decorates the output, rounded
    val scored = pairCounts
      .join(broadcast(dfTab.select(col("token").as("tok_a"), col("df").as("df_a"))), "tok_a")
      .join(broadcast(dfTab.select(col("token").as("tok_b"), col("df").as("df_b"))), "tok_b")
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("n_pair"), col("df_a"), col("df_b"),
        (col("n_pair").cast("double") * col("n_docs")
          / (col("df_a") * col("df_b")).cast("double")).as("__lift"))

    scored
      .orderBy(col("__lift").desc, col("tok_a"), col("tok_b"))
      .limit(topK)
      .select(col("tok_a"), col("tok_b"), col("n_pair"), col("df_a"), col("df_b"),
        (floor(log(col("__lift")) * 1e4 + lit(0.5)) / 1e4).as("pmi"))
  }
}
