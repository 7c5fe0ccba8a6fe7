package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** TF-IDF term weighting over a document corpus (the classic keyword /
  * feature-extraction pass; cf. the reference's text-profiling
  * intent, generalized for LLM-corpus analytics).
  *
  * Shape at scale:
  *  - tokenization is a narrow codegen'd projection (no UDF);
  *  - per-(doc, term) tf is one explode + partial-aggregated count —
  *    the shuffle carries (doc_id, term) pairs once;
  *  - document frequency reuses the tf relation (`groupBy(term)`), so
  *    the corpus is tokenized exactly once;
  *  - the vocabulary join is keyed by term and deliberately NOT
  *    broadcast (a 100 TB corpus has a multi-GB vocabulary; AQE may
  *    still elect a broadcast at small SF);
  *  - the corpus size joins back as a broadcast 1-row aggregate;
  *  - top-k per doc is a rank-filter window that Spark 4 plans as
  *    WindowGroupLimit: each mapper forwards at most k candidates per
  *    doc before the exchange.
  *
  * Scores are floor-rounded to 4 dp BEFORE ranking so the rank order
  * (score desc, term asc) is identical in any engine.
  */
object TfIdf {

  private def pround(c: Column, dp: Int): Column = {
    val f = math.pow(10, dp)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** (doc, term, tf) with smooth-idf TF-IDF score: tf * (ln((1+N)/(1+df)) + 1). */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TF.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(idCol, "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", pround(
        col("tf").cast("double") *
          (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0)), 4))
      .select(col(idCol), col("term"), col("tf"), col("tfidf"))
  }

  /** Top-k terms per document by TF-IDF (rank on the rounded score,
    * term-asc tie-break — total order, engine-portable).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scores(docs, idCol, textCol)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
