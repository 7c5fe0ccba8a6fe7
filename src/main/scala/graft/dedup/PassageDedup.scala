package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Passage-level (exact-substring-style) deduplication, after Lee et
  * al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better"): a repeated boilerplate span shared by many otherwise-
  * distinct pages is removed at passage granularity, where doc-level
  * dedup sees nothing.
  *
  * Shape at scale:
  *  - the corpus is tokenized and chunked ONCE per row into
  *    consecutive `w`-word passages (narrow HOFs, no UDF);
  *  - the shuffle carries (passage-hash, doc_id) pairs — never the
  *    text (pass `md5` only for cross-engine oracles; the production
  *    default `xxhash64` ships 8 bytes per passage);
  *  - "shared" = the hash occurs in ≥2 DISTINCT docs (partial-agg'd
  *    count_distinct);
  *  - the per-doc rollups are semi/anti joins against that hot-key
  *    set, reusing the same exchange.
  */
object PassageDedup {

  private def pround = graft.functions.Rounding.pround _

  private def occurrences(docs: DataFrame, idCol: String, textCol: String,
                          w: Int, hash: Column => Column): DataFrame =
    docs.select(col(idCol), posexplode(TF.passages(col(textCol), w)).as(Seq("pos", "p")))
      .select(col(idCol), col("pos"), hash(col("p")).as("pk"), col("p"))

  /** Passage hashes occurring in at least two distinct docs. */
  def sharedKeys(docs: DataFrame, idCol: String, textCol: String,
                 w: Int, hash: Column => Column): DataFrame =
    occurrences(docs, idCol, textCol, w, hash)
      .groupBy("pk")
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") >= 2)
      .select("pk")

  /** Per-doc contamination report: total passages, passages shared
    * with another doc, and the shared fraction (4 dp).
    *
    * ONE pass over the text: the (pk, doc) occurrence pairs partial-agg
    * to per-(pk, doc) multiplicities, the distinct-doc count per pk is
    * a count window over that already-deduplicated frame (two-level
    * count-distinct — never a second shingling scan, never a
    * collect'd bucket; a degenerate passage shared by millions of
    * docs is a large-but-spillable window partition of tiny rows),
    * and both per-doc rollups fall out of the same frame. Only the
    * doc-id spine is re-read (column-pruned) to restore zero-passage
    * docs.
    */
  def stats(docs: DataFrame, idCol: String, textCol: String,
            w: Int = 8, hash: Column => Column = xxhash64(_)): DataFrame = {
    val perPkDoc = occurrences(docs, idCol, textCol, w, hash)
      .groupBy(col("pk"), col(idCol))
      .agg(count(lit(1)).as("cnt"))
    val withNd = perPkDoc.withColumn("nd",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("pk"))))
    val perDoc = withNd.groupBy(idCol).agg(
      sum(col("cnt")).as("n_passages"),
      sum(when(col("nd") >= 2, col("cnt")).otherwise(lit(0L))).as("n_shared"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("n_passages", coalesce(col("n_passages"), lit(0L)))
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("shared_frac", when(col("n_passages") === 0, lit(0.0))
        .otherwise(pround(col("n_shared").cast("double") / col("n_passages"), 4)))
  }

  /** The corpus with shared passages REMOVED: each doc's surviving
    * passages, in original order, re-joined with single spaces. The
    * reassembly groups only a doc's own passages (bounded by doc
    * size); order is restored by the chunk ordinal, not a sort of
    * text.
    */
  def dropShared(docs: DataFrame, idCol: String, textCol: String,
                 w: Int = 8, hash: Column => Column = xxhash64(_)): DataFrame = {
    val occ = occurrences(docs, idCol, textCol, w, hash)
    val shared = sharedKeys(docs, idCol, textCol, w, hash)
    occ.join(shared, Seq("pk"), "left_anti")
      .groupBy(idCol)
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("p")))),
        s => s("p")), " ").as("clean_text"))
  }
}
