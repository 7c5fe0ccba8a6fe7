package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet/C4-style boilerplate line removal: the per-line dedup pass a
  * web-corpus pipeline runs before document-level dedup (headers,
  * cookie banners, "all rights reserved" footers dominate raw crawls).
  *
  * Two rules, applied together in one pass:
  *  - WITHIN a doc: keep only the first occurrence of each distinct
  *    line (repeated nav blocks, duplicated footers).
  *  - ACROSS the corpus: drop any line occurring in more than
  *    `maxDfPct` percent of documents (boilerplate by definition —
  *    CCNet drops paragraphs duplicated across shards the same way).
  *
  * Scale design: ONE exchange keyed by the line serves both
  * corpus-wide decisions — the per-(line, doc) first-occurrence
  * aggregate and the line doc-frequency window run on the same
  * co-located postings (the NgramJaccard single-exchange pattern), the
  * corpus doc count is a 1-row broadcast (integer cross-multiply, no
  * float threshold), and only the reassembly pays the second, doc-keyed
  * exchange. Per-doc state is bounded by document length (the
  * collect_list holds one doc's kept lines, never a corpus bucket).
  * At 100 TB the only change you'd consider is keying the df side by
  * xxhash64(line) to shrink shuffle bytes — the line text itself must
  * travel to the doc-keyed reassembly either way.
  */
object LineDedup {

  /** Returns one row per surviving doc: (idCol, n_kept, text_clean)
    * with lines re-joined in original order. A doc whose every line is
    * boilerplate drops out (anti-join the input to list casualties).
    */
  def clean(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", maxDfPct: Int = 5): DataFrame = {
    require(maxDfPct >= 0 && maxDfPct <= 100, s"maxDfPct out of range: $maxDfPct")
    val total = docs.agg(count(lit(1)).as("__n_docs"))
    val lines = docs
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      // the single line-keyed exchange: HashPartitioning(__line)
      // satisfies BOTH the (__line, id) grouping below and the
      // df window's partitioning — no second shuffle for the df
      .repartition(col("__line"))
    val firsts = lines
      .groupBy(col("__line"), col(idCol))
      .agg(min(col("__pos")).as("__pos"))
    // rows here are one per (line, doc): a plain count over the line
    // partition IS the line's distinct-doc frequency
    val withDf = firsts.withColumn("__df",
      count(lit(1)).over(Window.partitionBy(col("__line"))))
    val kept = withDf
      .join(broadcast(total),
        col("__df") * lit(100L) <= col("__n_docs") * lit(maxDfPct.toLong))
    kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws("\n",
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__line")))),
            x => x.getField("__line"))).as("text_clean"))
  }
}
