package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (SQ8) vector quantization: per-dimension min/max over the
  * corpus, then each float becomes an 8-bit code — the standard 4×
  * memory compression that makes a 100 TB embedding store searchable
  * (FAISS's SQ8; used under IVF cells in production ANN systems).
  *
  * Shape at scale:
  *  - dimension stats are a `posexplode` (narrow) + partial-agg'd
  *    min/max keyed by position — the shuffle carries `dims` rows per
  *    map task, the result is `dims` rows total;
  *  - the stats fold into two small arrays and broadcast back; the
  *    encode itself is a narrow per-row HOF projection;
  *  - the report is all-integer (code checksums, ppb-scaled error
  *    bounds): cross-engine float summation order can never bend it.
  */
object Quantize {

  /** Per-dimension (pos, mn, mx) over the corpus. */
  def dimStats(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))

  /** One row with the stats folded to pos-ordered arrays (collect_list
    * is unordered across tasks, so sort by the carried pos).
    */
  def statsRow(emb: DataFrame, vecCol: String): DataFrame =
    dimStats(emb, vecCol).agg(
      transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
        s => s("mn")).as("mns"),
      transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
        s => s("mx")).as("mxs"))

  /** SQ8 encode + reconstruction-error report per vector: dimension
    * count, code checksum, and max/total absolute reconstruction error
    * in parts-per-billion (integerized elementwise, summed exactly).
    */
  def sq8Report(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    def codeOf(x: Column, mn: Column, mx: Column): Column =
      when(mx === mn, lit(0L)).otherwise(
        floor((x.cast("double") - mn) / (mx - mn) * lit(255.0) + lit(0.5)).cast("long"))
    def errPpb(x: Column, mn: Column, mx: Column): Column =
      when(mx === mn, lit(0L)).otherwise(
        floor(abs(x.cast("double") - (mn + codeOf(x, mn, mx).cast("double")
          * (mx - mn) / lit(255.0))) * lit(1e9) + lit(0.5)).cast("long"))
    emb.crossJoin(broadcast(statsRow(emb, vecCol)))
      .withColumn("codes", transform(col(vecCol), (x, i) =>
        codeOf(x, element_at(col("mns"), i + 1), element_at(col("mxs"), i + 1))))
      .withColumn("errs", transform(col(vecCol), (x, i) =>
        errPpb(x, element_at(col("mns"), i + 1), element_at(col("mxs"), i + 1))))
      .select(col(idCol),
        size(col(vecCol)).cast("long").as("n_dims"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        array_max(col("errs")).as("max_err_ppb"),
        aggregate(col("errs"), lit(0L), (a, c) => a + c).as("sum_err_ppb"))
  }
}
