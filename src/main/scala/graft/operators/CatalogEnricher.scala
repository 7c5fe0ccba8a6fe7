package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Catalog (dimension) enrichment joins.
  *
  * Reference RN-008 / RN-005 (src/silver/job-silver-rues.py:395-473):
  * left-join small lookup catalogs onto the fact stream, after
  * normalizing the join key on both sides.
  *
  * Scale: catalogs are KBs–MBs; `broadcast()` makes every enrichment
  * a map-side hash join — zero shuffle of the 100 TB side. Keys are
  * normalized (trim/upper or trim/cast) *before* the join so the
  * broadcast hash table and the probe side agree on byte-identical
  * keys.
  */
object CatalogEnricher {

  /** Left-join `catalog` onto `df`: match `df(key)` against
    * `catalog(catKey)` (both normalized with trim+upper), bringing in
    * `catalog(valueCol)` as `as`.
    */
  def enrich(df: DataFrame, catalog: DataFrame,
             key: String, catKey: String, valueCol: String, as: String,
             normalizeKeys: Boolean = true): DataFrame = {
    val norm: String => org.apache.spark.sql.Column =
      if (normalizeKeys) c => upper(trim(col(c).cast("string")))
      else c => col(c)
    val cat = catalog.select(
      norm(catKey).as("__cat_key"),
      col(valueCol).as(as))
    df.join(broadcast(cat), norm(key) === col("__cat_key"), "left")
      .drop("__cat_key")
  }
}
