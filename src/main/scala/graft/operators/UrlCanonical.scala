package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-duplicate grouping — the
  * crawl-frontier dedup pass that runs BEFORE any content fetch or
  * text dedup: the same page hides behind scheme/host case, `www.`,
  * default ports, trailing slashes, tracking query parameters
  * (`utm_*`, `gclid`, `fbclid`, `ref`) and fragments, and a frontier
  * that treats those as distinct fetches the page N times. (C4 and
  * RefinedWeb both de-duplicate by normalized URL before content
  * passes; this is that normalization as an operator.)
  *
  * Canonical form: lower-cased scheme and host, `www.` and port
  * stripped, trailing path slashes trimmed, fragment dropped,
  * tracking params removed and SURVIVING params sorted (param order
  * is transport noise; paths keep their case — they are
  * case-sensitive). Everything is narrow codegen'd expressions
  * (`try_parse_url` + HOFs) — the grouping is the only exchange,
  * keyed by the canonical string.
  */
object UrlCanonical {

  private val TrackingParam = "^(utm_[^=]*|gclid|fbclid|ref)="

  /** The canonical form of a URL column; NULL for unparseable URLs
    * (`try_parse_url` — ANSI mode aborts on malformed otherwise).
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      regexp_replace(lower(try_parse_url(url, lit("HOST"))), "^www\\.", ""),
      ":\\d+$", "")
    val path = regexp_replace(coalesce(try_parse_url(url, lit("PATH")), lit("")),
      "/+$", "")
    val kept = array_join(array_sort(filter(
      split(coalesce(try_parse_url(url, lit("QUERY")), lit("")), "&"),
      p => p =!= "" && !p.rlike(TrackingParam))), "&")
    when(host.isNull || scheme === "", lit(null))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** One row per canonical URL: fetch-count collapse (n_dups) and the
    * kept representative (lowest id). Unparseable URLs are excluded —
    * a frontier quarantines them, it does not fetch them.
    */
  def dupReport(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalize(col(urlCol)).as("canonical_url"))
      .filter(col("canonical_url").isNotNull)
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))
}
