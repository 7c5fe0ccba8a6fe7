package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** URL-policy corpus filtering — the C4/RefinedWeb crawl-hygiene pass
  * (Raffel et al. 2020 §2.2 blocklist filtering; Penedo et al. 2023
  * §3.1 URL scoring + per-domain caps):
  *
  *  - host extraction from the document URL (codegen'd `parse_url`);
  *  - DOMAIN-SUFFIX blocklist: a blocked registrable domain removes
  *    the host itself and every subdomain ("example.com" blocks
  *    "cdn.example.com") — the match tests the host's own ≤~6 label
  *    suffixes, never scans the blocklist per row;
  *  - per-host document cap: at most k docs per host, chosen by a
  *    deterministic portable-md5 draw (stable under retries and
  *    re-partitioning, unlike rand()) — the anti-SEO-farm guard.
  *
  * Scale shape: blocklist matching is a pure narrow expression (the
  * list is a broadcast-sized literal here; a multi-million-entry UT1
  * list flips to exploding the suffixes and LEFT ANTI joining the
  * blocklist keyed by suffix — same semantics, one bounded-fanout
  * shuffle). The cap is one host-keyed exchange; row_number over
  * (md5, id) plans as WindowGroupLimit with partial top-k before the
  * shuffle, so a million-doc spam host sends k rows, not a million.
  */
object DomainPolicy {

  /** Lower-cased host of a URL column; NULL for malformed URLs (the
    * `try_` form — plain parse_url ABORTS the job on the first bad
    * URL under ANSI mode, and real crawl data always has some).
    */
  def hostOf(url: Column): Column = lower(try_parse_url(url, lit("HOST")))

  /** All dot-suffixes of a host: "a.b.com" → ["a.b.com","b.com","com"]. */
  private[graft] def hostSuffixes(host: Column): Column =
    TF.bindOnce(split(host, "\\."), parts =>
      transform(sequence(lit(1), size(parts)),
        i => array_join(slice(parts, i, size(parts) - i + 1), ".")))

  /** True iff the host or any parent domain is in `blocked`. */
  def isBlocked(host: Column, blocked: Seq[String]): Column =
    if (blocked.isEmpty) lit(false)
    else {
      val b = array(blocked.map(s => lit(s.toLowerCase)): _*)
      exists(hostSuffixes(host), s => array_contains(b, s))
    }

  /** Apply the full policy: parse host, drop blocked domains, cap each
    * surviving host at `maxPerHost` docs (portable-md5 order, id
    * tie-break). Output keeps all input columns plus `host`.
    *
    * Hostless docs (null / malformed URL) PASS THROUGH explicitly —
    * they match no blocklist entry and no cap (a `filter(!blocked)`
    * would silently drop them through three-valued NULL logic), and
    * they take the narrow branch, never the window: at crawl scale
    * every malformed URL landing in one `host IS NULL` window
    * partition would be the job's skew ceiling.
    */
  def applyPolicy(docs: DataFrame, urlCol: String, idCol: String,
      blocked: Seq[String], maxPerHost: Int): DataFrame = {
    val withHost = docs.withColumn("host", hostOf(col(urlCol)))
    val unblocked = withHost.filter(col("host").isNull ||
      !isBlocked(col("host"), blocked))
    val w = Window.partitionBy(col("host"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val capped = unblocked.filter(col("host").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPerHost)
      .drop("rn")
    capped.unionByName(unblocked.filter(col("host").isNull))
  }
}
