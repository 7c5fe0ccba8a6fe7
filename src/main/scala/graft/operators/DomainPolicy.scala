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
    capAndPassthroughHostless(unblocked, idCol, maxPerHost)
  }

  /** The UT1-SCALE blocklist form (r11 verdict item 7, previously
    * documented-only): the UT1/adult blocklists run to millions of
    * registrable domains — as an in-plan array literal that is
    * megabytes of plan and a per-row O(|suffixes|·lookup) scan, so
    * past [[InlineBlocklistCap]] the match flips to a JOIN: the
    * DISTINCT hosts (bounded by the crawl's host cardinality, not its
    * doc count) explode their ≤~6 dot-suffixes and LEFT SEMI join the
    * blocklist keyed by suffix; blocked hosts then LEFT ANTI back
    * onto the docs by host. Same semantics as [[isBlocked]]
    * (spec-pinned equal output), one bounded-fanout exchange of
    * (host, suffix) pairs + a broadcast-or-shuffled lookup the
    * optimizer sizes. NULL hosts survive the anti join by three-
    * valued logic — exactly the pass-through the literal form gives.
    */
  def applyPolicyJoin(docs: DataFrame, urlCol: String, idCol: String,
      blocklist: DataFrame, listCol: String, maxPerHost: Int): DataFrame = {
    val withHost = docs.withColumn("host", hostOf(col(urlCol)))
    val bl = blocklist.select(lower(col(listCol)).as("__sfx")).distinct()
    val blockedHosts = withHost.select(col("host"))
      .filter(col("host").isNotNull).distinct()
      .select(col("host"), explode(hostSuffixes(col("host"))).as("__sfx"))
      .join(bl, Seq("__sfx"), "left_semi")
      .select("host").distinct()
    val unblocked = withHost.join(blockedHosts, Seq("host"), "left_anti")
    capAndPassthroughHostless(unblocked, idCol, maxPerHost)
  }

  /** How many blocklist entries the in-plan literal form tolerates
    * before [[applyPolicyAuto]] flips to the join form. A few hundred
    * literals codegen fine; UT1-class lists (millions) must join.
    */
  val InlineBlocklistCap = 256

  /** Size-switched policy: literal expression for small lists, the
    * explode+semi-join form past [[InlineBlocklistCap]]. One API for
    * both regimes — the caller never hand-picks.
    */
  def applyPolicyAuto(docs: DataFrame, urlCol: String, idCol: String,
      blocked: Seq[String], maxPerHost: Int,
      inlineCap: Int = InlineBlocklistCap): DataFrame =
    if (blocked.size <= inlineCap)
      applyPolicy(docs, urlCol, idCol, blocked, maxPerHost)
    else {
      val spark = docs.sparkSession
      import spark.implicits._
      applyPolicyJoin(docs, urlCol, idCol, blocked.toDF("domain"),
        "domain", maxPerHost)
    }

  private def capAndPassthroughHostless(unblocked: DataFrame, idCol: String,
      maxPerHost: Int): DataFrame = {
    val w = Window.partitionBy(col("host"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val capped = unblocked.filter(col("host").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPerHost)
      .drop("rn")
    capped.unionByName(unblocked.filter(col("host").isNull))
  }
}
