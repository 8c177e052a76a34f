package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the first dedup pass of a
  * web-scale corpus pipeline (before any content hashing): the same page
  * is typically crawled under scheme/case/port/tracking-param/fragment
  * variants, and collapsing those is orders of magnitude cheaper than
  * content comparison.
  *
  * Everything is a pure codegen'd expression chain over the url string —
  * no UDF, no shuffle until the final keep-first aggregation on the
  * canonical key (one hash agg, same shape as exact dedup
  * [[DedupOps.exactDedup]]).
  */
object UrlOps {

  /** Tracking parameters stripped during canonicalization. */
  val TrackingParams = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

  /** Canonical form:
    *  - scheme and host lowercased; leading `www.` and default ports
    *    (`:80` http, `:443` https) dropped from the host
    *  - fragment dropped
    *  - path: trailing slashes dropped (`/a/b/` == `/a/b`), empty path
    *    kept empty
    *  - query: tracking params ([[TrackingParams]]) removed, remaining
    *    `k=v` pairs sorted for order independence, empty query dropped
    */
  /** Only ABSOLUTE urls (`scheme://…`) are canonicalized. Anything else —
    * relative paths, protocol-relative `//host/x`, garbage — is returned
    * trimmed-but-verbatim: collapsing every unparsable row onto one
    * synthetic key would silently merge unrelated documents in the dedup
    * step, which on a raw crawl is data loss, not cleaning.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val noWww = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val keptParams = array_sort(filter(split(rawQuery, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParams)))
    val query = array_join(keptParams, "&")
    when(length(scheme) > 0,
      concat(scheme, lit("://"), host, path,
        when(length(query) > 0, concat(lit("?"), query)).otherwise(lit(""))))
      .otherwise(trim(url))
  }

  /** Keep-first dedup on the canonical URL: one representative doc per
    * canonical key (min id — deterministic), plus the variant count.
    */
  def canonicalDedup(df: DataFrame, urlCol: Column, idCol: Column): DataFrame =
    df.select(canonicalizeUrl(urlCol).as("canonical_url"), idCol.as("id"))
      .groupBy(col("canonical_url"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_variants"))
}
