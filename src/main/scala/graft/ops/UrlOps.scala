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

  /** Host of an absolute url (lowercased, port dropped), empty string
    * when the url has no `scheme://host` form.
    */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      ":\\d+$", "")

  /** Multi-part public suffixes recognized by [[registeredDomain]] — a
    * deliberately small built-in slice of the Mozilla Public Suffix List
    * covering the common two-label country suffixes; real deployments
    * pass the full PSL through the same lookup.
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "co.in", "co.kr", "com.cn",
    "com.mx", "co.nz")

  /** RFC 3986 reference resolution (the crawl-frontier subset): absolute
    * references pass through; protocol-relative `//host/x` take the
    * base's scheme; root-relative `/x` join the base origin;
    * query-only `?x` replace the base's query; anything else joins the
    * base path's directory. Dot-segment normalization (`../`) is left
    * to [[canonicalizeUrl]]-style cleanup — frontier dedup hashes the
    * resolved string, and a consistent resolution matters more than a
    * minimal one. Pure codegen'd chain.
    */
  def resolveUrl(base: Column, ref: Column): Column = {
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1)
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val path = regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val dir = regexp_replace(path, "/[^/]*$", "")
    val baseNoQuery = concat(origin, path)
    when(ref.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), ref)
      .when(ref.startsWith("//"), concat(scheme, lit(":"), ref))
      .when(ref.startsWith("/"), concat(origin, ref))
      .when(ref.startsWith("?"), concat(baseNoQuery, ref))
      .otherwise(concat(origin, dir, lit("/"), ref))
  }

  /** Registered domain (PSL semantics): one label more than the public
    * suffix — `news.bbc.co.uk` → `bbc.co.uk`, `a.b.example.com` →
    * `example.com`. Hosts with fewer labels than that (bare TLDs,
    * localhost) return verbatim. Pure codegen'd chain — this is the
    * standard crawl-curation GROUP KEY (per-domain quality statistics,
    * domain caps, blocklists), so it runs on every url of the corpus.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    when(n >= 3 && last2.isin(MultiPartSuffixes.map(lit): _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** URL shape features — the frontier-prioritization / spam-prior
    * signals crawl schedulers compute per candidate URL BEFORE fetching
    * (a 120-char, 7-deep, digit-heavy, 4-parameter URL is overwhelmingly
    * a calendar/session/faceted-search trap; spending fetch budget there
    * starves real pages). All integer arithmetic over the standard URL
    * split, returned as one struct:
    * `url_len, path_depth, n_params, digit_permille (digits per 1000
    * path chars), host_labels, host_hyphens`, plus `spam_score` — the
    * count of exceeded thresholds (len>80, params≥3, digits≥30%,
    * depth≥5, hyphenated host≥2). Pure codegen'd chain, scan-side.
    */
  def urlFeatures(url: Column): Column = {
    val host = hostOf(url)
    val path =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val p2 = regexp_replace(path, "^/", "")
    val depth = when(length(p2) === 0, lit(0L))
      .otherwise(size(split(p2, "/")).cast("long"))
    val nParams = when(length(query) === 0, lit(0L))
      .otherwise(size(split(query, "&")).cast("long"))
    val nDigits =
      (length(path) - length(regexp_replace(path, "[0-9]", ""))).cast("long")
    val digitPermille = when(length(path) === 0, lit(0L))
      .otherwise(floor(nDigits * 1000 / length(path)).cast("long"))
    val hostLabels = size(split(host, "\\.")).cast("long")
    val hostHyphens =
      (length(host) - length(regexp_replace(host, "-", ""))).cast("long")
    val urlLen = length(url).cast("long")
    val spam = (urlLen > 80).cast("long") + (nParams >= 3).cast("long") +
      (digitPermille >= 300).cast("long") + (depth >= 5).cast("long") +
      (hostHyphens >= 2).cast("long")
    struct(urlLen.as("url_len"), depth.as("path_depth"),
      nParams.as("n_params"), digitPermille.as("digit_permille"),
      hostLabels.as("host_labels"), hostHyphens.as("host_hyphens"),
      spam.as("spam_score"))
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the CDX index
    * key of Common Crawl / web-archive lookups, see the IA wayback
    * cdx-server format): canonicalize ([[canonicalizeUrl]] — fragment,
    * www., default port, trailing slash, tracking params, query order),
    * then reverse the host labels comma-joined and append `)` + the
    * path?query — so one domain's URLs sort contiguously
    * (`com,example)/doc/1`). Non-absolute inputs yield an empty-host
    * key `)trimmed` rather than a synthetic collision. Pure codegen'd
    * chain, scan-side.
    */
  def surtKey(url: Column): Column = {
    val canon = canonicalizeUrl(url)
    val host = hostOf(canon)
    val rev = array_join(reverse(split(host, "\\.")), ",")
    val pathq = regexp_extract(canon,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    concat(rev, lit(")"), pathq)
  }
}
