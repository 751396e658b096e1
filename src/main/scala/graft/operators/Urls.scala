package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization and domain extraction for web-corpus curation — the
  * C4/RefinedWeb-style front half of a training-data pipeline: canonicalize
  * the crawl's URLs, group documents by registered domain, cap and
  * blocklist by domain (the cap/blocklist themselves compose from
  * [[Sampling.topKPerGroup]] and an anti-join; this object owns the string
  * surgery).
  *
  * Every function is a single codegen'd Catalyst expression (regexp +
  * array built-ins, no UDF) — a narrow map over the scan, embarrassingly
  * parallel at any scale — and every regex/array step is RE2-compatible
  * and mirrored verbatim by the DuckDB oracle (`curate_url_normalize`,
  * `curate_domain_cap`).
  *
  * Beyond-reference superset: the reference engine has no URL surface.
  */
object Urls {

  /** Public suffixes that span two labels — the short, hot subset of the
    * public-suffix list (a production system loads the full PSL as a
    * broadcast lookup at this seam; the operator shape is identical).
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "com.br",
    "co.in", "com.cn", "co.kr", "com.mx", "co.nz", "com.sg")

  /** Query parameters dropped during normalization: classic tracking
    * params (any `utm_*`, plus the big ad-click ids).
    */
  private def isTracking(p: Column): Column =
    p.startsWith("utm_") || p.startsWith("fbclid=") ||
      p.startsWith("gclid=") || p.startsWith("msclkid=")

  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host with the leading `www.` and the scheme's default port
    * stripped; empty string when `url` has no `scheme://` part.
    */
  def hostOf(url: Column): Column = {
    val u = trim(url)
    val hostport = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val h = regexp_replace(hostport, "^www\\.", "")
    when(schemeOf(u) === "http", regexp_replace(h, ":80$", ""))
      .when(schemeOf(u) === "https", regexp_replace(h, ":443$", ""))
      .otherwise(h)
  }

  /** Canonical URL: scheme and host lowercased (path and query are
    * case-SENSITIVE by RFC and preserved), `www.` and default port
    * stripped, fragment dropped, tracking params dropped, surviving query
    * params sorted, trailing path slashes stripped. Strings without a
    * `scheme://` pass through trimmed — callers filter junk rows
    * separately; silently rewriting them would corrupt non-URL columns.
    */
  def normalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = schemeOf(u)
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_replace(regexp_replace(noFrag, "\\?.*$", ""), "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => !(isTracking(p) || p === ""))
    val sortedQ = array_join(array_sort(params), "&")
    when(scheme === "", u).otherwise(concat(
      scheme, lit("://"), hostOf(url), path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ))))
  }

  /** Registered (pay-level) domain of the URL's host: the last two labels,
    * or three when the last two are a multi-label public suffix
    * ([[MultiLabelSuffixes]]) — `a.b.src.co.uk` → `src.co.uk`,
    * `a.src.example.com` → `example.com`. Hosts with one label (or no
    * scheme → empty host) return as-is.
    */
  def registeredDomain(url: Column): Column = {
    val host = hostOf(url)
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, greatest(n - 1, lit(1)), lit(2)), ".")
    val last3 = array_join(slice(labels, greatest(n - 2, lit(1)), lit(3)), ".")
    when(n >= 3 &&
        array_contains(array(MultiLabelSuffixes.map(lit): _*), last2), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }
}
