package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + host/registrable-domain extraction — the
  * CommonCrawl-style curation step that runs BEFORE any text dedup: a
  * crawl sees the same page as `HTTP://WWW.Site.COM:80/a/?utm_source=x`
  * and `http://site.com/a`, and every downstream URL-keyed operation
  * (exact URL dedup, per-domain caps, domain blocklists) needs the two to
  * key identically.
  *
  * Canonical form (the contract, pinned by UrlsSpec fixtures):
  *  - fragment stripped (`#...` is client-side only);
  *  - scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization);
  *  - leading `www.` host label stripped (treated as an alias);
  *  - default ports stripped (`:80` for http, `:443` for https) — any
  *    other explicit port is kept;
  *  - query tracking params (`utm_*`) dropped, the rest SORTED by the
  *    full `k=v` string (param order is transport noise), empty query
  *    dropped entirely;
  *  - trailing slashes collapsed off the path; empty path → `/`.
  *
  * Registrable domain = eTLD+1 against a public-suffix set
  * ([[MultiPartSuffixes]] carries the multi-label entries this corpus
  * produces; a production deployment swaps in the full Mozilla PSL — the
  * COLUMN LOGIC is identical: match the longest known suffix, keep one
  * more label).
  *
  * Everything here is pure string/regexp column expressions — codegen'd,
  * per-row, zero shuffle; a 100 TB corpus canonicalizes in the scan
  * projection.
  */
object Urls {

  /** Multi-label public suffixes present in this corpus's URL space. */
  val MultiPartSuffixes: Seq[String] = Seq("co.uk", "com.cn")

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** URL with the `#fragment` stripped. */
  def noFrag(url: Column): Column = regexp_extract(url, "^([^#]*)", 1)

  /** Lowercased scheme. */
  def scheme(url: Column): Column =
    lower(regexp_extract(noFrag(url), schemeRe, 1))

  private def hostPort(url: Column): Column =
    regexp_extract(noFrag(url), schemeRe + "([^/?]*)", 2)

  /** Lowercased host with any leading `www.` stripped (no port). */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(hostPort(url), "^([^:]*)", 1)),
      "^www\\.", "")

  /** Explicit port digits, or '' if none given. */
  def port(url: Column): Column =
    regexp_extract(hostPort(url), ":([0-9]+)$", 1)

  private def pathQuery(url: Column): Column =
    regexp_extract(noFrag(url), schemeRe + "[^/?]*(.*)$", 2)

  /** Path with trailing slashes collapsed; empty path → `/`. */
  def path(url: Column): Column = {
    val trimmed = regexp_replace(
      regexp_extract(pathQuery(url), "^([^?]*)", 1), "/+$", "")
    when(trimmed === "", "/").otherwise(trimmed)
  }

  /** Query string canonicalized: `utm_*` params dropped, the rest sorted
    * by the full `k=v` string; '' when nothing survives.
    */
  def canonicalQuery(url: Column): Column = {
    val qs = regexp_extract(pathQuery(url), "\\?(.*)$", 1)
    array_join(
      array_sort(filter(split(qs, "&"),
        p => p =!= "" && !p.startsWith("utm_"))), "&")
  }

  /** The full canonical URL (see the object contract above). */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val p = port(url)
    val defaultPort =
      (sch === "http" && p === "80") || (sch === "https" && p === "443")
    val portOut = when(p === "" || defaultPort, "").otherwise(concat(lit(":"), p))
    val q = canonicalQuery(url)
    val qsOut = when(q === "", "").otherwise(concat(lit("?"), q))
    concat(sch, lit("://"), host(url), portOut, path(url), qsOut)
  }

  /** Registrable domain (eTLD+1) of a bare host: the last TWO labels,
    * except when they form a known multi-label public suffix — then the
    * last THREE. Hosts with fewer labels than the rule needs pass through
    * unchanged.
    */
  def registrableDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    // CaseWhen evaluates only the matched branch, so the negative-index
    // element_at calls are reached only when the label count admits them
    // (ANSI mode errors on out-of-bounds element_at).
    when(n < lit(2), hostCol)
      .when(n >= lit(3) &&
          concat_ws(".", element_at(labels, -2), element_at(labels, -1))
            .isin(MultiPartSuffixes: _*),
        concat_ws(".", element_at(labels, -3), element_at(labels, -2),
          element_at(labels, -1)))
      .otherwise(concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
  }
}
