package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL analytics for web-crawl corpora: host/path extraction, tracking
  * parameter removal, and registrable-domain (eTLD+1) derivation.
  *
  * A crawl-scale pipeline needs URL identity long before it needs text:
  * per-domain quotas, blocklists, and dedup keys are all keyed on the
  * *registrable* domain (the public-suffix boundary plus one label), and
  * URL-level dedup is worthless until volatile tracking parameters are
  * stripped. Everything here composes codegen'd built-ins
  * (`parse_url`, `regexp_extract`, `regexp_replace`) — no UDFs, so the
  * whole family stays inside whole-stage codegen and runs at scan speed.
  *
  * Regex dialect note: every pattern below is deliberately RE2-safe (no
  * lookaround, no backreference replacements) so the same pattern text
  * is portable to RE2-based engines — which is also what keeps the
  * DuckDB oracles for `q_url_parse`/`q_domain_stats` byte-identical.
  *
  * The suffix list is a compiled-in subset of the public suffix list
  * (publicsuffix.org) covering the multi-label suffixes this library's
  * sources use; swap in the full PSL snapshot for production crawls via
  * [[registrableDomain]]'s `multiPartSuffixes` parameter.
  */
object UrlFunctions {

  /** Multi-label public suffixes recognized by default (PSL subset). */
  val DefaultMultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.br", "gov.br", "org.br", "net.br", "edu.br",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "com.mx")

  /** Lower-cased host ("authority without port/userinfo"). */
  def host(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** Path component ("/a/b"; empty for bare-host URLs). */
  def path(url: Column): Column = parse_url(url, lit("PATH"))

  /** Raw query string (no leading '?'), null when absent. */
  def query(url: Column): Column = parse_url(url, lit("QUERY"))

  /** Remove volatile tracking parameters (utm_*, gclid, fbclid) and tidy
    * the separators they leave behind. Every match is anchored at its
    * '?' or '&' separator (a param merely CONTAINING "utm_", like
    * `myutm_foo`, is untouched), and every replacement is a literal —
    * no backreferences, whose syntax differs across regex dialects:
    *   1. drop each '&'-led tracking pair (interior/trailing params),
    *   2. a '?'-led tracking pair with a successor hands '?' on,
    *   3. a '?'-led tracking pair with no successor drops the '?' too
    *      (works at end-of-url and before a '#fragment' alike).
    */
  def stripTracking(url: Column): Column = {
    val p = "(utm_|gclid=|fbclid=)[^&#]*"
    regexp_replace(regexp_replace(regexp_replace(url,
      s"&$p", ""),
      s"[?]$p&", "?"),
      s"[?]$p", "")
  }

  /** Registrable domain (eTLD+1) of a host: one label plus the public
    * suffix. Hosts whose suffix is multi-label ("co.uk") keep three
    * labels; everything else keeps two. Unknown/label-free hosts (IPs,
    * localhost) yield the empty string — filter or coalesce at the call
    * site. */
  def registrableDomain(
      hostCol: Column,
      multiPartSuffixes: Seq[String] = DefaultMultiPartSuffixes): Column = {
    val multi = multiPartSuffixes.map(_.replace(".", "\\.")).mkString("|")
    val threeLabel = regexp_extract(hostCol, s"([^.]+\\.(?:$multi))$$", 1)
    val twoLabel = regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
    when(threeLabel =!= "", threeLabel).otherwise(twoLabel)
  }

  /** One-stop parse: host, path, registrable domain, cleaned URL. */
  def parsed(url: Column): Seq[(String, Column)] = {
    val h = host(url)
    Seq(
      "host" -> h,
      "path" -> path(url),
      "domain" -> registrableDomain(h),
      "url_clean" -> stripTracking(url))
  }
}
