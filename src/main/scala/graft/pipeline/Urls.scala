package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL structure ops for web corpora — the group-by-domain primitives
  * behind per-domain caps, mixture weights and provenance stats. Pure
  * codegen'd expressions (Spark's own `parse_url` + array ops), zero
  * shuffle; grouping 100 TB of crawl rows by domain is one map-shaped
  * scan into the aggregate.
  */
object Urls {

  /** Lowercased hostname: scheme://user@HOST:port/path → host (no
    * userinfo, no port). NULL for unparseable urls — filter or coalesce
    * downstream.
    */
  def urlHost(url: Column): Column = lower(try_parse_url(url, lit("HOST")))

  /** [[urlHost]] mapped through IDN→punycode (RFC 3490 ToASCII, JDK
    * `java.net.IDN` behind a codegen'd native expression): an
    * internationalized host and its xn-- form group as ONE key
    * (`bücher.example` ≡ `xn--bcher-kva.example`) — the form PSL/domain
    * grouping should run on. All-ASCII hosts pass through by reference.
    * A RAW unicode host never reaches `parse_url` (the URI parser
    * rejects non-ASCII authorities), so extraction falls back to the
    * authority regex for exactly those urls before the IDN mapping.
    */
  def urlHostAscii(url: Column): Column = {
    val raw = nullif(lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)), lit(""))
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.IdnAscii(
        org.apache.spark.sql.GraftSqlBridge.expressionOf(
          coalesce(urlHost(url), raw))))
  }

  /** Two-level TLD second labels where the registrable unit is one label
    * deeper (`example.co.uk`, not `co.uk`). A deliberate HEURISTIC subset
    * of the public-suffix list (the full PSL is a data file, not logic —
    * swap it in by broadcasting the real list and joining); these seven
    * cover the overwhelming share of multi-level crawl hosts.
    */
  private val MultiTldSeconds = Seq("co", "com", "net", "org", "gov", "edu", "ac")

  /** Canonical form for URL-level dedup (the cheap pass that runs BEFORE
    * content dedup — the same page fetched as `http://www.x.com/a/?utm_…`
    * and `https://x.com/a` must collide): scheme dropped, host lowercased
    * with a leading `www.` stripped, DEFAULT ports dropped (`:80` for
    * http, `:443` for https — any other port survives, because
    * `x.com:8080/a` and `x.com/a` are genuinely distinct pages), trailing
    * path slash removed, fragment dropped, tracking params (`utm_*`,
    * `fbclid`, `gclid`) removed and the surviving query params SORTED,
    * and percent-encodings normalized per RFC 3986 §6.2.2 (escape hex
    * uppercased so `%2f` ≡ `%2F`; escapes of UNRESERVED characters
    * decoded so `%7E` ≡ `~` — reserved escapes stay encoded, decoding
    * them would change URL structure).
    * NULL for unparseable urls. Pure expression chain, zero shuffle —
    * `dropDuplicates(canonical)` after it is the one shuffle a URL-dedup
    * pass needs.
    */
  def canonicalUrl(url: Column): Column = {
    def pctNorm(c: Column): Column =
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.PercentNormalize(
          org.apache.spark.sql.GraftSqlBridge.expressionOf(c)))
    // IDN-mapped host: the unicode and xn-- spellings of one site
    // canonicalize to ONE url (all-ASCII hosts pass through by reference)
    val host = regexp_replace(urlHostAscii(url), "^www\\.", "")
    // parse_url rejects urls the URI grammar won't take (raw unicode
    // hosts, malformed escapes) wholesale — for those, the component
    // regexes (the SAME forms the oracle replays) take over, keyed on
    // the parsed host being null while the regex host resolved
    val parsedHost = urlHost(url)
    val scheme = coalesce(lower(try_parse_url(url, lit("PROTOCOL"))),
      nullif(lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)), lit("")))
    // parse_url has no PORT part: read it off the authority's tail, then
    // keep it only when it differs from the scheme's default
    val auth = coalesce(try_parse_url(url, lit("AUTHORITY")),
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val port = regexp_extract(auth, ":(\\d+)$", 1)
    val defaultPort = when(scheme === "http", lit("80"))
      .when(scheme === "https", lit("443")).otherwise(lit(""))
    val portSuffix = when(port === "" || port === defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = when(parsedHost.isNotNull,
        coalesce(try_parse_url(url, lit("PATH")), lit("")))
      .otherwise(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1))
    val rawQuery = when(parsedHost.isNotNull,
        coalesce(try_parse_url(url, lit("QUERY")), lit("")))
      .otherwise(regexp_extract(url, "^[^?#]*\\?([^#]*)", 1))
    val path = pctNorm(regexp_replace(rawPath, "/$", ""))
    val q0 = pctNorm(rawQuery)
    val kept = array_sort(filter(split(q0, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p === lit(""))))
    val query = array_join(kept, "&")
    when(host.isNull, lit(null)).otherwise(concat(host, portSuffix, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** Registrable domain of a url under the bundled Public Suffix List —
    * the form per-domain caps and mixture weights should use: the real
    * PSL rules (so `x.github.io`, `a.com.au`, `b.co.jp` group correctly,
    * wildcards and exceptions included) resolve via [[Psl]]'s hash sets
    * inside a codegen'd native expression. Zero shuffle, zero join — the
    * rule file rides the classpath. NULL when the host IS a public
    * suffix or the url is unparseable.
    */
  def registrableDomainPsl(url: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.RegistrableDomainPsl(
        org.apache.spark.sql.GraftSqlBridge.expressionOf(urlHostAscii(url))))

  /** [[registrableDomainPsl]] over a CUSTOM rule file (a current full
    * publicsuffix.org download on any Hadoop-visible path) — the
    * operational data swap, no rebuild: each executor parses the file
    * once per JVM. Same zero-shuffle codegen'd shape.
    */
  def registrableDomainPsl(url: Column, rulesPath: String): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.RegistrableDomainPsl(
        org.apache.spark.sql.GraftSqlBridge.expressionOf(urlHostAscii(url)),
        Some(rulesPath)))

  /** Registrable domain of a url, HEURISTIC form: last two host labels,
    * or three when the second-to-last is a multi-level-TLD label
    * (`sub.example.co.uk` → `example.co.uk`); a bare one/two-label host
    * passes through. Kept as the dependency-free default with pure
    * built-in expressions; [[registrableDomainPsl]] is the
    * full-rule-set form (same zero-shuffle shape).
    */
  def registrableDomain(url: Column): Column = {
    val host = urlHost(url)
    val ls = split(host, "\\.")
    val n = size(ls)
    when(host.isNull, lit(null))
      .when(n <= 2, host)
      .when(element_at(ls, -2).isin(MultiTldSeconds: _*),
        concat_ws(".", element_at(ls, -3), element_at(ls, -2), element_at(ls, -1)))
      .otherwise(concat_ws(".", element_at(ls, -2), element_at(ls, -1)))
  }
}
