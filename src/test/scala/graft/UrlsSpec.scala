package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.pipeline.Urls

/** URL host/domain extraction edges: userinfo, ports, case, multi-level
  * TLDs, bare and IP hosts, garbage.
  */
class UrlsSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("host and registrable domain across url shapes") {
    val cases = Seq(
      (1L, "https://Example.COM/path", "example.com", "example.com"),
      (2L, "http://user:pw@Sub.News.example.co.uk:8080/a?b=c",
        "sub.news.example.co.uk", "example.co.uk"),
      (3L, "https://a.b.c.blog.org/x", "a.b.c.blog.org", "blog.org"),
      (4L, "ftp://cdn.example.net:21/f", "cdn.example.net", "example.net"),
      (5L, "https://localhost/x", "localhost", "localhost"),
      (6L, "https://10.1.2.3:443/x", "10.1.2.3", "2.3"), // heuristic: IPs are labels too
      (7L, "not a url at all", null, null))
    val got = cases.toDF("id", "url", "wantHost", "wantDom")
      .select(col("id"), Urls.urlHost(col("url")).as("h"),
        Urls.registrableDomain(col("url")).as("d"),
        col("wantHost"), col("wantDom"))
      .collect()
    got.foreach { r =>
      assert(Option(r.getString(1)) === Option(r.getString(3)), s"host case ${r.getLong(0)}")
      assert(Option(r.getString(2)) === Option(r.getString(4)), s"domain case ${r.getLong(0)}")
    }
  }

  test("canonical url: tracking params, www, slashes, fragments, param order") {
    val cases = Seq(
      (1L, "http://www.X.com/a/?utm_source=tw&b=2&a=1&fbclid=z#frag", "x.com/a?a=1&b=2"),
      (2L, "https://x.com/a", "x.com/a"),
      (3L, "https://x.com/a/", "x.com/a"),
      (4L, "https://x.com/", "x.com"),
      (5L, "https://x.com?gclid=1&utm_medium=m", "x.com"),
      (6L, "https://sub.x.com/p?z=9&a=1", "sub.x.com/p?a=1&z=9"),
      (7L, "garbage", null),
      // scheme-default ports drop; any other port survives (x.com:8080/a
      // and x.com/a are genuinely distinct pages)
      (8L, "http://x.com:80/a", "x.com/a"),
      (9L, "https://x.com:443/a", "x.com/a"),
      (10L, "http://x.com:8080/a", "x.com:8080/a"),
      (11L, "https://x.com:80/a", "x.com:80/a"), // 80 is NOT https' default
      (12L, "http://user@x.com:8080/a", "x.com:8080/a"))
    cases.toDF("id", "url", "want")
      .select(col("id"), Urls.canonicalUrl(col("url")).as("got"), col("want"))
      .collect()
      .foreach(r => assert(Option(r.getString(1)) === Option(r.getString(2)),
        s"case ${r.getLong(0)}"))
    // cases 2, 3 (slash variant) and 8, 9 (default-port variants) all
    // collide on x.com/a: URL dedup keeps one of the four
    val canon = cases.toDF("id", "url", "want")
      .select(Urls.canonicalUrl(col("url")).as("c")).filter(col("c") === "x.com/a")
    assert(canon.count() === 4 && canon.distinct().count() === 1)
  }

  test("PSL registrable domain: private suffixes, multi-level TLDs, wildcards, exceptions") {
    val cases = Seq(
      // private-section suffixes group one label deeper
      (1L, "https://x.github.io/a", "x.github.io"),
      (2L, "https://a.b.github.io/", "b.github.io"),
      (3L, "https://myblog.blogspot.com/p", "myblog.blogspot.com"),
      // a host that IS a public suffix has no registrable domain
      (4L, "https://github.io/", null),
      (5L, "https://com.au/", null),
      // multi-level ICANN suffixes
      (6L, "https://www.shop.com.au/x", "shop.com.au"),
      (7L, "https://x.y.co.jp", "y.co.jp"),
      (8L, "https://school.k12.ca.us/z", "school.k12.ca.us"),
      // wildcard *.ck: every example.ck-shaped suffix is public
      (9L, "https://foo.example.ck", "foo.example.ck"),
      (10L, "https://example.ck", null),
      // exception !www.ck outranks the wildcard: www.ck is registrable
      (11L, "https://www.ck", "www.ck"),
      (12L, "https://x.www.ck", "www.ck"),
      // jp city wildcard + exception pair
      (13L, "https://a.b.kawasaki.jp", "a.b.kawasaki.jp"),
      (14L, "https://x.city.kawasaki.jp", "city.kawasaki.jp"),
      // unlisted TLD falls to the implicit * rule (last two labels)
      (15L, "https://a.b.example/x", "b.example"),
      (16L, "https://Sub.Example.COM/x", "example.com"),
      (17L, "not a url", null))
    cases.toDF("id", "url", "want")
      .select(col("id"), Urls.registrableDomainPsl(col("url")).as("got"), col("want"))
      .collect()
      .foreach(r => assert(Option(r.getString(1)) === Option(r.getString(2)),
        s"case ${r.getLong(0)}"))
  }

  test("PSL parser and matcher unit edges") {
    import graft.pipeline.Psl
    val rules = Psl.parse(Iterator(
      "// comment", "", "co.uk", "*.ck", "!www.ck", "k12.ca.us",
      "UPPER.case  trailing-ignored"))
    assert(rules.exact === Set("co.uk", "k12.ca.us", "upper.case"))
    assert(rules.wildcardBases === Set("ck"))
    assert(rules.exceptions === Set("www.ck"))
    assert(rules.maxDepth === 3)
    assert(Psl.registrableDomain("a.b.co.uk", rules) === "b.co.uk")
    assert(Psl.registrableDomain("co.uk", rules) === null)
    assert(Psl.registrableDomain("single", rules) === null)
    assert(Psl.registrableDomain("a..b.com", rules) === null)
    assert(Psl.registrableDomain(".com", rules) === null)
    assert(Psl.registrableDomain("x.com.", rules) === null)
    // bundled snapshot loads and resolves
    assert(Psl.registrableDomain("deep.x.github.io", Psl.bundled) === "x.github.io")
  }

  test("PSL matcher equals a naive all-rules reference on random hosts") {
    import graft.pipeline.Psl
    val rules = Psl.bundled
    // naive O(rules) reference, straight from the published algorithm:
    // exceptions first (registrable = the exception itself), else the
    // longest exact/wildcard match is the public suffix, else depth 1
    def naive(host: String): String = {
      val labels = host.split('.')
      if (host.isEmpty || host.startsWith(".") || host.endsWith(".") ||
        host.contains("..")) return null
      def suffixOf(depth: Int) = labels.takeRight(depth).mkString(".")
      val n = labels.length
      (n to 1 by -1).find(k => rules.exceptions.contains(suffixOf(k)))
        .map(suffixOf) match {
        case Some(exc) => exc
        case None =>
          val ps = (n to 1 by -1).find { k =>
            rules.exact.contains(suffixOf(k)) ||
              (k >= 2 && rules.wildcardBases.contains(suffixOf(k - 1)))
          }.getOrElse(1)
          if (n <= ps) null else suffixOf(ps + 1)
      }
    }
    val pool = Seq("github", "io", "com", "au", "co", "uk", "ck", "www",
      "kawasaki", "jp", "city", "blogspot", "k12", "ca", "us", "x", "a9", "b")
    val rnd = new scala.util.Random(61409)
    for (_ <- 1 to 3000) {
      val host = Seq.fill(1 + rnd.nextInt(5))(pool(rnd.nextInt(pool.length)))
        .mkString(".")
      assert(Psl.registrableDomain(host, rules) === naive(host), s"host $host")
    }
  }

  test("custom PSL file path swaps the rule set without a rebuild") {
    val f = java.nio.file.Files.createTempFile("psl_custom", ".dat")
    java.nio.file.Files.writeString(f,
      "// custom snapshot\nmy.zone\n*.wild.zone\n!ok.wild.zone\n")
    val path = f.toString
    val cases = Seq(
      (1L, "https://a.b.my.zone/x", "b.my.zone"), // custom 2-level rule
      (2L, "https://x.deep.wild.zone/", "x.deep.wild.zone"), // custom wildcard
      (3L, "https://ok.wild.zone/", "ok.wild.zone"), // custom exception
      // the custom file REPLACES the bundled rules: github.io is now an
      // unlisted suffix, so the implicit * rule groups by last two labels
      (4L, "https://a.b.github.io/", "github.io"))
    cases.toDF("id", "url", "want")
      .select(col("id"), Urls.registrableDomainPsl(col("url"), path).as("got"),
        col("want"))
      .collect()
      .foreach(r => assert(Option(r.getString(1)) === Option(r.getString(2)),
        s"case ${r.getLong(0)}"))
  }

  test("overwriting the custom PSL file takes effect on the next query") {
    // the rule cache keys by (path, mtime) captured at PLAN time: a newer
    // full-list download dropped onto the SAME path must be picked up by
    // the next query with no JVM restart and no versioned-path discipline
    val f = java.nio.file.Files.createTempFile("psl_swap", ".dat")
    java.nio.file.Files.writeString(f, "my.zone\n")
    val path = f.toString
    def domain(): String =
      Seq(("https://a.b.my.zone/x")).toDF("url")
        .select(Urls.registrableDomainPsl(col("url"), path).as("d"))
        .collect().head.getString(0)
    assert(domain() === "b.my.zone")
    // overwrite with a rule set where b.my.zone is itself a suffix;
    // force a distinct mtime (coarse-grained filesystems)
    java.nio.file.Files.writeString(f, "b.my.zone\n")
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    assert(domain() === "a.b.my.zone", "new rules must apply to a new plan")
  }

  test("IDN hosts map to punycode: unicode and xn-- forms group as one key") {
    val cases = Seq(
      (1L, "https://bücher.example/x", "xn--bcher-kva.example"),
      (2L, "https://xn--bcher-kva.example/y", "xn--bcher-kva.example"),
      (3L, "https://BÜCHER.EXAMPLE/z", "xn--bcher-kva.example"),
      (4L, "https://plain.example/x", "plain.example"),
      (5L, "not a url", null))
    cases.toDF("id", "url", "want")
      .select(col("id"), Urls.urlHostAscii(col("url")).as("got"), col("want"))
      .collect()
      .foreach(r => assert(Option(r.getString(1)) === Option(r.getString(2)),
        s"case ${r.getLong(0)}"))
    // PSL grouping runs on the mapped form: both spellings land in the
    // same registrable domain
    val doms = Seq("https://a.bücher.example/x",
        "https://a.xn--bcher-kva.example/y").toDF("url")
      .select(Urls.registrableDomainPsl(col("url")).as("d"))
      .collect().map(_.getString(0)).toSet
    assert(doms === Set("xn--bcher-kva.example"))
  }

  test("percent-encoding normalization: unreserved decode, hex uppercase") {
    val cases = Seq(
      // %2f vs %2F vs %7E~%41: one canonical spelling
      (1L, "https://x.com/p%41th%7e/x%2Fy?n%61me=v%2f1",
        "x.com/pAth~/x%2Fy?name=v%2F1"),
      (2L, "https://x.com/pAth~/x%2Fy?name=v%2F1",
        "x.com/pAth~/x%2Fy?name=v%2F1"),
      // reserved escapes stay encoded (decoding %2F would change structure)
      (3L, "https://x.com/a%2Fb", "x.com/a%2Fb"),
      // MALFORMED escapes fail the URI grammar; the regex component
      // fallback still canonicalizes, escapes passing through verbatim
      (4L, "https://x.com/a%2", "x.com/a%2"),
      (5L, "https://x.com/a%ZZb", "x.com/a%ZZb"),
      // IDN urls canonicalize through the punycode host WITH their
      // path/query intact (params still filtered + sorted)
      (6L, "https://bücher.example/x/?b=2&utm_source=t&a=1",
        "xn--bcher-kva.example/x?a=1&b=2"),
      (7L, "https://xn--bcher-kva.example/x?a=1&b=2",
        "xn--bcher-kva.example/x?a=1&b=2"),
      // true garbage still nulls (no scheme://host to anchor)
      (8L, "not a url", null))
    cases.toDF("id", "url", "want")
      .select(col("id"), Urls.canonicalUrl(col("url")).as("got"), col("want"))
      .collect()
      .foreach(r => assert(Option(r.getString(1)) === Option(r.getString(2)),
        s"case ${r.getLong(0)}"))
    // the normalizer itself passes malformed escapes through verbatim
    // (callers feeding it pre-split strings keep their bytes)
    assert(graft.pipeline.UrlNorm.percentNormalize("a%2") === "a%2")
    assert(graft.pipeline.UrlNorm.percentNormalize("a%ZZb") === "a%ZZb")
    assert(graft.pipeline.UrlNorm.percentNormalize("%2f%41%7e") === "%2FA~")
  }
}
