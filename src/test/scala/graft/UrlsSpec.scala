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
      (7L, "garbage", null))
    cases.toDF("id", "url", "want")
      .select(col("id"), Urls.canonicalUrl(col("url")).as("got"), col("want"))
      .collect()
      .foreach(r => assert(Option(r.getString(1)) === Option(r.getString(2)),
        s"case ${r.getLong(0)}"))
    // cases 2 and 3 collide (slash variant): URL dedup keeps one of them
    val canon = cases.toDF("id", "url", "want")
      .select(Urls.canonicalUrl(col("url")).as("c")).filter(col("c") === "x.com/a")
    assert(canon.count() === 2 && canon.distinct().count() === 1)
  }
}
