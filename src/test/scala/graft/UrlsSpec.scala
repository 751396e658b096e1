package graft

import org.apache.spark.sql.functions._

import graft.operators.Urls

/** [[Urls.normalizeUrl]] / [[Urls.registeredDomain]] — URL curation string
  * surgery. The `curate_url_normalize` / `curate_domain_cap` gates check
  * the corpus path against DuckDB; this suite pins the per-case contract
  * on hand-written URLs the synthetic corpus doesn't produce.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Urls.normalizeUrl(col("u"))).as[String].collect().head

  private def dom(u: String): String =
    Seq(u).toDF("u").select(Urls.registeredDomain(col("u"))).as[String].collect().head

  test("scheme and host lowercase; path and query stay case-sensitive") {
    assert(norm("HTTPS://ExAmPle.Com/Path/To?Q=Val") ==
      "https://example.com/Path/To?Q=Val")
  }

  test("www and the scheme's default port strip; foreign ports stay") {
    assert(norm("https://www.site.com:443/a") == "https://site.com/a")
    assert(norm("http://www.site.com:80/a") == "http://site.com/a")
    assert(norm("http://site.com:8080/a") == "http://site.com:8080/a")
    // https with port 80 is NOT a default port — keep it.
    assert(norm("https://site.com:80/a") == "https://site.com:80/a")
  }

  test("fragment drops; tracking params drop; survivors sort; empty query vanishes") {
    assert(norm("https://s.com/p?utm_source=x&b=2&a=1#frag") == "https://s.com/p?a=1&b=2")
    assert(norm("https://s.com/p?gclid=1&fbclid=2&msclkid=3&utm_medium=m#x") ==
      "https://s.com/p")
    assert(norm("https://s.com/p#only-frag") == "https://s.com/p")
  }

  test("trailing slashes strip; root URL collapses to bare authority") {
    assert(norm("https://s.com/a/b///") == "https://s.com/a/b")
    assert(norm("https://s.com/") == "https://s.com")
  }

  test("strings without a scheme pass through trimmed") {
    assert(norm("  not a url  ") == "not a url")
    assert(norm("www.site.com/x") == "www.site.com/x")
  }

  test("registered domain: two labels, multi-label public suffix, subdomains") {
    assert(dom("https://a.b.site.co.uk/x") == "site.co.uk")
    assert(dom("https://deep.sub.site.com/x") == "site.com")
    assert(dom("https://site.com/x") == "site.com")
    assert(dom("https://www.site.org.uk/x") == "site.org.uk")
    assert(dom("https://localhost/x") == "localhost")
  }

  test("normalization is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.ExAmPle.CO.UK:443/A/B/?utm_a=1&z=9&b=2#f",
      "http://x.com:80/", "ftp://Files.Site.com/Data")
    urls.foreach { u => assert(norm(norm(u)) == norm(u), u) }
  }

  test("plan is a narrow map — no shuffle, no UDF") {
    val df = Seq("https://a.com/x").toDF("u")
      .select(Urls.normalizeUrl(col("u")), Urls.registeredDomain(col("u")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"), plan)
  }
}
