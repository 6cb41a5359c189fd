package graft

import org.apache.spark.sql.functions._
import graft.operators.Web

class WebSpec extends SparkSpec {

  private def norm(urls: String*): Seq[(String, String)] = {
    import spark.implicits._
    urls.toDF("url")
      .select(Web.urlNormalize(col("url")), Web.urlHost(col("url")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("urlNormalize: case, default ports, slashes, tracking params, fragments") {
    val got = norm(
      "HTTPS://WWW.Example.COM:443//a//b/?utm_source=x&b=2&a=1#frag",
      "http://site.com:80/page/",
      "http://site.com:8080/page",       // non-default port KEPT
      "https://site.com",                 // empty path -> /
      "https://site.com/?fbclid=abc",     // all params tracked -> no query
      "http://Mixed.Case.org/A/B",        // path case preserved
      "https://x.io/p?z=1&a=2&gclid=g&m=3")
    assert(got(0) == ("https://www.example.com/a/b?a=1&b=2", "www.example.com"))
    assert(got(1) == ("http://site.com/page", "site.com"))
    assert(got(2) == ("http://site.com:8080/page", "site.com:8080"))
    assert(got(3) == ("https://site.com/", "site.com"))
    assert(got(4) == ("https://site.com/", "site.com"))
    assert(got(5) == ("http://mixed.case.org/A/B", "mixed.case.org"))
    assert(got(6) == ("https://x.io/p?a=2&m=3&z=1", "x.io"))
  }

  test("urlNormalize is idempotent and collision-inducing variants converge") {
    import spark.implicits._
    val variants = Seq(
      "HTTP://Site.com:80//a/b/?utm_campaign=c#x",
      "http://site.com/a//b",
      "http://site.com/a/b/")
    val canon = norm(variants: _*).map(_._1).distinct
    assert(canon == Seq("http://site.com/a/b"), s"got $canon")
    // idempotence: normalizing a canonical form is the identity
    val twice = Seq(canon.head).toDF("url")
      .select(Web.urlNormalize(col("url"))).head().getString(0)
    assert(twice == canon.head)
  }

  test("hostRollup: counts, dup ppm, majority lang") {
    import spark.implicits._
    val docs = Seq(
      ("http://a.com/1", "same text", "en"),
      ("http://a.com/2", "same text", "en"),   // exact dup within a.com
      ("HTTP://A.COM:80/2#f", "other text", "fr"), // same canonical URL as /2
      ("https://b.org/x", "unique here", "de"))
      .toDF("url", "content", "lang")
    val got = Web.hostRollup(docs, "url", "content", "lang")
      .orderBy("host").collect()
    assert(got.length == 2)
    val a = got(0)
    assert(a.getString(0) == "a.com")
    assert(a.getLong(1) == 3 && a.getLong(2) == 2) // 3 docs, 2 distinct urls
    assert(a.getLong(4) == 333333L, s"dup_ppm ${a.getLong(4)}") // (3-2)*1e6 div 3
    assert(a.getLong(5) == 2 && a.getString(6) == "en")
    val b = got(1)
    assert(b.getString(0) == "b.org" && b.getLong(1) == 1 && b.getLong(4) == 0L)
  }
}
