package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** URL canonicalization edge cases ([[UrlOps.normalizeUrl]]). */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.normalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("case, www, userinfo, default port, fragment, trailing slash all collapse") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/a/b/#frag",
      "https://user:pw@example.com/a/b",
      "https://example.com/a/b/",
      " https://example.com/a/b ") === Seq.fill(4)("https://example.com/a/b"))
  }

  test("non-default ports survive; scheme-matched defaults drop") {
    assert(canon("http://a.com:80/x", "http://a.com:8080/x", "https://a.com:80/x")
      === Seq("http://a.com/x", "http://a.com:8080/x", "https://a.com:80/x"))
  }

  test("tracking params drop, the rest sort; all-tracking query vanishes") {
    assert(canon(
      "http://a.com/p?b=2&utm_source=x&a=1",
      "http://a.com/p?a=1&b=2",
      "http://a.com/p?utm_campaign=y&fbclid=z")
      === Seq("http://a.com/p?a=1&b=2", "http://a.com/p?a=1&b=2", "http://a.com/p"))
  }

  test("root path collapses to bare host; schemeless input only loses its fragment") {
    assert(canon("http://a.com/", "http://a.com", "not a url#frag")
      === Seq("http://a.com", "http://a.com", "not a url"))
  }

  test("host and registered-domain extraction") {
    val r = Seq("https://user@Sub.WWW.co.uk:8443/x", "http://www.a.b.example.com/y")
      .toDF("u")
      .select(UrlOps.urlHost(col("u")).as("h"))
      .select(col("h"), UrlOps.registeredDomain(col("h")).as("d"))
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(r === Seq(("sub.www.co.uk", "www.co.uk"), ("a.b.example.com", "example.com")))
  }
}
