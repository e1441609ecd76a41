package graft

import org.apache.spark.sql.functions._

import graft.operators.Urls

/** URL canonicalization: surface-form collapsing, tracking-param
  * stripping, parameter sorting, malformed-input nulling. */
class UrlsSpec extends SparkTestBase {

  private def canon(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("url").withColumn("c", Urls.canonicalize(col("url")))
      .select("c").collect().toSeq.map(r => Option(r.getString(0)))
  }

  test("surface variants of one page collapse to a single canonical form") {
    val variants = Seq(
      "https://example.com/a/b?x=1&y=2",
      "HTTPS://EXAMPLE.COM/a/b?y=2&x=1",
      "https://www.example.com:443/a/b?x=1&y=2#section-3",
      "https://example.com/a/b?utm_source=tw&x=1&utm_medium=social&y=2",
      "https://example.com/a/b?y=2&ref=hn&x=1&fbclid=abc&gclid=xyz")
    assert(canon(variants: _*).toSet ==
      Set(Some("https://example.com/a/b?x=1&y=2")))
  }

  test("path and query normalization corners") {
    assert(canon("http://Host.org") == Seq(Some("http://host.org/")))
    assert(canon("http://host.org:80?utm_campaign=z") == Seq(Some("http://host.org/")))
    assert(canon("http://host.org/p?") == Seq(Some("http://host.org/p")))
    // only DEFAULT ports strip; a real port is identity-bearing
    assert(canon("http://host.org:8080/p") == Seq(Some("http://host.org:8080/p")))
    // case of PATH and params is preserved (only scheme+host lowercase)
    assert(canon("HTTP://A.Com/CaSe?Q=Vv") == Seq(Some("http://a.com/CaSe?Q=Vv")))
  }

  test("non-URLs canonicalize (and domain) to null, not garbage") {
    assert(canon("not a url", "/relative/path", "mailto:x@y.z") == Seq(None, None, None))
    import spark.implicits._
    val d = Seq("not a url", "https://www.Sub.Example.com:443/x")
      .toDF("url").withColumn("d", Urls.domain(col("url")))
      .select("d").collect().map(r => Option(r.getString(0))).toSeq
    assert(d == Seq(None, Some("sub.example.com")))
  }
}
