package graft.ops

import graft.SparkSpec

/** URL canonicalization semantics beyond what the u1 oracle derivation
  * exercises: tracking variants collapsing to one canonical form, ports,
  * root paths, single-label hosts, and valueless params. */
class WebOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(url: String): (String, String, String) = {
    val r = WebOps.canonicalize(Seq((1L, url)).toDF("id", "url"), "url")
      .select("canon_url", "host", "domain").head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("tracking variants collapse to one canonical form") {
    val variants = Seq(
      "https://News.Example.com/a/b?utm_source=x&q=1&ref=tw",
      "https://news.example.com/a/b/?q=1&utm_campaign=y#top",
      "HTTPS://news.example.com/a/b?gclid=123&q=1")
    val canons = variants.map(canonOf(_)._1).distinct
    assert(canons == Seq("https://news.example.com/a/b?q=1"))
  }

  test("param order is normalized; non-tracking params all survive") {
    assert(canonOf("https://e.com/p?b=2&a=1")._1 ==
      canonOf("https://e.com/p?a=1&b=2")._1)
    assert(canonOf("https://e.com/p?b=2&a=1")._1 == "https://e.com/p?a=1&b=2")
  }

  test("root path keeps its slash; bare host stays bare") {
    assert(canonOf("https://e.com/")._1 == "https://e.com/")
    assert(canonOf("https://e.com")._1 == "https://e.com")
  }

  test("port stays in the canonical authority but not in host/domain") {
    val (canon, host, domain) = canonOf("http://Dev.Site.org:8080/x?utm_a=1")
    assert(canon == "http://dev.site.org:8080/x")
    assert(host == "dev.site.org")
    assert(domain == "site.org")
  }

  test("single-label host is its own domain") {
    assert(canonOf("http://localhost/x")._3 == "localhost")
  }

  test("a query of only tracking params drops the '?' entirely") {
    assert(canonOf("https://e.com/x?utm_source=a&fbclid=z")._1 ==
      "https://e.com/x")
  }

  test("dedupByCanonical keeps the smallest id per canonical group") {
    val df = Seq(
      (3L, "https://e.com/a?utm_source=x"),
      (1L, "https://e.com/a/"),
      (2L, "https://e.com/b")
    ).toDF("doc_id", "url")
    val got = WebOps.dedupByCanonical(df, "doc_id", "url")
      .orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("https://e.com/a", 1L), ("https://e.com/b", 2L)))
  }
}
