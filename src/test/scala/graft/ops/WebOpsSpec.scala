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

  private def pslDomain(hosts: String*): Map[String, (String, String)] = {
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
    PublicSuffix.withRegistrableDomain(df, "host",
        PublicSuffix.rulesDf(spark))
      .select("host", "public_suffix", "domain").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
  }

  test("public-suffix registrable domains: multi-label ccTLD registries") {
    val got = pslDomain("bbc.co.uk", "www.bbc.co.uk", "news.example.com",
      "a.deep.chain.shop.com.au", "blog.team.github.io")
    assert(got("bbc.co.uk") == (("co.uk", "bbc.co.uk")))
    assert(got("www.bbc.co.uk") == (("co.uk", "bbc.co.uk")))
    assert(got("news.example.com") == (("com", "example.com")))
    assert(got("a.deep.chain.shop.com.au") == (("com.au", "shop.com.au")))
    // github.io is a private-registry public suffix: each user site is
    // its own registrable domain
    assert(got("blog.team.github.io") == (("github.io", "team.github.io")))
  }

  test("public-suffix wildcard and exception rules (*.ck / !www.ck)") {
    val got = pslDomain("www.ck", "x.b.ck", "a.x.b.ck", "b.ck")
    // exception: www.ck is registrable despite the wildcard
    assert(got("www.ck") == (("ck", "www.ck")))
    // wildcard: every direct child of ck is a public suffix
    assert(got("x.b.ck") == (("b.ck", "x.b.ck")))
    assert(got("a.x.b.ck") == (("b.ck", "x.b.ck")))
    // a bare child IS the public suffix: no registrable domain
    assert(got("b.ck") == (("b.ck", null)))
  }

  test("public-suffix default rule and edge hosts") {
    val got = pslDomain("foo.unknowntld", "deep.sub.foo.unknowntld",
      "co.uk", "com", "localhost", "MiXeD.Example.COM")
    // unknown TLD: default rule * — the TLD is the public suffix
    assert(got("foo.unknowntld") == (("unknowntld", "foo.unknowntld")))
    assert(got("deep.sub.foo.unknowntld") == (("unknowntld", "foo.unknowntld")))
    // a host that IS a public suffix has no registrable domain
    assert(got("co.uk") == (("co.uk", null)))
    assert(got("com") == (("com", null)))
    assert(got("localhost") == (("localhost", null)))
    // hosts are lowercased before matching
    assert(got("MiXeD.Example.COM") == (("com", "example.com")))
  }

  test("public-suffix rules parse: markers, comments, case") {
    val rules = PublicSuffix.parse(Iterator(
      "// comment", "", "com", "*.ck", "!www.ck", "  CO.UK  "))
    assert(rules == Seq(PublicSuffix.Rule("com", 0),
      PublicSuffix.Rule("ck", 1), PublicSuffix.Rule("www.ck", 2),
      PublicSuffix.Rule("co.uk", 0)))
    assert(PublicSuffix.Rule("co.uk", 0).labels == 2)
    // the bundled resource parses and contains the load-bearing tiers
    val keys = PublicSuffix.defaultRules.map(r => (r.key, r.kind)).toSet
    assert(keys(("co.uk", 0)) && keys(("github.io", 0)) &&
      keys(("ck", 1)) && keys(("www.ck", 2)))
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

  test("canonicalize is idempotent over generated URL shapes") {
    // THE canonical-form property: applying canonicalize to its own
    // output changes nothing. 300 URLs from a seeded generator sweep
    // scheme/host case, ports, path depth, trailing slashes, tracking
    // and valueless params, duplicates, and fragments — one Spark job
    // checks the whole batch.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val host = for {
      n <- Gen.choose(1, 3)
      ls <- Gen.listOfN(n, Gen.oneOf("Ex", "news", "WWW", "site"))
      tld <- Gen.oneOf("com", "ORG", "io")
    } yield (ls :+ tld).mkString(".")
    val param = Gen.oneOf("a=1", "b=2", "b=2", "utm_source=x", "ref=tw",
      "q", "z=", "gclid=9", "Key=V")
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTPS", "https")
      h <- host
      port <- Gen.oneOf("", ":8080")
      np <- Gen.choose(0, 3)
      ps <- Gen.listOfN(np, Gen.oneOf("a", "B", "p1", "x-y"))
      slash <- Gen.oneOf("", "/")
      nq <- Gen.choose(0, 4)
      qs <- Gen.listOfN(nq, param)
      frag <- Gen.oneOf("", "#top")
    } yield s"$scheme://$h$port" +
      (if (ps.isEmpty) "" else ps.mkString("/", "/", "")) + slash +
      (if (qs.isEmpty) "" else qs.mkString("?", "&", "")) + frag
    val urls = Gen.listOfN(300, urlGen)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val once = WebOps.canonicalize(
      urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url"),
      "url")
    val twice = WebOps.canonicalize(
      once.select($"id", $"canon_url".as("url"),
        $"canon_url".as("c1"), $"host".as("h1"), $"domain".as("d1")),
      "url")
    val broken = twice.filter(
      $"canon_url" =!= $"c1" || $"host" =!= $"h1" || $"domain" =!= $"d1")
      .select("c1", "canon_url").collect()
    assert(broken.isEmpty,
      s"non-idempotent canonicalization:\n${broken.take(5).mkString("\n")}")
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

  test("urlFilter: domain beats pattern; suffix matches subdomains only") {
    val df = Seq(
      (0L, "https://bad.org/x"),             // exact domain
      (1L, "https://a.bad.org/x"),           // subdomain suffix
      (2L, "https://notbad.org/x"),          // NOT a suffix match
      (3L, "https://ok.org/spam/page"),      // pattern
      (4L, "https://bad.org/spam"),          // both -> domain wins
      (5L, "https://ok.org/fine")
    ).toDF("doc_id", "url")
    val got = WebOps.urlFilter(df, "url", Seq("bad.org"), Seq("/spam"))
      .orderBy("doc_id").select("block_reason", "url_ok").collect()
      .map(r => (Option(r.getString(0)), r.getBoolean(1))).toSeq
    assert(got == Seq(Some("domain") -> false, Some("domain") -> false,
      None -> true, Some("pattern") -> false, Some("domain") -> false,
      None -> true))
  }

  test("urlFilterByTable agrees with the literal domain path") {
    val urls = Seq(
      (0L, "https://bad.org/x"), (1L, "https://a.b.bad.org/x"),
      (2L, "https://notbad.org/x"), (3L, "https://ok.org/y")
    ).toDF("doc_id", "url")
    val blocked = Seq("bad.org").toDF("domain")
    val viaTable = WebOps.urlFilterByTable(urls, "doc_id", "url", blocked)
      .orderBy("doc_id").select("doc_id", "url_ok")
      .as[(Long, Boolean)].collect().toSeq
    val viaLiteral = WebOps.urlFilter(urls, "url", Seq("bad.org"), Nil)
      .orderBy("doc_id").select("doc_id", "url_ok")
      .as[(Long, Boolean)].collect().toSeq
    assert(viaTable == viaLiteral)
    assert(viaTable.map(_._2) == Seq(false, false, true, true))
  }

  test("htmlToText: multiline scripts, comments, entity decode order") {
    val html =
      """<html><head><script>
        |  if (a < b && c > d) { alert("x"); }
        |</script><style>
        |  body { color: red; }
        |</style></head>
        |<body><p>A &amp;lt; B stays literal; 1 &lt; 2 decodes.</p>
        |<!-- hidden --></body></html>""".stripMargin
    val got = WebOps.htmlToText(Seq((1L, html)).toDF("id", "html"), "html")
      .head().getAs[String]("extracted_text")
    // &amp;lt; -> &lt; (one decode, not two); &lt; -> < ; markup gone
    assert(got == "A &lt; B stays literal; 1 < 2 decodes.", got)
  }

  test("WARC: multi-record archive file splits on the version magic") {
    import org.apache.spark.sql.functions._
    // five records concatenated into ONE archive file, as on disk
    val docs = Seq.tabulate(5)(i => (i.toLong, s"doc $i body " * (i + 1)))
      .toDF("doc_id", "text")
      .withColumn("url", concat(lit("https://w.org/"),
        col("doc_id").cast("string")))
      .withColumn("wdate", lit("2026-01-01T00:00:00Z"))
    val archive = docs.orderBy("doc_id")
      .select(WebOps.warcResponse("url", "wdate", "text").as("rec"))
      .collect().map(_.getString(0)).mkString("")
    val dir = tmpDir("warc")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "crawl.warc"),
      archive.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // text payloads cannot contain the magic -> lineSep splits records
    val rows = spark.read.option("lineSep", "WARC/1.1\r\n").text(dir)
      .filter(length(col("value")) > 0)
    val parsed = WebOps.parseWarc(rows, "value")
    assert(parsed.count() == 5)
    assert(parsed.filter(col("warc_ok")).count() == 5)
    val back = parsed.select("target_uri", "payload")
      .as[(String, String)].collect().toMap
    assert(back("https://w.org/3") == "doc 3 body " * 4)
  }

  test("WARC: truncated and header-damaged records flag warc_ok false") {
    val good = Seq((0L, "https://w.org/0", "2026-01-01T00:00:00Z", "payload"))
      .toDF("doc_id", "url", "wdate", "text")
      .select(WebOps.warcResponse("url", "wdate", "text").as("rec"))
      .head().getString(0)
    val cases = Seq(
      good.dropRight(12),                       // payload cut short
      good.replace("Content-Length", "X-Len"),  // length header gone
      "not a warc record at all")
    val parsed = WebOps.parseWarc(cases.toDF("rec"), "rec")
    assert(parsed.filter(org.apache.spark.sql.functions.col("warc_ok"))
      .count() == 0)
    // the intact record parses clean through the same code path
    assert(WebOps.parseWarc(Seq(good).toDF("rec"), "rec")
      .head().getAs[Boolean]("warc_ok"))
  }

  test("extractAnchors: hrefs + direct text; empty hrefs dropped") {
    import spark.implicits._
    val html =
      """<html><body>
        |<a href="https://a.example.com/x">first link</a>
        |<p>noise</p>
        |<a rel="nofollow" class="z" href="http://b.example.com">B</a>
        |<a href="">empty href</a>
        |<a name="anchor-only">no href attr</a>
        |</body></html>""".stripMargin
    val got = WebOps.extractAnchors(Seq((7L, html)).toDF("id", "html"),
      "id", "html").orderBy("href").collect()
      .map(r => (r.getAs[String]("href"), r.getAs[String]("anchor_text")))
    assert(got.toSeq == Seq(
      ("http://b.example.com", "B"),
      ("https://a.example.com/x", "first link")))
  }
}
