package graft.ops

import org.apache.spark.sql.functions._
import graft.dftly.SparkTestBase

class WebTextSpec extends SparkTestBase {
  import spark.implicits._

  private def strip1(html: String): String =
    Seq(html).toDF("h").select(WebText.stripHtml(col("h"))).as[String].head()

  test("stripHtml removes script/style WITH content, tags leave a space") {
    assert(strip1("<p>a</p><p>b</p>") == "a b")
    assert(strip1("<script>var x = '<p>not text</p>';</script>hello") == "hello")
    assert(strip1("<STYLE type=x>p { color: red }</style>world") == "world")
    assert(strip1("keep<!-- secret -->this") == "keep this")
    // whole <head> drops (title/meta are chrome), <header> does NOT
    assert(strip1("<head><title>Site</title></head><body>text</body>") == "text")
    assert(strip1("<header>Top nav</header>body") == "Top nav body")
  }

  test("stripHtml decodes entities exactly once, &amp; last") {
    assert(strip1("a &amp; b") == "a & b")
    assert(strip1("&lt;tag&gt;") == "<tag>")
    // &amp;lt; is the LITERAL string "&lt;" — must not double-decode to <
    assert(strip1("&amp;lt;") == "&lt;")
    assert(strip1("x&nbsp;&nbsp;y") == "x y")
    assert(strip1("it&#39;s &quot;q&quot;") == "it's \"q\"")
  }

  test("stripHtml decodes numeric character references, decimal and hex") {
    assert(strip1("It&#8217;s here") == "It’s here")
    assert(strip1("a &#x2019;b&#X2019; c") == "a ’b’ c")
    assert(strip1("&#169; 2024") == "© 2024")
    assert(strip1("&#x1F600;") == new String(Character.toChars(0x1F600))) // astral
    // the decode-once discipline extends to numerics: &amp;#8217; is the
    // LITERAL &#8217;
    assert(strip1("&amp;#8217;") == "&#8217;")
    // every ampersand form decodes last
    assert(strip1("a &#38; b &#x26; c &#038; d") == "a & b & c & d")
    // invalid refs stay literal: no digits, unterminated, surrogate,
    // out of range, overlong
    assert(strip1("&#; &#x; &#8217 &#xD800; &#1114112; &#999999999;") ==
      "&#; &#x; &#8217 &#xD800; &#1114112; &#999999999;")
    // adjacent and back-to-back refs
    assert(strip1("&#65;&#66;&#67;") == "ABC")
  }

  test("stripHtml is null-safe and collapses all whitespace") {
    assert(strip1("  a\t\nb  c ") == "a b c")
    val n = Seq[Option[String]](None).toDF("h")
      .select(WebText.stripHtml(col("h"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("extractUrls finds urls in order, stopping at delimiters") {
    val got = Seq("see https://a.com/x, then (http://b.org/y) and \"https://c.net\".")
      .toDF("t").select(WebText.extractUrls(col("t"))).as[Seq[String]].head()
    assert(got == Seq("https://a.com/x", "http://b.org/y", "https://c.net"))
  }

  test("urlHost: lowercases, skips userinfo, stops at port/path, null on non-URL") {
    val rows = Seq(
      "https://User:pw@Sub.EXAMPLE.com:8443/p?q#f",
      "http://plain.org",
      "not a url").toDF("u")
      .select(WebText.urlHost(col("u"))).as[Option[String]].collect()
    assert(rows(0).contains("sub.example.com"))
    assert(rows(1).contains("plain.org"))
    assert(rows(2).isEmpty)
  }

  test("registrableDomain: two-label default, listed second-level suffixes take three") {
    val cases = Seq(
      "shop.example.co.uk" -> "example.co.uk",
      "a.b.c.example.com" -> "example.com",
      "example.com" -> "example.com",
      "co.uk" -> "co.uk",        // bare suffix: nothing registrable above it
      "localhost" -> "localhost",
      "news.site.com.au" -> "site.com.au")
    val got = cases.map(_._1).toDF("h")
      .select(WebText.registrableDomain(col("h"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("normalizeUnicode matches the hand-written Unicode-table expectations") {
    val df = graft.SparkEntry.UnicodeCases.map { case (tid, raw, _, _) => (tid, raw) }
      .toDF("tid", "raw")
      .select(col("tid"),
        WebText.normalizeUnicode(col("raw"), "NFC").as("nfc"),
        WebText.normalizeUnicode(col("raw"), "NFKC").as("nfkc"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    graft.SparkEntry.UnicodeCases.zip(df).foreach {
      case ((tid, _, expNfc, expNfkc), (gtid, gotNfc, gotNfkc)) =>
        assert(tid == gtid)
        assert(gotNfc == expNfc, s"case $tid NFC")
        assert(gotNfkc == expNfkc, s"case $tid NFKC")
    }
  }

  test("canonicalizeUrl: fixture expectations hold and the op is idempotent") {
    val cases = graft.SparkEntry.UrlCanonCases
    val got = cases.map { case (tid, raw, _) => (tid, raw) }.toDF("tid", "raw")
      .select(col("tid"), WebText.canonicalizeUrl(col("raw")).as("c"))
      .as[(Long, String)].collect().toMap
    cases.foreach { case (tid, _, expected) =>
      assert(got(tid) == expected, s"case $tid")
    }
    // canonical form is a fixed point — canonicalizing twice changes nothing
    val twice = cases.map { case (tid, raw, _) => (tid, raw) }.toDF("tid", "raw")
      .select(col("tid"),
        WebText.canonicalizeUrl(WebText.canonicalizeUrl(col("raw"))).as("c"))
      .as[(Long, String)].collect().toMap
    assert(twice == got)
    // the canonical key actually merges variant spellings of one page
    val variants = Seq(
      "https://Site.com/a?utm_source=x",
      "HTTPS://site.com:443/a#top",
      "https://site.com/a").toDF("u")
    val keys = variants.select(WebText.canonicalizeUrl(col("u"))).distinct().count()
    assert(keys == 1)
  }

  test("registrableDomainPsl: full PSL algorithm — wildcards, exceptions, private suffixes") {
    val rules = graft.ops.expr.PslRules.parse(
      """// comment
        |uk
        |co.uk
        |ck
        |*.ck
        |!www.ck
        |github.io   // trailing junk after whitespace is ignored per spec
        |""".stripMargin)
    def rd(h: String): String =
      Seq(h).toDF("h")
        .select(WebText.registrableDomainPsl(col("h"), rules)).as[String].head()
    assert(rd("a.b.example.co.uk") == "example.co.uk")
    assert(rd("x.blog.github.io") == "blog.github.io")
    assert(rd("foo.bar.ck") == "foo.bar.ck") // *.ck → bar.ck is a suffix
    assert(rd("www.ck") == "www.ck")         // !www.ck beats the wildcard
    assert(rd("a.www.ck") == "www.ck")
    assert(rd("example.com") == "example.com") // unlisted TLD: implicit *
    assert(rd("co.uk") == "co.uk")           // host IS a suffix: pass through
    assert(rd("localhost") == "localhost")
    // null-safety
    val n = Seq[Option[String]](None).toDF("h")
      .select(WebText.registrableDomainPsl(col("h"), rules)).collect()(0)
    assert(n.isNullAt(0))
  }

  test("registrableDomainPsl: an exception rule prevails over a LONGER normal rule") {
    // the published algorithm: "if more than one rule matches, the
    // prevailing rule is the one which is an exception rule" — at any
    // length, so a.b.c (3 labels) must NOT shadow !b.c
    val rules = graft.ops.expr.PslRules.parse("c\nb.c\na.b.c\n!b.c\n")
    def rd(h: String): String =
      Seq(h).toDF("h")
        .select(WebText.registrableDomainPsl(col("h"), rules)).as[String].head()
    // exception !b.c → public suffix c → registrable b.c, even though the
    // 3-label normal rule a.b.c also matches
    assert(rd("x.a.b.c") == "b.c")
    assert(rd("b.c") == "b.c")
  }

  test("registrableDomainPsl with the default rules matches the compact registrableDomain") {
    val hosts = Seq("a.example.co.uk", "b.example.com", "x.y.com.au",
      "single", "deep.sub.example.co.jp", "example.co.za")
    val df = hosts.toDF("h").select(
      WebText.registrableDomain(col("h")).as("compact"),
      WebText.registrableDomainPsl(col("h"),
        graft.ops.expr.PslRules.default).as("psl"))
    assert(df.filter(col("compact") =!= col("psl")).count() == 0)
  }

  test("normalizeUnicode is idempotent and rejects bad forms") {
    val texts = graft.SparkEntry.UnicodeCases.map(_._2).toDF("t")
    val once = texts.select(WebText.normalizeUnicode(col("t"), "NFKC").as("x"))
    val twice = once.select(WebText.normalizeUnicode(col("x"), "NFKC").as("y"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
    intercept[IllegalArgumentException] {
      texts.select(WebText.normalizeUnicode(col("t"), "NFX")).collect()
    }
  }
}
