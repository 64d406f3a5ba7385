package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Sitemap parsing: urlset entries with optional hints, sitemapindex
  * children, robots.txt discovery lines, entity decoding, and the
  * malformed-hint tolerance contract.
  */
class SitemapsSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://ex.test/a?x=1&amp;y=2</loc>
      |    <lastmod>2024-03-01</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc> https://ex.test/bare </loc></url>
      |  <url>
      |    <loc>https://ex.test/weird</loc>
      |    <priority>not-a-number</priority>
      |  </url>
      |</urlset>""".stripMargin

  test("urlset entries: loc decoded and trimmed, hints optional, bad priority null") {
    val got = Seq(Tuple1(urlset)).toDF("x")
      .select(Sitemaps.sitemapUrls(col("x")).as("u"))
      .selectExpr("inline(u)")
      .as[(String, Option[String], Option[String], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("https://ex.test/a?x=1&y=2", Some("2024-03-01"), Some("daily"), Some(0.8)),
      ("https://ex.test/bare", None, None, None),
      ("https://ex.test/weird", None, None, None)))
  }

  test("sitemapindex children; urlset extraction ignores them and vice versa") {
    val index =
      """<sitemapindex>
        |  <sitemap><loc>https://ex.test/s1.xml</loc>
        |    <lastmod>2024-01-02T03:04:05+00:00</lastmod></sitemap>
        |  <sitemap><loc>https://ex.test/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val kids = Seq(Tuple1(index)).toDF("x")
      .select(Sitemaps.sitemapChildren(col("x")).as("k"))
      .selectExpr("inline(k)").as[(String, Option[String])].collect().toSeq
    assert(kids == Seq(
      ("https://ex.test/s1.xml", Some("2024-01-02T03:04:05+00:00")),
      ("https://ex.test/s2.xml", None)))
    val noUrls = Seq(Tuple1(index)).toDF("x")
      .select(size(Sitemaps.sitemapUrls(col("x")))).as[Int].head()
    assert(noUrls == 0)
    val noKids = Seq(Tuple1(urlset)).toDF("x")
      .select(size(Sitemaps.sitemapChildren(col("x")))).as[Int].head()
    assert(noKids == 0)
  }

  test("xmlUnescape: amp last, so double-escaped entities stay literal") {
    val got = Seq(Tuple1("a&amp;lt;b &lt;c&gt; &quot;d&apos; &amp;e")).toDF("s")
      .select(Sitemaps.xmlUnescape(col("s"))).as[String].head()
    assert(got == "a&lt;b <c> \"d' &e")
  }

  test("xmlUnescape: numeric character references decode once — decimal, " +
    "hex, and the ampersand forms last") {
    val cases = Seq(
      // &#38; / &#x26; are legal loc escapes and must decode to &
      ("https://e.test/?a=1&#38;b=2", "https://e.test/?a=1&b=2"),
      ("https://e.test/?a=1&#x26;b=2", "https://e.test/?a=1&b=2"),
      // other refs: decimal, hex, zero-padded
      ("d&#45;e &#x2F; f&#0045;g", "d-e / f-g"),
      // decode-once: an escaped ref stays literal
      ("x&amp;#60;y", "x&#60;y"),
      ("x&#38;lt;y", "x&lt;y"),
      // malformed refs stay literal text
      ("no&#;semi &#999999999; &#xZZ;", "no&#;semi &#999999999; &#xZZ;"))
    cases.toDF("s", "expected")
      .select(col("expected"), Sitemaps.xmlUnescape(col("s")).as("got"))
      .collect().foreach { r =>
        assert(r.getString(1) == r.getString(0),
          s"expected ${r.getString(0)}, got ${r.getString(1)}")
      }
  }

  test("lastmod: the W3C-datetime ladder — fractional seconds (any length)," +
    " minute precision, month and year forms all parse; garbage is null") {
    val docs = Seq(
      ("2024-03-01", "2024-03-01 00:00:00"),
      ("2024-03-01T12:00:00Z", "2024-03-01 12:00:00"),
      ("2024-03-01T12:00:00+02:00", "2024-03-01 10:00:00"),
      ("2024-03-01T12:00:00.5Z", "2024-03-01 12:00:00.5"),
      ("2024-03-01T12:00:00.25Z", "2024-03-01 12:00:00.25"),
      ("2024-03-01T12:00:00.125Z", "2024-03-01 12:00:00.125"),
      ("2024-03-01T12:00:00.123456789Z", "2024-03-01 12:00:00.123"),
      ("2024-03-01T12:00Z", "2024-03-01 12:00:00"),
      ("2024-03", "2024-03-01 00:00:00"),
      ("2024", "2024-01-01 00:00:00"),
      ("soon", null))
      .zipWithIndex.map { case ((lm, want), i) =>
        (i.toLong,
          s"<urlset><url><loc>https://e.test/$i</loc>" +
            s"<lastmod>$lm</lastmod></url></urlset>", want)
      }.toDF("i", "xml", "want")
    val got = Sitemaps.parseSitemaps(docs, "xml")
      .select(col("want"), col("lastmod").cast("string").as("got"))
      .collect()
    assert(got.length == 11)
    got.foreach { r =>
      assert(Option(r.getString(1)) == Option(r.getString(0)),
        s"lastmod expected ${r.getString(0)}, got ${r.getString(1)}")
    }
  }

  test("sitemapsFromRobots: case-insensitive field, order kept") {
    val robots =
      """User-agent: *
        |Disallow: /private
        |Sitemap: https://ex.test/sitemap.xml
        |sitemap: https://ex.test/news.xml
        |# Sitemap: https://ex.test/commented.xml is still matched? no - has leading #
        |""".stripMargin
    val got = Seq(Tuple1(robots)).toDF("r")
      .select(Sitemaps.sitemapsFromRobots(col("r")).as("s"))
      .as[Seq[String]].head()
    assert(got == Seq("https://ex.test/sitemap.xml", "https://ex.test/news.xml"))
  }

  test("sitemaps pipeline verb matches the direct op") {
    val docs = Seq((7L, urlset)).toDF("doc_id", "xml")
    val viaVerb = graft.pipeline.Pipeline.run(spark,
      """source: docs
        |steps:
        |  - sitemaps: {xml: xml}
        |""".stripMargin, { case "docs" => docs; case n => fail(s"unexpected $n") })
      .select("doc_id", "loc", "kind").as[(Long, String, String)].collect().toSet
    val direct = Sitemaps.parseSitemaps(docs, "xml")
      .select("doc_id", "loc", "kind").as[(Long, String, String)].collect().toSet
    assert(viaVerb == direct && direct.nonEmpty)
  }

  test("parseSitemaps: urls and index children in one exploded frame, " +
    "lastmod parsed for both ISO forms") {
    val docs = Seq(
      (1L, urlset),
      (2L, "<sitemapindex><sitemap><loc>https://ex.test/child.xml</loc>" +
        "<lastmod>2024-05-06</lastmod></sitemap></sitemapindex>"))
      .toDF("doc_id", "xml")
    val got = Sitemaps.parseSitemaps(docs, "xml")
      .select(col("doc_id"), col("loc"), col("lastmod").cast("string"),
        col("kind"), col("priority"))
      .as[(Long, String, Option[String], String, Option[Double])]
      .collect().toSet
    assert(got == Set(
      (1L, "https://ex.test/a?x=1&y=2", Some("2024-03-01 00:00:00"), "url", Some(0.8)),
      (1L, "https://ex.test/bare", None, "url", None),
      (1L, "https://ex.test/weird", None, "url", None),
      (2L, "https://ex.test/child.xml", Some("2024-05-06 00:00:00"), "sitemap", None)))
  }
}
