package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase
import graft.ops.expr.RobotsMatch

/** robots.txt evaluation (RFC 9309): group selection, longest-match
  * precedence, allow-wins-ties, wildcard/anchor patterns, default-allow,
  * and the pipeline verb.
  */
class RobotsSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def allowed(txt: String, path: String, agent: String = "*"): Boolean =
    RobotsMatch.allowed(RobotsMatch.compileRules(txt, agent), path)

  test("longest match wins; allow wins ties; no match allows") {
    val txt = "User-agent: *\nDisallow: /private/\nAllow: /private/ok"
    assert(allowed(txt, "/private/ok-page"))  // A len 11 > D len 9
    assert(!allowed(txt, "/private/secret"))
    assert(allowed(txt, "/public"))
    // equal-length tie: allow wins (RFC)
    val tie = "User-agent: *\nAllow: /p\nDisallow: /p"
    assert(allowed(tie, "/page"))
  }

  test("specific agent group preferred over *, case-insensitively, merged") {
    val txt =
      "User-agent: GraftBot\nDisallow: /a\n\n" +
        "User-agent: *\nDisallow: /\n\n" +
        "User-agent: graftbot\nDisallow: /b"
    // graftbot: the two graftbot groups merge; the * group is ignored
    assert(!allowed(txt, "/a/x", "graftbot"))
    assert(!allowed(txt, "/b", "GRAFTBOT"))
    assert(allowed(txt, "/c", "graftbot"))
    // another agent falls to *: everything blocked
    assert(!allowed(txt, "/c", "otherbot"))
  }

  test("wildcard and end-anchor patterns") {
    val txt = "User-agent: *\nDisallow: /x*z$"
    assert(!allowed(txt, "/xz"))
    assert(!allowed(txt, "/x-anything-z"))
    assert(allowed(txt, "/xz/deep")) // does not END in z
    assert(allowed(txt, "/y"))
    // bare anchor: only the exact path
    val root = "User-agent: *\nDisallow: /$"
    assert(!allowed(root, "/"))
    assert(allowed(root, "/page"))
    // mid-pattern wildcard without anchor
    val mid = "User-agent: *\nDisallow: /a*b"
    assert(!allowed(mid, "/aXXb/tail"))
    assert(allowed(mid, "/a"))
  }

  test("empty Disallow is no rule; comments and unknown directives skipped") {
    assert(allowed("User-agent: *\nDisallow:", "/anything"))
    val txt =
      "# blanket\nUser-agent: * # all\nCrawl-delay: 5\nDisallow: /a # nope\nSitemap: https://x/s.xml"
    assert(!allowed(txt, "/a"))
    assert(allowed(txt, "/b"))
  }

  test("null robots (missing file) defaults to allowed in the kernel") {
    val df = Seq(
      (1L, Some("User-agent: *\nDisallow: /"), "/x"),
      (2L, None, "/x")
    ).toDF("id", "txt", "path")
    val out = df.select(col("id"),
      WebText.robotsAllowed(WebText.robotsRules(col("txt")), col("path")).as("ok"))
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true))
  }

  test("urlPath extracts path+query, '/' default, null on non-URLs") {
    val df = Seq("https://a.com/x/y?q=1#frag", "https://a.com", "nonsense")
      .toDF("u")
    val got = df.select(WebText.urlPath(col("u"))).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("/x/y?q=1"), Some("/"), None))
  }

  test("percent-encoding normalization (RFC 9309 §2.2.2)") {
    // unreserved octet: encoded path matches a literal rule and vice versa
    val tilde = "User-agent: *\nDisallow: /a~b"
    assert(!allowed(tilde, "/a%7Eb"))
    assert(!allowed(tilde, "/a%7eb"))
    val encRule = "User-agent: *\nDisallow: /a%7Eb"
    assert(!allowed(encRule, "/a~b"))
    // reserved octet stays encoded; hex case is canonicalized
    val slash = "User-agent: *\nDisallow: /a%2Fb"
    assert(!allowed(slash, "/a%2fb"))
    assert(allowed(slash, "/a/b")) // literal '/' is NOT the encoded octet
    // %2A / %24 must NOT decode into * / $ metacharacters
    val star = "User-agent: *\nDisallow: /x%2Az"
    assert(!allowed(star, "/x%2az"))
    assert(allowed(star, "/x-anything-z"))
    // malformed triplets pass through literally
    assert(!allowed("User-agent: *\nDisallow: /p%zz", "/p%zz"))
    assert(!allowed("User-agent: *\nDisallow: /p%", "/p%"))
  }

  test("pipeline robotsFilter verb: filter and mark modes") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /no")
    ).toDF("host", "robots_txt")
    val docs = Seq(
      (1L, "https://a.com/ok"), (2L, "https://a.com/no/x"),
      (3L, "https://b.com/anything") // no robots row -> allowed
    ).toDF("id", "url")
    def run(mode: String) = graft.pipeline.Pipeline.run(spark,
      s"""source: docs
         |steps:
         |  - robotsFilter: {url: url, robots: robots, mode: $mode}
         |""".stripMargin,
      name => if (name == "docs") docs else robots)
    assert(run("filter").select("id").as[Long].collect().toSet == Set(1L, 3L))
    val marked = run("mark").select(col("id"), col("robots_ok"))
      .as[(Long, Boolean)].collect().toMap
    assert(marked == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("robotsFilter: unparseable URL is an explicit default-allow, not a null-drop") {
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /no"))
      .toDF("host", "robots_txt")
    val docs = Seq(
      (1L, "https://a.com/no/x"), (2L, "not a url at all")
    ).toDF("id", "url")
    def run(mode: String) = graft.pipeline.Pipeline.run(spark,
      s"""source: docs
         |steps:
         |  - robotsFilter: {url: url, robots: robots, mode: $mode}
         |""".stripMargin,
      name => if (name == "docs") docs else robots)
    // the unparseable-URL row survives filter mode (robots cannot be
    // consulted -> protocol default-allow, made explicit)
    assert(run("filter").select("id").as[Long].collect().toSet == Set(2L))
    val marked = run("mark").select(col("id"), col("robots_ok"))
      .as[(Long, Boolean)].collect().toMap
    assert(marked == Map(1L -> false, 2L -> true))
  }
}
