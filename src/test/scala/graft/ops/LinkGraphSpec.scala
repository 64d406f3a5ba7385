package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Link-graph extraction + PageRank: hand-computed fixtures for every
  * resolution rule, closed-form rank checks on canonical graphs, and the
  * mass-conservation invariant.
  */
class LinkGraphSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  test("linkHost resolution rules: every branch") {
    val page = "https://src.test/dir/page.html"
    val cases = Seq(
      ("http://other.test/x", "other.test"),
      ("HTTPS://UPPER.TEST/x", "upper.test"),
      ("//proto.test/y", "proto.test"),
      ("/rooted", "src.test"),
      ("relative/path", "src.test"),
      ("?query=1", "src.test"),
      ("#frag", null),
      ("", null),
      ("mailto:a@b.test", null),
      ("javascript:void(0)", null),
      ("tel:+1555", null),
      ("ftp://files.test/z", null),
      ("data:text/plain,hi", null)
    )
    val df = cases.toDF("href", "expected")
      .select(col("expected"), LinkGraph.linkHost(col("href"), lit(page)).as("got"))
    df.collect().foreach { r =>
      assert(Option(r.getString(1)) == Option(r.getString(0)),
        s"href case expected ${r.getString(0)}, got ${r.getString(1)}")
    }
  }

  test("hrefs: double/single/unquoted, case-insensitive, whitespace") {
    val html = """<a href="http://a.test/1">x</a>
      |<A HREF='http://b.test/2'>y</A>
      |<a href = "http://c.test/3">z</a>
      |<a href=http://d.test/4>w</a>
      |<area href="/rel">""".stripMargin
    val got = Seq(Tuple1(html)).toDF("h")
      .select(LinkGraph.hrefs(col("h")).as("u"))
      .as[Seq[String]].head().toSet
    assert(got == Set("http://a.test/1", "http://b.test/2",
      "http://c.test/3", "http://d.test/4", "/rel"))
  }

  test("hrefs/anchors: data-href and ng-href are NOT links") {
    val html = """<a data-href="http://tpl.test/x" href="http://real.test/1">r</a>
      |<div ng-href='http://ng.test/2'>t</div>""".stripMargin
    val got = Seq(Tuple1(html)).toDF("h")
      .select(LinkGraph.hrefs(col("h")).as("u"))
      .as[Seq[String]].head().toSet
    assert(got == Set("http://real.test/1"))
    val anchors = Seq(Tuple1(html)).toDF("h")
      .select(LinkGraph.anchors(col("h")).as("a"))
      .selectExpr("inline(a)").as[(String, String)].collect().toSeq
    assert(anchors == Seq(("http://real.test/1", "r")))
  }

  test("baseHref: first base-with-href wins; quoting forms; no-href base " +
    "skipped") {
    val cases = Seq(
      ("""<base href="https://b.test/dir/"><base href="https://c.test/">""",
        "https://b.test/dir/"),
      ("<BASE HREF='//proto.test/x'>", "//proto.test/x"),
      ("<base href=/rooted/>", "/rooted/"),
      ("""<base target="_blank"><base href="https://late.test/">""",
        "https://late.test/"),
      ("<base target=\"_blank\">", null),
      ("no base at all", null),
      ("<base href=\"\">", null))
    cases.toDF("html", "expected")
      .select(col("expected"), LinkGraph.baseHref(col("html")).as("got"))
      .collect().foreach { r =>
        assert(Option(r.getString(1)) == Option(r.getString(0)),
          s"baseHref expected ${r.getString(0)}, got ${r.getString(1)}")
      }
  }

  test("baseHost: absolute/protocol-relative bases change the host; " +
    "rooted/relative/non-web bases do not") {
    val cases = Seq(
      ("""<base href="https://cdn.test/assets/">""", "cdn.test"),
      ("<base href='//other.test/'>", "other.test"),
      ("<base href=\"/subdir/\">", null),
      ("<base href=\"sub/\">", null),
      ("<base href=\"mailto:x@y\">", null),
      ("none", null))
    cases.toDF("html", "expected")
      .select(col("expected"), LinkGraph.baseHost(col("html")).as("got"))
      .collect().foreach { r =>
        assert(Option(r.getString(1)) == Option(r.getString(0)),
          s"baseHost expected ${r.getString(0)}, got ${r.getString(1)}")
      }
  }

  test("hostEdges/anchorTexts honor <base href>: relative links attribute " +
    "to the base host, absolute links unaffected") {
    val html =
      """<base href="https://based.test/root/">
        |<a href="rel/p">rel anchor</a>
        |<a href="/rooted">rooted</a>
        |<a href="http://abs.test/q">abs</a>
        |<a href="//pr.test/r">pr</a>""".stripMargin
    val df = Seq(("https://src.test/p", html)).toDF("url", "html")
    val edges = LinkGraph.hostEdges(df, "url", "html")
      .as[(String, String)].collect().toSet
    assert(edges == Set(
      ("src.test", "based.test"), ("src.test", "abs.test"),
      ("src.test", "pr.test")))
    val anchors = LinkGraph.anchorTexts(df, "url", "html")
      .as[(String, String, String)].collect().toSet
    assert(anchors == Set(
      ("src.test", "based.test", "rel anchor"),
      ("src.test", "based.test", "rooted"),
      ("src.test", "abs.test", "abs"),
      ("src.test", "pr.test", "pr")))
    // a same-host base turns relative links into self-loops (dropped);
    // a rooted base leaves the page host in charge
    val sameHost = Seq(("https://src.test/p",
      """<base href="https://src.test/x/"><a href="rel">r</a>""" +
        """<a href="http://abs.test/q">a</a>""")).toDF("url", "html")
    assert(LinkGraph.hostEdges(sameHost, "url", "html")
      .as[(String, String)].collect().toSet == Set(("src.test", "abs.test")))
    val rootedBase = Seq(("https://src.test/p",
      """<base href="/sub/"><a href="http://x.test/1">x</a>""" +
        """<a href="rel">r</a>""")).toDF("url", "html")
    assert(LinkGraph.hostEdges(rootedBase, "url", "html")
      .as[(String, String)].collect().toSet == Set(("src.test", "x.test")))
  }

  test("domainRank: per-domain mass is the sum of its hosts; total mass " +
    "conserved at 1") {
    val edges = Seq(
      ("a.x.co.uk", "b.y.co.uk"), ("b.y.co.uk", "c.x.co.uk"),
      ("c.x.co.uk", "a.x.co.uk"), ("a.x.co.uk", "d.z.test"))
      .toDF("src", "dst")
    val hosts = LinkGraph.pageRank(edges, iterations = 3)
    val hostMap = hosts.as[(String, Double)].collect().toMap
    val doms = LinkGraph.domainRank(hosts).as[(String, Double)]
      .collect().toMap
    assert(doms.keySet == Set("x.co.uk", "y.co.uk", "z.test"))
    assert(math.abs(doms("x.co.uk") -
      (hostMap("a.x.co.uk") + hostMap("c.x.co.uk"))) < 1e-12)
    assert(math.abs(doms("y.co.uk") - hostMap("b.y.co.uk")) < 1e-12)
    assert(math.abs(doms.values.sum - 1.0) < 1e-9)
  }

  test("hostEdges: decoys and self-loops drop, output distinct") {
    val html =
      """<a href="http://dst.test/a">1</a>
        |<a href="http://dst.test/b">same host again</a>
        |<a href="/self">self</a>
        |<a href="mailto:x@y">m</a>
        |<a href="https://src.test/other">self abs</a>""".stripMargin
    val df = Seq(("https://src.test/p", html)).toDF("url", "html")
    val edges = LinkGraph.hostEdges(df, "url", "html")
      .as[(String, String)].collect().toSet
    assert(edges == Set(("src.test", "dst.test")))
  }

  test("anchors: quote variants, inner markup stripped, whitespace collapsed") {
    val html = "<a href=\"http://a.test/1\">First <b>bold</b>\n  link</a>" +
      "<A HREF='http://b.test/2' class=x>second</A>" +
      "<a href=\"/r\"></a>"
    val got = Seq(Tuple1(html)).toDF("h")
      .select(LinkGraph.anchors(col("h")).as("a"))
      .selectExpr("inline(a)")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("http://a.test/1", "First bold link"),
      ("http://b.test/2", "second"),
      ("/r", "")))
  }

  test("anchors: unquoted legacy hrefs extract too (parity with hrefs())") {
    val html = "<a href=http://u.test/legacy>unquoted target</a>"
    val got = Seq(Tuple1(html)).toDF("h")
      .select(LinkGraph.anchors(col("h")).as("a"))
      .selectExpr("inline(a)").as[(String, String)].collect().toSeq
    assert(got == Seq(("http://u.test/legacy", "unquoted target")))
    // the same markup must produce BOTH the edge and the anchor row
    val df = Seq(("https://src.test/p", html)).toDF("url", "html")
    assert(LinkGraph.hostEdges(df, "url", "html").count() == 1)
    assert(LinkGraph.anchorTexts(df, "url", "html").count() == 1)
  }

  test("anchorTexts: cross-host only, empty anchors drop, occurrences kept") {
    val html =
      """<a href="http://dst.test/a">go <i>there</i></a>
        |<a href="http://dst.test/b">go there</a>
        |<a href="/local">Home</a>
        |<a href="https://src.test/other">self abs</a>
        |<a href="http://dst.test/c"> </a>""".stripMargin
    val df = Seq(("https://src.test/p", html)).toDF("url", "html")
    val got = LinkGraph.anchorTexts(df, "url", "html")
      .as[(String, String, String)].collect().toSeq.sorted
    // two occurrences of the same normalized anchor are BOTH kept
    assert(got == Seq(
      ("src.test", "dst.test", "go there"),
      ("src.test", "dst.test", "go there")))
  }

  test("pageRank: 2-cycle is the uniform fixpoint exactly") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = LinkGraph.pageRank(e, iterations = 4).as[(String, Double)]
      .collect().toMap
    assert(r == Map("a" -> 0.5, "b" -> 0.5))
  }

  test("pageRank: dangling mass redistributes (hand-computed)") {
    // a -> b, b dangling; N=2, d=0.85, one iteration from uniform:
    // D0 = 0.5; r1(a) = 0.075 + 0.85*(0 + 0.25) = 0.2875
    //           r1(b) = 0.075 + 0.85*(0.5 + 0.25) = 0.7125
    val e = Seq(("a", "b")).toDF("src", "dst")
    val r = LinkGraph.pageRank(e, iterations = 1).as[(String, Double)]
      .collect().toMap
    assert(math.abs(r("a") - 0.2875) < 1e-12)
    assert(math.abs(r("b") - 0.7125) < 1e-12)
  }

  test("pageRank: mass conserved at 1.0 across iterations") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"))
      .toDF("src", "dst") // d is a source-only vertex; none dangling except none
    val r = LinkGraph.pageRank(e, iterations = 7)
    val total = r.agg(sum(col("rank"))).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("pageRank: duplicate edge rows do not double-count") {
    val e1 = Seq(("a", "b")).toDF("src", "dst")
    val e3 = Seq(("a", "b"), ("a", "b"), ("a", "b")).toDF("src", "dst")
    val r1 = LinkGraph.pageRank(e1, iterations = 2).as[(String, Double)].collect().toMap
    val r3 = LinkGraph.pageRank(e3, iterations = 2).as[(String, Double)].collect().toMap
    assert(r1 == r3)
  }

  test("pageRank: the edge table exchanges ONCE, not once per iteration " +
    "(the 100 TB contract, measured with broadcast joins disabled)") {
    // At test scale the vertex-sized rank table broadcasts and hides the
    // edge side's join distribution entirely. Disable broadcasting to get
    // the cluster-scale sort-merge plan, then count total shuffle WRITE
    // records across the whole call: the cached edge table is
    // hash-partitioned on src at build, so each iteration's contribution
    // join re-exchanges only the VERTEX-sized rank frame. If the edge side
    // re-shuffled per iteration, the total would grow by ~|E| per
    // iteration (5 × 60k here) and blow the budget.
    val nEdges = 60000L
    val hosts = 600L
    val iters = 5
    val e = spark.range(nEdges).select(
      concat(lit("h"), (col("id") % hosts).cast("string")).as("src"),
      concat(lit("h"), ((col("id") * 131 + 7) % hosts).cast("string")).as("dst"))
    val written = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) written.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        ()
      }
    }
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = LinkGraph.pageRank(e, iterations = iters)
      assert(r.count() == hosts)
      var prev = -1L
      var stable = written.get()
      var waited = 0
      while (stable != prev && waited < 100) {
        prev = stable; Thread.sleep(100); waited += 1; stable = written.get()
      }
      // Budget: the one-time distinct/degree/repartition chain is a small
      // multiple of |E| (distinct partials + join exchange + repartition
      // ≤ ~4|E| worst case); per-iteration traffic is vertex-sized — the
      // dominant term is the contribution partial-aggregate, up to
      // #tasks × |V| records (32 × 600 here), plus a few |V|-sized
      // exchanges. 40|V| per iteration covers that with slack while
      // staying far under the no-reuse regime (an extra |E| per iteration
      // ≈ +300k would overshoot this budget by ~2×).
      val budget = 6L * nEdges + iters * 40L * hosts
      assert(stable <= budget,
        s"total shuffle records $stable exceed budget $budget — " +
          "the edge table is re-exchanging inside the iteration loop")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("degreeStats: hand-computed, sink and source vertices present") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val s = LinkGraph.degreeStats(e).as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(s == Map("a" -> ((2L, 0L)), "b" -> ((1L, 1L)), "c" -> ((0L, 2L))))
  }
}
