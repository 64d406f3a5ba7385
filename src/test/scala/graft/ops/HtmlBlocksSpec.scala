package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase
import graft.ops.expr.HtmlContent

/** DOM-block main-content extraction: hand-derived block features (the
  * q86 oracle derivations), entity decode-once, the context rules, and
  * malformed-input leniency.
  */
class HtmlBlocksSpec extends SparkTestBase {

  import spark.implicits._

  private val rules = HtmlContent.ContentRules()

  // The good paragraph shared by q86's fixtures. Hand counts (derivation
  // for the oracle row): 3 sentences, 46 words, 220 chars
  // (99 + 1 + 93 + 1 + 26), 20 stopword hits (11 + 9 + 0: the×6, is×3,
  // in×2, and×2, it, for, are×2, as×2 — "we" is not in the compact list)
  // → stop_ratio 20/46 ≈ 0.4348 ≥ 0.20 and 220 > 200 ⇒ GOOD.
  val Para: String = graft.SparkEntry.HtmlFixturePara

  test("paragraph hand counts hold (the numbers the oracle pins)") {
    assert(Para.length == 220)
    assert(Para.split(" ").length == 46)
  }

  test("F1: nav chrome / good paragraph / link-list footer") {
    val html =
      "<html><head><title>T</title></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav>" +
        s"<p>$Para</p>" +
        "<div class=\"foot\"><a href=\"/tos\">Terms</a></div>" +
        "</body></html>"
    val bs = HtmlContent.blocks(html, rules)
    assert(bs.length == 3)

    // idx 0: the nav — chrome by declaration, 100% link text
    assert(bs(0).tag == "nav" && bs(0).inChrome)
    assert(bs(0).text == "Home About")
    assert(bs(0).nChars == 10 && bs(0).nWords == 2)
    assert(bs(0).linkDensity == 1.0 && bs(0).stopRatio == 0.0)
    assert(bs(0).label == "bad" && !bs(0).content)

    // idx 1: the content paragraph
    assert(bs(1).tag == "p" && !bs(1).inChrome)
    assert(bs(1).text == Para)
    assert(bs(1).nChars == 220 && bs(1).nWords == 46)
    assert(bs(1).linkDensity == 0.0 && bs(1).stopRatio == 20.0 / 46.0)
    assert(bs(1).label == "good" && bs(1).content)

    // idx 2: footer link list — short AND all-link, bad by link density
    assert(bs(2).tag == "div" && !bs(2).inChrome)
    assert(bs(2).text == "Terms")
    assert(bs(2).nChars == 5 && bs(2).nWords == 1)
    assert(bs(2).linkDensity == 1.0 && bs(2).label == "bad" && !bs(2).content)

    // head/title content dropped entirely
    assert(!bs.exists(_.text.contains("T ")))
    assert(HtmlContent.mainContent(html, rules) == Para)
  }

  test("F2: short block between two goods is rescued by context") {
    val html = s"<p>$Para</p><p>Nice short note.</p><p>$Para</p>"
    val bs = HtmlContent.blocks(html, rules)
    assert(bs.length == 3)
    assert(bs(1).text == "Nice short note.")
    assert(bs(1).nChars == 16 && bs(1).nWords == 3)
    assert(bs(1).label == "short" && bs(1).content) // good on BOTH sides
    assert(HtmlContent.mainContent(html, rules) ==
      s"$Para\nNice short note.\n$Para")
    // short at the page edge is NOT rescued (edges count as bad)
    val edge = HtmlContent.blocks(s"<p>Nice short note.</p><p>$Para</p>", rules)
    assert(edge(0).label == "short" && !edge(0).content)
  }

  test("F3: entities decode once in-pass; br and script split/drop") {
    val html = "<div>A &amp; B &#8217;x&#8217; costs &#x24;5<br>" +
      "second <script>var x=1;</script>part</div>"
    val bs = HtmlContent.blocks(html, rules)
    assert(bs.length == 2)
    assert(bs(0).text == "A & B ’x’ costs $5")
    assert(bs(0).nChars == 18 && bs(0).nWords == 6)
    // "A" lowercases + strips to the stopword "a": 1 hit / 6 words
    assert(bs(0).stopRatio == 1.0 / 6.0)
    assert(bs(0).label == "short" && !bs(0).content) // no good neighbors
    assert(bs(1).text == "second part")
    assert(bs(1).nChars == 11 && bs(1).nWords == 2)
    // decode-once: &amp;lt; is the literal &lt;, never <
    val once = HtmlContent.blocks("<p>a &amp;lt; b &amp;#36;</p>", rules)
    assert(once(0).text == "a &lt; b &#36;")
  }

  test("near-good: rescued by one good neighbor, dropped alone") {
    // 17 words, 3 stop hits (the, is, to) → 3/17 ≈ 0.176 ∈ [0.10, 0.20);
    // 114 chars ∈ [70, 200] ⇒ NEAR-GOOD
    val ng = "The quantum design method is shown here to produce " +
      "excellent robust devices more rapidly under testing conditions."
    val alone = HtmlContent.blocks(s"<p>$ng</p>", rules)
    assert(alone(0).nChars == 114 && alone(0).nWords == 17)
    assert(alone(0).stopRatio == 3.0 / 17.0)
    assert(alone(0).label == "near-good" && !alone(0).content)
    val byGood = HtmlContent.blocks(s"<p>$Para</p><p>$ng</p>", rules)
    assert(byGood(1).label == "near-good" && byGood(1).content)
  }

  test("lenient on malformed input: never throws") {
    for (h <- Seq(
      "", "<", "a < b", "<p>unclosed", "<p unterminated attr='x",
      "&#xZZ; &#; &amp", "<script>never closed", "<!-- open comment",
      "</div></div>text", "<a>link only", "<p><p><p>nested")) {
      HtmlContent.blocks(h, rules) // must not throw
      HtmlContent.mainContent(h, rules)
    }
    assert(HtmlContent.blocks("a < b", rules)(0).text == "a < b")
  }

  test("chrome state recovers from malformed nesting (outer close unwinds inner chrome)") {
    // closing </nav> while the inner <aside> is still open unwinds BOTH
    // from the tag stack; chrome state is derived from the stack, so the
    // paragraph after is NOT chrome (the old independent counter leaked
    // and marked the whole rest of the page chrome)
    val html = s"<nav><aside>menu</nav><p>$Para</p>"
    val bs = HtmlContent.blocks(html, rules)
    val para = bs.find(_.text == Para).get
    assert(!para.inChrome && para.label == "good" && para.content)
    // an unmatched close of a chrome tag never goes negative / misclassifies
    val bs2 = HtmlContent.blocks(s"</nav><p>$Para</p>", rules)
    assert(!bs2.find(_.text == Para).get.inChrome)
  }

  test("rulesForLang: en preserved, lang lists swap, stoplist-less langs drop the gate") {
    // en IS the default rules — byte-identical behavior preservation
    assert(HtmlContent.rulesForLang("en") == HtmlContent.ContentRules())
    // de swaps only the stopword list (same thresholds)
    val de = HtmlContent.rulesForLang("de")
    assert(de.stopwords == graft.ops.TextStats.stopwordsFor("de").toSet)
    assert(de.stopwordsLow == 0.10 && de.stopwordsHigh == 0.20)
    assert(de.stopwords.contains("und") && !de.stopwords.contains("the"))
    // a German paragraph: good under de rules, bad under the en default
    val dePara = "Der Hund lief und lief durch das weite Feld und war mit " +
      "sich im Reinen denn die Sonne stand hoch und der Tag war lang und " +
      "die Arbeit auf dem Hof war getan und nicht eine Sorge blieb den " +
      "Tieren auf der Weide am Abend."
    assert(dePara.length > 200)
    def label(rules: HtmlContent.ContentRules) =
      HtmlContent.blocks(s"<p>$dePara</p>", rules).head.label
    assert(label(de) == "good")
    assert(label(HtmlContent.ContentRules()) == "bad")
    // zh has no whitespace function words: no-stoplist mode — both
    // thresholds 0, so a long CJK block classifies by length alone
    val zh = HtmlContent.rulesForLang("zh")
    assert(zh.stopwordsLow == 0.0 && zh.stopwordsHigh == 0.0 && zh.stopwords.isEmpty)
    val cjk = "这是一个很长的中文段落" * 20 // 240 chars, zero stopwords
    assert(HtmlContent.blocks(s"<p>$cjk</p>", zh).head.label == "good")
    assert(HtmlContent.blocks(s"<p>$cjk</p>", HtmlContent.ContentRules())
      .head.label == "bad")
    // unknown code behaves like a stoplist-less lang, never throws
    assert(HtmlContent.rulesForLang("xx").stopwords.isEmpty)
  }

  test("column API: htmlBlocks explodes to scalars; extractMainContent") {
    val df = Seq((1L, s"<nav><a href='/'>x</a></nav><p>$Para</p>"))
      .toDF("id", "html")
    val rows = df.select(col("id"),
        explode(WebText.htmlBlocks(col("html"))).as("b"))
      .select(col("id"), col("b.idx"), col("b.tag"), col("b.label"),
        col("b.content"))
      .orderBy("idx").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(2) == "nav" && !rows(0).getBoolean(4))
    assert(rows(1).getString(2) == "p" && rows(1).getBoolean(4))
    val main = df.select(WebText.extractMainContent(col("html")).as("t"))
      .as[String].head()
    assert(main == Para)
  }
}
