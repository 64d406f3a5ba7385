package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus text cleanup: HTML stripping, URL/domain extraction, Unicode
  * normalization — the first verbs a crawl-derived corpus hits, ahead of
  * language ID / quality scoring / dedup. Everything here is a map-only
  * per-row `Column` (codegen'd builtins or one native kernel), so the plans
  * are embarrassingly parallel at any scale — no shuffle, no state.
  */
object WebText {

  /** Plain text from an HTML fragment/document:
    *
    *   1. `<script>`/`<style>`/`<head>` blocks (and HTML comments) are
    *      removed WITH their content — code, CSS, and title/meta chrome
    *      are not corpus text (`<header>` is NOT matched: the `\b` after
    *      `head` requires a non-word char);
    *   2. remaining tags are removed, each leaving one space (block
    *      boundaries must not glue words: `<p>a</p><p>b</p>` → `a b`);
    *   3. the named entities every real page carries are decoded —
    *      `&lt; &gt; &quot; &#39; &apos; &nbsp;` first — then ALL numeric
    *      character references, decimal and hex (`&#8217;`/`&#x2019;` —
    *      curly quotes, dashes, © are everywhere in crawl text), via the
    *      [[graft.ops.expr.NumericCharRefDecode]] kernel, and every
    *      ampersand form (`&amp;`, `&#38;`, `&#x26;`) LAST — so
    *      `&amp;lt;` decodes once, to the literal `&lt;`, not twice, and
    *      likewise `&amp;#8217;` to the literal `&#8217;`;
    *   4. whitespace runs collapse to one space, trimmed.
    *
    * A regex chain over codegen'd builtins, deliberately NOT a DOM parse:
    * corpus HTML is malformed at scale and a lenient lexical strip is the
    * standard curation choice (what trafilatura/jusText do before their
    * block heuristics). Compose with [[Corpus.stripBoilerplate]] for
    * line-level template removal AFTER stripping.
    */
  def stripHtml(html: Column): Column = {
    // (?is): case-insensitive (SCRIPT/Script), dotall (blocks span lines).
    // Backreference \1 closes the same block that opened.
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style|head)\\b[^>]*>.*?</\\1\\s*>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " "
    ).foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    val numerics = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.ops.expr.NumericCharRefDecode(
        ColumnBridge.expression(decoded)))
    }
    // every ampersand form last (the kernel skips codepoint 38 for this).
    // Zero-padding bounded to 8 total digits so overlong refs like
    // `&#000000038;` stay literal, matching NumericCharRefDecode's contract
    // for every other codepoint.
    val ampLast = regexp_replace(numerics, "&amp;|&#0{0,6}38;|&#[xX]0{0,6}26;", "&")
    trim(regexp_replace(ampLast, "[ \\t\\n\\x0B\\f\\r\\u00A0]+", " "))
  }

  /** DOM-block segmentation + jusText-style classification of an HTML
    * page: `array<struct>` of per-block features (tag, chrome flag, text,
    * char/word counts, link density, stopword density) and labels — the
    * block layer real crawl curation scores before keeping anything. See
    * [[graft.ops.expr.HtmlContent]] for the algorithm and threshold
    * provenance. Codegen'd, map-only.
    */
  def htmlBlocks(
      html: Column,
      rules: graft.ops.expr.HtmlContent.ContentRules =
        graft.ops.expr.HtmlContent.ContentRules()): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.ops.expr.HtmlBlocksExpr(
      ColumnBridge.expression(html), rules))
  }

  /** Main-content extraction: the text of the blocks the jusText-style
    * classifier keeps, joined by newlines — what a crawl pipeline stores
    * as the document's text instead of the whole-page [[stripHtml]].
    * Codegen'd, map-only.
    */
  def extractMainContent(
      html: Column,
      rules: graft.ops.expr.HtmlContent.ContentRules =
        graft.ops.expr.HtmlContent.ContentRules()): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.ops.expr.MainContentExpr(
      ColumnBridge.expression(html), rules))
  }

  /** Every absolute http(s) URL in the text, in order of appearance.
    * Conservative token shape: scheme, then everything up to whitespace or
    * a closing quote/bracket/angle (URLs pasted in prose end at those);
    * trailing prose punctuation (`.,;:!?`) is trimmed — `see https://a.com.`
    * means `https://a.com`, not a URL ending in a dot.
    */
  def extractUrls(text: Column): Column =
    transform(
      regexp_extract_all(text, lit("""https?://[^\s"'<>\)\]]+"""), lit(0)),
      u => regexp_replace(u, "[.,;:!?]+$", ""))

  /** Lowercased host of a URL: after the scheme and optional userinfo, up
    * to the first `/ : ? #`. Null-safe on non-URLs (empty match → null).
    */
  def urlHost(url: Column): Column = {
    val h = lower(regexp_extract(url,
      """^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]+)""", 1))
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Path (+ query) of a URL: everything from the first `/` after the
    * authority; a URL with no path component evaluates to `/` (the form
    * robots.txt rules match against). Null-safe on non-URLs.
    */
  def urlPath(url: Column): Column = {
    val p = regexp_extract(url,
      """^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([/?][^#]*)?""", 1)
    when(urlHost(url).isNull, lit(null).cast("string"))
      .otherwise(when(p === "", lit("/")).otherwise(p))
  }

  /** Compile a robots.txt column into the compact per-agent rules
    * encoding ([[graft.ops.expr.RobotsMatch]] — RFC 9309 group selection,
    * `A:`/`D:` lines). Run once per DOMAIN row, before joining to URLs.
    */
  def robotsRules(robotsTxt: Column, agent: String = "*"): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.ops.expr.RobotsRulesExpr(
      ColumnBridge.expression(robotsTxt), agent))
  }

  /** RFC 9309 decision for a path under compiled rules: longest match
    * wins, allow wins ties, no match or NULL rules (no robots.txt) ⇒
    * allowed. Codegen'd, map-only.
    */
  def robotsAllowed(rules: Column, path: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.ops.expr.RobotsAllowedExpr(
      ColumnBridge.expression(rules), ColumnBridge.expression(path)))
  }

  /** Charset-aware crawl-payload decode
    * ([[graft.ops.expr.CharsetText]] — WHATWG sniffing precedence: BOM →
    * HTTP `Content-Type` charset param → `<meta>` prescan → UTF-8, REPLACE
    * on malformed bytes). The front-door text materialization for WARC
    * payloads; pair with [[fixEncoding]] downstream only for text that was
    * mojibaked BEFORE it reached the archive.
    */
  def payloadText(payload: Column, contentType: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.ops.expr.PayloadTextExpr(
      ColumnBridge.expression(payload), ColumnBridge.expression(contentType)))
  }

  /** Multi-label public suffixes recognized by [[registrableDomain]] — a
    * compact subset of the (public) Mozilla Public Suffix List covering the
    * common ccTLD second-level registries. At 100 TB you would broadcast
    * the full PSL as a lookup table; the subset keeps the expression
    * literal-only (no join) and covers the overwhelming majority of crawl
    * traffic. Single-label TLDs need no listing: the default is "last two
    * labels".
    */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.tr", "com.ar", "com.sg", "com.hk", "com.tw",
    "co.za", "co.kr", "com.my", "com.ph", "com.vn", "com.eg", "com.sa")

  /** Registrable domain (eTLD+1) of a lowercased host: the last two labels,
    * or three when the last two are a listed second-level public suffix
    * (`shop.example.co.uk` → `example.co.uk`, not `co.uk`). Hosts with one
    * label (localhost, intranet names) pass through. This is the key
    * per-site quotas and domain blocklists group by.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n <= 1, host)
      .when(array_contains(lit(TwoLevelSuffixes.toArray), lastTwo) && n >= 3, lastThree)
      .otherwise(lastTwo)
  }

  /** Registrable domain under a FULL Public Suffix List — the 100 TB
    * variant the compact subset's scaladoc promises: wildcard (`*.ck`)
    * and exception (`!www.ck`) rules, multi-label registries the subset
    * omits (`co.il`, `com.pl`), and the PRIVATE section's
    * `github.io`-style suffixes all key correctly. `rules` comes from a
    * caller-supplied copy of the published list
    * ([[graft.ops.expr.PslRules.parse]]); the rule sets ride the task
    * binary once and probe per row inside whole-stage codegen — no join,
    * no broadcast exchange. With [[graft.ops.expr.PslRules.default]] the
    * keying is identical to [[registrableDomain]].
    */
  def registrableDomainPsl(host: Column, rules: graft.ops.expr.PslRules): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.ops.expr.PslRegistrableDomainExpr(
      ColumnBridge.expression(host), rules))
  }

  /** Unicode normalization (NFC / NFD / NFKC / NFKD) as a native codegen'd
    * expression over `java.text.Normalizer` — NFC before hashing/dedup (the
    * same text arrives precomposed from some sites and decomposed from
    * others and must hash identically); NFKC before tokenization (fullwidth
    * digits, ligatures, compatibility forms fold to their plain
    * equivalents).
    */
  /** URL canonicalization — the dedup/quota KEY for web corpora: the same
    * page arrives under scheme/host case variants, default ports,
    * fragments, tracking parameters, and trailing-slash forms, and every
    * variant fragments per-URL dedup and per-domain quotas. The rules
    * (each a plain regex step, so the gate replays them in SQL):
    *
    *   1. strip the fragment (`#…` — never sent to the server);
    *   2. lowercase the scheme and authority (RFC 3986 §6.2.2.1 — path
    *      and query stay case-sensitive);
    *   3. drop default ports (`http://…:80`, `https://…:443`);
    *   4. drop tracking parameters (`utm_*`, `fbclid`, `gclid`,
    *      `msclkid`, `mc_eid`) keeping the rest IN ORDER (sorting
    *      parameters can change semantics; dropping known-inert ones
    *      cannot), then tidy separators (`?&`→`?`, `&&`→`&`, trailing
    *      `?`/`&` dropped);
    *   5. drop the slash of a bare root path (`https://x.com/` →
    *      `https://x.com`).
    *
    * Deliberately NOT done: percent-decoding (changes bytes the server
    * sees), path `.`/`..` resolution (origin servers disagree), and
    * parameter sorting.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase only scheme://authority; splice the rest back unchanged
    val prefix = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val rest = substring(noFrag, length(prefix) + 1, lit(1000000))
    val loweredPrefix = lower(prefix)
    val noPort = regexp_replace(
      regexp_replace(loweredPrefix, "^(http://[^/:]+):80$", "$1"),
      "^(https://[^/:]+):443$", "$1")
    val joined = when(prefix === "", noFrag).otherwise(concat(noPort, rest))
    val noTracking = regexp_replace(joined,
      "([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid)=[^&#]*", "$1")
    val tidied = regexp_replace(
      regexp_replace(
        regexp_replace(noTracking, "\\?&+", "?"),
        "&&+", "&"),
      "[?&]+$", "")
    regexp_replace(tidied, "^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")
  }

  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    graft.ops.expr.UnicodeNormExprs.normalizeUnicode(text, form)
}
