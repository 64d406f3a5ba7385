package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org XML, the crawl-discovery format next to
  * robots.txt): `<urlset>` entry extraction with the optional
  * lastmod/changefreq/priority hints, and `<sitemapindex>` child listing —
  * the two document kinds the protocol defines. Lexical extraction by
  * design, like [[WebText.stripHtml]]: real-web sitemaps are
  * machine-generated and regular, and a full XML parser buys nothing a
  * crawl pipeline needs while costing codegen and malformed-input
  * tolerance. Everything is plain column expressions — map-only, no UDFs,
  * each rule replayable in SQL.
  *
  * Scale shape: sitemaps arrive one-per-host (via the robots.txt
  * `Sitemap:` line or the well-known path), so the parse is a per-row
  * projection over a host-keyed frame; the explode in [[parseSitemaps]]
  * is bounded by the protocol's own 50,000-entry / 50 MB per-file limits.
  */
object Sitemaps {

  /** Decode the five predefined XML entities plus numeric character
    * references (the protocol REQUIRES escaping `&` in loc URLs, so
    * `&amp;` is routine — and real generators emit the equally-legal
    * `&#38;`/`&#x26;` and other numeric refs; the XML CharRef production
    * is part of the escaping table). Numeric refs decode through the same
    * [[graft.ops.expr.NumericCharRefDecode]] kernel `stripHtml` uses
    * (one linear scan, codegen'd); every AMPERSAND form decodes LAST, so
    * `&amp;lt;` yields the literal `&lt;` (not `<`) and `&#38;#60;` the
    * literal `&#60;` — decode-once, the XML semantics.
    */
  def xmlUnescape(s: Column): Column = {
    val lt = regexp_replace(s, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val ap = regexp_replace(gt, "&apos;", "'")
    val qt = regexp_replace(ap, "&quot;", "\"")
    val numerics = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.ops.expr.NumericCharRefDecode(
        ColumnBridge.expression(qt)))
    }
    regexp_replace(numerics, "&amp;|&#0{0,6}38;|&#[xX]0{0,6}26;", "&")
  }

  private def tagText(block: Column, tag: String): Column = {
    val v = regexp_extract(block, s"(?is)<$tag>\\s*(.*?)\\s*</$tag>", 1)
    when(v === "", lit(null).cast("string")).otherwise(xmlUnescape(v))
  }

  /** Priority as a double, null when absent or non-numeric: the extraction
    * regex only matches a plain decimal, so the cast can never hit ANSI's
    * malformed-cast error — a garbage hint field must not fail the parse.
    */
  private def priorityOf(block: Column): Column = {
    val v = regexp_extract(block,
      "(?is)<priority>\\s*([0-9]*\\.?[0-9]+)\\s*</priority>", 1)
    when(v === "", lit(null).cast("double")).otherwise(v.cast("double"))
  }

  /** `<urlset>` entries of a sitemap document:
    * `array<struct<loc, lastmod, changefreq, priority>>` — loc
    * entity-decoded and trimmed, absent optional tags null, priority a
    * double (null when absent or malformed — hint fields never fail a
    * parse).
    */
  def sitemapUrls(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?is)<url>(.*?)</url>"), lit(1)),
      b => struct(
        tagText(b, "loc").as("loc"),
        tagText(b, "lastmod").as("lastmod"),
        tagText(b, "changefreq").as("changefreq"),
        priorityOf(b).as("priority")))

  /** `<sitemapindex>` children: `array<struct<loc, lastmod>>` — the child
    * sitemap URLs a frontier must fetch next.
    */
  def sitemapChildren(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?is)<sitemap>(.*?)</sitemap>"), lit(1)),
      b => struct(
        tagText(b, "loc").as("loc"),
        tagText(b, "lastmod").as("lastmod")))

  /** `Sitemap:` lines of a robots.txt (the discovery channel RFC 9309 §2.3
    * reserves for exactly this): absolute sitemap URLs, order kept,
    * case-insensitive field name per the spec's example corpus.
    */
  def sitemapsFromRobots(robotsTxt: Column): Column =
    transform(
      regexp_extract_all(robotsTxt,
        lit("(?im)^\\s*sitemap\\s*:\\s*(\\S+)\\s*$"), lit(1)),
      u => u)

  /** Explode a frame of sitemap documents into one row per discovered URL:
    * input columns are kept, plus `loc`, `lastmod` (timestamp via
    * try-parse of the ISO forms the protocol allows — date-only and full
    * datetime), `changefreq`, `priority`, and `kind`
    * (`url` for urlset entries, `sitemap` for index children, which carry
    * null changefreq/priority). Documents yielding no entries disappear
    * (inner explode) — filter upstream to inspect empties.
    */
  def parseSitemaps(df: DataFrame, xmlCol: String): DataFrame = {
    val urls = transform(sitemapUrls(col(xmlCol)), e => struct(
      e.getField("loc").as("loc"),
      e.getField("lastmod").as("lastmod"),
      e.getField("changefreq").as("changefreq"),
      e.getField("priority").as("priority"),
      lit("url").as("kind")))
    val kids = transform(sitemapChildren(col(xmlCol)), e => struct(
      e.getField("loc").as("loc"),
      e.getField("lastmod").as("lastmod"),
      lit(null).cast("string").as("changefreq"),
      lit(null).cast("double").as("priority"),
      lit("sitemap").as("kind")))
    // the full W3C-datetime ladder the protocol allows: full datetime,
    // fractional seconds (1–3 digits native; longer fractions truncate to
    // millis first — a lastmod HINT loses nothing there), minute
    // precision, date, month, year. Each try_-parse: a malformed hint
    // yields null, never an ANSI error.
    val lm = col("__e.lastmod")
    val lmMillis = regexp_replace(lm, "(\\.\\d{3})\\d+", "$1")
    df.select(df.columns.map(col) :+
        explode(concat(urls, kids)).as("__e"): _*)
      .select(df.columns.map(col) :+
        col("__e.loc").as("loc") :+
        coalesce(
          try_to_timestamp(lm, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
          try_to_timestamp(lmMillis, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
          try_to_timestamp(lm, lit("yyyy-MM-dd'T'HH:mm:ss.SSXXX")),
          try_to_timestamp(lm, lit("yyyy-MM-dd'T'HH:mm:ss.SXXX")),
          try_to_timestamp(lm, lit("yyyy-MM-dd'T'HH:mmXXX")),
          try_to_timestamp(lm, lit("yyyy-MM-dd")),
          try_to_timestamp(lm, lit("yyyy-MM")),
          try_to_timestamp(lm, lit("yyyy")))
          .as("lastmod") :+
        col("__e.changefreq").as("changefreq") :+
        col("__e.priority").as("priority") :+
        col("__e.kind").as("kind"): _*)
  }
}
