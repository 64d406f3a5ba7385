package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WAT support — the METADATA member of CommonCrawl's per-crawl artifact
  * trio (`*.warc.gz` responses / `*.warc.wat.gz` metadata /
  * `*.warc.wet.gz` extracted text; the iipc web-archive-transformation
  * convention). A WAT record is a WARC `metadata` record whose JSON
  * content block carries an Envelope of header metadata plus
  * payload-derived metadata — most importantly the page's outlinks and
  * title, which is what consumers read WAT for (building link graphs
  * WITHOUT re-parsing the HTML of the whole crawl).
  *
  * This implements the envelope SUBSET those consumers actually key on,
  * as pure column expressions (codegen'd — the render is one projection):
  *
  * {{{
  * {"Envelope": {
  *    "WARC-Header-Metadata": {"WARC-Target-URI": …, "WARC-Date": …,
  *                             "WARC-Type": "response"},
  *    "Payload-Metadata": {"HTTP-Response-Metadata": {"HTML-Metadata": {
  *        "Head": {"Title": …},
  *        "Links": [{"url": …}, …]}}}}}
  * }}}
  *
  * Links come from [[graft.ops.LinkGraph.hrefs]] (double-, single- and
  * un-quoted href attributes, in that order of extraction); `Title` is
  * the first `<title>` element's raw text (entity decoding is the
  * downstream [[graft.ops.Sitemaps.xmlUnescape]]'s job, same as the rest
  * of the html layer), omitted when absent. The full iipc envelope also
  * carries HTTP header maps and container offsets — documented scope-out;
  * the [[Cdx]] layer owns offsets here.
  *
  * Scale shape: [[writeWat]] is one map-only projection into the sharded
  * record writer (no shuffle); [[parseWat]] is `from_json` with an
  * explicit schema over the metadata records — no sampling pass, splits
  * like any [[Warc.readWarc]] consumer.
  */
object Wat {

  /** The WAT envelope JSON for one page, as a column ([[writeWat]]'s
    * payload; `to_json` omits null fields, so a title-less page simply
    * has no `Title` key).
    */
  def watEnvelope(uri: Column, html: Column, warcDate: String): Column = {
    val rawTitle = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    val title = when(rawTitle === "", lit(null).cast("string"))
      .otherwise(rawTitle)
    to_json(struct(
      struct(
        struct(
          uri.as("WARC-Target-URI"),
          lit(warcDate).as("WARC-Date"),
          lit("response").as("WARC-Type")).as("WARC-Header-Metadata"),
        struct(
          struct(
            struct(
              struct(title.as("Title")).as("Head"),
              transform(graft.ops.LinkGraph.hrefs(html),
                u => struct(u.as("url"))).as("Links")
            ).as("HTML-Metadata")
          ).as("HTTP-Response-Metadata")
        ).as("Payload-Metadata")
      ).as("Envelope")))
  }

  /** Write a WAT archive from pages: one `metadata` record per row, the
    * [[watEnvelope]] JSON as the content block, `WARC-Refers-To` linking
    * to the response record [[Warc.writeWarcResponses]] would write for
    * the same uri. Same shard layout, codecs and commit protocol as the
    * WARC writers.
    */
  def writeWat(
      df: DataFrame,
      outDir: String,
      uriCol: String,
      htmlCol: String,
      warcDate: String = "2026-01-01T00:00:00Z",
      maxRecordsPerShard: Int = 100000,
      overwrite: Boolean = false,
      codec: String = "gzip"
  ): Unit =
    Warc.writeWarcMetadata(
      df.withColumn("__wat",
        watEnvelope(col(uriCol).cast("string"), col(htmlCol).cast("string"),
          warcDate)),
      outDir, uriCol, "__wat", warcDate, maxRecordsPerShard, overwrite, codec)

  /** The envelope schema [[parseWat]] reads with (explicit — no sampling
    * pass over a 100 TB crawl's WAT shards).
    */
  val WatEnvelopeSchema: StructType = StructType(Seq(
    StructField("Envelope", StructType(Seq(
      StructField("WARC-Header-Metadata", StructType(Seq(
        StructField("WARC-Target-URI", StringType),
        StructField("WARC-Date", StringType),
        StructField("WARC-Type", StringType)))),
      StructField("Payload-Metadata", StructType(Seq(
        StructField("HTTP-Response-Metadata", StructType(Seq(
          StructField("HTML-Metadata", StructType(Seq(
            StructField("Head", StructType(Seq(
              StructField("Title", StringType)))),
            StructField("Links", ArrayType(StructType(Seq(
              StructField("url", StringType)))))))))))))))))))

  /** Parse the WAT (`metadata`) records of a [[Warc.readWarc]] frame into
    * `(target_uri, refers_to, title, links)` — `links` an array of url
    * strings in extraction order (double-, single-, then un-quoted href
    * groups, document order within each group — the
    * [[graft.ops.LinkGraph.hrefs]] order the envelope was built in).
    * Torn JSON yields null fields, never a
    * failed read (crawl-scale tolerance, same as [[Cdx.readCdxj]]).
    */
  def parseWat(warc: DataFrame): DataFrame =
    warc.filter(col("warc_type") === "metadata")
      .select(
        col("target_uri"),
        col("refers_to"),
        from_json(col("payload").cast("string"), WatEnvelopeSchema)
          .as("__env"))
      .select(
        col("target_uri"),
        col("refers_to"),
        col("__env.Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata.Head.Title")
          .as("title"),
        transform(
          col("__env.Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata.Links"),
          l => l.getField("url")).as("links"))

  /** [[writeWat]] + [[Warc.writeWarcResponses]] side by side — the
    * response archive and its WAT sibling from one frame, into sibling
    * directories, cross-referenced by record id.
    */
  def writeWarcWithWat(
      df: DataFrame,
      warcDir: String,
      watDir: String,
      uriCol: String,
      htmlCol: String,
      warcDate: String = "2026-01-01T00:00:00Z",
      overwrite: Boolean = false,
      codec: String = "gzip"
  ): Unit = {
    Warc.writeWarcResponses(df, warcDir, uriCol, htmlCol,
      warcDate = warcDate, overwrite = overwrite, codec = codec)
    writeWat(df, watDir, uriCol, htmlCol,
      warcDate = warcDate, overwrite = overwrite, codec = codec)
  }
}
