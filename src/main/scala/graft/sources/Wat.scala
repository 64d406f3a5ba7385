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
  * {"Container": {"Filename": …, "Offset": "…", "Length": "…"},   // optional
  *  "Envelope": {
  *    "WARC-Header-Metadata": {"WARC-Target-URI": …, "WARC-Date": …,
  *                             "WARC-Type": "response"},
  *    "Payload-Metadata": {"HTTP-Response-Metadata": {
  *        "Headers": {"Content-Type": …, …},                       // optional
  *        "HTML-Metadata": {
  *          "Head": {"Title": …},
  *          "Links": [{"url": …, "path": "A@/href"}, …]}}}}}
  * }}}
  *
  * Links come from [[graft.ops.LinkGraph.hrefs]] (double-, single- and
  * un-quoted href attributes, in that order of extraction), each entry
  * carrying the published convention's `path` key (`A@/href` — an anchor
  * element's href attribute; the published format also emits `title`/
  * `text` for some link kinds, which [[parseWat]]'s schema tolerates and
  * surfaces). `Title` is the first `<title>` element's raw text (entity
  * decoding is the downstream [[graft.ops.Sitemaps.xmlUnescape]]'s job,
  * same as the rest of the html layer), omitted when absent. `Headers`
  * renders a caller-supplied map column (the server's HTTP response
  * headers — what server-header analyses read WAT for); `Container`
  * names the response record's location in its archive
  * (filename/offset/length as STRINGS, the published quoting
  * convention) — [[writeWarcWithWat]] with `container = true` fills it
  * from the response write's own index sidecar.
  *
  * Scale shape: [[writeWat]] is one map-only projection into the sharded
  * record writer (no shuffle; the container variant adds one url-keyed
  * join against the write's sidecar index, response-count sized);
  * [[parseWat]] is `from_json` with an explicit schema over the metadata
  * records — no sampling pass, splits like any [[Warc.readWarc]]
  * consumer.
  */
object Wat {

  /** The WAT envelope JSON for one page, as a column ([[writeWat]]'s
    * payload; `to_json` omits null fields, so a title-less page simply
    * has no `Title` key, a null `headers` map no `Headers`, a null
    * `container` struct no `Container`).
    *
    * SCOPE: envelopes are rendered for `response` records only. Published
    * WAT files also carry envelopes for `request` and `metadata` records
    * (`HTTP-Request-Metadata` / `WARC-Metadata` payload branches); those
    * consumers are a small minority and this writer has no request or
    * metadata records to describe — a deliberate scope choice, not an
    * oversight. [[parseWat]] still READS real WAT files containing such
    * envelopes (their records simply surface null response fields).
    *
    * @param headers   optional `map<string,string>` of HTTP response
    *                  headers to render under
    *                  `HTTP-Response-Metadata.Headers`
    * @param container optional `struct<Filename,Offset,Length>` (strings)
    *                  locating the described response record in its
    *                  archive, rendered as the top-level `Container`
    */
  def watEnvelope(
      uri: Column,
      html: Column,
      warcDate: String,
      headers: Option[Column] = None,
      container: Option[Column] = None
  ): Column = {
    val rawTitle = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    val title = when(rawTitle === "", lit(null).cast("string"))
      .otherwise(rawTitle)
    val htmlMeta = struct(
      struct(title.as("Title")).as("Head"),
      transform(graft.ops.LinkGraph.hrefs(html),
        u => struct(u.as("url"), lit("A@/href").as("path"))).as("Links"))
    val respFields =
      headers.map(_.as("Headers")).toSeq :+ htmlMeta.as("HTML-Metadata")
    val envelope = struct(
      struct(
        uri.as("WARC-Target-URI"),
        lit(warcDate).as("WARC-Date"),
        lit("response").as("WARC-Type")).as("WARC-Header-Metadata"),
      struct(
        struct(respFields: _*).as("HTTP-Response-Metadata")
      ).as("Payload-Metadata"))
    val top =
      container.map(_.as("Container")).toSeq :+ envelope.as("Envelope")
    to_json(struct(top: _*))
  }

  /** Write a WAT archive from pages: one `metadata` record per row, the
    * [[watEnvelope]] JSON as the content block, `WARC-Refers-To` linking
    * to the response record [[Warc.writeWarcResponses]] would write for
    * the same uri. `headersCol` optionally names a `map<string,string>`
    * column rendered as the envelope's HTTP `Headers` — a
    * [[Warc.readWarc]] frame's `http_headers` column feeds it directly,
    * so WAT generation from a real crawl replays the ORIGINAL server
    * headers without re-parsing payloads; `containerCol` a
    * prepared `struct<Filename,Offset,Length>` column rendered as the
    * top-level `Container` ([[writeWarcWithWat]] builds it from the
    * response write's sidecar). Same shard layout, codecs and commit
    * protocol as the WARC writers.
    */
  def writeWat(
      df: DataFrame,
      outDir: String,
      uriCol: String,
      htmlCol: String,
      warcDate: String = "2026-01-01T00:00:00Z",
      maxRecordsPerShard: Int = 100000,
      overwrite: Boolean = false,
      codec: String = "gzip",
      headersCol: Option[String] = None,
      containerCol: Option[String] = None
  ): Unit =
    Warc.writeWarcMetadata(
      df.withColumn("__wat",
        watEnvelope(col(uriCol).cast("string"), col(htmlCol).cast("string"),
          warcDate, headersCol.map(col), containerCol.map(col))),
      outDir, uriCol, "__wat", warcDate, maxRecordsPerShard, overwrite, codec)

  /** The envelope schema [[parseWat]] reads with (explicit — no sampling
    * pass over a 100 TB crawl's WAT shards). A SUBSET of the published
    * envelope: unknown keys are ignored by `from_json`, and the published
    * `Links` entries' `path`/`title`/`text` keys (present in real WAT
    * next to `url`) are tolerated AND surfaced.
    */
  val WatEnvelopeSchema: StructType = StructType(Seq(
    StructField("Container", StructType(Seq(
      StructField("Filename", StringType),
      StructField("Offset", StringType),
      StructField("Length", StringType)))),
    StructField("Envelope", StructType(Seq(
      StructField("WARC-Header-Metadata", StructType(Seq(
        StructField("WARC-Target-URI", StringType),
        StructField("WARC-Date", StringType),
        StructField("WARC-Type", StringType)))),
      StructField("Payload-Metadata", StructType(Seq(
        StructField("HTTP-Response-Metadata", StructType(Seq(
          StructField("Headers", MapType(StringType, StringType)),
          StructField("HTML-Metadata", StructType(Seq(
            StructField("Head", StructType(Seq(
              StructField("Title", StringType)))),
            StructField("Links", ArrayType(StructType(Seq(
              StructField("url", StringType),
              StructField("path", StringType),
              StructField("title", StringType),
              StructField("text", StringType)))))))))))))))))))

  /** Parse the WAT (`metadata`) records of a [[Warc.readWarc]] frame into
    * `(target_uri, refers_to, title, links, http_headers,
    * container_filename, container_offset, container_length)` — `links`
    * an array of `struct<url, path, title, text>` in extraction order
    * (double-, single-, then un-quoted href groups, document order within
    * each group — the [[graft.ops.LinkGraph.hrefs]] order the envelope
    * was built in; real WAT producers emit their own order),
    * `http_headers` the envelope's HTTP header map (null when absent),
    * and the `container_*` columns the described record's archive
    * location (offset/length cast to long, null when absent or torn).
    * Torn JSON yields null fields, never a failed read (crawl-scale
    * tolerance, same as [[Cdx.readCdxj]]).
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
        col("__env.Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata.Links")
          .as("links"),
        col("__env.Envelope.Payload-Metadata.HTTP-Response-Metadata.Headers")
          .as("http_headers"),
        col("__env.Container.Filename").as("container_filename"),
        expr("try_cast(__env.Container.Offset AS BIGINT)")
          .as("container_offset"),
        expr("try_cast(__env.Container.Length AS BIGINT)")
          .as("container_length"))

  /** [[writeWat]] + [[Warc.writeWarcResponses]] side by side — the
    * response archive and its WAT sibling from one frame, into sibling
    * directories, cross-referenced by record id. `container = true`
    * additionally writes the response archive WITH its CDXJ index
    * sidecar, reads the sidecar back, and fills each WAT envelope's
    * top-level `Container` with the response record's true
    * (filename, offset, length) — one url-keyed join, response-count
    * sized. The sidecar side is aggregated to ONE row per url before
    * the join, and a duplicated url FAILS LOUDLY (`raise_error` inside
    * the aggregate — real crawl batches carry same-URL recaptures, and
    * a silent url-keyed join would cross-match their containers and fan
    * out; dedup upstream, or write recaptures in separate frames).
    * `headersCol` forwards to [[writeWat]].
    */
  def writeWarcWithWat(
      df: DataFrame,
      warcDir: String,
      watDir: String,
      uriCol: String,
      htmlCol: String,
      warcDate: String = "2026-01-01T00:00:00Z",
      overwrite: Boolean = false,
      codec: String = "gzip",
      headersCol: Option[String] = None,
      container: Boolean = false
  ): Unit = {
    Warc.writeWarcResponses(df, warcDir, uriCol, htmlCol,
      warcDate = warcDate, overwrite = overwrite, codec = codec,
      index = container)
    val watSrc =
      if (!container) df
      else {
        // one row per url, duplicates failing loudly at execution: a
        // url-keyed join against a sidecar with same-URL recaptures would
        // cross-match containers AND fan the join out — the aggregate
        // both dedups the build side and carries the guard, no extra pass
        val side = Cdx.readCdxj(df.sparkSession, warcDir,
          glob = Some("*.cdxj"))
          .select(col("url").as("__c_url"),
            struct(
              col("filename").as("Filename"),
              col("offset").cast("string").as("Offset"),
              col("length").cast("string").as("Length")).as("__c"))
          .groupBy(col("__c_url"))
          .agg(count(lit(1)).as("__n"), first(col("__c")).as("__c"))
          .select(col("__c_url"),
            when(col("__n") > 1, raise_error(concat(
              lit("writeWarcWithWat(container = true): duplicate capture " +
                "url in the response archive's index sidecar: '"),
              col("__c_url"),
              lit("' — containers are keyed by url; dedup the input " +
                "frame or write recaptures in separate frames"))))
              .otherwise(col("__c")).as("__container"))
        df.join(side, col(uriCol).cast("string") === col("__c_url"), "left")
          .drop("__c_url", "__n")
      }
    writeWat(watSrc, watDir, uriCol, htmlCol,
      warcDate = warcDate, overwrite = overwrite, codec = codec,
      headersCol = headersCol,
      containerCol = if (container) Some("__container") else None)
  }
}
