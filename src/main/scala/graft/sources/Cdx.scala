package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CommonCrawl index (CDXJ) support — the layer a 100 TB consumer actually
  * starts from: instead of scanning every WARC byte, query the published
  * capture index (one line per capture: SURT key, 14-digit timestamp, JSON
  * payload with the warc `filename`/`offset`/`length`), filter down to the
  * captures you want, and fetch only those byte ranges. Format per the
  * pywb/OpenWayback CDXJ convention used by the CommonCrawl `cc-index`
  * (https://github.com/webrecorder/pywb/wiki/CDX-Index-Format; ISO 28500
  * WARC is the payload these point into).
  *
  * Three pieces:
  *   1. [[surt]] — the Sort-friendly URI Reordering Transform key
  *      (`com,example)/path?q`), the index's primary key; pure column
  *      expression, engine-portable.
  *   2. [[readCdxj]] — CDXJ lines → typed frame. Line-splittable text
  *      (newline-framed like jsonl), so a 300 GB index shards across the
  *      cluster for free; the JSON payload parses with an explicit schema
  *      (`from_json` — no sampling pass over 100 TB of index).
  *   3. [[fetchPlan]] — filtered captures → per-WARC-file byte-range plan:
  *      ranges sorted per file and COALESCED when the gap between
  *      consecutive captures is under `gapBytes` (one ranged GET amortizes
  *      over adjacent members; a gap bigger than the merge tolerance is
  *      cheaper as two requests). Classic gaps-and-islands, expressed as
  *      one window + one aggregation — both keyed by filename, so the plan
  *      for each WARC file lands in one place.
  */
object Cdx {

  /** SURT form of a URL: lowercase, scheme dropped, host labels reversed
    * and comma-joined, `)` before the path, query kept, fragment dropped.
    * `com,example)/path?q=1` — string-sortable so one host's (and one
    * registrable domain's) captures are contiguous, which is the entire
    * point of the index key. Ports are dropped (the [[WebText.urlHost]]
    * key granularity — the published cc-index keys carry no default ports
    * either, and crawl corpora are overwhelmingly port-less). Null for
    * unparseable URLs.
    */
  def surt(url: Column): Column = {
    val u = lower(trim(url))
    val host = graft.ops.WebText.urlHost(u)
    val rev = array_join(reverse(split(host, "\\.")), ",")
    // path + query, fragment dropped; "" and "/" both normalize to "/"
    val pq = regexp_extract(u, "^[a-z][a-z0-9+.\\-]*://[^/?#]*([^#]*)", 1)
    val path = when(pq === "" || pq === "/", lit("/")).otherwise(pq)
    when(host.isNull, lit(null).cast("string"))
      .otherwise(concat(rev, lit(")"), path))
  }

  /** JVM-side [[surt]] with the identical rules — the WARC writer's index
    * sidecar ([[Warc.writeWarcResponses]] `index = true`) runs per record
    * inside the shard writer where no Column can. Parity with the column
    * expression is spec-pinned (CdxSpec "surtString parity"); the trim
    * strips only ASCII spaces to match Spark's `trim`.
    */
  def surtString(url: String): String = {
    if (url == null) return null
    val u = url.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
      .reverse.toLowerCase(java.util.Locale.ROOT)
    val host = SchemeHostRe.findFirstMatchIn(u).map(_.group(1)).getOrElse("")
    if (host.isEmpty) null
    else {
      val rev = host.split("\\.", -1).reverse.mkString(",")
      val pq = PathQueryRe.findFirstMatchIn(u)
        .flatMap(m => Option(m.group(1))).getOrElse("")
      val path = if (pq.isEmpty || pq == "/") "/" else pq
      rev + ")" + path
    }
  }

  private val SchemeHostRe =
    "^[a-z][a-z0-9+.\\-]*://(?:[^/@?#]*@)?([^/:?#]+)".r
  private val PathQueryRe =
    "^[a-z][a-z0-9+.\\-]*://[^/?#]*([^#]*)".r

  /** Payload schema of the CommonCrawl cc-index CDXJ JSON block. All
    * fields arrive as JSON strings (the published format quotes numbers);
    * [[readCdxj]] casts the numerics.
    */
  val CdxjPayloadSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("length", StringType),
    StructField("offset", StringType),
    StructField("filename", StringType),
    StructField("languages", StringType),
    StructField("charset", StringType)))

  /** Read a CDXJ index (plain or .gz shards — Spark's text source handles
    * the codec by extension) into
    * `(surt_key, ts, url, mime, status, digest, filename, offset, length,
    * languages, charset)`. `ts` parses the 14-digit capture timestamp to a
    * UTC timestamp; `offset`/`length` cast to long; `status` to int
    * (null when the capture has none, e.g. revisit records). Malformed
    * lines (no JSON block, bad JSON) yield null payload fields rather than
    * failing the read — index shards at this scale always carry a few torn
    * lines; filter `filename IS NULL` to drop or inspect them. `glob`
    * restricts the listing (e.g. `Some("*.cdxj")` when reading the writer's
    * sidecars out of a directory that also holds the `.warc.gz` shards).
    */
  def readCdxj(
      spark: SparkSession,
      path: String,
      glob: Option[String] = None
  ): DataFrame = {
    val reader = spark.read
    val lines = glob.fold(reader)(g => reader.option("pathGlobFilter", g))
      .text(path)
    // "<surt> <14-digit ts> <json>" — split on the first two single spaces
    val parsed = lines.select(
      regexp_extract(col("value"), "^(\\S+) (\\d{14}) (\\{.*)$", 1).as("surt_key"),
      regexp_extract(col("value"), "^(\\S+) (\\d{14}) (\\{.*)$", 2).as("__ts14"),
      from_json(
        regexp_extract(col("value"), "^(\\S+) (\\d{14}) (\\{.*)$", 3),
        CdxjPayloadSchema).as("__p"))
    parsed.select(
      when(col("surt_key") === "", lit(null).cast("string"))
        .otherwise(col("surt_key")).as("surt_key"),
      // try_: a torn line's empty ts must yield null, not an ANSI parse
      // error that fails the whole read
      try_to_timestamp(col("__ts14"), lit("yyyyMMddHHmmss")).as("ts"),
      col("__p.url").as("url"),
      col("__p.mime").as("mime"),
      // try_cast throughout: a capture with a malformed numeric field is
      // one null row, never a failed 100 TB index scan (ANSI casts throw)
      expr("try_cast(__p.status AS INT)").as("status"),
      col("__p.digest").as("digest"),
      col("__p.filename").as("filename"),
      expr("try_cast(__p.offset AS BIGINT)").as("offset"),
      expr("try_cast(__p.length AS BIGINT)").as("length"),
      col("__p.languages").as("languages"),
      col("__p.charset").as("charset"))
  }

  /** Byte-range fetch plan from filtered captures: per WARC file, the
    * capture ranges sorted by offset and merged when the gap to the
    * previous range end is ≤ `gapBytes` (0 merges only touching/overlapping
    * ranges). Returns
    * `(filename, range_start, range_end, n_captures, bytes)` with
    * `range_end` exclusive and `bytes = range_end − range_start` (the GET
    * size, including any swallowed gap bytes).
    *
    * Scale shape: ONE shuffle keyed by filename (the window), then the
    * island aggregation — per-file capture counts are bounded by WARC
    * sizing convention (~1 GB archives ⇒ tens of thousands of members), so
    * no window partition can be corpus-sized. The running maximum of range
    * ends (not a plain `lag`) makes containment-safe islands: a capture
    * fully inside an earlier long member must not split the island.
    */
  def fetchPlan(captures: DataFrame, gapBytes: Long = 0L): DataFrame = {
    require(gapBytes >= 0L, s"gapBytes must be >= 0, got $gapBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("filename"))
      .orderBy(col("offset"), col("end"))
    // length > 0: a malformed capture with "length":"0" (try_cast keeps
    // it) would otherwise yield a degenerate range_end == range_start row
    // that aborts the downstream ranged read — torn-index tolerance means
    // dropping it here, same as the null fields
    val rows = captures
      .where(col("filename").isNotNull && col("offset").isNotNull &&
        col("length").isNotNull && col("offset") >= 0 && col("length") > 0)
      .select(col("filename"), col("offset").cast("long").as("offset"),
        (col("offset") + col("length")).cast("long").as("end"))
    val marked = rows
      .withColumn("__prev_max_end",
        max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new_island",
        when(col("__prev_max_end").isNull ||
          col("offset") > col("__prev_max_end") + gapBytes, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col("filename"), col("__island"))
      .agg(
        min(col("offset")).as("range_start"),
        max(col("end")).as("range_end"),
        count(lit(1)).as("n_captures"))
      .select(col("filename"), col("range_start"), col("range_end"),
        col("n_captures"),
        (col("range_end") - col("range_start")).as("bytes"))
  }
}
