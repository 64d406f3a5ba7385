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

  /** SURT form of a URL with the Internet Archive DEFAULT CANONICALIZATION
    * — the key family the published CommonCrawl cc-index and the pywb/
    * OpenWayback ecosystem actually use (the `surt` library's
    * `DefaultIAURLCanonicalizer`; a verbatim-key SURT would silently match
    * NOTHING when joined against the real index, because the published
    * keys strip `www.` and alphabetize query args). Rules, in order:
    *
    *   1. tab/CR/LF removed anywhere, surrounding spaces trimmed, the
    *      whole URL lowercased, fragment dropped;
    *   2. userinfo (`user:pass@`) stripped; host dots tidied (runs
    *      collapsed, leading/trailing dropped); ONE leading `www.` /
    *      `www<digits>.` host label stripped (IA `massageHost`);
    *   3. scheme-default ports dropped (`http:80`, `https:443`,
    *      `ftp:21`); any other explicit port keys after the reversed
    *      host — `com,example:8080)/`;
    *   4. path: spaces percent-encode to `%20` (so the key can live in a
    *      space-delimited CDXJ line); ASP.NET cookieless-session path
    *      segments (`/(s(…24…))/…aspx`) stripped (the IA path-session
    *      rules); ONE trailing slash dropped unless the path is just `/`
    *      (`/goo/` keys as `/goo` — the surt library's README example);
    *   5. query: spaces percent-encode; the IA session-id parameters
    *      strip (`jsessionid`/`phpsessid`/`sid` 32-char values,
    *      `aspsessionid*`, `cfid`+`cftoken` — session noise would
    *      otherwise make every capture of a page key uniquely); args
    *      split on `&` and ALPHABETIZED by (name, value) — python-tuple
    *      order: a bare arg sorts before `name=` with a value; an empty
    *      query (or one emptied by the session strip) drops its `?`.
    *
    * So `https://www.Example.com:443/goo/?b=2&a=1#f` keys as
    * `com,example)/goo?a=1&b=2` — string-sortable, one registrable
    * domain's captures contiguous, and JOINABLE against the published
    * index. Null for unparseable URLs (no `scheme://host`). Out of scope
    * (documented, not silent): the Google-canonicalizer percent-decode/
    * re-encode cycles, IDN/punycode folding and IP normalization — keys
    * for such URLs may diverge from the published index; everything else
    * matches the IA rules.
    */
  def surt(url: Column): Column = {
    val u = lower(trim(regexp_replace(url, "[\\t\\n\\r]", "")))
    val scheme = regexp_extract(u, "^([a-z][a-z0-9+.\\-]*)://", 1)
    val rawHost = regexp_extract(u,
      "^[a-z][a-z0-9+.\\-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    val dotted = regexp_replace(
      regexp_replace(rawHost, "\\.{2,}", "."), "^\\.|\\.$", "")
    val host = regexp_replace(dotted, "^www[0-9]*\\.", "")
    val port = regexp_extract(u,
      "^[a-z][a-z0-9+.\\-]*://(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)(?=[/?#]|$)", 1)
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443") ||
        (scheme === "ftp" && port === "21"))
    val rev = array_join(reverse(split(host, "\\.")), ",")
    val revPort = when(keepPort, concat(rev, lit(":"), port)).otherwise(rev)
    // path + query, fragment dropped
    val pq = regexp_extract(u, "^[a-z][a-z0-9+.\\-]*://[^/?#]*([^#]*)", 1)
    val rawPath = regexp_extract(pq, "^([^?]*)", 1)
    val hasQuery = instr(pq, "?") > 0
    val rawQuery = regexp_extract(pq, "^[^?]*\\?(.*)$", 1)
    val pEsc = regexp_replace(rawPath, " ", "%20")
    val pSess1 = regexp_replace(pEsc,
      "^(.*/)\\((?:[a-z]\\([0-9a-z]{24}\\))+\\)/([^?]+\\.aspx.*)$", "$1$2")
    val pSess2 = regexp_replace(pSess1,
      "^(.*/)\\([0-9a-z]{24}\\)/([^?]+\\.aspx.*)$", "$1$2")
    val pSlash = regexp_replace(pSess2, "(.)/$", "$1")
    val path = when(pSlash === "", lit("/")).otherwise(pSlash)
    val qEsc = regexp_replace(rawQuery, " ", "%20")
    val qStripped = QuerySessionPatterns.foldLeft(qEsc)(
      (q, pat) => regexp_replace(q, pat, "$1$2"))
    val qParts = split(qStripped, "&", -1)
    val qStructs = transform(qParts, a => {
      val i = instr(a, "=")
      struct(
        when(i > 0, a.substr(lit(1), i - lit(1))).otherwise(a).as("k"),
        when(i > 0, lit(1)).otherwise(lit(0)).as("h"),
        when(i > 0, a.substr(i + lit(1), length(a))).otherwise(lit("")).as("v"))
    })
    val qSorted = array_join(
      transform(array_sort(qStructs), st =>
        when(st.getField("h") === 1,
          concat(st.getField("k"), lit("="), st.getField("v")))
          .otherwise(st.getField("k"))), "&")
    val query = when(!hasQuery, lit("")).otherwise(qSorted)
    val tail = when(query === "", path)
      .otherwise(concat(path, lit("?"), query))
    when(host.isNull || host === "", lit(null).cast("string"))
      .otherwise(concat(revPort, lit(")"), tail))
  }

  /** The IA query-session-id strip patterns (applied in this order, each
    * at most once, anchored over the whole query — the `surt` library's
    * `stripQuerySessionID` rule set). `$1$2` replacement: Java substitutes
    * the empty string for a non-participating group, matching the python
    * `group(1) [+ group(2)]` join.
    */
  private val QuerySessionPatterns = Seq(
    "^(.*)(?:jsessionid=[0-9a-z]{32})(?:&(.*))?$",
    "^(.*)(?:phpsessid=[0-9a-z]{32})(?:&(.*))?$",
    "^(.*)(?:sid=[0-9a-z]{32})(?:&(.*))?$",
    "^(.*)(?:aspsessionid[a-z]{8}=[a-z]{24})(?:&(.*))?$",
    "^(.*)(?:cfid=[^&]+&cftoken=[^&]+)(?:&(.*))?$")

  /** JVM-side [[surt]] with the identical rules — the WARC writer's index
    * sidecar ([[Warc.writeWarcResponses]] `index = true`) runs per record
    * inside the shard writer where no Column can. Parity with the column
    * expression is spec-pinned (CdxSpec "surtString parity"); the trim
    * strips only ASCII spaces to match Spark's `trim`. (Query sorting
    * compares with `String.compareTo` here vs UTF8String byte order in the
    * column — identical for BMP text, which is all a lowercased query can
    * realistically hold; supplementary-plane query args are the one
    * documented divergence.)
    */
  def surtString(url: String): String = {
    if (url == null) return null
    val u = url.replaceAll("[\\t\\n\\r]", "")
      .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
      .reverse.toLowerCase(java.util.Locale.ROOT)
    val scheme = SchemeRe.findFirstMatchIn(u).map(_.group(1)).getOrElse("")
    val rawHost = SchemeHostRe.findFirstMatchIn(u).map(_.group(1)).getOrElse("")
    val host = rawHost.replaceAll("\\.{2,}", ".")
      .replaceAll("^\\.|\\.$", "").replaceAll("^www[0-9]*\\.", "")
    if (host.isEmpty) null
    else {
      val port = PortRe.findFirstMatchIn(u).map(_.group(1)).getOrElse("")
      val keepPort = port.nonEmpty &&
        !((scheme == "http" && port == "80") ||
          (scheme == "https" && port == "443") ||
          (scheme == "ftp" && port == "21"))
      val rev = host.split("\\.", -1).reverse.mkString(",")
      val revPort = if (keepPort) rev + ":" + port else rev
      val pq = PathQueryRe.findFirstMatchIn(u)
        .flatMap(m => Option(m.group(1))).getOrElse("")
      val qAt = pq.indexOf('?')
      val rawPath = if (qAt >= 0) pq.substring(0, qAt) else pq
      val pSlash = rawPath.replace(" ", "%20")
        .replaceAll("^(.*/)\\((?:[a-z]\\([0-9a-z]{24}\\))+\\)/([^?]+\\.aspx.*)$", "$1$2")
        .replaceAll("^(.*/)\\([0-9a-z]{24}\\)/([^?]+\\.aspx.*)$", "$1$2")
        .replaceAll("(.)/$", "$1")
      val path = if (pSlash.isEmpty) "/" else pSlash
      val query =
        if (qAt < 0) ""
        else {
          val stripped = QuerySessionPatterns.foldLeft(
            pq.substring(qAt + 1).replace(" ", "%20"))(
            (q, pat) => q.replaceAll(pat, "$1$2"))
          stripped.split("&", -1).sortBy { a =>
            val i = a.indexOf('=')
            if (i >= 0) (a.substring(0, i), 1, a.substring(i + 1))
            else (a, 0, "")
          }.mkString("&")
        }
      revPort + ")" + path + (if (query.isEmpty) "" else "?" + query)
    }
  }

  private val SchemeRe = "^([a-z][a-z0-9+.\\-]*)://".r
  private val SchemeHostRe =
    "^[a-z][a-z0-9+.\\-]*://(?:[^/@?#]*@)?([^/:?#]+)".r
  private val PortRe =
    "^[a-z][a-z0-9+.\\-]*://(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)(?=[/?#]|$)".r
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
