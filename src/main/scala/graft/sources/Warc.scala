package graft.sources

import java.io.{ByteArrayInputStream, EOFException, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** WARC (Web ARChive, ISO 28500 — the format CommonCrawl and the wayback
  * ecosystem ship crawls in) ingestion and emission. Re-implemented from
  * the published format specification; the reference has no I/O surface at
  * all (parser.py:326-344) — this is beyond-reference crawl ingestion, the
  * front door of a web-scale training-data pipeline (crawl → extract →
  * language-ID → quality → dedup all exist downstream in this library).
  *
  * Format recap (spec, WARC-1.1 §4): a WARC file is a sequence of records,
  * each `WARC/1.x CRLF`, header lines (`Name: value`, continuations start
  * with SP/HT), an empty line, then exactly `Content-Length` bytes of
  * content block, then two CRLFs. A `.warc.gz` is a CONCATENATION of gzip
  * members, one record per member (the spec's recommended layout) —
  * `GZIPInputStream` reads concatenated members natively, so one streaming
  * pass parses both layouts. For `response` records the content block is
  * an HTTP/1.x message; the row splits it into status, headers and payload.
  *
  * Scale shape (same as [[TarShards]]):
  *   - READ: one task per WARC file via the `binaryFile` source — gzip
  *     members are not seekable-splittable without a side index, matching
  *     how the format ships (CommonCrawl: ~1 GiB .warc.gz files, tens of
  *     thousands per crawl — file count IS the parallelism; the 2 GiB
  *     `binaryFile` cap is above the format's customary shard size).
  *     Per-record memory is bounded by `maxPayloadBytes`: larger payloads
  *     are truncated (flagged in the `truncated` column), never buffered.
  *   - WRITE: one `.warc.gz` per task (rolled every `maxRecordsPerShard`),
  *     record-per-gzip-member, streamed to the Hadoop filesystem with the
  *     attempt-unique-temp + rename-on-finish commit protocol and the
  *     non-empty-dir refusal (same contract as [[TarShards.writeTarShards]]).
  */
object Warc {

  /** One parsed WARC record. HTTP fields are populated only for records
    * whose content block is an `application/http` message (responses /
    * requests); for every other record `payload` is the raw content block.
    */
  case class WarcRow(
      warc_file: String,
      record_index: Int,
      warc_type: String,
      record_id: Option[String],
      target_uri: Option[String],
      warc_date: Option[String],
      content_type: Option[String],
      content_length: Long,
      http_status: Option[Int],
      http_content_type: Option[String],
      payload: Array[Byte],
      truncated: Boolean,
      // dedup/revisit linkage headers (WARC-1.1 §5.9/§5.11/§6.7.2):
      // `payload_digest` (WARC-Payload-Digest, `sha1:BASE32` by crawl
      // convention) identifies the CONTENT; `refers_to` (WARC-Refers-To)
      // and `warc_profile` (WARC-Profile) carry a revisit's link to its
      // original capture — see [[resolveRevisits]]
      payload_digest: Option[String],
      refers_to: Option[String],
      warc_profile: Option[String])

  /** Read a directory of `.warc` / `.warc.gz` files as record rows.
    * `maxPayloadBytes` bounds per-record memory: longer payloads keep
    * their prefix and set `truncated` (64 MiB default — far above any
    * honest HTML page, below a pathological dump).
    */
  def readWarc(
      s: SparkSession,
      path: String,
      maxPayloadBytes: Int = 64 << 20
  ): DataFrame = {
    import s.implicits._
    val bin = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
    bin.mapPartitions { files =>
      files.flatMap { case (p, bytes) => parseFile(p, bytes, maxPayloadBytes) }
    }.toDF()
  }

  /** Streaming variant of [[readWarc]]: watch a directory for newly landed
    * WARC files (a continuously-landing crawl drop), one micro-batch task
    * per new file — mirrors [[TarShards.readTarShardsStream]].
    */
  def readWarcStream(
      s: SparkSession,
      path: String,
      maxPayloadBytes: Int = 64 << 20,
      maxFilesPerTrigger: Int = 0
  ): DataFrame = {
    import s.implicits._
    val r = s.readStream.format("binaryFile")
      .schema(new org.apache.spark.sql.types.StructType()
        .add("path", org.apache.spark.sql.types.StringType)
        .add("modificationTime", org.apache.spark.sql.types.TimestampType)
        .add("length", org.apache.spark.sql.types.LongType)
        .add("content", org.apache.spark.sql.types.BinaryType))
      .option("pathGlobFilter", "*.warc*")
    val bin = (if (maxFilesPerTrigger > 0)
                 r.option("maxFilesPerTrigger", maxFilesPerTrigger)
               else r).load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
    bin.mapPartitions { files =>
      files.flatMap { case (p, bytes) => parseFile(p, bytes, maxPayloadBytes) }
    }.toDF()
  }

  /** Ranged WARC read — the selective-access half of the CDX loop: take a
    * [[Cdx.fetchPlan]] frame (`filename`, `range_start`, `range_end`) and
    * decode ONLY those byte ranges of `dir`'s archives. One task reads one
    * or more ranges (seek + bounded read — at web scale this is the ranged
    * GET against the archive store; nothing outside the plan is ever
    * fetched), and the member-per-record framing (gzip members / zstd
    * frames) makes any member-aligned range independently decodable. For
    * `.warc.zst` archives with a leading skippable-frame DICTIONARY, the
    * file head is re-read and prepended so mid-file members decode —
    * index offsets never include the head because the writer's offsets
    * bracket members only.
    *
    * `record_index` is the index WITHIN the decoded range, not the file.
    * A range produced with a gap tolerance > 0 can contain interstitial
    * records that were not in the filtered capture set — re-filter by
    * `target_uri`/`record_id` after decode (the standard CDX-fetch
    * discipline; [[Cdx.fetchPlan]]'s scaladoc says the same).
    *
    * Each range buffers in one array, so ranges are capped at
    * `maxRangeBytes` (default 1 GiB — the WARC sizing convention; the
    * whole-file read path has the same class of bound via `binaryFile`'s
    * 2 GiB limit). A plan exceeding it fails LOUDLY with the knob to turn
    * (a smaller `gapBytes` at planning time) instead of an executor OOM
    * or an opaque overflow mid-read.
    */
  def readWarcRanges(
      s: SparkSession,
      dir: String,
      plan: DataFrame,
      maxPayloadBytes: Int = 64 << 20,
      maxRangeBytes: Long = 1L << 30
  ): DataFrame = {
    import s.implicits._
    val conf = new SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    val ranges = plan.select(
      col("filename").cast("string"),
      col("range_start").cast("long"),
      col("range_end").cast("long")).as[(String, Long, Long)]
    ranges.mapPartitions { it =>
      it.flatMap { case (fn, start, end) =>
        require(fn != null && start >= 0 && end > start,
          s"readWarcRanges: bad range ($fn, $start, $end)")
        require(end - start <= maxRangeBytes,
          s"readWarcRanges: range ($fn, $start, $end) is ${end - start} " +
            s"bytes, over maxRangeBytes=$maxRangeBytes — replan with a " +
            "smaller fetchPlan gapBytes (or raise maxRangeBytes if the " +
            "executors have the memory)")
        val p = new Path(dir, fn)
        val fs = p.getFileSystem(conf.value)
        val in = fs.open(p)
        val bytes =
          try {
            val head =
              if (fn.endsWith(".zst") && start > 0) readHeadSkippables(in)
              else Array.emptyByteArray
            val len = math.toIntExact(end - start)
            val buf = new Array[Byte](len)
            in.seek(start)
            in.readFully(buf, 0, len)
            if (head.isEmpty) buf else head ++ buf
          } finally in.close()
        parseFile(s"$p@$start", bytes, maxPayloadBytes)
      }
    }.toDF()
  }

  /** Leading zstd skippable frames of an open `.warc.zst` (the iipc
    * dictionary convention) — re-read verbatim so a mid-file ranged decode
    * can prepend them and [[parseFile]]'s dictionary branch applies.
    */
  private def readHeadSkippables(
      in: org.apache.hadoop.fs.FSDataInputStream): Array[Byte] = {
    val acc = new java.io.ByteArrayOutputStream()
    var pos = 0L
    var done = false
    val hdr = new Array[Byte](8)
    while (!done) {
      in.seek(pos)
      // loop to 8 bytes: FSDataInputStream.read may legally return short
      // mid-stream (object-store chunk boundaries) — a partial header read
      // must not be mistaken for end-of-skippables, or the dictionary
      // frame silently goes missing and every mid-file member fails
      var got = 0
      var eof = false
      while (got < 8 && !eof) {
        val n = in.read(hdr, got, 8 - got)
        if (n < 0) eof = true else got += n
      }
      if (got < 8 || !isZstSkippable(hdr, 0)) done = true
      else {
        val size = math.toIntExact(leU32(hdr, 4))
        val content = new Array[Byte](size)
        in.readFully(content, 0, size)
        acc.write(hdr); acc.write(content)
        pos += 8L + size
      }
    }
    acc.toByteArray
  }

  /** Write each row as one WARC `response` record (the record type a
    * downstream curation pipeline reads back): an HTTP/1.1 200 message
    * whose body is `bodyCol`, addressed by `uriCol`. `.warc.gz` layout by
    * default (record-per-gzip-member per the spec's recommendation);
    * `codec = "zstd"` writes `.warc.zst` as plain concatenated zstd
    * frames, one per record (no shared dictionary). Record IDs are
    * deterministic (`<urn:graft:<64-bit FNV of uri>>`) so a write→read
    * round-trip is value-stable end to end; `warcDate` is the mandatory
    * WARC-Date header for every record (a crawl timestamp column can be
    * carried in the body's `X-Graft-Date` HTTP header by the caller if
    * per-row dates matter — the format keeps them in the record header,
    * but a constant keeps this writer deterministic for gate replay).
    */
  def writeWarcResponses(
      df: DataFrame,
      outDir: String,
      uriCol: String,
      bodyCol: String,
      httpContentType: String = "text/html; charset=UTF-8",
      warcDate: String = "2026-01-01T00:00:00Z",
      maxRecordsPerShard: Int = 100000,
      overwrite: Boolean = false,
      contentTypeCol: Option[String] = None,
      codec: String = "gzip",
      index: Boolean = false
  ): Unit = {
    // per-record HTTP Content-Type when a column is given (a crawl body's
    // charset is per-page); rows with a null value fall back to the
    // constant default
    val projected = df.select(
      col(uriCol).cast("string").as("__uri"),
      col(bodyCol).cast("binary").as("__body"),
      coalesce(
        contentTypeCol.map(c => col(c).cast("string"))
          .getOrElse(lit(null).cast("string")),
        lit(httpContentType)).as("__ct"))
    // `index = true`: emit a per-shard CDXJ sidecar (part-….cdxj next to
    // part-….warc.gz — outside the readers' "*.warc*" glob) with one line
    // per record: SURT key, the write's 14-digit ts, url/mime/status/
    // digest and the member's exact (offset, length, filename) — the
    // capture-index convention that makes [[Cdx.fetchPlan]]-driven ranged
    // reads possible without a separate indexing pass over the archive.
    val ts14 = warcDate.replaceAll("[^0-9]", "").take(14)
    require(!index || ts14.length == 14,
      s"writeWarcResponses: index=true needs a full timestamp warcDate, got '$warcDate'")
    def jsonEsc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val indexFor: Option[org.apache.spark.sql.Row => (Long, Long, String) => String] =
      if (!index) None
      else Some { r =>
        val uri = r.getString(0)
        val body =
          if (r.isNullAt(1)) Array.emptyByteArray
          else r.get(1).asInstanceOf[Array[Byte]]
        val ct = if (r.isNullAt(2)) httpContentType else r.getString(2)
        val mime = ct.split(";")(0).trim
        // unparseable uris keep the raw (lowercased) uri as the key: a
        // capture must never vanish from its own archive's index. The key
        // is the line's FIRST space-delimited token, so any whitespace a
        // garbage uri smuggled in must be percent-encoded or the sidecar
        // line itself becomes unparseable (and a newline would split it) —
        // the exact silent-vanish this fallback exists to prevent.
        val rawKey = Option(graft.sources.Cdx.surtString(uri))
          .getOrElse(uri.toLowerCase(java.util.Locale.ROOT))
        val key = rawKey.flatMap {
          case ' ' => "%20"
          case '\t' => "%09"
          case '\n' => "%0A"
          case '\r' => "%0D"
          case c => c.toString
        }
        // digest = base32 SHA-1 of the PAYLOAD (the pywb/cc-index
        // convention: digest identifies content, so consumers can dedup by
        // it and resolve revisit records across URLs — a URL-keyed hash
        // here would silently collapse distinct contents of one URL)
        val prefix = s"""${key} $ts14 {"url":"${jsonEsc(uri)}","mime":"${jsonEsc(mime)}",""" +
          s""""status":"200","digest":"${sha1Base32(body)}""""
        (off: Long, len: Long, fn: String) =>
          prefix + s""","offset":"$off","length":"$len","filename":"${jsonEsc(fn)}"}"""
      }
    writeShardedRecords(projected, outDir, codec, maxRecordsPerShard,
      overwrite, "writeWarcResponses", indexFor) { r =>
      val uri = r.getString(0)
      if (uri == null) throw new IllegalArgumentException(
        "writeWarcResponses: null uri — WARC-Target-URI is mandatory " +
          "for response records; filter or coalesce the uri column first")
      val body =
        if (r.isNullAt(1)) Array.emptyByteArray
        else r.get(1).asInstanceOf[Array[Byte]]
      val ct = if (r.isNullAt(2)) httpContentType else r.getString(2)
      val http =
        (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
      val block = http ++ body
      val header =
        ("WARC/1.0\r\n" +
          "WARC-Type: response\r\n" +
          f"WARC-Record-ID: <urn:graft:${fnv64(uri)}%016x>\r\n" +
          s"WARC-Date: $warcDate\r\n" +
          s"WARC-Target-URI: $uri\r\n" +
          // content digest per crawl convention (`sha1:` + base32 SHA-1 of
          // the payload) — what revisit records point back at, and what
          // [[resolveRevisits]] joins on
          s"WARC-Payload-Digest: sha1:${sha1Base32(body)}\r\n" +
          "Content-Type: application/http; msgtype=response\r\n" +
          s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8")
      header ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    }
  }

  /** Write each row as one WARC `revisit` record — the CommonCrawl /
    * wayback NATIVE dedup convention (WARC-1.1 §6.7.2, the
    * `identical-payload-digest` profile): when a crawler re-fetches a URL
    * and the payload hashes identically to a capture it already archived,
    * it stores only this stub — target URI, the shared
    * `WARC-Payload-Digest`, optionally `WARC-Refers-To` naming the
    * original record — and the payload itself exactly once. Readers
    * resolve stubs back to content with [[resolveRevisits]]. `digestCol`
    * must carry the original's payload digest (`sha1:BASE32` — compute it
    * with [[payloadDigest]] over the original body, or read it off the
    * original's `payload_digest` column); `refersToCol` optionally carries
    * the original's record id. The content block is empty (the profile
    * permits it; the digest IS the linkage). Same shard layout, codecs and
    * commit protocol as [[writeWarcResponses]]; `index = true` emits the
    * CDXJ sidecar with mime `warc/revisit` and the REVISIT's digest, the
    * cc-index convention that lets an index consumer resolve content
    * without touching the archive.
    */
  def writeWarcRevisits(
      df: DataFrame,
      outDir: String,
      uriCol: String,
      digestCol: String,
      refersToCol: Option[String] = None,
      warcDate: String = "2026-01-01T00:00:00Z",
      maxRecordsPerShard: Int = 100000,
      overwrite: Boolean = false,
      codec: String = "gzip",
      index: Boolean = false
  ): Unit = {
    val projected = df.select(
      col(uriCol).cast("string").as("__uri"),
      col(digestCol).cast("string").as("__digest"),
      refersToCol.map(c => col(c).cast("string"))
        .getOrElse(lit(null).cast("string")).as("__refers"))
    val ts14 = warcDate.replaceAll("[^0-9]", "").take(14)
    require(!index || ts14.length == 14,
      s"writeWarcRevisits: index=true needs a full timestamp warcDate, got '$warcDate'")
    def jsonEsc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val indexFor: Option[org.apache.spark.sql.Row => (Long, Long, String) => String] =
      if (!index) None
      else Some { r =>
        val uri = r.getString(0)
        val digest = if (r.isNullAt(1)) "" else r.getString(1)
        val rawKey = Option(graft.sources.Cdx.surtString(uri))
          .getOrElse(uri.toLowerCase(java.util.Locale.ROOT))
        val key = rawKey.flatMap {
          case ' ' => "%20"
          case '\t' => "%09"
          case '\n' => "%0A"
          case '\r' => "%0D"
          case c => c.toString
        }
        // bare-base32 digest in the index line (cc-index drops the sha1: prefix)
        val bare = digest.replaceFirst("(?i)^sha1:", "")
        val prefix = s"""${key} $ts14 {"url":"${jsonEsc(uri)}","mime":"warc/revisit",""" +
          s""""digest":"${jsonEsc(bare)}""""
        (off: Long, len: Long, fn: String) =>
          prefix + s""","offset":"$off","length":"$len","filename":"${jsonEsc(fn)}"}"""
      }
    writeShardedRecords(projected, outDir, codec, maxRecordsPerShard,
      overwrite, "writeWarcRevisits", indexFor) { r =>
      val uri = r.getString(0)
      if (uri == null) throw new IllegalArgumentException(
        "writeWarcRevisits: null uri — WARC-Target-URI is mandatory " +
          "for revisit records; filter or coalesce the uri column first")
      if (r.isNullAt(1)) throw new IllegalArgumentException(
        "writeWarcRevisits: null digest — a revisit without " +
          "WARC-Payload-Digest can never be resolved; filter such rows " +
          "or write them as full response records instead")
      val digest = r.getString(1)
      val refers =
        if (r.isNullAt(2)) "" else s"WARC-Refers-To: ${r.getString(2)}\r\n"
      val header =
        ("WARC/1.0\r\n" +
          "WARC-Type: revisit\r\n" +
          f"WARC-Record-ID: <urn:graft:revisit:${fnv64(uri + "|" + digest)}%016x>\r\n" +
          refers +
          s"WARC-Date: $warcDate\r\n" +
          s"WARC-Target-URI: $uri\r\n" +
          "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n" +
          s"WARC-Payload-Digest: $digest\r\n" +
          "Content-Length: 0\r\n\r\n").getBytes("UTF-8")
      header ++ "\r\n\r\n".getBytes("UTF-8")
    }
  }

  /** Resolve `revisit` records to their original captures' content — the
    * join every consumer of multi-crawl WARC sets needs before any
    * text-level processing (CommonCrawl stores a re-fetched unchanged page
    * as a payload-less revisit stub; feeding stubs to an extraction
    * pipeline silently drops every stable page). Input: a [[readWarc]] /
    * [[readWarcRanges]] frame (or a union over crawls). Output: the same
    * columns plus `resolved_from` — for each revisit row, `payload`,
    * `http_status` and `http_content_type` are replaced by those of the
    * response record sharing its payload digest (preferring, among
    * responses with that digest, the one named by `WARC-Refers-To` when
    * present), and `resolved_from` carries the original's record id;
    * non-revisit rows pass through with `resolved_from` null, and a
    * revisit whose digest matches no response in the frame keeps its empty
    * payload with `resolved_from` null (filter `warc_type = 'revisit' AND
    * resolved_from IS NULL` to find danglers — their originals live in a
    * crawl you did not read).
    *
    * Scale shape: ONE shuffle keyed by the normalized digest. The
    * originals side first collapses to one representative row per digest
    * (`min_by` over (file, index) — deterministic, and partial-aggregates
    * map-side so the duplicate-payload key never concentrates); the join
    * output is revisit-count sized, never responses × revisits.
    */
  def resolveRevisits(warc: DataFrame): DataFrame = {
    val norm = (c: Column) => upper(regexp_replace(c, "(?i)^sha1:", ""))
    val originals = warc
      .filter(col("warc_type") === "response" && col("payload_digest").isNotNull)
      .groupBy(norm(col("payload_digest")).as("__digest"))
      .agg(min_by(
        struct(col("payload"), col("http_status"), col("http_content_type"),
          col("record_id")),
        struct(col("warc_file"), col("record_index"))).as("__o"))
    val revisits = warc.filter(col("warc_type") === "revisit")
    val passthrough = warc.filter(col("warc_type") =!= "revisit")
      .withColumn("resolved_from", lit(null).cast("string"))
    val resolved = revisits
      .join(originals, norm(col("payload_digest")) === col("__digest"), "left")
      .select(warc.columns.toIndexedSeq.map {
        case "payload" =>
          coalesce(col("__o.payload"), col("payload")).as("payload")
        case "http_status" =>
          coalesce(col("__o.http_status"), col("http_status")).as("http_status")
        case "http_content_type" =>
          coalesce(col("__o.http_content_type"), col("http_content_type"))
            .as("http_content_type")
        case c => col(c)
      } :+ col("__o.record_id").as("resolved_from"): _*)
    passthrough.unionByName(resolved)
  }

  /** `sha1:`-less base32 SHA-1 of a binary (or string) column — the crawl
    * ecosystem's payload-digest value ([[WarcRow.payload_digest]] carries
    * it WITH the `sha1:` prefix; cc-index JSON carries it bare). Pure
    * column expression: Spark's codegen'd `sha1` (hex) regrouped to RFC
    * 4648 base32 — 160 bits = 8 × 20-bit hex chunks = 8 × 4 base32 chars,
    * no padding. Parity with the writer's JVM-side [[sha1Base32]] is
    * spec-pinned (WarcSpec).
    */
  def payloadDigest(c: Column): Column = {
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val hex = sha1(c)
    concat((0 until 8).map { i =>
      val n = conv(substring(hex, i * 5 + 1, 5), 16, 10).cast("int")
      concat((3 to 0 by -1).map { j =>
        lit(alpha).substr(shiftright(n, j * 5).bitwiseAND(lit(31)) + lit(1), lit(1))
      }: _*)
    }: _*)
  }

  /** JVM-side RFC 4648 base32 of SHA-1 — the writer's digest (per record,
    * inside the shard task where no Column can run). 20 bytes → exactly 32
    * chars, padless.
    */
  private[sources] def sha1Base32(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new java.lang.StringBuilder(32)
    var buf = 0L
    var bits = 0
    d.foreach { b =>
      buf = (buf << 8) | (b & 0xffL)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(alpha(((buf >> bits) & 31L).toInt))
      }
    }
    sb.toString
  }

  /** Write each row as one WARC `conversion` record — the WET layout
    * CommonCrawl ships extracted plain text in (`*.warc.wet.gz`): the
    * record's Content-Type is `text/plain`, the content block IS the
    * UTF-8 text (no HTTP envelope), and `WARC-Refers-To` points at the
    * response record the text was converted from — deterministic urn of
    * the uri matching [[writeWarcResponses]]'s record ids, so a response
    * archive and its WET sibling written from the same frame
    * cross-reference. Reader-side ([[readWarc]] parses every record type
    * generically) these rows come back with `http_status`/
    * `http_content_type` null and `payload` = the text bytes. Same shard
    * layout, codecs and commit protocol as [[writeWarcResponses]].
    */
  def writeWetConversions(
      df: DataFrame,
      outDir: String,
      uriCol: String,
      textCol: String,
      warcDate: String = "2026-01-01T00:00:00Z",
      maxRecordsPerShard: Int = 100000,
      overwrite: Boolean = false,
      codec: String = "gzip"
  ): Unit = {
    val projected = df.select(
      col(uriCol).cast("string").as("__uri"),
      col(textCol).cast("string").as("__text"))
    writeShardedRecords(projected, outDir, codec, maxRecordsPerShard,
      overwrite, "writeWetConversions") { r =>
      val uri = r.getString(0)
      if (uri == null) throw new IllegalArgumentException(
        "writeWetConversions: null uri — WARC-Target-URI is mandatory " +
          "for conversion records; filter or coalesce the uri column first")
      val body =
        if (r.isNullAt(1)) Array.emptyByteArray
        else r.getString(1).getBytes("UTF-8")
      val header =
        ("WARC/1.0\r\n" +
          "WARC-Type: conversion\r\n" +
          f"WARC-Record-ID: <urn:graft:wet:${fnv64(uri)}%016x>\r\n" +
          f"WARC-Refers-To: <urn:graft:${fnv64(uri)}%016x>\r\n" +
          s"WARC-Date: $warcDate\r\n" +
          s"WARC-Target-URI: $uri\r\n" +
          "Content-Type: text/plain\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
      header ++ body ++ "\r\n\r\n".getBytes("UTF-8")
    }
  }

  /** Build a capture index from EXISTING `.warc.gz` archives that have no
    * sidecars — the cdx-indexer pass (webarchive-commons/pywb ship the
    * same tool): walk each shard's gzip MEMBERS tracking compressed
    * offsets, parse the record(s) inside each member, and emit one row
    * per response/revisit/conversion record in [[Cdx.readCdxj]]'s exact
    * column shape — so the result feeds [[Cdx.fetchPlan]] →
    * [[readWarcRanges]] directly, or renders through [[Cdx.cdxjLines]] →
    * [[Cdx.writeZipnum]] into a queryable two-level index. The round trip
    * "archives in, selective access out" needs no cooperation from
    * whoever wrote the archives.
    *
    * Mechanics: one task per shard (`binaryFile`, the non-splittable-gzip
    * parallelism contract); member boundaries come from a real gzip
    * header walk + Inflater consumption count (FEXTRA/FNAME/FCOMMENT/
    * FHCRC all handled, 8-byte CRC/ISIZE trailer) — no format guessing.
    * A member holding several records (the spec recommends one-per-member
    * but permits more) emits one row per record, all sharing the MEMBER's
    * (offset, length) — a ranged fetch decodes the member and re-filters,
    * the standard CDX discipline. `digest` is the payload's bare-base32
    * SHA-1, null when the payload was truncated at `maxPayloadBytes`
    * (a digest of a prefix would silently poison content-keyed dedup).
    * Plain `.warc` / `.warc.zst` shards are rejected loudly — member
    * offsets are a gzip-layout property; zstd-frame walking is a
    * documented non-goal for now.
    */
  def indexWarc(
      s: SparkSession,
      path: String,
      maxPayloadBytes: Int = 64 << 20
  ): DataFrame = {
    import s.implicits._
    val bin = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
    val rows = bin.mapPartitions { files =>
      files.flatMap { case (p, bytes) =>
        require(bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
          (bytes(1) & 0xff) == 0x8b,
          s"indexWarc: $p is not a .warc.gz archive (gzip member offsets " +
            "are a gzip-layout property; write-side sidecars via " +
            "writeWarcResponses(index = true) cover other codecs)")
        val fn = p.substring(p.lastIndexOf('/') + 1)
        gzipMembers(bytes, p).flatMap { case (off, len, member) =>
          parseFile(s"$p@$off", member, maxPayloadBytes).map { r =>
            val ts14 = Option(r.warc_date.orNull)
              .map(_.replaceAll("[^0-9]", "").take(14)).filter(_.length == 14)
            val mime = r.http_content_type.orElse(r.content_type)
              .map(_.split(";")(0).trim)
            // digest: the record's own WARC-Payload-Digest when present
            // (bare base32, the cc-index convention) — for a REVISIT stub
            // that is the ORIGINAL's content digest, which a recomputed
            // hash of the stub's empty payload would silently replace
            // with the empty-payload digest and poison every
            // content-keyed join; recompute only when the header is
            // absent and the payload arrived whole
            val digest = r.payload_digest
              .map(_.replaceFirst("(?i)^sha1:", ""))
              .orElse(if (r.truncated) None else Some(sha1Base32(r.payload)))
            (Option(Cdx.surtString(r.target_uri.orNull)),
              ts14, r.target_uri, mime, r.http_status, digest,
              fn, off, len, r.warc_type)
          }
        }
      }
    }.toDF("__surt", "__ts14", "url", "mime", "status", "digest",
      "filename", "offset", "length", "warc_type")
    rows.select(
      col("__surt").as("surt_key"),
      try_to_timestamp(col("__ts14"), lit("yyyyMMddHHmmss")).as("ts"),
      col("url"), col("mime"), col("status"), col("digest"),
      col("filename"), col("offset"), col("length"),
      lit(null).cast("string").as("languages"),
      lit(null).cast("string").as("charset"),
      col("warc_type"))
  }

  /** Split a `.warc.gz` byte array into gzip members:
    * `(offset, compressedLength, decompressedBytes)` per member. Real
    * header walk (magic/CM check, FLG extras) + Inflater(nowrap)
    * consumption count + the 8-byte CRC32/ISIZE trailer — the only way
    * to recover member boundaries the writer did not record.
    */
  private[sources] def gzipMembers(
      bytes: Array[Byte],
      path: String
  ): Iterator[(Long, Long, Array[Byte])] = new Iterator[(Long, Long, Array[Byte])] {
    private var pos = 0
    override def hasNext: Boolean = pos + 10 <= bytes.length
    override def next(): (Long, Long, Array[Byte]) = {
      val start = pos
      require((bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
        s"$path: expected a gzip member at offset $pos, found " +
          f"0x${bytes(pos) & 0xff}%02x${bytes(pos + 1) & 0xff}%02x")
      require((bytes(pos + 2) & 0xff) == 8,
        s"$path: unsupported gzip compression method ${bytes(pos + 2) & 0xff}")
      val flg = bytes(pos + 3) & 0xff
      var p = pos + 10
      // every extra-field walk is bounds-checked: a corrupt FEXTRA length
      // or an unterminated FNAME must fail with a locatable error, not an
      // ArrayIndexOutOfBounds from deep inside the indexer
      def truncated(): Nothing = throw new EOFException(
        s"$path: truncated gzip member header at offset $start")
      if ((flg & 0x04) != 0) { // FEXTRA
        if (p + 2 > bytes.length) truncated()
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
        if (p > bytes.length) truncated()
      }
      if ((flg & 0x08) != 0) { // FNAME
        while (p < bytes.length && bytes(p) != 0) p += 1
        if (p >= bytes.length) truncated()
        p += 1
      }
      if ((flg & 0x10) != 0) { // FCOMMENT
        while (p < bytes.length && bytes(p) != 0) p += 1
        if (p >= bytes.length) truncated()
        p += 1
      }
      if ((flg & 0x02) != 0) p += 2 // FHCRC
      if (p >= bytes.length) truncated()
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, p, bytes.length - p)
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val buf = new Array[Byte](1 << 16)
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n > 0) out.write(buf, 0, n)
          else if (inf.needsInput()) throw new EOFException(
            s"$path: truncated gzip member at offset $start")
        }
        val consumed = (bytes.length - p) - inf.getRemaining
        val end = p + consumed + 8 // CRC32 + ISIZE trailer
        require(end <= bytes.length,
          s"$path: gzip member at offset $start is missing its trailer")
        pos = end
        (start.toLong, (end - start).toLong, out.toByteArray)
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new java.io.IOException(
            s"$path: corrupt gzip member at offset $start", e)
      } finally inf.end()
    }
  }

  /** The shared sharded-record writer behind [[writeWarcResponses]] /
    * [[writeWetConversions]]: one `.warc.gz`/`.warc.zst` per task (rolled
    * every `maxRecordsPerShard`), member-per-record framing in all codecs
    * (gzip members per the WARC spec's recommendation, concatenated zstd
    * frames for `.warc.zst`), attempt-unique-temp + rename-on-finish
    * commit, non-empty-dir refusal. `zstd-dict` additionally trains a
    * PER-SHARD dictionary on the shard's first records and emits it in
    * the iipc 0x184D2A5D skippable frame — member-per-record framing
    * compresses each small record in isolation, which is exactly where a
    * shared dictionary pays; shards too small to train fall back to plain
    * frames, which the reader handles transparently. `mkRecord` renders
    * one row to complete record bytes (header + block + trailing CRLFs).
    */
  private def writeShardedRecords(
      projected: DataFrame,
      outDir: String,
      codec: String,
      maxRecordsPerShard: Int,
      overwrite: Boolean,
      errName: String,
      // per-record CDXJ index line builder, called with the member's
      // (offset, compressedLength, shardFileName) once both are known —
      // offset/length at write time (FSDataOutputStream.getPos brackets
      // the member, dictionary frames included in the arithmetic because
      // they too go through `out`), the shard name at close time
      indexFor: Option[org.apache.spark.sql.Row => (Long, Long, String) => String] = None
  )(mkRecord: org.apache.spark.sql.Row => Array[Byte]): Unit = {
    require(maxRecordsPerShard > 0, "maxRecordsPerShard must be positive")
    require(codec == "gzip" || codec == "zstd" || codec == "zstd-dict",
      s"codec must be gzip|zstd|zstd-dict, got $codec")
    val ext = if (codec.startsWith("zstd")) ".warc.zst" else ".warc.gz"
    val conf = new SerializableConfiguration(
      projected.sparkSession.sparkContext.hadoopConfiguration)
    val driverFs = FileSystem.get(new java.net.URI(outDir), conf.value)
    val outPath = new Path(outDir)
    if (driverFs.exists(outPath)) {
      val existing = driverFs.listStatus(outPath)
      if (existing.nonEmpty) {
        if (overwrite) existing.foreach(st => driverFs.delete(st.getPath, true))
        else throw new IllegalArgumentException(
          s"$errName: output directory $outDir is not empty " +
            s"(${existing.length} entries, e.g. ${existing.head.getPath.getName}); " +
            "pass overwrite = true to clear it, or choose a fresh directory")
      }
    }
    projected.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val attempt = tc.taskAttemptId()
        val fs = FileSystem.get(new java.net.URI(outDir), conf.value)
        var shardNo = 0
        var inShard = 0
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var tmpPath: Path = null
        def open(): Unit = {
          tmpPath = new Path(outDir,
            f".inprogress-$attempt%d-part-$pid%05d-$shardNo%04d$ext")
          out = fs.create(tmpPath, true)
        }
        val idxEntries: scala.collection.mutable.ArrayBuffer[String => String] =
          if (indexFor.isDefined) new scala.collection.mutable.ArrayBuffer()
          else null
        def close(): Unit = if (out != null) {
          out.close(); out = null
          val finalName = f"part-$pid%05d-$shardNo%04d$ext"
          val finalPath = new Path(outDir, finalName)
          if (!fs.rename(tmpPath, finalPath)) {
            // discard the temp ONLY for a lost speculative race (dest
            // already complete); a transient rename failure must FAIL the
            // task so it retries — silently deleting here would lose up
            // to maxRecordsPerShard records with a green job status
            if (fs.exists(finalPath)) fs.delete(tmpPath, false)
            else throw new java.io.IOException(
              s"$errName: rename $tmpPath -> $finalPath failed " +
                "and the destination does not exist; failing the task so " +
                "it retries instead of dropping the shard")
          }
          tmpPath = null
          if (idxEntries != null && idxEntries.nonEmpty) {
            // sidecar: same temp+rename commit; named part-…-….cdxj so the
            // readers' "*.warc*" glob never sees it
            val base = finalName.stripSuffix(ext)
            val idxTmp = new Path(outDir,
              f".inprogress-$attempt%d-$base%s.cdxj")
            val os = fs.create(idxTmp, true)
            try os.write(idxEntries.iterator.map(_(finalName))
              .mkString("", "\n", "\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally os.close()
            val idxFinal = new Path(outDir, base + ".cdxj")
            if (!fs.rename(idxTmp, idxFinal)) {
              if (fs.exists(idxFinal)) fs.delete(idxTmp, false)
              else throw new java.io.IOException(
                s"$errName: rename $idxTmp -> $idxFinal failed and the " +
                  "destination does not exist; failing the task so the " +
                  "shard (and its index) is retried, not silently unindexed")
            }
            idxEntries.clear()
          }
        }
        // zstd-dict per-shard state: the first `DictSampleRecords` records
        // buffer in memory, a dictionary trains on them, the 0x184D2A5D
        // frame and the buffered members flush, then the rest streams
        // dict-compressed. null dict after resolution = training declined
        // (shard too small / trainer failed) → plain frames.
        val useDict = codec == "zstd-dict"
        var pending: scala.collection.mutable.ArrayBuffer[
            (Array[Byte], (Long, Long, String) => String)] =
          if (useDict) new scala.collection.mutable.ArrayBuffer() else null
        var dict: Array[Byte] = null
        // digested once per shard: setDict(bytes) would re-run
        // ZSTD_CCtx_loadDictionary per MEMBER — 100k redundant ~16 KiB
        // dictionary digests per default shard on the hot write path
        var dictC: com.github.luben.zstd.ZstdDictCompress = null
        var dictDone = !useDict
        def writeMember(
            bytes: Array[Byte],
            mkLine: (Long, Long, String) => String): Unit = {
          // one compressed member per record: the member stream closes
          // over a wrapper whose close() is a no-op, so finishing a
          // member never closes the underlying shard stream
          val posBefore = out.getPos
          val shard = out
          val noClose = new java.io.FilterOutputStream(shard) {
            override def write(b: Array[Byte], off: Int, len: Int): Unit =
              shard.write(b, off, len) // bulk passthrough (default is per-byte)
            override def close(): Unit = {} // member boundary, not file end
          }
          val member: java.io.OutputStream =
            if (codec.startsWith("zstd")) {
              val z = new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(noClose)
              if (dictC != null) z.setDict(dictC)
              z
            } else new GZIPOutputStream(noClose)
          member.write(bytes)
          member.close() // flushes the member/frame trailer; shard stays open
          if (mkLine != null && idxEntries != null) {
            val len = out.getPos - posBefore
            idxEntries += (fn => mkLine(posBefore, len, fn))
          }
        }
        def flushPending(): Unit = {
          dict = trainDictionary(pending.map(_._1))
          if (dict != null) {
            dictC = new com.github.luben.zstd.ZstdDictCompress(dict, 3)
            // skippable frame, magic 0x184D2A5D little-endian + u32 size
            out.write(Array(0x5d, 0x2a, 0x4d, 0x18,
              dict.length & 0xff, (dict.length >> 8) & 0xff,
              (dict.length >> 16) & 0xff, (dict.length >> 24) & 0xff)
              .map(_.toByte))
            out.write(dict)
          }
          pending.foreach { case (b, mk) => writeMember(b, mk) }
          pending.clear()
          dictDone = true
        }
        open()
        rows.foreach { r =>
          if (inShard >= maxRecordsPerShard) {
            if (!dictDone) flushPending()
            close(); shardNo += 1; inShard = 0; open()
            if (useDict) {
              if (dictC != null) { dictC.close(); dictC = null }
              dict = null; dictDone = false
            }
          }
          val record = mkRecord(r)
          val mkLine: (Long, Long, String) => String =
            indexFor.map(f => f(r)).orNull
          if (!dictDone) {
            pending += ((record, mkLine))
            if (pending.length >= DictSampleRecords) flushPending()
          } else writeMember(record, mkLine)
          inShard += 1
        }
        if (!dictDone) flushPending()
        close()
        if (dictC != null) { dictC.close(); dictC = null }
      }
    }
  }

  /** Records buffered per shard before dictionary training (`zstd-dict`).
    * 256 typical web records ≈ a few MB of executor memory — enough sample
    * mass for zstd's trainer; records past the sample still compress with
    * the dictionary (crawl shards are homogeneous, the convention's bet).
    */
  private val DictSampleRecords = 256

  /** Train a zstd dictionary on the buffered records; null when the shard
    * is too small to train or the trainer declines (both are normal for
    * tail shards — callers fall back to plain frames, which the reader
    * handles). Dict size 16 KiB: zstd's guidance is ~1/100 of sample mass,
    * and 256 × ~10 KiB records sit right around it.
    */
  private def trainDictionary(
      samples: scala.collection.Seq[Array[Byte]]): Array[Byte] = {
    val total = samples.iterator.map(_.length.toLong).sum
    if (samples.length < 8 || total < 16384) return null
    try {
      // dict size scaled to sample mass (zstd wants dict ≪ samples;
      // a fixed 16 KiB dict over a few-KiB sample set fails to train)
      val dictSize = math.min(16L << 10, math.max(1024L, total / 10)).toInt
      val trainer = new com.github.luben.zstd.ZstdDictTrainer(
        math.min(total, 32L << 20).toInt, dictSize)
      samples.foreach(trainer.addSample)
      val d = trainer.trainSamples()
      if (d == null || d.isEmpty) null else d
    } catch {
      case _: com.github.luben.zstd.ZstdException => null
    }
  }

  /** FNV-1a 64-bit over UTF-8 — deterministic record-ID material. */
  private[sources] def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes("UTF-8").foreach { b =>
      h ^= (b & 0xffL)
      h *= 0x100000001b3L
    }
    h
  }

  // ---------------------------------------------------------------- parse

  /** Parse one WARC file's bytes (plain or gzip, single or concatenated
    * members) into record rows. Streaming: one record's capped payload in
    * memory at a time.
    */
  private[sources] def parseFile(
      path: String,
      bytes: Array[Byte],
      maxPayloadBytes: Int
  ): Iterator[WarcRow] = {
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        new GZIPInputStream(raw, 1 << 16)
      else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x28 &&
          (bytes(1) & 0xff) == 0xb5 && (bytes(2) & 0xff) == 0x2f &&
          (bytes(3) & 0xff) == 0xfd) {
        // .warc.zst: concatenated zstd frames (member-per-record, the
        // layout this library's writer emits and newer CommonCrawl
        // segments ship); continuous mode reads across frame boundaries
        val z = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(raw)
        z.setContinuous(true)
        z
      } else if (isZstSkippable(bytes, 0)) {
        // zstd SKIPPABLE frame(s) (0x184D2A50..5F little-endian) before
        // the records: the iipc warc.zst convention stores a shared
        // compression DICTIONARY in magic 0x184D2A5D — itself possibly
        // zstd-compressed (the spec allows both). Load it (zstd-jni
        // auto-detects structured vs raw-content dictionaries), skip any
        // OTHER leading skippable frames (that's what skippable means),
        // and decode the member frames against it in continuous mode.
        var off = 0
        var dict: Array[Byte] = null
        while (isZstSkippable(bytes, off)) {
          // u32 size compared in Long: an adversarial size near 2^31 must
          // hit the truncation error, not overflow past it into an opaque
          // ArrayIndexOutOfBounds downstream
          val sizeL = leU32(bytes, off + 4)
          if (off + 8L + sizeL > bytes.length)
            throw new IllegalArgumentException(
              s"$path: truncated zstd skippable frame at offset $off")
          val size = sizeL.toInt
          if ((bytes(off) & 0xff) == 0x5d && dict == null) {
            val content = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
            dict =
              if (content.length >= 4 && (content(0) & 0xff) == 0x28 &&
                  (content(1) & 0xff) == 0xb5 && (content(2) & 0xff) == 0x2f &&
                  (content(3) & 0xff) == 0xfd) {
                // compressed dictionary: one plain zstd frame around it
                val zin = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
                  new ByteArrayInputStream(content))
                try zin.readAllBytes() finally zin.close()
              } else content
          }
          off += 8 + size
        }
        val z = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
          new ByteArrayInputStream(bytes, off, bytes.length - off))
        if (dict != null) z.setDict(dict)
        z.setContinuous(true)
        z
      } else raw
    var idx = -1
    Iterator.continually(parseRecord(path, in, maxPayloadBytes))
      .takeWhile(_.isDefined)
      .map { r => idx += 1; r.get.copy(record_index = idx) }
  }

  /** zstd skippable-frame magic 0x184D2A50..5F (little-endian) at `off`. */
  private def isZstSkippable(bytes: Array[Byte], off: Int): Boolean =
    off + 8 <= bytes.length && (bytes(off) & 0xf0) == 0x50 &&
      (bytes(off + 1) & 0xff) == 0x2a && (bytes(off + 2) & 0xff) == 0x4d &&
      (bytes(off + 3) & 0xff) == 0x18

  /** Little-endian u32 as an unsigned Long (overflow-proof comparisons). */
  private def leU32(bytes: Array[Byte], off: Int): Long =
    ((bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
      ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24))

  /** Read one line up to CRLF (or LF — lenient); None at clean EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      buf.write(c)
      c = in.read()
    }
    val s = buf.toString("UTF-8")
    Some(if (s.endsWith("\r")) s.substring(0, s.length - 1) else s)
  }

  private def readFully(in: InputStream, buf: Array[Byte], len: Int): Unit = {
    var off = 0
    while (off < len) {
      val n = in.read(buf, off, len - off)
      if (n < 0) throw new EOFException(
        s"truncated WARC content block ($len bytes expected, got $off)")
      off += n
    }
  }

  private def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    val tmp = new Array[Byte](8192)
    while (left > 0) {
      val r = in.read(tmp, 0, math.min(left, tmp.length.toLong).toInt)
      if (r < 0) throw new EOFException(
        s"truncated WARC content block ($n bytes to skip, $left left)")
      left -= r
    }
  }

  /** One record, or None at end of stream. Lenient to blank lines between
    * records (the spec's two post-block CRLFs arrive here as empties).
    */
  private def parseRecord(
      path: String,
      in: InputStream,
      maxPayloadBytes: Int
  ): Option[WarcRow] = {
    // seek the version line across inter-record padding
    var version: Option[String] = None
    var line = readLine(in)
    while (line.isDefined && version.isEmpty) {
      val l = line.get
      if (l.startsWith("WARC/")) version = Some(l)
      else if (l.nonEmpty)
        throw new IllegalArgumentException(
          s"$path: expected a WARC/1.x version line, got '${l.take(80)}'")
      else line = readLine(in)
    }
    if (version.isEmpty) return None

    // headers: Name: value, with SP/HT continuation folding
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    var done = false
    while (!done) {
      val l = readLine(in).getOrElse(throw new EOFException(
        s"$path: EOF inside a WARC header block"))
      if (l.isEmpty) done = true
      else if ((l.charAt(0) == ' ' || l.charAt(0) == '\t') && lastKey != null)
        headers(lastKey) = headers(lastKey) + " " + l.trim
      else {
        val colonAt = l.indexOf(':')
        if (colonAt < 0) throw new IllegalArgumentException(
          s"$path: malformed WARC header line '${l.take(80)}'")
        lastKey = l.substring(0, colonAt).trim.toLowerCase(java.util.Locale.ROOT)
        headers(lastKey) = l.substring(colonAt + 1).trim
      }
    }
    val rawLen = headers.getOrElse("content-length",
      throw new IllegalArgumentException(
        s"$path: WARC record without Content-Length"))
    val contentLength =
      try rawLen.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$path: malformed WARC Content-Length '${rawLen.take(40)}'")
      }
    val toRead = math.min(contentLength, maxPayloadBytes.toLong).toInt
    val block = new Array[Byte](toRead)
    readFully(in, block, toRead)
    if (contentLength > toRead) skipFully(in, contentLength - toRead)
    val truncated = contentLength > toRead

    val warcType = headers.getOrElse("warc-type", "unknown")
    val recCt = headers.get("content-type")
    val isHttp = recCt.exists(_.toLowerCase(java.util.Locale.ROOT)
      .startsWith("application/http"))
    val (status, httpCt, payload) =
      if (isHttp) parseHttp(block) else (None, None, block)
    Some(WarcRow(
      warc_file = path,
      record_index = 0, // filled by parseFile
      warc_type = warcType,
      record_id = headers.get("warc-record-id"),
      target_uri = headers.get("warc-target-uri"),
      warc_date = headers.get("warc-date"),
      content_type = recCt,
      content_length = contentLength,
      http_status = status,
      http_content_type = httpCt,
      payload = payload,
      truncated = truncated,
      payload_digest = headers.get("warc-payload-digest"),
      refers_to = headers.get("warc-refers-to"),
      warc_profile = headers.get("warc-profile")))
  }

  /** Split an HTTP/1.x message block into (status, content-type, body).
    * Lenient: a block that does not look like HTTP comes back whole as the
    * body (a truncated-capture guard — CommonCrawl contains such records).
    */
  private[sources] def parseHttp(
      block: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    // find the CRLFCRLF (or LFLF) header/body boundary
    var i = 0
    var bodyAt = -1
    while (bodyAt < 0 && i < block.length) {
      if (block(i) == '\n') {
        if (i + 1 < block.length && block(i + 1) == '\n') bodyAt = i + 2
        else if (i + 2 < block.length && block(i + 1) == '\r' && block(i + 2) == '\n')
          bodyAt = i + 3
        else if (i + 1 == block.length) bodyAt = i + 1
      }
      i += 1
    }
    if (bodyAt < 0) return (None, None, block)
    val head = new String(block, 0, bodyAt, "UTF-8")
    val lines = head.split("\r?\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return (None, None, block)
    val status = lines(0).split(" ", 3) match {
      case parts if parts.length >= 2 && parts(1).forall(_.isDigit) &&
        parts(1).nonEmpty => Some(parts(1).toInt)
      case _ => None
    }
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }
    (status, ct, java.util.Arrays.copyOfRange(block, bodyAt, block.length))
  }
}

