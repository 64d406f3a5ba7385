package graft

/** Verbatim-LAYOUT public-format samples, hand-transcribed from the
  * published specifications and documentation — the interop anchors the
  * q111 gate family reads through the REAL readers and compares against
  * hand-written oracle literals (never against values computed by the
  * code under test):
  *
  *   - [[WarcSpecFile]] — a warcinfo + response + revisit record set in
  *     the shapes the WARC spec's annex examples use (ISO 28500 / the
  *     iipc warc-specifications annex: Heritrix warcinfo fields, the
  *     archive.org robots.txt response, a WARC-1.1
  *     `identical-payload-digest` revisit referring back to it).
  *     Content-Lengths are computed at fixture build so the records are
  *     internally consistent; every EXPECTED value in the gate's oracle
  *     is a hand-written literal (the payload digest
  *     `COG3DOA5RTNLK7TES7YYMA3RQV6RVV45` was computed once, outside
  *     this library, and pasted).
  *   - [[CdxjLines]] — capture-index lines in the published cc-index /
  *     pywb CDXJ layout (space after each JSON colon, quoted numerics,
  *     `mime-detected`/`redirect`/`charset`/`languages` keys, the
  *     empty-payload revisit digest `3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ` —
  *     base32 SHA-1 of zero bytes, a genuinely published constant).
  *     NOTE the published `languages` field carries ISO 639-3 codes
  *     (`eng`); this library's own indexer emits ISO 639-1 (`en`) — a
  *     documented divergence ([[graft.sources.Warc.indexWarc]]), and
  *     irrelevant to the reader, which surfaces the field verbatim.
  *   - [[WatEnvelope]] — a WAT envelope in the published iipc layout:
  *     top-level `Container`, `Format`/`*-Length` bookkeeping keys the
  *     subset schema must IGNORE, HTTP `Headers`, and `Links` entries
  *     carrying `path` + `text`/`title`/`alt` beside `url`.
  */
object PublishedSamples {

  /** One WARC record: version line, headers + computed Content-Length,
    * blank line, content block, two CRLFs.
    */
  private def rec(
      version: String,
      headers: Seq[(String, String)],
      block: Array[Byte]): Array[Byte] = {
    val head = (s"WARC/$version\r\n" +
      (headers :+ ("Content-Length" -> block.length.toString))
        .map { case (k, v) => s"$k: $v" }.mkString("", "\r\n", "\r\n") +
      "\r\n").getBytes("UTF-8")
    head ++ block ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** The robots.txt payload of the spec's response example. */
  val RobotsBody: String = "User-agent: *\nDisallow: /cgi-bin/\n"

  /** base32(SHA-1(RobotsBody)) — computed once outside this library. */
  val RobotsDigest: String = "COG3DOA5RTNLK7TES7YYMA3RQV6RVV45"

  /** The warcinfo record's warc-fields block (the spec annex's Heritrix
    * example fields).
    */
  val WarcInfoFields: String =
    "software: Heritrix 1.12.0 http://crawler.archive.org\r\n" +
      "hostname: crawling017.archive.org\r\n" +
      "ip: 207.241.227.234\r\n" +
      "isPartOf: testcrawl-20050708\r\n" +
      "description: testcrawl with WARC output\r\n" +
      "operator: IA_Admin\r\n" +
      "format: WARC file version 1.0\r\n"

  val ResponseRecordId = "<urn:uuid:92283950-ef2f-4d72-b224-f54c6ec90bb0>"

  private val httpResponseBlock: Array[Byte] =
    ("HTTP/1.1 200 OK\r\n" +
      "Date: Tue, 19 Sep 2006 17:18:40 GMT\r\n" +
      "Server: Apache/2.0.54 (Ubuntu) PHP/5.0.5-2ubuntu1.4 " +
      "mod_ssl/2.0.54 OpenSSL/0.9.7g\r\n" +
      "Last-Modified: Mon, 16 Jun 2003 22:28:51 GMT\r\n" +
      s"Content-Length: ${RobotsBody.getBytes("UTF-8").length}\r\n" +
      "Connection: close\r\n" +
      "Content-Type: text/plain; charset=UTF-8\r\n\r\n" +
      RobotsBody).getBytes("UTF-8")

  // the revisit's content block: the re-fetch's HTTP response line and
  // headers, no body (WARC-1.1 §6.7.2 records them so consumers know the
  // server's answer without the payload)
  private val httpRevisitBlock: Array[Byte] =
    ("HTTP/1.1 200 OK\r\n" +
      "Date: Tue, 06 Mar 2007 00:43:35 GMT\r\n" +
      "Server: Apache/2.0.54 (Ubuntu)\r\n" +
      "Content-Type: text/plain; charset=UTF-8\r\n\r\n").getBytes("UTF-8")

  /** The three spec-shaped records as one plain `.warc` file's bytes. */
  lazy val WarcSpecFile: Array[Byte] =
    rec("1.0", Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2006-09-19T17:20:14Z",
      "WARC-Record-ID" -> "<urn:uuid:d7ae5c10-e6b3-4d27-967d-34780c58ba39>",
      "Content-Type" -> "application/warc-fields"),
      WarcInfoFields.getBytes("UTF-8")) ++
    rec("1.0", Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://www.archive.org/robots.txt",
      "WARC-Date" -> "2006-09-19T17:20:24Z",
      "WARC-Record-ID" -> ResponseRecordId,
      "WARC-IP-Address" -> "207.241.229.39",
      "WARC-Payload-Digest" -> s"sha1:$RobotsDigest",
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponseBlock) ++
    rec("1.1", Seq(
      "WARC-Type" -> "revisit",
      "WARC-Target-URI" -> "http://www.archive.org/robots.txt",
      "WARC-Date" -> "2007-03-06T00:43:35Z",
      "WARC-Record-ID" -> "<urn:uuid:16da6da0-bcdc-49c3-927e-57494593b943>",
      "WARC-Profile" ->
        "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
      "WARC-Refers-To" -> ResponseRecordId,
      "WARC-Payload-Digest" -> s"sha1:$RobotsDigest",
      "Content-Type" -> "application/http; msgtype=response"),
      httpRevisitBlock)

  // ---------------------------------------------------------------------
  // Coded-payload records (HTTP transfer/content coding): real WARC
  // response records store the RAW captured message — chunked framing and
  // gzip content coding included (warcio/pywb undo both before handing
  // out payload). These four records pin that contract: every STORED byte
  // is fixed here (the gzip streams are byte literals generated once
  // outside this library, like the digests), so both the stored-block
  // digests and the decoded texts are hand-pasted oracle literals.

  /** The chunked transfer-coding example body in the published HTTP spec
    * lineage's layout (hex chunk sizes, data chunks carrying CRLFs,
    * last-chunk, blank trailer section). Decodes to [[ChunkedDecoded]].
    */
  val ChunkedBody: Array[Byte] =
    "4\r\nWiki\r\n6\r\npedia \r\nE\r\nin \r\n\r\nchunks.\r\n0\r\n\r\n"
      .getBytes("ISO-8859-1")

  val ChunkedDecoded: String = "Wikipedia in \r\n\r\nchunks."

  /** base32(SHA-1(ChunkedBody)) — computed once outside this library:
    * the STORED payload block's digest (the crawl convention), not the
    * decoded entity's.
    */
  val ChunkedStoredDigest: String = "YXT4BYEXT6EGMF5Q3QLCBN52E64SFXS4"

  /** The gzip-coded entity's decoded text (oracle literal). */
  val GzipText: String =
    "The quick brown fox jumps over the lazy dog. Plain English prose, " +
      "stored gzip-coded in the archive, exactly as real captures arrive " +
      "from the server.\n"

  /** gzip(GzipText) as fixed bytes — generated once outside this library
    * (mtime 0) and pasted, so the stored block and its digest are
    * constants, not re-derived by the code under test.
    */
  val GzipBodyBytes: Array[Byte] = hexBytes(
    "1f8b08000000000002ff1dcdc115c2300c03d03b536800e816dc39b08049dd2690c6" +
      "c14e4adbe931dcf49ebe9eee91f1ee29bcf050f9144cb2e1d9976a909515cdeb4c" +
      "c78e51e601b74ca9e05ae69c2ca2aa189f614d9447cc47aa9720a34737bf1d6988" +
      "6975c11b8596779041993202d5d695cd853ac0a4b2fc17c6eaa7c3e90b82f4d361" +
      "95000000")

  val GzipStoredDigest: String = "2WLFLN4DXAGJKV4HDP2QXUKGZP2YSDY6"

  /** The chunked+gzipped entity's decoded text (oracle literal). */
  val ChunkedGzipText: String =
    "Chunked and gzipped together: the transfer coding frames the wire " +
      "bytes while the content coding compresses the entity, and a " +
      "reader must undo both in order.\n"

  private val ChunkedGzipInner: Array[Byte] = hexBytes(
    "1f8b08000000000002ff358dd10dc3200c44ff3bc50d507580fe7612020ea0141b" +
      "19a3289dbe166a7f4ebe7bb6ef55261f941038217f6aef3e9b64b242fa842b4c03" +
      "8f9d145152e58c5d43a3b1d05995b05de6f62cf54d2b8cc2466cfff528ad2b8df1" +
      "3b7152edbaafbe00a590fc739bc330390936b182ca10f5fc71fb02d6e6ebf69e00" +
      "0000")

  /** The chunked framing AROUND the gzip stream (two data chunks split
    * at byte 60, then last-chunk) — `Transfer-Encoding: chunked` +
    * `Content-Encoding: gzip` on one message, the decode-both-in-order
    * case.
    */
  val ChunkedGzipBody: Array[Byte] = {
    val c1 = ChunkedGzipInner.take(60)
    val c2 = ChunkedGzipInner.drop(60)
    s"${c1.length.toHexString.toUpperCase}\r\n".getBytes("ISO-8859-1") ++
      c1 ++ "\r\n".getBytes("ISO-8859-1") ++
      s"${c2.length.toHexString.toUpperCase}\r\n".getBytes("ISO-8859-1") ++
      c2 ++ "\r\n0\r\n\r\n".getBytes("ISO-8859-1")
  }

  val ChunkedGzipStoredDigest: String = "UPBERXOYSZH3SZMKW5YOABA7LVBDSXNZ"

  /** A body claiming `Content-Encoding: br` — no JDK brotli decoder
    * exists, so readers must keep the stored bytes verbatim and say so
    * (`payload_decoded = false`). Deliberately NOT valid brotli.
    */
  val BrBody: Array[Byte] =
    Array[Byte](0x8b.toByte, 0x02, 0x80.toByte) ++
      "not really brotli".getBytes("ISO-8859-1") ++ Array[Byte](0x03)

  /** base32(SHA-1(BrBody)) — outside-computed; the br record carries NO
    * WARC-Payload-Digest header, so an indexer must RECOMPUTE over the
    * stored block and land exactly here.
    */
  val BrStoredDigest: String = "XYNO4TIWTAPFNQLBSEEG3AKGT7ZFMVKY"

  private def codedHttpBlock(
      headers: Seq[String], body: Array[Byte]): Array[Byte] =
    (("HTTP/1.1 200 OK" +: headers).mkString("", "\r\n", "\r\n") + "\r\n")
      .getBytes("ISO-8859-1") ++ body

  /** Four response records exercising the captured-coding matrix:
    * chunked, gzip, chunked+gzip, and unsupported br — one plain `.warc`
    * file's bytes, every stored byte fixed.
    */
  lazy val CodedWarcFile: Array[Byte] =
    rec("1.0", Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://coded.example/chunked",
      "WARC-Date" -> "2024-01-02T03:04:05Z",
      "WARC-Record-ID" -> "<urn:uuid:0a314b11-17c8-4bb5-a2a6-a407e1011001>",
      "WARC-Payload-Digest" -> s"sha1:$ChunkedStoredDigest",
      "Content-Type" -> "application/http; msgtype=response"),
      codedHttpBlock(Seq(
        "Content-Type: text/plain; charset=UTF-8",
        "Transfer-Encoding: chunked"), ChunkedBody)) ++
    rec("1.0", Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://coded.example/gzipped",
      "WARC-Date" -> "2024-01-02T03:04:05Z",
      "WARC-Record-ID" -> "<urn:uuid:0a314b11-17c8-4bb5-a2a6-a407e1011002>",
      "WARC-Payload-Digest" -> s"sha1:$GzipStoredDigest",
      "Content-Type" -> "application/http; msgtype=response"),
      codedHttpBlock(Seq(
        "Content-Type: text/html; charset=UTF-8",
        "Content-Encoding: gzip"), GzipBodyBytes)) ++
    rec("1.0", Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://coded.example/both",
      "WARC-Date" -> "2024-01-02T03:04:05Z",
      "WARC-Record-ID" -> "<urn:uuid:0a314b11-17c8-4bb5-a2a6-a407e1011003>",
      "WARC-Payload-Digest" -> s"sha1:$ChunkedGzipStoredDigest",
      "Content-Type" -> "application/http; msgtype=response"),
      codedHttpBlock(Seq(
        "Content-Type: text/html; charset=UTF-8",
        "Content-Encoding: gzip",
        "Transfer-Encoding: chunked"), ChunkedGzipBody)) ++
    rec("1.0", Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://coded.example/brotli",
      "WARC-Date" -> "2024-01-02T03:04:05Z",
      "WARC-Record-ID" -> "<urn:uuid:0a314b11-17c8-4bb5-a2a6-a407e1011004>",
      // no WARC-Payload-Digest: the indexer must recompute over the
      // STORED block (BrStoredDigest)
      "Content-Type" -> "application/http; msgtype=response"),
      codedHttpBlock(Seq(
        "Content-Type: text/plain",
        "Content-Encoding: br"), BrBody))

  private def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  /** Published-layout CDXJ lines (pywb docs sample shape; cc-index server
    * output shape with its extra keys and long crawl-data filenames).
    */
  val CdxjLines: Seq[String] = Seq(
    """com,example)/ 20170730223850 {"url": "http://example.com", "mime": "text/html", "status": "200", "digest": "G7HRM7BGOKSKMSXZAHMUQTTV53QOFSMK", "length": "1219", "offset": "771", "filename": "example.warc.gz"}""",
    """org,commoncrawl)/faq 20240714031134 {"url": "https://commoncrawl.org/faq", "mime": "text/html", "mime-detected": "text/html", "status": "200", "digest": "UYXVCD72DAPCRXBBKFE6KIZWCY5F3OAY", "length": "9754", "offset": "754067", "filename": "crawl-data/CC-MAIN-2024-30/segments/1720763514759.39/warc/CC-MAIN-20240714031134-20240714061134-00000.warc.gz", "charset": "UTF-8", "languages": "eng"}""",
    """org,commoncrawl)/ 20240722120756 {"url": "https://commoncrawl.org/", "mime": "warc/revisit", "status": "200", "digest": "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ", "length": "545", "offset": "130171", "filename": "crawl-data/CC-MAIN-2024-30/segments/1720763514759.39/crawldiagnostics/CC-MAIN-20240722115029-20240722145029-00434.warc.gz"}""",
    """com,example)/path?a=1&b=2 20230601000000 {"url": "https://www.example.com/path?b=2&a=1", "mime": "text/html", "status": "301", "redirect": "https://example.com/new", "digest": "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA", "length": "412", "offset": "0", "filename": "redirect.warc.gz"}""")

  /** Cluster-index lines in the published pywb ZipNum layout (the
    * two-level cc-index entry: a plain-text `cluster.idx` holding one
    * line per compressed CDXJ block —
    * `<surt key> <14-digit ts>\t<shard file>\t<offset>\t<length>\t<seq>`
    * — tab-separated, the block key being the block's FIRST line's
    * space-joined `<surt> <ts>` prefix, `seq` 1-BASED per the published
    * convention, consecutive blocks' offsets contiguous within a shard).
    * Two shard files so per-shard boundary planning is exercised; the
    * q113 gates pin both the parsed field surface and the hand-computed
    * candidate-block plan for a prefix query.
    */
  val ClusterIdxLines: Seq[String] = Seq(
    "0,100,22,165)/ 20170417004624\tcdx-00000.gz\t0\t195191\t1",
    "com,example)/ 20200101000000\tcdx-00000.gz\t195191\t180000\t2",
    "com,example)/path 20200601120000\tcdx-00000.gz\t375191\t170500\t3",
    "net,example)/ 20210101000000\tcdx-00000.gz\t545691\t160000\t4",
    "org,commoncrawl)/ 20240101000000\tcdx-00001.gz\t0\t150000\t1",
    "org,wikipedia)/ 20240201000000\tcdx-00001.gz\t150000\t140000\t2")

  /** A WAT envelope in the published iipc layout (Container first,
    * bookkeeping keys, Headers map, rich Links entries).
    */
  val WatEnvelope: String =
    """{"Container":{"Filename":"CC-MAIN-20240722115029-20240722145029-00434.warc.gz","Compressed":true,"Offset":"593","Length":"2012"},""" +
    """"Envelope":{"Format":"WARC","WARC-Header-Length":"254",""" +
    """"WARC-Header-Metadata":{"WARC-Target-URI":"http://r.example/","WARC-Date":"2024-01-01T00:00:00Z","WARC-Type":"response"},""" +
    """"Payload-Metadata":{"Actual-Content-Type":"application/http; msgtype=response","Trailing-Slop-Length":"4",""" +
    """"HTTP-Response-Metadata":{"Response-Message":{"Status":"200","Version":"HTTP/1.1","Reason":"OK"},""" +
    """"Headers":{"Content-Type":"text/html","Server":"Apache"},"Headers-Length":"315","Entity-Length":"1697",""" +
    """"HTML-Metadata":{"Head":{"Title":"Real Page","Metas":[{"name":"viewport","content":"width=device-width"}]},""" +
    """"Links":[{"path":"A@/href","url":"http://t.example/a","text":"anchor text"},""" +
    """{"path":"IMG@/src","url":"/img/logo.png","alt":"logo"},""" +
    """{"path":"LINK@/href","url":"/style.css","title":"css title"}]}}}}}"""
}
