package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** WAT metadata archives: envelope render/parse roundtrip, record shape,
  * cross-referencing with the response archive, config-only sink.
  */
class WatSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("wat_spec_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("writeWat → readWarc → parseWat: links in document order, title " +
    "present/absent, torn JSON tolerated") {
    val dir = tmpDir()
    val pages = Seq(
      ("https://a.test/1",
        "<html><head><title>One</title></head><body>" +
          "<a href=\"https://x.test/p\">x</a>" +
          "<a href='/rel'>r</a><a href=//proto.test/q>p</a></body></html>"),
      ("https://a.test/2", "<html><body>no links no title</body></html>"))
      .toDF("uri", "html")
    Wat.writeWat(pages, dir, "uri", "html")
    val raw = Warc.readWarc(spark, dir)
    assert(raw.count() == 2)
    raw.collect().foreach { r =>
      assert(r.getAs[String]("warc_type") == "metadata")
      assert(r.getAs[String]("content_type") == "application/json")
      assert(r.getAs[String]("refers_to") != null)
    }
    val parsed = Wat.parseWat(raw)
      .select(col("target_uri"), col("title"),
        expr("transform(links, l -> l.url)").as("urls"),
        expr("transform(links, l -> l.path)").as("paths"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        r.getSeq[String](2).toList, r.getSeq[String](3).toList))).toMap
    // hrefs extracts double-quoted, then single-quoted, then unquoted;
    // each written entry carries the published path convention A@/href
    assert(parsed("https://a.test/1") ==
      (("One", List("https://x.test/p", "/rel", "//proto.test/q"),
        List("A@/href", "A@/href", "A@/href"))))
    assert(parsed("https://a.test/2") == ((null, Nil, Nil)))
    // torn JSON payload: null fields, never a failed parse
    val torn = Seq(("f", 0, "metadata", Some("id"), Some("https://t/1"),
      None: Option[String], Some("application/json"), 3L,
      None: Option[Int], None: Option[String],
      "{\"Envelope\": tor".getBytes("UTF-8"), false,
      None: Option[String], Some("<urn:x>"), None: Option[String]))
      .toDF("warc_file", "record_index", "warc_type", "record_id",
        "target_uri", "warc_date", "content_type", "content_length",
        "http_status", "http_content_type", "payload", "truncated",
        "payload_digest", "refers_to", "warc_profile")
    val t = Wat.parseWat(torn).collect()
    assert(t.length == 1 && t.head.isNullAt(2) && t.head.isNullAt(3))
  }

  test("writeWarcWithWat: sibling archives cross-reference by record id") {
    val parent = tmpDir()
    val warcDir = new java.io.File(parent, "warc").getPath
    val watDir = new java.io.File(parent, "wat").getPath
    val pages = Seq(("https://s.test/p",
      "<html><head><title>T</title></head><body>" +
        "<a href=\"https://o.test/\">o</a></body></html>")).toDF("uri", "html")
    Wat.writeWarcWithWat(pages, warcDir, watDir, "uri", "html")
    val resp = Warc.readWarc(spark, warcDir).collect().head
    val wat = Warc.readWarc(spark, watDir).collect().head
    assert(resp.getAs[String]("warc_type") == "response")
    assert(wat.getAs[String]("refers_to") == resp.getAs[String]("record_id"))
    // the WAT envelope's header metadata names the described capture
    val env = Wat.parseWat(Warc.readWarc(spark, watDir)).collect().head
    assert(env.getString(0) == "https://s.test/p")
    assert(env.getString(2) == "T")
  }

  test("pipeline wat sink: config-only WAT write, incl. the headers map") {
    val dir = tmpDir()
    val out = new java.io.File(dir, "wat").getPath
    Seq(("https://c.test/1",
      "<html><body><a href=\"https://d.test/x\">d</a></body></html>",
      Map("Server" -> "cfg/1")))
      .toDF("uri", "html", "hdrs").createOrReplaceTempView("wat_pages")
    graft.pipeline.Pipeline.run(spark,
      s"""source: wat_pages
         |sink: {format: wat, path: "$out", uri: uri, html: html,
         |  headers: hdrs}
         |""".stripMargin, name => spark.table(name))
    val got = Wat.parseWat(Warc.readWarc(spark, out))
      .select(expr("transform(links, l -> l.url)"),
        expr("http_headers['Server']")).collect().head
    assert(got.getSeq[String](0) == Seq("https://d.test/x"))
    assert(got.getString(1) == "cfg/1")
  }

  test("writeWarcWithWat container + headers: the envelope locates the " +
    "response record (the range decodes to it) and carries the header map") {
    val parent = tmpDir()
    val warcDir = new java.io.File(parent, "warc").getPath
    val watDir = new java.io.File(parent, "wat").getPath
    val pages = Seq(
      ("https://c.test/1",
        "<html><head><title>C1</title></head><body>" +
          "<a href=\"https://o.test/a\">a</a></body></html>",
        Map("Content-Type" -> "text/html", "Server" -> "srv/1.0")),
      ("https://c.test/2", "<html><body>plain</body></html>",
        Map("Content-Type" -> "text/plain")))
      .toDF("uri", "html", "hdrs")
    Wat.writeWarcWithWat(pages, warcDir, watDir, "uri", "html",
      headersCol = Some("hdrs"), container = true)
    val parsed = Wat.parseWat(Warc.readWarc(spark, watDir))
    val rows = parsed.collect()
      .map(r => r.getAs[String]("target_uri") -> r).toMap
    val r1 = rows("https://c.test/1")
    assert(r1.getAs[Map[String, String]]("http_headers")
      == Map("Content-Type" -> "text/html", "Server" -> "srv/1.0"))
    assert(r1.getAs[String]("container_filename").endsWith(".warc.gz"))
    assert(r1.getAs[Long]("container_offset") >= 0L)
    assert(r1.getAs[Long]("container_length") > 0L)
    // the Container range is REAL: fetching exactly those bytes from the
    // response archive decodes to the described record
    val plan = parsed
      .select(col("container_filename").as("filename"),
        col("container_offset").as("range_start"),
        (col("container_offset") + col("container_length")).as("range_end"),
        col("target_uri"))
    val back = Warc.readWarcRanges(spark, warcDir, plan)
      .select(col("target_uri"), col("payload").cast("string"))
      .as[(String, String)].collect().toMap
    assert(back("https://c.test/2") == "<html><body>plain</body></html>")
    assert(back("https://c.test/1").contains("<title>C1</title>"))
  }

  test("writeWarcWithWat container: a same-URL recapture frame FAILS " +
    "loudly instead of cross-matching containers through the url join") {
    val parent = tmpDir()
    val warcDir = new java.io.File(parent, "warc").getPath
    val watDir = new java.io.File(parent, "wat").getPath
    // two captures of the SAME url — the real-crawl recapture shape
    val pages = Seq(
      ("https://dup.test/page", "<html><body>first capture</body></html>"),
      ("https://dup.test/page", "<html><body>second capture</body></html>"),
      ("https://dup.test/other", "<html><body>fine</body></html>"))
      .toDF("uri", "html")
    val e = intercept[Exception] { // raise_error → SparkRuntimeException
      Wat.writeWarcWithWat(pages, warcDir, watDir, "uri", "html",
        container = true)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("duplicate capture url")))
  }

  test("parseWat tolerates and surfaces a REAL-shaped published envelope: " +
    "Container, Headers, Links with path/title/text keys") {
    // hand-written in the published iipc WAT layout (keys beyond the
    // subset schema are ignored; path/title/text surface per link)
    val env =
      """{"Container":{"Filename":"CC-MAIN-x.warc.gz","Compressed":true,
        |"Offset":"593","Length":"2012"},
        |"Envelope":{"Format":"WARC","WARC-Header-Length":"254",
        |"WARC-Header-Metadata":{"WARC-Target-URI":"http://r.example/",
        |"WARC-Date":"2024-01-01T00:00:00Z","WARC-Type":"response"},
        |"Payload-Metadata":{"Actual-Content-Type":"application/http",
        |"HTTP-Response-Metadata":{
        |"Headers":{"Content-Type":"text/html","Server":"Apache"},
        |"Headers-Length":"315",
        |"HTML-Metadata":{
        |"Head":{"Title":"Real Page","Metas":[{"name":"x","content":"y"}]},
        |"Links":[
        |{"path":"A@/href","url":"http://t.example/a","text":"anchor text"},
        |{"path":"IMG@/src","url":"/img/logo.png","alt":"logo"},
        |{"path":"LINK@/href","url":"/style.css","title":"css title"}
        |]}}}}}""".stripMargin.replace("\n", "")
    val frame = Seq(("f", 0, "metadata", Some("<urn:w>"),
      Some("http://r.example/"), None: Option[String],
      Some("application/json"), env.length.toLong, None: Option[Int],
      None: Option[String], env.getBytes("UTF-8"), false,
      None: Option[String], Some("<urn:x>"), None: Option[String]))
      .toDF("warc_file", "record_index", "warc_type", "record_id",
        "target_uri", "warc_date", "content_type", "content_length",
        "http_status", "http_content_type", "payload", "truncated",
        "payload_digest", "refers_to", "warc_profile")
    val got = Wat.parseWat(frame).collect().head
    assert(got.getAs[String]("title") == "Real Page")
    assert(got.getAs[String]("container_filename") == "CC-MAIN-x.warc.gz")
    assert(got.getAs[Long]("container_offset") == 593L)
    assert(got.getAs[Long]("container_length") == 2012L)
    assert(got.getAs[Map[String, String]]("http_headers")("Server") == "Apache")
    val links = got.getSeq[org.apache.spark.sql.Row](
      got.fieldIndex("links"))
    assert(links.map(_.getAs[String]("url"))
      == Seq("http://t.example/a", "/img/logo.png", "/style.css"))
    assert(links.map(_.getAs[String]("path"))
      == Seq("A@/href", "IMG@/src", "LINK@/href"))
    assert(links.head.getAs[String]("text") == "anchor text")
    assert(links(2).getAs[String]("title") == "css title")
  }
}
