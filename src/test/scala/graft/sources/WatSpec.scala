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
    val parsed = Wat.parseWat(raw).collect()
      .map(r => r.getString(0) -> ((r.getString(2),
        r.getSeq[String](3).toList))).toMap
    // hrefs extracts double-quoted, then single-quoted, then unquoted
    assert(parsed("https://a.test/1") ==
      (("One", List("https://x.test/p", "/rel", "//proto.test/q"))))
    assert(parsed("https://a.test/2") == ((null, Nil)))
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

  test("pipeline wat sink: config-only WAT write") {
    val dir = tmpDir()
    val out = new java.io.File(dir, "wat").getPath
    Seq(("https://c.test/1",
      "<html><body><a href=\"https://d.test/x\">d</a></body></html>"))
      .toDF("uri", "html").createOrReplaceTempView("wat_pages")
    graft.pipeline.Pipeline.run(spark,
      s"""source: wat_pages
         |sink: {format: wat, path: "$out", uri: uri, html: html}
         |""".stripMargin, name => spark.table(name))
    val got = Wat.parseWat(Warc.readWarc(spark, out)).collect().head
    assert(got.getSeq[String](3) == Seq("https://d.test/x"))
  }
}
