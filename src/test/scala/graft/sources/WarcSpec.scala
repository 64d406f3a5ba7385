package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** WARC source/sink: write→read roundtrip, hand-built record parsing
  * (record types, header folding, CRLF/LF leniency, concatenated gzip
  * members, payload truncation, HTTP splitting), and the commit-protocol
  * refusals shared with the tar-shard sink.
  */
class WarcSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("warc_spec_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def crlf(lines: String*): String = lines.mkString("", "\r\n", "\r\n")

  /** One hand-assembled WARC record with an arbitrary content block. */
  private def record(headers: Seq[String], block: Array[Byte]): Array[Byte] = {
    val head = crlf((Seq("WARC/1.0") ++ headers ++
      Seq(s"Content-Length: ${block.length}", "")): _*)
    head.getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def httpBlock(status: String, ct: String, body: String): Array[Byte] =
    (crlf(s"HTTP/1.1 $status", s"Content-Type: $ct", "") + body).getBytes("UTF-8")

  test("write → read roundtrip preserves uri, status, content type and body") {
    val dir = tmpDir()
    val df = (1 to 41)
      .map(i => (s"https://example.com/doc/$i", s"<html><p>body $i</p></html>"))
      .toDF("uri", "body")
    Warc.writeWarcResponses(df.repartition(3), dir, "uri", "body")
    val back = Warc.readWarc(spark, dir)
      .select(col("target_uri"), col("http_status"),
        col("http_content_type"), col("payload").cast("string").as("body"),
        col("warc_type"), col("truncated"))
    assert(back.count() == 41)
    assert(back.filter(col("warc_type") =!= "response").count() == 0)
    assert(back.filter(col("http_status") =!= 200).count() == 0)
    assert(back.filter(col("truncated")).count() == 0)
    assert(back.filter(!col("http_content_type").startsWith("text/html")).count() == 0)
    val got = back.select(col("target_uri").as("uri"), col("body"))
    val want = df
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("payload digest: column/JVM parity and the canonical empty-payload " +
    "vector") {
    // sha1("") base32 — the digest every crawl consumer has seen on
    // zero-length payloads
    assert(Warc.sha1Base32(Array.emptyByteArray)
      == "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    val bodies = Seq("", "a", "hello world", "x" * 1000, "päge\n")
    val viaColumn = bodies.toDF("b")
      .select(Warc.payloadDigest(col("b").cast("binary")).as("d"))
      .as[String].collect().toSeq
    val viaJvm = bodies.map(b => Warc.sha1Base32(b.getBytes("UTF-8")))
    assert(viaColumn == viaJvm)
    viaColumn.foreach(d => assert(d.length == 32 && d.forall(
      c => (c >= 'A' && c <= 'Z') || (c >= '2' && c <= '7'))))
  }

  test("response records carry WARC-Payload-Digest; sidecar digest is the " +
    "payload's base32 sha1, not a URL key") {
    val dir = tmpDir()
    // two urls with IDENTICAL bodies and one distinct: content-keyed
    // digests must collapse the twins and separate the loner
    val df = Seq(
      ("https://a.test/1", "same body"), ("https://b.test/2", "same body"),
      ("https://c.test/3", "other body")).toDF("uri", "body")
    Warc.writeWarcResponses(df, dir, "uri", "body",
      overwrite = true, index = true)
    val rows = Warc.readWarc(spark, dir)
      .select(col("target_uri"), col("payload_digest")).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getString(1) != null && r.getString(1).startsWith("sha1:"))
    }
    val byUri = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byUri("https://a.test/1") == byUri("https://b.test/2"))
    assert(byUri("https://a.test/1") != byUri("https://c.test/3"))
    assert(byUri("https://a.test/1").stripPrefix("sha1:")
      == Warc.sha1Base32("same body".getBytes("UTF-8")))
    // the sidecar's digest field: bare base32 of the payload
    val idx = Cdx.readCdxj(spark, dir, glob = Some("*.cdxj"))
      .select(col("url"), col("digest")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(idx("https://a.test/1")
      == Warc.sha1Base32("same body".getBytes("UTF-8")))
    assert(idx("https://a.test/1") == idx("https://b.test/2"))
  }

  test("revisit write → read → resolveRevisits: stubs regain the original " +
    "payload; danglers stay null") {
    val parent = tmpDir()
    val origDir = new java.io.File(parent, "crawl1").getPath
    val revDir = new java.io.File(parent, "crawl2").getPath
    val originals = Seq(
      ("https://o.test/a", "alpha content"),
      ("https://o.test/b", "beta content")).toDF("uri", "body")
    Warc.writeWarcResponses(originals, origDir, "uri", "body", index = true)
    // revisit of /a under a DIFFERENT url (content-keyed resolution), a
    // same-url revisit of /b, and a dangler whose original is not here
    val revisits = Seq(
      ("https://m.test/mirror-of-a",
        "sha1:" + Warc.sha1Base32("alpha content".getBytes("UTF-8")),
        Some("<urn:x:orig-a>")),
      ("https://o.test/b",
        "sha1:" + Warc.sha1Base32("beta content".getBytes("UTF-8")), None),
      ("https://gone.test/x",
        "sha1:" + Warc.sha1Base32("vanished".getBytes("UTF-8")), None))
      .toDF("uri", "digest", "refers")
    Warc.writeWarcRevisits(revisits, revDir, "uri", "digest",
      refersToCol = Some("refers"), index = true)
    // read BOTH crawls in one frame (glob over the parent)
    val warc = Warc.readWarc(spark, parent + "/*")
    assert(warc.count() == 5)
    val rev = warc.filter(col("warc_type") === "revisit").collect()
    assert(rev.length == 3)
    rev.foreach { r =>
      assert(r.getAs[String]("warc_profile")
        == "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")
      assert(r.getAs[Array[Byte]]("payload").isEmpty)
    }
    assert(rev.count(_.getAs[String]("refers_to") == "<urn:x:orig-a>") == 1)
    val resolved = Warc.resolveRevisits(warc)
    assert(resolved.count() == 5)
    val byUri = resolved.filter(col("warc_type") === "revisit")
      .select(col("target_uri"), col("payload").cast("string"),
        col("resolved_from"), col("http_status")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))).toMap
    assert(byUri("https://m.test/mirror-of-a")._1 == "alpha content")
    assert(byUri("https://m.test/mirror-of-a")._2 != null)
    assert(byUri("https://m.test/mirror-of-a")._3 == 200)
    assert(byUri("https://o.test/b")._1 == "beta content")
    assert(byUri("https://gone.test/x")._1 == "")
    assert(byUri("https://gone.test/x")._2 == null)
    // non-revisit rows pass through untouched, resolved_from null
    assert(resolved.filter(col("warc_type") === "response" &&
      col("resolved_from").isNotNull).count() == 0)
    // the revisit sidecar indexes stubs with mime warc/revisit + bare digest
    val idx = Cdx.readCdxj(spark, revDir, glob = Some("*.cdxj")).collect()
    assert(idx.length == 3)
    idx.foreach { r =>
      assert(r.getAs[String]("mime") == "warc/revisit")
      assert(r.getAs[String]("digest").length == 32)
    }
  }

  test("resolveRevisits prefers the WARC-Refers-To original among " +
    "same-digest responses; absent/unknown refers-to falls back to the " +
    "digest representative") {
    val parent = tmpDir()
    val origDir = new java.io.File(parent, "c1").getPath
    val revDir = new java.io.File(parent, "c2").getPath
    // three responses sharing one payload digest; the representative
    // (min (file, index)) is the FIRST written — coalesce(1) pins order
    val uris = Seq("https://o.test/first", "https://o.test/second",
      "https://o.test/third")
    Warc.writeWarcResponses(
      uris.map(u => (u, "shared body")).toDF("uri", "body").coalesce(1),
      origDir, "uri", "body")
    val digest = "sha1:" + Warc.sha1Base32("shared body".getBytes("UTF-8"))
    def rid(u: String): String = f"<urn:graft:${Warc.fnv64(u)}%016x>"
    val revisits = Seq(
      // names the THIRD original — must override the representative
      ("https://r.test/a", digest, Some(rid("https://o.test/third"))),
      // no refers-to — representative (the first)
      ("https://r.test/b", digest, None),
      // names a record outside the frame — fall back to representative
      ("https://r.test/c", digest, Some("<urn:x:not-here>")))
      .toDF("uri", "digest", "refers")
    Warc.writeWarcRevisits(revisits, revDir, "uri", "digest",
      refersToCol = Some("refers"))
    val resolved = Warc.resolveRevisits(Warc.readWarc(spark, parent + "/*"))
      .filter(col("warc_type") === "revisit")
      .select(col("target_uri"), col("resolved_from"),
        col("payload").cast("string")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(resolved("https://r.test/a")._1 == rid("https://o.test/third"))
    assert(resolved("https://r.test/b")._1 == rid("https://o.test/first"))
    assert(resolved("https://r.test/c")._1 == rid("https://o.test/first"))
    resolved.values.foreach { case (_, body) => assert(body == "shared body") }
  }

  test("markRevisits: prior-index hits and within-batch seconds flag as " +
    "revisits; batch-firsts, null bodies and unseen payloads do not") {
    val prior = Seq(
      Warc.sha1Base32("old content".getBytes("UTF-8")), // bare base32
      "sha1:" + Warc.sha1Base32("also old".getBytes("UTF-8")), // prefixed
      null).toDF("digest")
    val batch = Seq(
      ("u1", "old content"),   // in prior → revisit (even though first)
      ("u2", "fresh stuff"),   // batch-first of a dup pair → response
      ("u3", "fresh stuff"),   // second of the pair → revisit
      ("u4", "unique thing"),  // nowhere else → response
      ("u5", null)             // null body → never a revisit
    ).toDF("uri", "body")
    val marked = Warc.markRevisits(batch, "uri", "body", prior)
      .select(col("uri"), col("is_revisit"), col("payload_digest"))
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getString(2)))).toMap
    assert(marked("u1")._1 && marked("u2")._1 == false)
    assert(marked("u3")._1 && !marked("u4")._1 && !marked("u5")._1)
    assert(marked("u5")._2 == null)
    assert(marked("u2")._2
      == "sha1:" + Warc.sha1Base32("fresh stuff".getBytes("UTF-8")))
    // withinBatch = false: only prior hits flag
    val acrossOnly = Warc.markRevisits(batch, "uri", "body", prior,
      withinBatch = false)
      .select(col("uri"), col("is_revisit")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(acrossOnly("u1") && !acrossOnly("u3"))
  }

  test("markRevisits: refuses an input that already carries the columns " +
    "it computes (payload_digest / is_revisit)") {
    val prior = Seq("ABC").toDF("digest")
    val withDigest = Seq(("u1", "body", "sha1:XYZ"))
      .toDF("uri", "body", "payload_digest")
    val e1 = intercept[IllegalArgumentException] {
      Warc.markRevisits(withDigest, "uri", "body", prior)
    }
    assert(e1.getMessage.contains("payload_digest"))
    val withFlag = Seq(("u1", "body", false)).toDF("uri", "body", "is_revisit")
    val e2 = intercept[IllegalArgumentException] {
      Warc.markRevisits(withFlag, "uri", "body", prior)
    }
    assert(e2.getMessage.contains("is_revisit"))
  }

  test("writeWarcDeduped: responses and revisit stubs interleave in one " +
    "archive, the sidecar indexes both, and resolution round-trips") {
    val parent = tmpDir()
    val prior = Seq(Warc.sha1Base32("known".getBytes("UTF-8"))).toDF("digest")
    val batch = Seq(
      ("https://d.test/1", "known"),   // prior hit → stub
      ("https://d.test/2", "new one"), // first → response
      ("https://d.test/3", "new one"), // within-batch second → stub
      ("https://d.test/4", "lonely")   // response
    ).toDF("uri", "body")
    Warc.writeWarcDeduped(batch, parent, "uri", "body", prior, index = true)
    val back = Warc.readWarc(spark, parent)
    val types = back.select(col("target_uri"), col("warc_type"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types == Map(
      "https://d.test/1" -> "revisit", "https://d.test/2" -> "response",
      "https://d.test/3" -> "revisit", "https://d.test/4" -> "response"))
    // stubs carry the shared digest and the profile; responses their own
    val stub = back.filter(col("target_uri") === "https://d.test/3").head()
    assert(stub.getAs[String]("payload_digest")
      == "sha1:" + Warc.sha1Base32("new one".getBytes("UTF-8")))
    assert(stub.getAs[String]("warc_profile") != null)
    assert(stub.getAs[Array[Byte]]("payload").isEmpty)
    // the within-batch stub resolves against THIS archive's own response
    val resolved = Warc.resolveRevisits(back)
      .filter(col("target_uri") === "https://d.test/3").head()
    assert(new String(resolved.getAs[Array[Byte]]("payload"), "UTF-8")
      == "new one")
    assert(resolved.getAs[String]("resolved_from") != null)
    // sidecar: mixed mimes, stubs under warc/revisit with the digest
    val idx = Cdx.readCdxj(spark, parent, glob = Some("*.cdxj"))
      .select(col("url"), col("mime"), col("digest")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(idx("https://d.test/1")._1 == "warc/revisit")
    assert(idx("https://d.test/2")._1 == "text/html")
    assert(idx("https://d.test/3")._2
      == Warc.sha1Base32("new one".getBytes("UTF-8")))
  }

  test("pipeline warcDedup sink: config-only deduplicating write") {
    val parent = tmpDir()
    val outDir = new java.io.File(parent, "out").getPath
    val prior = Seq(Warc.sha1Base32("seen".getBytes("UTF-8"))).toDF("digest")
    val batch = Seq(
      ("https://p.test/1", "seen"), ("https://p.test/2", "novel"))
      .toDF("uri", "body")
    batch.createOrReplaceTempView("incoming_batch")
    graft.pipeline.Pipeline.run(spark,
      s"""source: incoming_batch
         |sink: {format: warcDedup, path: "$outDir", uri: uri, body: body,
         |  prior: prior_digests, index: true}
         |""".stripMargin,
      name =>
        if (name == "prior_digests") prior
        else spark.table(name))
    val types = Warc.readWarc(spark, outDir)
      .select(col("target_uri"), col("warc_type")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types == Map("https://p.test/1" -> "revisit",
      "https://p.test/2" -> "response"))
  }

  test("pipeline resolveRevisits verb: config-only stub resolution") {
    val parent = tmpDir()
    Warc.writeWarcResponses(
      Seq(("https://o.test/p", "the payload")).toDF("uri", "body"),
      new java.io.File(parent, "c1").getPath, "uri", "body")
    Warc.writeWarcRevisits(
      Seq(("https://r.test/p",
        "sha1:" + Warc.sha1Base32("the payload".getBytes("UTF-8"))))
        .toDF("uri", "digest"),
      new java.io.File(parent, "c2").getPath, "uri", "digest")
    val out = graft.pipeline.Pipeline.run(spark,
      s"""source: {format: warc, path: "$parent/*"}
         |steps:
         |  - resolveRevisits: {}
         |  - filter: "$$warc_type == 'revisit'"
         |""".stripMargin, _ => fail("no table resolve expected"))
    val r = out.select(col("payload").cast("string"), col("resolved_from"))
      .collect()
    assert(r.length == 1 && r.head.getString(0) == "the payload" &&
      r.head.getString(1) != null)
    // parseHeaders: false flows through the source — http_headers null
    val noHdr = graft.pipeline.Pipeline.run(spark,
      s"""source: {format: warc, path: "$parent/c1", parseHeaders: false}
         |""".stripMargin, _ => fail("no table resolve expected"))
    assert(noHdr.select("http_headers").collect().forall(_.isNullAt(0)))
    val withHdr = graft.pipeline.Pipeline.run(spark,
      s"""source: {format: warc, path: "$parent/c1"}
         |""".stripMargin, _ => fail("no table resolve expected"))
    assert(withHdr.select("http_headers").collect()
      .forall(!_.isNullAt(0)))
  }

  test("pipeline knobs: warc sink contentEncoding, warc source " +
    "decodePayloads, warcIndex languageCodes — all config-only") {
    val parent = tmpDir()
    Seq(("https://pk.test/1",
      "<html><p>" + graft.PublishedSamples.GzipText + "</p></html>"))
      .toDF("uri", "body").createOrReplaceTempView("pk_pages")
    graft.pipeline.Pipeline.run(spark,
      s"""source: pk_pages
         |sink: {format: warc, path: "$parent/coded", uri: uri, body: body,
         |  contentEncoding: gzip}
         |""".stripMargin, name => spark.table(name))
    // default source decodes; decodePayloads: false keeps stored bytes
    val dec = graft.pipeline.Pipeline.run(spark,
      s"""source: {format: warc, path: "$parent/coded"}
         |""".stripMargin, _ => fail("no table"))
    assert(dec.select("payload_decoded").collect().forall(_.getBoolean(0)))
    assert(dec.select(col("payload").cast("string")).collect()
      .head.getString(0).startsWith("<html><p>The quick"))
    val raw = graft.pipeline.Pipeline.run(spark,
      s"""source: {format: warc, path: "$parent/coded", decodePayloads: false}
         |""".stripMargin, _ => fail("no table"))
    val stored = raw.select("payload").collect().head.getAs[Array[Byte]](0)
    assert((stored(0) & 0xff) == 0x1f && (stored(1) & 0xff) == 0x8b)
    // warcIndex languageCodes: iso639_3 spells the published field
    val idx = graft.pipeline.Pipeline.run(spark,
      s"""source: {format: warcIndex, path: "$parent/coded",
         |  languageCodes: iso639_3}
         |""".stripMargin, _ => fail("no table"))
    assert(idx.select("languages").collect().head.getString(0) == "eng")
    intercept[IllegalArgumentException] {
      graft.pipeline.Pipeline.run(spark,
        s"""source: {format: warc, path: "$parent/coded", decodeBodies: true}
           |""".stripMargin, _ => fail("no table"))
    }
  }

  test("gzipMembers: FEXTRA/FNAME/FHCRC headers walk correctly; offsets " +
    "tile the file") {
    def handGzip(
        content: Array[Byte],
        fname: Option[String] = None,
        fextra: Option[Array[Byte]] = None): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      var flg = 0
      if (fextra.isDefined) flg |= 0x04
      if (fname.isDefined) flg |= 0x08
      out.write(Array(0x1f, 0x8b, 0x08, flg, 0, 0, 0, 0, 0, 0).map(_.toByte))
      fextra.foreach { x =>
        out.write(x.length & 0xff); out.write((x.length >> 8) & 0xff)
        out.write(x)
      }
      fname.foreach { n => out.write(n.getBytes("ISO-8859-1")); out.write(0) }
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(content); d.finish()
      val buf = new Array[Byte](1 << 16)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val crc = new java.util.zip.CRC32(); crc.update(content)
      val v = crc.getValue
      out.write(Array(v, v >> 8, v >> 16, v >> 24,
        content.length, content.length >> 8, content.length >> 16,
        content.length >> 24).map(x => (x & 0xff).toByte))
      out.toByteArray
    }
    def plainGzip(content: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(content); gz.close()
      bos.toByteArray
    }
    val c1 = "first member with headers".getBytes("UTF-8")
    val c2 = "second plain member".getBytes("UTF-8")
    val c3 = ("third " * 100).getBytes("UTF-8")
    val m1 = handGzip(c1, fname = Some("orig.warc"),
      fextra = Some(Array[Byte](1, 2, 3, 4)))
    val m2 = plainGzip(c2)
    val m3 = handGzip(c3)
    val all = m1 ++ m2 ++ m3
    val ms = Warc.gzipMembers(all, "test").toList
    assert(ms.map(_._3.toSeq) == List(c1.toSeq, c2.toSeq, c3.toSeq))
    assert(ms.map(m => (m._1, m._2)) == List(
      (0L, m1.length.toLong), (m1.length.toLong, m2.length.toLong),
      ((m1.length + m2.length).toLong, m3.length.toLong)))
  }

  test("indexWarc: computed member offsets equal the writer's own sidecar " +
    "index, field for field") {
    val dir = tmpDir()
    val docs = (0 until 37).map(i =>
      (s"https://h${i % 3}.test/d/$i", s"payload $i")).toDF("uri", "body")
    Warc.writeWarcResponses(docs.repartition(2), dir, "uri", "body",
      index = true, maxRecordsPerShard = 10)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("surt_key"), col("ts").cast("string"), col("url"),
        col("mime"), col("status"), col("digest"), col("filename"),
        col("offset"), col("length"))
      .as[(String, String, String, String, Int, String, String, Long, Long)]
      .collect().toSet
    val sidecar = shape(Cdx.readCdxj(spark, dir, glob = Some("*.cdxj")))
    val computed = shape(Warc.indexWarc(spark, dir))
    assert(computed == sidecar)
    // renderer roundtrip: indexWarc → cdxjLines → parseCdxjLines gives
    // back the same typed rows
    val rendered = shape(Cdx.parseCdxjLines(
      Cdx.cdxjLines(Warc.indexWarc(spark, dir))))
    assert(rendered == sidecar)
  }

  test("indexWarc: a revisit stub indexes under its HEADER digest (the " +
    "original's content), never a recomputed empty-payload hash") {
    val dir = tmpDir()
    val origDigest = Warc.sha1Base32("the real content".getBytes("UTF-8"))
    Warc.writeWarcRevisits(
      Seq(("https://r.test/p", s"sha1:$origDigest")).toDF("uri", "digest"),
      dir, "uri", "digest")
    val idx = Warc.indexWarc(spark, dir).collect()
    assert(idx.length == 1)
    assert(idx.head.getAs[String]("digest") == origDigest)
    assert(idx.head.getAs[String]("warc_type") == "revisit")
    assert(idx.head.getAs[String]("digest")
      != Warc.sha1Base32(Array.emptyByteArray))
  }

  test("warcinfo = true opens every shard with a warcinfo record (gzip " +
    "and zstd-dict — the dictionary frame stays leading for ranged reads)") {
    for (codec <- Seq("gzip", "zstd-dict")) {
      val dir = tmpDir()
      val docs = (0 until 80).map(i =>
        (s"https://wi.test/d/$i", s"wi body $i " + ("pad " * (i % 5))))
        .toDF("uri", "body")
      Warc.writeWarcResponses(docs.repartition(2), dir, "uri", "body",
        codec = codec, maxRecordsPerShard = 25, warcinfo = true,
        index = true)
      val back = Warc.readWarc(spark, dir)
      val infos = back.filter(col("warc_type") === "warcinfo")
      // one per shard; shards = per-partition ceil(rows/25) >= 4 total
      val nShards = new java.io.File(dir).listFiles()
        .count(f => f.getName.startsWith("part-") &&
          f.getName.contains(".warc"))
      assert(infos.count() == nShards, codec)
      // first record of every file, warc-fields content
      val firsts = back.filter(col("record_index") === 0).collect()
      assert(firsts.forall(_.getAs[String]("warc_type") == "warcinfo"), codec)
      val one = infos.collect().head
      assert(one.getAs[String]("content_type") == "application/warc-fields")
      assert(new String(one.getAs[Array[Byte]]("payload"), "UTF-8")
        .contains("format: WARC file version 1.0"), codec)
      assert(back.filter(col("warc_type") === "response").count() == 80, codec)
      // sidecar skips warcinfo, and ranged fetch through the sidecar
      // still decodes mid-file members (dict frame must lead the shard)
      val side = Cdx.readCdxj(spark, dir, glob = Some("*.cdxj"))
      assert(side.count() == 80, codec)
      val plan = Cdx.fetchPlan(side.filter(col("url").endsWith("7")),
        gapBytes = 0L)
      val got = Warc.readWarcRanges(spark, dir, plan)
        .filter(col("warc_type") === "response")
        .select(col("target_uri"), col("payload").cast("string"))
        .as[(String, String)].collect().toMap
      (7 until 80 by 10).foreach { i =>
        assert(got(s"https://wi.test/d/$i")
          == s"wi body $i " + ("pad " * (i % 5)), codec)
      }
    }
  }

  test("gzipMembers: truncated headers fail loudly, not with an index " +
    "error") {
    // FNAME flag set but the name (and everything after) cut off
    val truncated = Array(0x1f, 0x8b, 0x08, 0x08, 0, 0, 0, 0, 0, 0,
      'a', 'b').map(_.toByte)
    val e = intercept[java.io.EOFException] {
      Warc.gzipMembers(truncated, "t").toList
    }
    assert(e.getMessage.contains("truncated gzip member header"))
    // FEXTRA length pointing past the buffer
    val badExtra = Array(0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0,
      0xff, 0x7f).map(_.toByte)
    intercept[java.io.EOFException] {
      Warc.gzipMembers(badExtra, "t").toList
    }
  }

  test("indexWarc: zstd archives walk frame by frame — computed offsets " +
    "drive a correct ranged decode (plain and dictionary layouts)") {
    for (codec <- Seq("zstd", "zstd-dict")) {
      val dir = tmpDir()
      val docs = (0 until 300).map(i =>
        (s"https://z.test/d/$i", s"zstd body $i " + ("pad " * (i % 7))))
        .toDF("uri", "body")
      Warc.writeWarcResponses(docs.repartition(2), dir, "uri", "body",
        codec = codec, maxRecordsPerShard = 100)
      val idx = Warc.indexWarc(spark, dir)
      assert(idx.count() == 300, codec)
      // digest is the payload sha1 (headers present in the records)
      val one = idx.filter(col("url") === "https://z.test/d/7").collect().head
      assert(one.getAs[String]("digest")
        == Warc.sha1Base32("zstd body 7 ".getBytes("UTF-8")), codec)
      // every computed (offset, length) must decode: a wrong frame
      // boundary breaks the zstd decode or loses records
      val plan = Cdx.fetchPlan(
        idx.filter(col("url").endsWith("0")), gapBytes = 0L)
      val back = Warc.readWarcRanges(spark, dir, plan)
        .select(col("target_uri"), col("payload").cast("string"))
        .as[(String, String)].collect().toMap
      assert(back.size == 30, codec)
      (0 until 300 by 10).foreach { i =>
        assert(back(s"https://z.test/d/$i")
          == s"zstd body $i " + ("pad " * (i % 7)), codec)
      }
    }
  }

  test("indexWarc: plain uncompressed .warc indexes with raw record byte " +
    "offsets that drive a correct ranged decode (codec = none roundtrip)") {
    val dir = tmpDir()
    val docs = (0 until 120).map(i =>
      (s"https://p.test/d/$i", s"plain body $i " + ("pad " * (i % 5))))
      .toDF("uri", "body")
    Warc.writeWarcResponses(docs.repartition(2), dir, "uri", "body",
      codec = "none", maxRecordsPerShard = 50)
    // the writer produced plain .warc shards (no compression extension)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")) // local-FS .crc sidecars
    assert(files.nonEmpty && files.forall(_.endsWith(".warc")))
    val idx = Warc.indexWarc(spark, dir)
    assert(idx.count() == 120)
    val one = idx.filter(col("url") === "https://p.test/d/7").collect().head
    assert(one.getAs[String]("digest")
      == Warc.sha1Base32(("plain body 7 " + "pad " * 2).getBytes("UTF-8")))
    // offsets are raw byte offsets: the record bytes AT that offset start
    // with the version line
    val conf = spark.sparkContext.hadoopConfiguration
    val row0 = idx.orderBy(col("offset")).collect().head
    val p = new org.apache.hadoop.fs.Path(dir, row0.getAs[String]("filename"))
    val in = p.getFileSystem(conf).open(p)
    val head = new Array[Byte](5)
    try { in.seek(row0.getAs[Long]("offset")); in.readFully(head, 0, 5) }
    finally in.close()
    assert(new String(head, "UTF-8") == "WARC/")
    // and every computed (offset, length) decodes through the ranged path
    val plan = Cdx.fetchPlan(
      idx.filter(col("url").endsWith("0")), gapBytes = 0L)
    val back = Warc.readWarcRanges(spark, dir, plan)
      .select(col("target_uri"), col("payload").cast("string"))
      .as[(String, String)].collect().toMap
    assert(back.size == 12)
    (0 until 120 by 10).foreach { i =>
      assert(back(s"https://p.test/d/$i")
        == s"plain body $i " + ("pad " * (i % 5)))
    }
    // genuinely unrecognizable bytes still fail loudly
    val junkDir = tmpDir()
    java.nio.file.Files.write(
      new java.io.File(junkDir, "x.warc").toPath,
      "this is not an archive".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.indexWarc(spark, junkDir).collect()
    }
    assert(e.getMessage.contains("indexWarc") ||
      Option(e.getCause).exists(_.getMessage.contains("indexWarc")))
  }

  test("indexWarc: languages/charset populated for text records (WHATWG " +
    "sniff + langid), null for binary mimes and under detectText=false") {
    val dir = tmpDir()
    val en = "the quick brown fox jumps over the lazy dog and then " +
      "the fox sleeps while the dog watches the quiet house"
    val fr = "le chat et le chien sont dans la maison avec une porte " +
      "et les fenetres sont grandes mais la cour est petite"
    val ru = "привет мир " +
      "это тест русс" +
      "кого текста"
    val rows = Seq(
      ("https://t.test/en", s"<html><body><p>$en</p></body></html>",
        "text/html; charset=utf-8"),
      ("https://t.test/fr", s"<html><body><p>$fr</p></body></html>",
        "text/html; charset=iso-8859-1"),
      ("https://t.test/ru", s"<html><body><p>$ru</p></body></html>",
        "text/html; charset=utf-8"),
      ("https://t.test/bin", "not text at all",
        "application/octet-stream")).toDF("uri", "body", "ct")
    Warc.writeWarcResponses(rows, dir, "uri", "body",
      contentTypeCol = Some("ct"))
    val idx = Warc.indexWarc(spark, dir)
      .select(col("url"), col("languages"), col("charset")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(idx("https://t.test/en") == (("en", "UTF-8")))
    // iso-8859-1 label → windows-1252 per the WHATWG label table (the
    // name reports what the decode actually does)
    assert(idx("https://t.test/fr") == (("fr", "windows-1252")))
    assert(idx("https://t.test/ru") == (("ru", "UTF-8")))
    assert(idx("https://t.test/bin") == ((null, null)))
    val off = Warc.indexWarc(spark, dir, detectText = false)
      .select(col("languages"), col("charset")).collect()
    off.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }

  test("record ids are deterministic and distinct per uri") {
    val dir1 = tmpDir(); val dir2 = tmpDir()
    val df = Seq("https://a/x", "https://a/y").toDF("uri")
      .withColumn("body", lit("b"))
    Warc.writeWarcResponses(df.repartition(1), dir1, "uri", "body")
    Warc.writeWarcResponses(df.repartition(1), dir2, "uri", "body")
    def ids(d: String) = Warc.readWarc(spark, d)
      .select(col("target_uri"), col("record_id")).as[(String, String)]
      .collect().toMap
    val i1 = ids(dir1); val i2 = ids(dir2)
    assert(i1 == i2)
    assert(i1.values.toSet.size == 2)
  }

  test("WET conversion records: write → read, no HTTP fields, refers-to links") {
    val dir = tmpDir()
    val df = Seq(
      ("https://a/x", "extracted text é one"),
      ("https://a/y", "second doc\nwith lines")).toDF("uri", "text")
    Warc.writeWetConversions(df.repartition(1), dir, "uri", "text")
    val back = Warc.readWarc(spark, dir)
      .select(col("target_uri"), col("warc_type"), col("content_type"),
        col("http_status"), col("http_content_type"),
        col("payload").cast("string"), col("content_length"))
      .as[(String, String, Option[String], Option[Int], Option[String], String, Long)]
      .collect().sortBy(_._1)
    assert(back.map(_._2).toSeq == Seq("conversion", "conversion"))
    assert(back.map(_._3).toSeq == Seq(Some("text/plain"), Some("text/plain")))
    assert(back.forall(r => r._4.isEmpty && r._5.isEmpty), "no HTTP fields")
    assert(back.map(_._6).toSeq == Seq("extracted text é one", "second doc\nwith lines"))
    assert(back.map(_._7).toSeq ==
      Seq("extracted text é one".getBytes("UTF-8").length.toLong,
        "second doc\nwith lines".getBytes("UTF-8").length.toLong))
    // WARC-Refers-To of the conversion record = the response record's id
    // for the same uri (the WET↔WARC cross-reference)
    val respDir = tmpDir()
    Warc.writeWarcResponses(
      df.withColumnRenamed("text", "body").repartition(1), respDir, "uri", "body")
    val respIds = Warc.readWarc(spark, respDir)
      .select(col("target_uri"), col("record_id")).as[(String, String)]
      .collect().toMap
    val wetIds = Warc.readWarc(spark, dir)
      .select(col("target_uri"), col("record_id")).as[(String, String)]
      .collect().toMap
    assert(wetIds.values.toSet.intersect(respIds.values.toSet).isEmpty,
      "conversion ids are distinct from response ids")
    // a mixed directory (responses + conversions) reads both types
    val mixed = tmpDir()
    Warc.writeWarcResponses(
      df.withColumnRenamed("text", "body").repartition(1), mixed, "uri", "body")
    val wetShards = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    wetShards.foreach { f =>
      Files.copy(f.toPath, new java.io.File(mixed, "wet-" + f.getName).toPath)
    }
    val types = Warc.readWarc(spark, mixed).groupBy("warc_type").count()
      .as[(String, Long)].collect().toMap
    assert(types == Map("response" -> 2L, "conversion" -> 2L))
  }

  test("parses record types, header folding and LF-only leniency") {
    val warcinfo = record(
      Seq("WARC-Type: warcinfo", "Content-Type: application/warc-fields"),
      "software: graft\r\n".getBytes("UTF-8"))
    val resp = record(
      Seq("WARC-Type: response",
        "WARC-Target-URI: https://e.com/long",
        "WARC-Record-ID: <urn:x:1>",
        "WARC-Date: 2026-01-02T03:04:05Z",
        // folded header: continuation line starts with a space
        "Content-Type: application/http;", " msgtype=response"),
      httpBlock("404 Not Found", "text/plain", "gone"))
    val meta = record(
      Seq("WARC-Type: metadata", "Content-Type: application/warc-fields"),
      "via: crawler\n".getBytes("UTF-8"))
    // LF-only version/header lines (lenient parse)
    val lfOnly = ("WARC/1.1\nWARC-Type: resource\nContent-Length: 3\n\nabc\r\n\r\n")
      .getBytes("UTF-8")
    val rows = Warc.parseFile("t.warc",
      warcinfo ++ resp ++ meta ++ lfOnly, 1 << 20).toSeq
    assert(rows.map(_.warc_type) == Seq("warcinfo", "response", "metadata", "resource"))
    assert(rows.map(_.record_index) == Seq(0, 1, 2, 3))
    val r = rows(1)
    assert(r.target_uri.contains("https://e.com/long"))
    assert(r.warc_date.contains("2026-01-02T03:04:05Z"))
    assert(r.content_type.contains("application/http; msgtype=response"))
    assert(r.http_status.contains(404))
    assert(r.http_content_type.contains("text/plain"))
    assert(new String(r.payload, "UTF-8") == "gone")
    assert(new String(rows(3).payload, "UTF-8") == "abc")
    assert(rows(3).http_status.isEmpty) // not an http record
  }

  test("concatenated gzip members parse as one stream") {
    val bos = new ByteArrayOutputStream()
    Seq(
      record(Seq("WARC-Type: resource"), "one".getBytes("UTF-8")),
      record(Seq("WARC-Type: resource"), "two".getBytes("UTF-8"))
    ).foreach { rec =>
      val gz = new GZIPOutputStream(bos); gz.write(rec); gz.finish(); gz.close()
    }
    val rows = Warc.parseFile("t.warc.gz", bos.toByteArray, 1 << 20).toSeq
    assert(rows.map(r => new String(r.payload, "UTF-8")) == Seq("one", "two"))
  }

  test("payload cap truncates, flags, and keeps the stream aligned") {
    val big = record(Seq("WARC-Type: resource"), Array.fill[Byte](1000)('x'))
    val after = record(Seq("WARC-Type: resource"), "tail".getBytes("UTF-8"))
    val rows = Warc.parseFile("t.warc", big ++ after, maxPayloadBytes = 100).toSeq
    assert(rows.length == 2)
    assert(rows(0).truncated && rows(0).payload.length == 100)
    assert(rows(0).content_length == 1000) // the declared, not the kept, length
    assert(!rows(1).truncated && new String(rows(1).payload, "UTF-8") == "tail")
  }

  test("http block without a header/body boundary comes back whole") {
    val m = Warc.parseHttp("not an http message".getBytes("UTF-8"))
    assert(m.status.isEmpty && m.contentType.isEmpty && m.headers.isEmpty)
    assert(new String(m.body, "UTF-8") == "not an http message")
  }

  test("parseHttp full header map: original casing, repeats comma-joined, " +
    "obs-fold continuations appended; readWarc surfaces it") {
    val msg = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html\r\n" +
      "Content-Type: text/plain\r\n" + // duplicated CT: first value wins
      "Set-Cookie: a=1; Expires=Wed, 21 Oct 2026 07:28:00 GMT\r\n" +
      "Set-Cookie: b=2\r\n" +
      "X-Repeat: u\r\n" +
      "X-Repeat: v\r\n" +
      "X-Folded: start\r\n continued\r\n" +
      "\r\nBODY").getBytes("UTF-8")
    val parsed = Warc.parseHttp(msg)
    // http_content_type is the FIRST Content-Type — a joined value would
    // corrupt every derived mime field
    assert(parsed.status.contains(200) &&
      parsed.contentType.contains("text/html"))
    assert(new String(parsed.body, "UTF-8") == "BODY")
    val h = parsed.headers.get
    assert(h("Content-Type") == "text/html, text/plain") // map keeps both
    // Set-Cookie never comma-joins (RFC 6265 — its values hold commas);
    // newline-joined so consumers split losslessly
    assert(h("Set-Cookie")
      == "a=1; Expires=Wed, 21 Oct 2026 07:28:00 GMT\nb=2")
    assert(h("X-Repeat") == "u, v")
    assert(h("X-Folded") == "start continued")
    // parseHeaders = false: same scalars, no map
    val bare = Warc.parseHttp(msg, wantHeaders = false)
    assert(bare.status == parsed.status &&
      bare.contentType == parsed.contentType && bare.headers.isEmpty)
    // end to end: the map rides the readWarc frame
    val dir = tmpDir()
    Warc.writeWarcResponses(
      Seq(("https://h.test/p", "pay")).toDF("uri", "body"),
      dir, "uri", "body", httpContentType = "text/plain; charset=UTF-8")
    val row = Warc.readWarc(spark, dir).collect().head
    val m = row.getAs[Map[String, String]]("http_headers")
    assert(m("Content-Type") == "text/plain; charset=UTF-8")
    assert(m.contains("Content-Length"))
  }

  test("dechunk: published chunked-framing example, extensions and " +
    "trailers dropped, truncation and non-chunked fallback") {
    import graft.PublishedSamples
    // the published example decodes exactly (data chunks carry CRLFs)
    val Some((d, capped)) = Warc.dechunk(PublishedSamples.ChunkedBody, 1 << 20)
    assert(new String(d, "ISO-8859-1") == PublishedSamples.ChunkedDecoded)
    assert(!capped)
    // chunk extensions after ';' and trailer fields drop
    val ext = ("5;ext=\"v\"\r\nhello\r\n0\r\nX-Trailer: t\r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(new String(Warc.dechunk(ext, 1 << 20).get._1, "UTF-8") == "hello")
    // truncated mid-chunk: what decoded survives (capture truncation)
    val torn = "4\r\nWiki\r\nA\r\npedi".getBytes("ISO-8859-1")
    assert(new String(Warc.dechunk(torn, 1 << 20).get._1, "UTF-8")
      == "Wikipedi")
    // first size line unparsable: not chunked at all — None, caller
    // falls back to the stored bytes
    assert(Warc.dechunk("<html>hi</html>".getBytes("UTF-8"), 1 << 20).isEmpty)
    // output cap flags
    val Some((cappedOut, wasCapped)) =
      Warc.dechunk(PublishedSamples.ChunkedBody, 5)
    assert(cappedOut.length == 5 && wasCapped)
  }

  test("gunzip/inflate leniency: roundtrip, wrong-magic fallback, torn " +
    "tail, zlib and raw deflate both accepted") {
    val text = ("decode me " * 50).getBytes("UTF-8")
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos); gz.write(text); gz.close()
    val gzBytes = bos.toByteArray
    assert(java.util.Arrays.equals(
      Warc.gunzipLenient(gzBytes, 1 << 20).get._1, text))
    // not gzip → None (mislabeled coding falls back)
    assert(Warc.gunzipLenient(text, 1 << 20).isEmpty)
    // torn tail: most of the stream inflates
    val torn = java.util.Arrays.copyOf(gzBytes, gzBytes.length - 12)
    val got = Warc.gunzipLenient(torn, 1 << 20).get._1
    assert(got.length > 0 && got.length <= text.length)
    assert(new String(got, "UTF-8").startsWith("decode me "))
    // deflate: zlib-wrapped (the correct coding) and raw (the mislabel)
    val zlibBytes = {
      val d = new java.util.zip.Deflater()
      d.setInput(text); d.finish()
      val out = new ByteArrayOutputStream(); val b = new Array[Byte](512)
      while (!d.finished()) out.write(b, 0, d.deflate(b))
      d.end(); out.toByteArray
    }
    val rawBytes = {
      val d = new java.util.zip.Deflater(-1, true)
      d.setInput(text); d.finish()
      val out = new ByteArrayOutputStream(); val b = new Array[Byte](512)
      while (!d.finished()) out.write(b, 0, d.deflate(b))
      d.end(); out.toByteArray
    }
    assert(java.util.Arrays.equals(
      Warc.inflateLenient(zlibBytes, 1 << 20).get._1, text))
    assert(java.util.Arrays.equals(
      Warc.inflateLenient(rawBytes, 1 << 20).get._1, text))
  }

  test("decodeHttpBody: chunked+gzip chain decodes in order; unsupported " +
    "br reverts whole; identity is a no-op") {
    import graft.PublishedSamples
    val (b3, dec3, cap3) = Warc.decodeHttpBody(
      PublishedSamples.ChunkedGzipBody,
      Some("chunked"), Some("gzip"), 1 << 20)
    assert(dec3 && !cap3)
    assert(new String(b3, "UTF-8") == PublishedSamples.ChunkedGzipText)
    // br: no JDK decoder — the ORIGINAL stored bytes come back whole
    val (bBr, decBr, _) = Warc.decodeHttpBody(
      PublishedSamples.BrBody, None, Some("br"), 1 << 20)
    assert(!decBr &&
      java.util.Arrays.equals(bBr, PublishedSamples.BrBody))
    // a failed step anywhere reverts the WHOLE chain (never half-decoded)
    val (bHalf, decHalf, _) = Warc.decodeHttpBody(
      PublishedSamples.ChunkedGzipBody, Some("chunked"), Some("br"), 1 << 20)
    assert(!decHalf &&
      java.util.Arrays.equals(bHalf, PublishedSamples.ChunkedGzipBody))
    val (bId, decId, _) = Warc.decodeHttpBody(
      "x".getBytes("UTF-8"), Some("identity"), None, 1 << 20)
    assert(!decId && new String(bId, "UTF-8") == "x")
  }

  test("readWarc decodes captured codings end to end; decodePayloads = " +
    "false keeps stored bytes; coding columns always surface") {
    import graft.PublishedSamples
    val dir = tmpDir()
    Files.write(new java.io.File(dir, "coded.warc").toPath,
      PublishedSamples.CodedWarcFile)
    val rows = Warc.readWarc(spark, dir)
      .select(col("target_uri"), col("payload"), col("payload_decoded"),
        col("http_transfer_encoding"), col("http_content_encoding"),
        col("truncated"))
      .collect().map(r => r.getString(0) -> r).toMap
    val chunked = rows("http://coded.example/chunked")
    assert(new String(chunked.getAs[Array[Byte]]("payload"), "UTF-8")
      == PublishedSamples.ChunkedDecoded)
    assert(chunked.getAs[Boolean]("payload_decoded"))
    assert(chunked.getAs[String]("http_transfer_encoding") == "chunked")
    val gzr = rows("http://coded.example/gzipped")
    assert(new String(gzr.getAs[Array[Byte]]("payload"), "UTF-8")
      == PublishedSamples.GzipText)
    assert(gzr.getAs[String]("http_content_encoding") == "gzip")
    val both = rows("http://coded.example/both")
    assert(new String(both.getAs[Array[Byte]]("payload"), "UTF-8")
      == PublishedSamples.ChunkedGzipText)
    val br = rows("http://coded.example/brotli")
    assert(!br.getAs[Boolean]("payload_decoded"))
    assert(java.util.Arrays.equals(
      br.getAs[Array[Byte]]("payload"), PublishedSamples.BrBody))
    assert(br.getAs[String]("http_content_encoding") == "br")
    // raw split (warcio raw_stream): stored block bodies verbatim, the
    // coding headers still there so callers can decode selectively
    val raw = Warc.readWarc(spark, dir, decodePayloads = false)
      .select(col("target_uri"), col("payload"), col("payload_decoded"),
        col("http_transfer_encoding"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(java.util.Arrays.equals(
      raw("http://coded.example/chunked").getAs[Array[Byte]]("payload"),
      PublishedSamples.ChunkedBody))
    assert(!raw("http://coded.example/chunked")
      .getAs[Boolean]("payload_decoded"))
    assert(raw("http://coded.example/chunked")
      .getAs[String]("http_transfer_encoding") == "chunked")
  }

  test("indexWarc over coded captures: digest keys the STORED block, " +
    "charset/languages sniff the DECODED sample, iso639_3 re-spells") {
    import graft.PublishedSamples
    val dir = tmpDir()
    Files.write(new java.io.File(dir, "coded.warc").toPath,
      PublishedSamples.CodedWarcFile)
    val idx = Warc.indexWarc(spark, dir)
      .select(col("url"), col("digest"), col("charset"), col("languages"))
      .collect().map(r => r.getString(0) -> r).toMap
    // headers present → surfaced verbatim (stored-block digests)
    assert(idx("http://coded.example/gzipped").getString(1)
      == PublishedSamples.GzipStoredDigest)
    assert(idx("http://coded.example/both").getString(1)
      == PublishedSamples.ChunkedGzipStoredDigest)
    // header ABSENT → recomputed over the stored block, landing on the
    // outside-computed constant (decoded bytes would land elsewhere)
    assert(idx("http://coded.example/brotli").getString(1)
      == PublishedSamples.BrStoredDigest)
    // the sniffs saw decoded text, not gzip bytes
    assert(idx("http://coded.example/gzipped").getString(2) == "UTF-8")
    assert(idx("http://coded.example/gzipped").getString(3) == "en")
    assert(idx("http://coded.example/both").getString(3) == "en")
    val idx3 = Warc.indexWarc(spark, dir, languageCodes = "iso639_3")
      .select(col("url"), col("languages"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(idx3("http://coded.example/gzipped") == "eng")
    intercept[IllegalArgumentException] {
      Warc.indexWarc(spark, dir, languageCodes = "nope")
    }
  }

  test("writeWarcResponses(contentEncoding = gzip): stored bodies are " +
    "coded, digests key the coded block, readers decode by default") {
    val dir = tmpDir()
    val df = (1 to 30)
      .map(i => (s"https://ce.test/d/$i", s"<html><p>entity $i</p></html>" +
        ("pad" * (i % 5))))
      .toDF("uri", "body")
    Warc.writeWarcResponses(df.repartition(2), dir, "uri", "body",
      contentEncoding = "gzip", index = true)
    // decoded read (default): original bodies, coding surfaced
    val back = Warc.readWarc(spark, dir)
      .select(col("target_uri"), col("payload").cast("string").as("body"),
        col("http_content_encoding"), col("payload_decoded"),
        col("payload_digest"))
    assert(back.count() == 30)
    assert(back.filter(col("http_content_encoding") =!= "gzip").count() == 0)
    assert(back.filter(!col("payload_decoded")).count() == 0)
    val got = back.select(col("target_uri").as("uri"), col("body"))
    assert(got.exceptAll(df).count() == 0 && df.exceptAll(got).count() == 0)
    // raw read: stored bytes are genuinely gzip, and BOTH digests (record
    // header + index sidecar) key exactly those coded bytes
    val raw = Warc.readWarc(spark, dir, decodePayloads = false)
      .select(col("target_uri"), col("payload"), col("payload_digest"))
      .collect().map(r => r.getString(0) -> r).toMap
    raw.values.foreach { r =>
      val stored = r.getAs[Array[Byte]]("payload")
      assert((stored(0) & 0xff) == 0x1f && (stored(1) & 0xff) == 0x8b)
      assert(r.getString(2) == "sha1:" + Warc.sha1Base32(stored))
    }
    val side = Cdx.readCdxj(spark, dir, glob = Some("*.cdxj"))
      .select(col("url"), col("digest")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(side.size == 30)
    side.foreach { case (url, d) =>
      assert("sha1:" + d == raw(url).getString(2),
        s"sidecar digest for $url must equal the record header's")
    }
    // bad value fails loudly
    intercept[IllegalArgumentException] {
      Warc.writeWarcResponses(df, tmpDir(), "uri", "body",
        contentEncoding = "zstd")
    }
  }

  test("parseHttp obs-fold reset: a continuation after a colon-less " +
    "garbage line does not append to the previous field") {
    val msg = ("HTTP/1.1 200 OK\r\n" +
      "X-First: alpha\r\n" +
      "garbage line without a colon\r\n" +
      " looks-like-a-continuation\r\n" +
      "X-Second: beta\r\n" +
      "\r\nBODY").getBytes("UTF-8")
    val m = Warc.parseHttp(msg)
    val h = m.headers.get
    assert(h("X-First") == "alpha") // NOT "alpha looks-like-a-continuation"
    assert(h("X-Second") == "beta")
  }

  test("garbage between records fails loudly, missing Content-Length too") {
    val bad = "GARBAGE\r\n".getBytes("UTF-8") ++
      record(Seq("WARC-Type: resource"), "x".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      Warc.parseFile("t.warc", bad, 1 << 20).toSeq
    }
    val noLen = "WARC/1.0\r\nWARC-Type: resource\r\n\r\n".getBytes("UTF-8")
    intercept[IllegalArgumentException] {
      Warc.parseFile("t.warc", noLen, 1 << 20).toSeq
    }
  }

  test("non-empty output dir is refused unless overwrite") {
    val dir = tmpDir()
    val df = Seq(("https://a/1", "b")).toDF("uri", "body")
    Warc.writeWarcResponses(df, dir, "uri", "body")
    val e = intercept[IllegalArgumentException] {
      Warc.writeWarcResponses(df, dir, "uri", "body")
    }
    assert(e.getMessage.contains("not empty"))
    Warc.writeWarcResponses(df, dir, "uri", "body", overwrite = true)
    assert(Warc.readWarc(spark, dir).count() == 1)
  }

  test("shards roll at maxRecordsPerShard") {
    val dir = tmpDir()
    val df = (1 to 25).map(i => (s"https://a/$i", s"v$i")).toDF("uri", "body")
    Warc.writeWarcResponses(df.repartition(1), dir, "uri", "body",
      maxRecordsPerShard = 10)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(shards.length == 3) // 10 + 10 + 5
    assert(Warc.readWarc(spark, dir).count() == 25)
  }

  test("pipeline warc sink writes response shards from YAML") {
    val dir = tmpDir()
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    graft.pipeline.Pipeline.run(spark,
      s"""source: docs
         |steps:
         |  - select:
         |      uri: "f'https://x/{$$doc_id}'"
         |      body: $$text
         |sink: {format: warc, path: "$dir/out", uri: uri, body: body}
         |""".stripMargin,
      name => { assert(name == "docs"); docs })
    val back = Warc.readWarc(spark, s"$dir/out")
      .select(col("target_uri"), col("payload").cast("string"))
      .as[(String, String)].collect().toSet
    assert(back == Set(("https://x/1", "alpha"), ("https://x/2", "beta")))
    // warcinfo: true flows through the sink to the shard-head record
    graft.pipeline.Pipeline.run(spark,
      s"""source: docs
         |steps:
         |  - select:
         |      uri: "f'https://x/{$$doc_id}'"
         |      body: $$text
         |sink: {format: warc, path: "$dir/wi", uri: uri, body: body,
         |  warcinfo: true}
         |""".stripMargin,
      name => docs)
    val types = Warc.readWarc(spark, s"$dir/wi")
      .select(col("warc_type")).as[String].collect()
    assert(types.count(_ == "warcinfo") >= 1 &&
      types.count(_ == "response") == 2)
    intercept[IllegalArgumentException] {
      graft.pipeline.Pipeline.run(spark,
        s"""source: docs
           |sink: {format: warc, path: "$dir/out2", partitionBy: [x]}
           |""".stripMargin,
        name => docs)
    }
  }

  test("zstd shards: write → read roundtrip, mixed gz+zst directory") {
    val dir = tmpDir()
    val df = (1 to 23).map(i => (s"https://z/$i", s"zbody $i")).toDF("uri", "body")
    Warc.writeWarcResponses(df.repartition(2), dir, "uri", "body", codec = "zstd")
    val names = new java.io.File(dir).list().toSeq.filterNot(_.startsWith("."))
    assert(names.nonEmpty && names.forall(_.endsWith(".warc.zst")), names.toString)
    val back = Warc.readWarc(spark, dir)
      .select(col("target_uri").as("uri"), col("payload").cast("string").as("body"))
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // mixed directory: add gzip shards alongside, one read sees both
    val df2 = (100 to 110).map(i => (s"https://g/$i", s"gbody $i")).toDF("uri", "body")
    val gzDir = tmpDir()
    Warc.writeWarcResponses(df2, gzDir, "uri", "body")
    new java.io.File(gzDir).listFiles()
      .filterNot(_.getName.startsWith(".")).foreach { f =>
        Files.copy(f.toPath, new java.io.File(dir, "gz-" + f.getName).toPath)
      }
    assert(Warc.readWarc(spark, dir).count() == 23 + 11)
  }

  test("zstd: concatenated frames parse as one stream; non-dict skippable frame skipped") {
    // two records compressed as two INDEPENDENT concatenated frames
    val r1 = record(Seq("WARC-Type: resource", "WARC-Target-URI: u1"),
      "abc".getBytes("UTF-8"))
    val r2 = record(Seq("WARC-Type: resource", "WARC-Target-URI: u2"),
      "defg".getBytes("UTF-8"))
    val bytes = com.github.luben.zstd.Zstd.compress(r1) ++
      com.github.luben.zstd.Zstd.compress(r2)
    val rows = Warc.parseFile("t.warc.zst", bytes, 1 << 20).toSeq
    assert(rows.map(_.target_uri) == Seq(Some("u1"), Some("u2")))
    assert(rows.map(r => new String(r.payload, "UTF-8")) == Seq("abc", "defg"))
    // a leading NON-dictionary skippable frame (magic 0x184D2A50) is
    // simply skipped — that is what skippable means
    val skippable = Array(0x50, 0x2a, 0x4d, 0x18, 4, 0, 0, 0, 1, 2, 3, 4)
      .map(_.toByte) ++ com.github.luben.zstd.Zstd.compress(r1)
    val skipped = Warc.parseFile("d.warc.zst", skippable, 1 << 20).toSeq
    assert(skipped.map(_.target_uri) == Seq(Some("u1")))
    // truncated skippable frame (declared size past EOF) → loud error
    val torn = Array(0x50, 0x2a, 0x4d, 0x18, 99, 0, 0, 0, 1).map(_.toByte)
    val e = intercept[IllegalArgumentException] {
      Warc.parseFile("torn.warc.zst", torn, 1 << 20).toSeq
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("zstd shared-dictionary convention: 0x184D2A5D dict frame decodes members") {
    def skipFrame(magic0: Int, content: Array[Byte]): Array[Byte] =
      Array(magic0, 0x2a, 0x4d, 0x18,
        content.length & 0xff, (content.length >> 8) & 0xff,
        (content.length >> 16) & 0xff, (content.length >> 24) & 0xff)
        .map(_.toByte) ++ content
    val dict = ("warc dictionary sample content shared across members " * 20)
      .getBytes("UTF-8") // raw-content dictionary (no trainer needed)
    def withDict(data: Array[Byte]): Array[Byte] = {
      val cctx = new com.github.luben.zstd.ZstdCompressCtx()
      try { cctx.loadDict(dict); cctx.compress(data) } finally cctx.close()
    }
    val r1 = record(Seq("WARC-Type: resource", "WARC-Target-URI: d1"),
      "dict payload one".getBytes("UTF-8"))
    val r2 = record(Seq("WARC-Type: resource", "WARC-Target-URI: d2"),
      "dict payload two".getBytes("UTF-8"))
    // plain (uncompressed) dictionary in the 0x184D2A5D frame
    val plainDict = skipFrame(0x5d, dict) ++ withDict(r1) ++ withDict(r2)
    val got = Warc.parseFile("pd.warc.zst", plainDict, 1 << 20).toSeq
    assert(got.map(_.target_uri) == Seq(Some("d1"), Some("d2")))
    assert(got.map(r => new String(r.payload, "UTF-8")) ==
      Seq("dict payload one", "dict payload two"))
    // COMPRESSED dictionary (one plain zstd frame around the dict bytes),
    // preceded by an unrelated skippable frame — both spec-allowed
    val compDict = skipFrame(0x50, Array[Byte](9, 9)) ++
      skipFrame(0x5d, com.github.luben.zstd.Zstd.compress(dict)) ++
      withDict(r1)
    val got2 = Warc.parseFile("cd.warc.zst", compDict, 1 << 20).toSeq
    assert(got2.map(_.target_uri) == Seq(Some("d1")))
    assert(new String(got2.head.payload, "UTF-8") == "dict payload one")
  }

  test("zstd-dict codec: trains a per-shard dictionary, roundtrips, falls back when tiny") {
    val dir = tmpDir()
    // 60 records of repetitive-but-distinct content — enough sample mass
    val page = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 12
    val df = (1 to 60).map(i =>
      (s"https://d/$i",
        s"shared boilerplate header; $page unique part $i; $page footer"))
      .toDF("uri", "body")
    Warc.writeWarcResponses(df.repartition(1), dir, "uri", "body",
      codec = "zstd-dict")
    val files = new java.io.File(dir).listFiles()
      .filterNot(_.getName.startsWith(".")).sortBy(_.getName)
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".warc.zst")))
    // every shard leads with the 0x184D2A5D dictionary skippable frame
    for (f <- files) {
      val head = Files.readAllBytes(f.toPath).take(4)
      assert(head.sameElements(Array(0x5d, 0x2a, 0x4d, 0x18).map(_.toByte)),
        s"${f.getName} does not start with the dict skippable frame")
    }
    val back = Warc.readWarc(spark, dir)
      .select(col("target_uri").as("uri"), col("payload").cast("string").as("body"))
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // shard rolling keeps one dictionary per shard
    val dir2 = tmpDir()
    Warc.writeWarcResponses(df.repartition(1), dir2, "uri", "body",
      codec = "zstd-dict", maxRecordsPerShard = 25)
    val shards = new java.io.File(dir2).listFiles()
      .filterNot(_.getName.startsWith("."))
    assert(shards.length == 3)
    val dictMagic = Array(0x5d, 0x2a, 0x4d, 0x18).map(_.toByte)
    val plainMagic = Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte)
    // full 25-record shards train; the 10-record tail may fall under the
    // training floor and legitimately fall back to plain frames
    shards.sortBy(_.getName).take(2).foreach { f =>
      val head = Files.readAllBytes(f.toPath).take(4)
      assert(head.sameElements(dictMagic), s"${f.getName} missing dict frame")
    }
    val tail = Files.readAllBytes(shards.sortBy(_.getName).last.toPath).take(4)
    assert(tail.sameElements(dictMagic) || tail.sameElements(plainMagic))
    assert(Warc.readWarc(spark, dir2).count() == 60)
    // a shard too small to train falls back to PLAIN frames and still reads
    val tiny = tmpDir()
    val df3 = (1 to 3).map(i => (s"https://t/$i", s"tb$i")).toDF("uri", "body")
    Warc.writeWarcResponses(df3.repartition(1), tiny, "uri", "body",
      codec = "zstd-dict")
    val tf = new java.io.File(tiny).listFiles()
      .filterNot(_.getName.startsWith(".")).head
    val thead = Files.readAllBytes(tf.toPath).take(4)
    assert(thead.sameElements(Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte)),
      "tiny shard should fall back to plain zstd frames")
    assert(Warc.readWarc(spark, tiny).count() == 3)
  }

  test("pipeline warc sink writes zst from YAML (codec option)") {
    val dir = tmpDir() + "/out"
    val docs = (1 to 5).map(i => (s"https://y/$i", s"yb$i")).toDF("uri", "body")
    graft.pipeline.Pipeline.run(spark,
      s"""source: docs
         |sink: {format: warc, path: "$dir", uri: uri, body: body, codec: zstd}
         |""".stripMargin,
      name => docs)
    assert(new java.io.File(dir).list().filterNot(_.startsWith("."))
      .forall(_.endsWith(".warc.zst")))
    assert(Warc.readWarc(spark, dir).count() == 5)
  }

  test("pipeline warc source reads records and rejects unknown keys") {
    val dir = tmpDir()
    val df = (1 to 7).map(i => (s"https://p/$i", s"t$i")).toDF("uri", "body")
    Warc.writeWarcResponses(df, dir, "uri", "body")
    val out = graft.pipeline.Pipeline.run(spark,
      s"""
         |source: {format: warc, path: "$dir"}
         |steps:
         |  - filter: "$$http_status == 200"
         |  - select:
         |      uri: $$target_uri
         |""".stripMargin, _ => fail("no table resolve expected"))
    assert(out.count() == 7)
    intercept[IllegalArgumentException] {
      graft.pipeline.Pipeline.run(spark,
        s"""source: {format: warc, path: "$dir", schema: "x INT"}""",
        _ => fail("no table resolve expected"))
    }
  }

  test("index sidecar: one cdxj line per record, exact member offsets") {
    val dir = tmpDir()
    val docs = (0 until 25).map(i =>
      (s"https://h${i % 3}.test/d/$i", s"body of document $i"))
      .toDF("uri", "body")
    Warc.writeWarcResponses(docs.repartition(2), dir, "uri", "body",
      overwrite = true, index = true, maxRecordsPerShard = 10)
    val idx = Cdx.readCdxj(spark, dir, glob = Some("*.cdxj"))
    val rows = idx.collect()
    assert(rows.length == 25)
    // every line parsed fully: surt from the uri, ts from the default
    // warcDate, status 200, offsets/lengths positive
    rows.foreach { r =>
      assert(r.getAs[String]("surt_key").startsWith("test,h"))
      assert(r.getAs[java.sql.Timestamp]("ts").toInstant.toString
        == "2026-01-01T00:00:00Z")
      assert(r.getAs[Int]("status") == 200)
      assert(r.getAs[Long]("length") > 0)
    }
    // the core contract: each (filename, offset, length) slice decodes to
    // exactly ITS record — checked byte-for-byte against the raw shard
    val byFile = rows.groupBy(_.getAs[String]("filename"))
    byFile.foreach { case (fn, caps) =>
      val bytes = Files.readAllBytes(new java.io.File(dir, fn).toPath)
      caps.foreach { c =>
        val off = c.getAs[Long]("offset").toInt
        val len = c.getAs[Long]("length").toInt
        val slice = java.util.Arrays.copyOfRange(bytes, off, off + len)
        val recs = Warc.readWarc(spark, { // parse via a temp single file
          val d2 = tmpDir()
          Files.write(new java.io.File(d2, "one.warc.gz").toPath, slice)
          d2
        }).collect()
        assert(recs.length == 1)
        assert(recs.head.getAs[String]("target_uri") == c.getAs[String]("url"))
      }
      // offsets tile the shard: sorted, non-overlapping, ending at EOF
      val sorted = caps.sortBy(_.getAs[Long]("offset"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("offset") + a.getAs[Long]("length")
            == b.getAs[Long]("offset"))
        case _ => ()
      }
      assert(sorted.last.getAs[Long]("offset") +
        sorted.last.getAs[Long]("length") == bytes.length.toLong)
    }
  }

  test("index sidecar: whitespace in a garbage uri percent-encodes in the " +
    "key — the capture stays findable instead of breaking its line") {
    val dir = tmpDir()
    val docs = Seq(
      ("https://ok.test/fine", "good"),
      ("https://bad.test/with space/and\ttab", "weird but archived"))
      .toDF("uri", "body")
    Warc.writeWarcResponses(docs, dir, "uri", "body",
      overwrite = true, index = true)
    val idx = Cdx.readCdxj(spark, dir, glob = Some("*.cdxj")).collect()
    assert(idx.length == 2)
    idx.foreach { r =>
      assert(r.getAs[String]("surt_key") != null, "every line must parse")
      assert(r.getAs[String]("filename") != null)
    }
    val weird = idx.filter(_.getAs[String]("url").contains("space")).head
    // the canonicalizer itself now owns the encoding: spaces → %20 (so the
    // key survives the space-delimited line), tab/CR/LF removed outright
    // (the IA pre-clean); the writer's extra percent-encode only guards the
    // raw-uri fallback branch for uris surtString cannot parse at all
    assert(weird.getAs[String]("surt_key") == "test,bad)/with%20space/andtab")
  }

  test("readWarcRanges: fetchPlan-driven selective decode, gz") {
    val dir = tmpDir()
    val docs = (0 until 40).map(i =>
      (s"https://h${i % 4}.test/d/$i", s"payload $i")).toDF("uri", "body")
    Warc.writeWarcResponses(docs, dir, "uri", "body",
      overwrite = true, index = true)
    val idx = Cdx.readCdxj(spark, dir, glob = Some("*.cdxj"))
      .filter(col("surt_key").startsWith("test,h2)"))
    val plan = Cdx.fetchPlan(idx, gapBytes = 0L)
    val got = Warc.readWarcRanges(spark, dir, plan)
      .select(col("target_uri")).as[String].collect().toSet
    assert(got == (0 until 40).filter(_ % 4 == 2)
      .map(i => s"https://h2.test/d/$i").toSet)
  }

  test("readWarcRanges: zstd-dict mid-file ranges re-read the head dictionary") {
    val dir = tmpDir()
    // enough similar records to train a dictionary (≥ 8 and ≥ 16 KiB)
    val docs = (0 until 400).map(i =>
      (s"https://z.test/d/$i",
        s"shared boilerplate header for every page; unique part $i; " +
          ("filler " * 20))).toDF("uri", "body")
    Warc.writeWarcResponses(docs.coalesce(1), dir, "uri", "body",
      overwrite = true, index = true, codec = "zstd-dict")
    val idx = Cdx.readCdxj(spark, dir, glob = Some("*.cdxj")).collect()
    assert(idx.length == 400)
    // a LATE capture: its offset is far past the dictionary frame, so the
    // decode only works if the head skippables are re-read and prepended
    val late = idx.maxBy(_.getAs[Long]("offset"))
    assert(late.getAs[Long]("offset") > 0)
    val plan = Seq((late.getAs[String]("filename"),
      late.getAs[Long]("offset"),
      late.getAs[Long]("offset") + late.getAs[Long]("length")))
      .toDF("filename", "range_start", "range_end")
    val got = Warc.readWarcRanges(spark, dir, plan).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("target_uri") == late.getAs[String]("url"))
    val text = new String(got.head.getAs[Array[Byte]]("payload"), "UTF-8")
    assert(text.contains("unique part"))
  }
}
