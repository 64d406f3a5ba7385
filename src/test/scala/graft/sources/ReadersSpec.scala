package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

import graft.dftly.SparkTestBase

class ReadersSpec extends SparkTestBase {

  import spark.implicits._

  private def writeGz(dir: File, name: String, lines: Seq[String]): Unit = {
    val out = new GZIPOutputStream(new FileOutputStream(new File(dir, name)))
    out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
  }

  private lazy val fixtureDir: File = {
    val d = Files.createTempDirectory("graft_jsonl_spec").toFile
    d.deleteOnExit()
    writeGz(d, "shard-00.jsonl.gz", Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "quote \" and newline \\n inside"}""",
      """{"doc_id": 3, "text": "üñíçødé ✓"}"""))
    writeGz(d, "shard-01.jsonl.gz", Seq(
      """{"doc_id": 4, "text": "good line"}""",
      """{"doc_id": 5, "text": "torn line""", // malformed: unterminated
      """{"doc_id": 6, "text": "last good"}"""))
    d
  }

  test("readJsonl: gz shards, explicit schema, drop policy") {
    val df = Readers.readJsonl(spark, fixtureDir.getPath,
      schema = "doc_id BIGINT, text STRING", badRecords = "drop")
    val rows = df.as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 6L)) // torn line dropped
    assert(rows(3L) == "üñíçødé ✓")
    assert(rows(2L).contains("quote \" and newline"))
  }

  test("readJsonl: keep policy parks corrupt lines in _corrupt_record") {
    val df = Readers.readJsonl(spark, fixtureDir.getPath,
      schema = "doc_id BIGINT, text STRING", badRecords = "keep")
    assert(df.columns.toSeq == Seq("doc_id", "text", "_corrupt_record"))
    // Spark disallows queries whose referenced columns are ONLY the internal
    // corrupt-record column (count() / filter-on-it-alone) straight off raw
    // files — materialize rows first, as a real audit pipeline would
    val rows = df.collect()
    assert(rows.length == 6)
    val bad = rows.filter(r => !r.isNullAt(r.fieldIndex("_corrupt_record")))
    assert(bad.length == 1)
    val r = bad.head
    assert(r.isNullAt(r.fieldIndex("doc_id")))
    assert(r.getString(r.fieldIndex("_corrupt_record")).startsWith("""{"doc_id": 5"""))
  }

  test("readJsonl: fail policy aborts on first corrupt line") {
    val df = Readers.readJsonl(spark, fixtureDir.getPath,
      schema = "doc_id BIGINT, text STRING", badRecords = "fail")
    intercept[Exception] { df.count() }
  }

  test("readJsonl: mixed plain and gz shards in one directory both read") {
    val d = Files.createTempDirectory("graft_jsonl_mixed").toFile
    d.deleteOnExit()
    writeGz(d, "a.jsonl.gz", Seq("""{"doc_id": 1, "text": "compressed"}"""))
    Files.writeString(new File(d, "b.jsonl").toPath,
      """{"doc_id": 2, "text": "plain"}""" + "\n")
    val rows = Readers.readJsonl(spark, d.getPath,
      schema = "doc_id BIGINT, text STRING")
      .as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "compressed", 2L -> "plain"))
  }

  private def writeZst(dir: File, name: String, lines: Seq[String]): Unit = {
    val out = new com.github.luben.zstd.ZstdOutputStream(
      new FileOutputStream(new File(dir, name)))
    out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
  }

  test("readJsonl: zst shards resolve through the codec factory; mixed gz+zst+corrupt dir") {
    val d = Files.createTempDirectory("graft_jsonl_zst").toFile
    d.deleteOnExit()
    writeGz(d, "a.jsonl.gz", Seq("""{"doc_id": 1, "text": "gzip shard"}"""))
    writeZst(d, "b.jsonl.zst", Seq(
      """{"doc_id": 2, "text": "zstd shard"}""",
      """{"doc_id": 3, "text": "üñíçødé in zst ✓"}"""))
    writeZst(d, "zz-corrupt.jsonl.zst", Seq("""{"doc_id": broken""", "garbage"))
    val rows = Readers.readJsonl(spark, d.getPath,
      schema = "doc_id BIGINT, text STRING", badRecords = "drop")
      .as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "gzip shard", 2L -> "zstd shard",
      3L -> "üñíçødé in zst ✓"))
  }

  test("readJsonl: options thread through but cannot override the bad-record policy") {
    val d = Files.createTempDirectory("graft_jsonl_opts").toFile
    d.deleteOnExit()
    // custom lineSep: records separated by ; on one physical line
    Files.writeString(new File(d, "a.jsonl").toPath,
      """{"doc_id": 1, "text": "x"};{"doc_id": 2, "text": "y"};not json""")
    val rows = Readers.readJsonl(spark, d.getPath,
      schema = "doc_id BIGINT, text STRING", badRecords = "drop",
      options = Map("lineSep" -> ";", "mode" -> "FAILFAST"))
      .as[(Long, String)].collect().toMap
    // lineSep honored (2 records parsed); the mode=FAILFAST smuggled via
    // options is overridden by badRecords=drop (corrupt trailer dropped,
    // no exception)
    assert(rows == Map(1L -> "x", 2L -> "y"))
  }

  test("readJsonl: schema'd parse prunes fields not in the schema") {
    val d = Files.createTempDirectory("graft_jsonl_prune").toFile
    d.deleteOnExit()
    writeGz(d, "s.jsonl.gz", Seq(
      """{"doc_id": 1, "text": "a", "huge_ignored": {"nested": [1,2,3]}}"""))
    val df = Readers.readJsonl(spark, d.getPath, schema = "doc_id BIGINT, text STRING")
    assert(df.columns.toSeq == Seq("doc_id", "text"))
    assert(df.count() == 1)
  }

  test("readJsonlStream: gz shards stream in as they land; batch operators apply") {
    val d = Files.createTempDirectory("graft_jsonl_stream").toFile
    d.deleteOnExit()
    writeGz(d, "s0.jsonl.gz", Seq("""{"doc_id": 1, "text": "first shard"}"""))
    val stream = Readers.readJsonlStream(spark, d.getPath,
      schema = "doc_id BIGINT, text STRING", maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("jsonl_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_stream").count() == 1)
      // a newly-landed shard (with a torn line, dropped) flows in
      writeGz(d, "s1.jsonl.gz", Seq(
        """{"doc_id": 2, "text": "second shard"}""",
        """{"torn""",
        """{"doc_id": 3, "text": "third"}"""))
      q.processAllAvailable()
      val rows = spark.table("jsonl_stream").as[(Long, String)].collect().toMap
      assert(rows.keySet == Set(1L, 2L, 3L))
      assert(rows(2L) == "second shard")
    } finally q.stop()
  }

  test("readEvents: micros-era testdata reads as TIMESTAMP_NTZ") {
    val ev = Readers.readEvents(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampNTZType)
    assert(ev.count() > 0)
    // timestamps are sane epoch values, not nanos misread as micros
    val yr = ev.select(year($"ts")).as[Int].head()
    assert(yr >= 2000 && yr <= 2100)
  }

  test("readEvents: long-typed ts (nanos era surfaced via nanosAsLong) branch") {
    val d = Files.createTempDirectory("graft_events_long").toFile
    d.deleteOnExit()
    // simulate what nanosAsLong produces for a TIMESTAMP(NANOS) file: raw
    // Long nanos — 2024-01-01T00:00:01 in ns
    Seq((1L, 1704067201000000000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"${d.getPath}/events.parquet")
    val ev = Readers.readEvents(spark, d.getPath)
    assert(ev.schema("ts").dataType == TimestampNTZType)
    assert(ev.select(year($"ts")).as[Int].head() == 2024)
  }
}
