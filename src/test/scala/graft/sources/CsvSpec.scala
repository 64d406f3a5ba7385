package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** CSV/TSV source: schema'd read, separator handling, the three
  * bad-record policies, policy authority over user options, and the
  * pipeline source branch.
  */
class CsvSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def writeLines(lines: Seq[String], suffix: String = ".csv"): String = {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, s"part-0$suffix")
    Files.write(f.toPath, lines.mkString("\n").getBytes("UTF-8"))
    dir.getAbsolutePath
  }

  test("schema'd csv read: no inference pass, typed columns") {
    val p = writeLines(Seq("1,alpha", "2,\"be,ta\"", "3,gamma"))
    val df = Readers.readCsv(spark, p, schema = "id BIGINT, t STRING")
    assert(df.schema.map(_.dataType.typeName) == Seq("long", "string"))
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "be,ta"), (3L, "gamma")))
  }

  test("tsv separator and header skip") {
    val p = writeLines(Seq("id\tt", "1\talpha", "2\tbeta"), ".tsv")
    val df = Readers.readCsv(spark, p, schema = "id BIGINT, t STRING",
      sep = "\t", header = true)
    assert(df.count() == 2)
  }

  test("badRecords drop/keep/fail on type-violating rows") {
    val p = writeLines(Seq("1,ok", "notanumber,torn", "3,ok2"))
    val dropped = Readers.readCsv(spark, p,
      schema = "id BIGINT, t STRING", badRecords = "drop")
    // CSV column-pruning caveat: a count() parses no columns, so
    // malformation is only detected when data columns are read
    assert(dropped.collect().length == 2)
    val kept = Readers.readCsv(spark, p,
      schema = "id BIGINT, t STRING", badRecords = "keep")
    // corrupt-record caveat: reference a data column alongside the audit
    // column (Spark disallows corrupt-only projections off raw files)
    val rows = kept.select("id", "t", "_corrupt_record")
      .collect().sortBy(r => Option(r.get(0)).map(_.toString).getOrElse(""))
    assert(rows.length == 3)
    val corrupt = rows.filter(!_.isNullAt(2))
    assert(corrupt.length == 1 && corrupt.head.getString(2) == "notanumber,torn")
    val failing = Readers.readCsv(spark, p,
      schema = "id BIGINT, t STRING", badRecords = "fail")
    intercept[org.apache.spark.SparkException] { failing.collect() }
  }

  test("badRecords policy overrides a user-supplied mode option") {
    val p = writeLines(Seq("1,ok", "notanumber,torn"))
    val df = Readers.readCsv(spark, p, schema = "id BIGINT, t STRING",
      badRecords = "drop", options = Map("mode" -> "FAILFAST"))
    assert(df.collect().length == 1) // drop won; FAILFAST would have thrown
  }

  test("declared sep/header beat user options; keep requires a schema") {
    val p = writeLines(Seq("1\thello", "2\tworld"), ".tsv")
    // an options sep must not silently defeat the declared tsv separator
    val df = Readers.readCsv(spark, p, schema = "id BIGINT, t STRING",
      sep = "\t", options = Map("sep" -> ","))
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "hello"), (2L, "world")))
    intercept[IllegalArgumentException] {
      Readers.readCsv(spark, p, badRecords = "keep") // no schema
    }
  }

  test("readCsvStream: shards stream in as they land; torn rows dropped") {
    val d = Files.createTempDirectory("graft_csv_stream").toFile
    d.deleteOnExit()
    Files.write(new java.io.File(d, "s0.csv").toPath,
      "1,first shard\n".getBytes("UTF-8"))
    val stream = Readers.readCsvStream(spark, d.getPath,
      schema = "id BIGINT, t STRING", maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("csv_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("csv_stream").count() == 1)
      Files.write(new java.io.File(d, "s1.csv").toPath,
        "2,second shard\nnotanumber,torn\n3,third\n".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = spark.table("csv_stream").as[(Long, String)].collect().toMap
      assert(rows.keySet == Set(1L, 2L, 3L))
      assert(rows(2L) == "second shard")
    } finally q.stop()
    intercept[IllegalArgumentException] {
      Readers.readCsvStream(spark, d.getPath, schema = null)
    }
  }

  test("pipeline csv/tsv source branch with steps") {
    val p = writeLines(Seq("1,hello world", "2,tiny"))
    val out = graft.pipeline.Pipeline.run(spark,
      s"""source: {format: csv, path: "$p", schema: "id BIGINT, text STRING"}
         |steps:
         |  - filter: "len_chars($$text) > 5"
         |""".stripMargin,
      name => fail(s"unexpected resolve: $name"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      graft.pipeline.Pipeline.run(spark,
        s"""source: {format: tsv, path: "$p", bogus: 1}
           |steps: []
           |""".stripMargin, _ => fail("no resolve"))
    }
  }
}
