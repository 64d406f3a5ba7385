package graft.dftly

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TextStats

/** dftly expressions are stateless scalar transforms, so the whole engine
  * works unchanged under Structured Streaming (SURVEY.md §2.9). Proven here
  * with a MemoryStream → Dftly.select → memory-sink pipeline, plus a
  * windowed-aggregation composition over compiled expressions.
  */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  test("Dftly.select applies to a stream; results match the batch run") {
    val input = MemoryStream[(Long, Double, Double)](spark)
    val yaml =
      """id: $_1
        |revenue: $_2 * (1 - $_3)
        |big: "YES if $_2 > 100 else NO"
        |""".stripMargin
    val streamed = Dftly.select(input.toDF(), yaml)
    val q = streamed.writeStream.format("memory").queryName("dftly_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, 50.0, 0.1), (2L, 200.0, 0.25))
      q.processAllAvailable()
      val got = spark.table("dftly_stream").orderBy("id").collect()
      assert(got.length == 2)
      assert(math.abs(got(0).getDouble(1) - 45.0) < 1e-9)
      assert(got(0).getString(2) == "NO")
      assert(math.abs(got(1).getDouble(1) - 150.0) < 1e-9)
      assert(got(1).getString(2) == "YES")
    } finally q.stop()
  }

  test("compiled expressions compose with watermark + windowed aggregation") {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val df = input.toDF().toDF("ts", "text")
    val enriched = df.select(
      col("ts"),
      TextStats.tokenCountWs(col("text")).as("n_tok"),
      Dftly.compile(Dftly.parse("$text[0:3]"), Some(df.schema)).as("prefix")
    )
    val agg = enriched
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("prefix"))
      .agg(sum(col("n_tok")).as("toks"))
    val q = agg.writeStream.format("memory").queryName("dftly_windowed")
      .outputMode("update").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:05")
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:30")
      input.addData((t0, "abc def"), (t1, "abcdef ghi jkl"))
      q.processAllAvailable()
      val got = spark.table("dftly_windowed").collect()
      assert(got.map(_.getString(1)).toSet == Set("abc"))
      assert(got.map(_.getLong(2)).sum == 5) // 2 + 3 tokens, same window+prefix
    } finally q.stop()
  }
}
