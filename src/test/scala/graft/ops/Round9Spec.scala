package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Round-9 additions: the streaming e2e gate query (q56) against a batch
  * replay computed in-Spark — the DuckDB oracle covers the same ground in
  * Verify; this pins it in the suite where a refactor of StreamingOps or
  * Readers breaks fast.
  */
class Round9Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q56: streaming jsonl → dedup → sessionize equals the batch replay") {
    val streamed = graft.SparkEntry.queries("q56_stream_e2e")(spark, dir)

    // batch replay: distinct events, session_window aggregation (the same
    // operator sessionize uses — on a batch frame it needs no watermark)
    val ev = graft.sources.Readers.readEvents(spark, dir)
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("user_id"))
      .distinct()
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val batch = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_event"), max(col("ts")).as("last_event"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"),
        unix_micros(col("first_event")).as("first_us"),
        unix_micros(col("last_event")).as("last_us"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
