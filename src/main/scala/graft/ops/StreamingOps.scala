package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterparts of the corpus-cleaning operators. The dftly
  * expression layer is stateless and works on streams unchanged; dedup is the
  * one operator that needs state, and unbounded state is the thing that kills
  * streaming jobs at scale — everything here bounds it with a watermark.
  */
object StreamingOps {

  /** Exact dedup on a stream with BOUNDED state: duplicates arriving within
    * the watermark delay are dropped; state for keys older than the watermark
    * is evicted. Dedup key is the same 128-bit content digest as the batch
    * operator (full content never enters the state store — 32 bytes per key).
    */
  def dedupExactWithinWatermark(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      delay: String
  ): DataFrame = {
    val contentKey = md5(to_binary(to_json(struct(keyCols.map(col): _*)), lit("utf-8")))
    df.withColumn("__content_key", contentKey)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__content_key")
      .drop("__content_key")
  }

  /** Event sessionization: per-key sessions closed after `gap` of
    * inactivity, with count and start/end bounds. Built on Spark's native
    * `session_window` (merging windowed state, watermark-evicted) rather
    * than hand-rolled `flatMapGroupsWithState` — the built-in keeps state in
    * the state store's merging format and survives scale-out/retries with
    * exactly-once semantics for free. Works identically on batch frames.
    *
    * @param delay watermark delay (how late events may arrive); sessions
    *   emit once the watermark passes their end.
    */
  def sessionize(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gap: String,
      delay: String
  ): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy((keyCols.map(col) :+ session_window(col(tsCol), gap)): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_event"),
        max(col(tsCol)).as("last_event")
      )
      .select(
        keyCols.map(col) ++ Seq(
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("first_event"), col("last_event")
        ): _*
      )
}
