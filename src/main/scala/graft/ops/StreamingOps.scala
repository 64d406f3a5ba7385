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
}
