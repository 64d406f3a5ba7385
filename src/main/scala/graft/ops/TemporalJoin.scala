package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the temporal alignment primitive the
  * reference has no equivalent for, but every event/feature pipeline needs:
  * "for each left row, the latest right row at or before its timestamp, per
  * key".
  *
  * Spark has no native as-of join; the naive encoding
  * (`l.ts >= r.ts` inequality join + max) degenerates to a broadcast
  * nested-loop or an O(n·m) blowup. This is the single-shuffle formulation:
  * tag and union both sides, sort each key's timeline once in a window, and
  * carry the last-seen right payload forward with `last(..., ignoreNulls)`.
  * Cost = one shuffle on the key + one per-partition sort — the same shape
  * as a sort-merge join, at any scale. Skewed keys can be pre-salted only if
  * correctness allows (as-of needs the full key timeline together), so the
  * practical guard is key granularity, not salting.
  */
object TemporalJoin {

  /** @param rightCols right columns to attach (null when no prior right row)
    * @param tolerance optional max lookback: matches older than
    *   `leftTs − tolerance` are nulled (e.g. `expr("INTERVAL 1 HOUR")`)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tolerance: Option[Column] = None
  ): DataFrame = {
    val spark = left.sparkSession
    val leftCols = left.columns.toSeq

    // Unioned timeline: right rows sort before left rows at equal timestamps
    // (side 0 < 1), making the join inclusive (right.ts <= left.ts).
    val payloadType = right
      .select(struct((col(rightTs).as("__rts") +: rightCols.map(col)): _*).as("p"))
      .schema("p").dataType
    val leftType = left
      .select(struct(leftCols.map(col): _*).as("l"))
      .schema("l").dataType

    val leftTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(null).cast(payloadType).as("__payload"),
        struct(leftCols.map(col): _*).as("__left"),
        lit(1).as("__side")
      ): _*
    )
    val rightTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        struct((col(rightTs).as("__rts") +: rightCols.map(col)): _*).as("__payload"),
        lit(null).cast(leftType).as("__left"),
        lit(0).as("__side")
      ): _*
    )

    val unioned = leftTagged.unionByName(rightTagged)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTolerance = tolerance match {
      case Some(tol) =>
        when(col("__match").isNotNull &&
          col("__match.__rts") >= col("__ts") - tol, col("__match"))
      case None => col("__match")
    }
    val out = matched.withColumn("__match", withinTolerance)
    val leftOut = leftCols.map(c => col(s"__left.$c").as(c))
    val rightOut = rightCols.map(c => col(s"__match.$c").as(c))
    out.select(leftOut ++ rightOut: _*)
  }
}
