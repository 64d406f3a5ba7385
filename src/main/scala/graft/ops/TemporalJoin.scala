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
    // Null right timestamps sort first (asc = nulls first) and would be
    // carried forward as spurious "prior" matches; DuckDB ASOF (the oracle
    // semantics) never matches a null timestamp — drop them up front.
    val rightNonNull = right.filter(col(rightTs).isNotNull)
    val rightTagged = rightNonNull.select(
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

  /** Range (interval-containment) join: all (left, right) pairs with
    * `right.start <= left.ts <= right.end`, per key.
    *
    * The naive inequality join degenerates to a nested loop; this bucketizes
    * time into `bucketMicros`-wide cells — each left row lands in one cell,
    * each right interval explodes into the cells it covers — and equi-joins
    * on (key, cell) before the exact containment filter. Cost scales with
    * interval-length / bucket width (capped by `maxCellsPerInterval`:
    * pathological unbounded intervals are dropped rather than exploding the
    * job; pick `bucketMicros` near the typical interval length).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightStart: String,
      rightEnd: String,
      bucketMicros: Long,
      maxCellsPerInterval: Int = 10000
  ): DataFrame = {
    def cellOf(df: DataFrame, colName: String): Column = {
      val micros = df.schema(colName).dataType match {
        case org.apache.spark.sql.types.LongType => col(colName)
        case _ => unix_micros(col(colName).cast("timestamp"))
      }
      floor(micros.cast("double") / bucketMicros.toDouble).cast("long")
    }
    // Explicit side aliases: the two inputs often derive from the same source
    // frame (e.g. one events scan filtered two ways), and dataframe-identity
    // column references on such self-joins are fragile (Spark warns
    // "trivially true equals predicate" and guesses the disambiguation).
    val leftCelled = left.withColumn("__cell", cellOf(left, leftTs)).alias("__gl")
    val rightCelled = right
      .withColumn("__c0", cellOf(right, rightStart))
      .withColumn("__c1", cellOf(right, rightEnd))
      .filter(col("__c1") >= col("__c0") &&
        (col("__c1") - col("__c0")) < maxCellsPerInterval)
      .withColumn("__cell", explode(sequence(col("__c0"), col("__c1"))))
      .drop("__c0", "__c1")
      .alias("__gr")
    val joinCond = keys.map(k => col(s"__gl.$k") === col(s"__gr.$k")).reduce(_ && _) &&
      col("__gl.__cell") === col("__gr.__cell") &&
      col(s"__gl.$leftTs") >= col(s"__gr.$rightStart") &&
      col(s"__gl.$leftTs") <= col(s"__gr.$rightEnd")
    val leftOut = left.columns.map(c => col(s"__gl.$c"))
    val rightOut = right.columns.filterNot(keys.contains).map(c => col(s"__gr.$c"))
    leftCelled.join(rightCelled, joinCond)
      .select((leftOut ++ rightOut).toIndexedSeq: _*)
  }
}
