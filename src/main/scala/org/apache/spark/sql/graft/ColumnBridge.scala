package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ catalyst-Expression
  * converters, for registering custom native expressions
  * (graft.ops.expr). Lives in the org.apache.spark.sql namespace solely to
  * satisfy the access qualifier — the standard extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly-converted catalyst tree (no lazy ColumnNodeExpression wrapper —
    * the wrapper is Unevaluable and survives analysis when injected through
    * the function registry rather than a DataFrame API).
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Lineage truncation without a row codec round-trip: re-root `df` as a
    * fresh frame over its executed plan's `InternalRow` RDD
    * (`internalCreateDataFrame`, the same mechanism `Dataset.checkpoint`
    * uses internally). Unlike the public `createDataFrame(df.rdd, schema)`
    * route this skips the InternalRow→Row→InternalRow encoder pass, which
    * dominates per-round cost in iterative algorithms on wide frames.
    *
    * The caller owns the cache contract: persist `df` BEFORE calling this,
    * or every downstream use of the result recomputes the full upstream
    * plan (the returned frame shares `df`'s physical RDD, cached or not).
    */
  def truncateLineage(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }

  /** The ONE physical `InternalRow` RDD behind `df`'s plan. Running several
    * jobs against this same RDD object is the `RDD.zipWithIndex` consistency
    * idiom: any shuffle inside is planned (and its range bounds sampled)
    * exactly once, its map outputs are reused across the jobs, and per-
    * partition recomputation replays the same lineage — unlike executing
    * two separately-planned DataFrame actions over the same logical plan,
    * where each execution samples its own range bounds (`RangePartitioner`
    * seeds on `rdd.id`).
    */
  def internalRowRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd

  /** Wrap an `InternalRow` RDD (e.g. a transformation of
    * [[internalRowRdd]]'s result) back into a DataFrame.
    */
  def dataFrameFromInternalRows(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** All `CollectMetrics` observations in `df`'s EXECUTED plan, including
    * those buried under AQE — `AdaptiveSparkPlanExec` is a leaf to plan
    * traversals, so the stock `QueryExecution.observedMetrics` returns {}
    * for any observed query that also contains an exchange once adaptive
    * execution is on (which is this library's default posture). Descends
    * into the adaptive plan explicitly. When the same observation name
    * appears at several plan positions (a self-join reusing one observed
    * exchange — only the executed copy's accumulator fills), keeps the row
    * with data.
    */
  def observedMetricsAll(df: org.apache.spark.sql.DataFrame)
      : Map[String, org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.execution.{CollectMetricsExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // three leaf-like wrappers hide the real tree from stock traversals:
    // the AQE root (executedPlan), each materialized stage (plan), and
    // reused exchanges/subqueries (child) — all descended here
    def gather(p: SparkPlan): Seq[(String, org.apache.spark.sql.Row)] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => gather(a.executedPlan)
        case q: QueryStageExec        => gather(q.plan)
        case c: CollectMetricsExec    => Seq(c.name -> c.collectedMetrics)
        case _                        => Nil
      }
      here ++ p.children.flatMap(gather)
    }
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    gather(ds.queryExecution.executedPlan)
      .groupBy(_._1)
      .map { case (name, rows) =>
        // the executed copy has real accumulator contents; a never-ran
        // instance reports nulls/zeros — prefer the numerically largest
        // row (sound for monotone metrics: counts, maxes, sums)
        name -> rows.map(_._2).maxBy { r =>
          (0 until r.length).map { i =>
            r.get(i) match {
              case n: java.lang.Number => n.longValue()
              case _                   => 0L
            }
          }.sum
        }
      }
  }
}
