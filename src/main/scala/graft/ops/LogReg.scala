package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed logistic-regression training for learned quality filters —
  * train a linear classifier ON the corpus (e.g. "looks like the curated
  * reference" vs "looks like raw crawl"), then apply it as one map-only
  * scoring pass. The fastText-style recipe every large pipeline uses for
  * its model-based quality signal, reduced to its Spark-native core:
  * full-batch gradient descent where EACH ITERATION IS ONE AGGREGATE.
  *
  * Scale shape: an iteration scans the corpus once and reduces to
  * (numFeatures + 2) partial sums — map-side combined, nothing but a few
  * decimals on the exchange, weights broadcast back as plan literals. At
  * 100 TB an iteration costs exactly one pass; `iters` is small because a
  * quality filter needs separation, not convergence to the optimum.
  *
  * Determinism contract (the [[LangModel]] / [[Corpus.profile]] lesson,
  * applied to training): per-row sigmoids are rounded to 6 decimals
  * (absorbing libm last-ulp differences across engines), per-row gradient
  * terms to 9, and the sums run as exact decimal(38,12) — so the learned
  * weights are bit-stable across partitionings, cluster sizes, AND
  * engines: the q72 oracle replays the full unrolled training in SQL and
  * hash-compares the weights themselves. Dot products associate strictly
  * left-to-right in feature order; transcribe the same order when
  * replaying.
  *
  * The reference has no aggregate/training surface at all
  * (parser.py:326-344) — beyond-reference, motivated by model-based
  * quality scoring.
  */
object LogReg {

  /** σ(z) rounded to 6 decimals, z associated left-to-right over
    * `features` with weights `w` and bias `b` (the replay contract).
    */
  def sigmoid(features: Seq[Column], w: Seq[Double], b: Double): Column = {
    val z = features.zip(w).map { case (x, wi) => x * wi }
      .reduceLeft(_ + _) + b
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Train `iters` full-batch iterations from zero weights; returns
    * feature weights (in `featureCols` order) followed by the bias. The
    * label column must be 0/1.
    */
  def train(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      iters: Int,
      lr: Double
  ): Array[Double] = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(iters >= 1, "iters must be >= 1")
    val k = featureCols.length
    val w = Array.fill(k + 1)(0.0) // last = bias
    val dec = DecimalType(38, 12)
    for (_ <- 0 until iters) {
      val p = sigmoid(featureCols.map(col), w.take(k).toSeq, w(k))
      val r = col(labelCol).cast("double") - p
      val sums = featureCols.map(c =>
        sum(round(r * col(c), 9).cast(dec))) :+
        sum(round(r, 9).cast(dec)) :+
        count(lit(1))
      val row = df.agg(sums.head, sums.tail: _*).head()
      val n = row.getLong(k + 1)
      require(n > 0, "cannot train on an empty frame")
      var j = 0
      while (j <= k) {
        val g = Option(row.getDecimal(j)).map(_.doubleValue).getOrElse(0.0)
        // HALF_UP (away from zero) — the same convention Spark's and
        // DuckDB's round() apply to doubles, so the replay agrees
        w(j) = BigDecimal(w(j) + lr * g / n)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        j += 1
      }
    }
    w
  }

  /** Score column under trained weights — the map-only application pass. */
  def score(features: Seq[Column], weights: Array[Double]): Column =
    sigmoid(features, weights.dropRight(1).toSeq, weights.last)
}
