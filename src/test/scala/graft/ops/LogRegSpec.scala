package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Distributed logistic regression: learning sanity, partitioning
  * invariance (the decimal-sum determinism contract), and scoring.
  */
class LogRegSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def separable = (1 to 400).map { i =>
    val x = i / 400.0
    (x, if (x >= 0.5) 1.0 else 0.0)
  }.toDF("x", "y")

  test("learns the separating direction (positive weight, ~centered bias)") {
    val w = LogReg.train(separable, Seq("x"), "y", iters = 20, lr = 2.0)
    assert(w(0) > 0.0, s"feature weight should be positive: ${w.toSeq}")
    // score must rank a high-x row above a low-x row
    val s = separable.select(
      LogReg.score(Seq(col("x")), w).as("p"), col("x"))
    val hi = s.filter(col("x") > 0.9).agg(avg("p")).as[Double].head()
    val lo = s.filter(col("x") < 0.1).agg(avg("p")).as[Double].head()
    assert(hi > lo + 0.05, s"hi=$hi lo=$lo")
  }

  test("weights are invariant to partitioning (exact decimal gradient sums)") {
    val a = LogReg.train(separable.repartition(1), Seq("x"), "y", 3, 0.5)
    val b = LogReg.train(separable.repartition(13), Seq("x"), "y", 3, 0.5)
    assert(a.toSeq == b.toSeq)
  }

  test("zero-information features keep zero-ish weights") {
    val df = (1 to 100).map(i => (0.0, i % 2
      match { case 0 => 1.0; case _ => 0.0 })).toDF("x", "y")
    val w = LogReg.train(df, Seq("x"), "y", 2, 0.5)
    assert(w(0) == 0.0) // x is constant zero — no gradient can flow to it
  }

  test("score stays in (0,1) and matches sigmoid of the dot product") {
    val w = Array(2.0, -1.0)
    val s = Seq(Tuple1(0.75)).toDF("x")
      .select(LogReg.score(Seq(col("x")), w).as("p")).as[Double].head()
    val expect = BigDecimal(1.0 / (1.0 + math.exp(-(0.75 * 2.0 - 1.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s == expect)
  }
}
