package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Interpolated Kneser–Ney bigram scoring: hand-derived probabilities on a
  * tiny corpus, both the seen-context and the unseen-context (continuation
  * backoff) branches, and the discount guard.
  *
  * Train: "a b a c", "b a". Counts: c(a,b)=1, c(b,a)=2, c(a,c)=1;
  * c_prev(a)=2 with N1+(a,·)=2, c_prev(b)=2 with N1+(b,·)=1; distinct
  * bigrams N=3; V={a,b,c}=3; continuation N1+(·,a)=1, N1+(·,b)=1,
  * N1+(·,c)=1. Floored continuation Pc(x) = (N1+(·,x)+1)/(N+V) = 2/6 for
  * seen words, 1/6 for OOV.
  */
class KneserNeySpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def train = Seq((0L, "a b a c"), (1L, "b a")).toDF("id", "text")

  private def score(text: String): (Long, Double, Double) = {
    val docs = Seq((42L, text)).toDF("id", "text")
    LangModel.scorePerplexityKneserNey(docs, "id", "text", train, "text")
      .select(col("n_bigrams"), col("avg_logp"), col("ppl"))
      .as[(Long, Double, Double)].head()
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("seen bigram: discounted count plus redistributed continuation mass") {
    // P(b|a) = (max(1-0.75,0) + 0.75 * 2 * (2/6)) / 2 = (0.25 + 0.5) / 2
    val (n, avg, _) = score("a b")
    assert(n == 1L)
    assert(avg == r6(math.log(0.375)))
  }

  test("seen context, unseen word: pure backoff mass, no raw count") {
    // P(a|a): c(a,a)=0 -> (0 + 0.75 * 2 * Pc(a)) / 2 with Pc(a) = 2/6
    val (_, avg, _) = score("a a")
    assert(avg == r6(math.log(0.75 * 2 * (2.0 / 6) / 2)))
  }

  test("unseen context: floored continuation probability") {
    // prev 'z' untrained -> P = Pc(a) = (1+1)/(3+3)
    val (_, avg, _) = score("z a")
    assert(avg == r6(math.log(2.0 / 6)))
  }

  test("fully out-of-vocabulary bigram scores finitely") {
    // P = Pc(q) = (0+1)/(3+3) — the deliberate +1/V floor
    val (_, avg, ppl) = score("z q")
    assert(avg == r6(math.log(1.0 / 6)))
    assert(ppl == 6.0)
  }

  test("Kneser–Ney beats Laplace on fluent text from the train distribution") {
    val docs = Seq((1L, "a b a c"), (2L, "q r s t")).toDF("id", "text")
    def ppls(f: => org.apache.spark.sql.DataFrame): Map[Long, Double] =
      f.select(col("id"), col("ppl")).as[(Long, Double)].collect().toMap
    val kn = ppls(LangModel.scorePerplexityKneserNey(docs, "id", "text", train, "text"))
    val lap = ppls(LangModel.scorePerplexity(docs, "id", "text", train, "text"))
    // both models must rank the in-distribution doc below the gibberish one
    assert(kn(1L) < kn(2L) && lap(1L) < lap(2L))
  }

  test("pipeline perplexity verb with smoothing: kn") {
    val out = graft.pipeline.Pipeline.run(spark,
      """source: docs
        |steps:
        |  - perplexity: {id: id, text: text, smoothing: kn}
        |""".stripMargin,
      name => { assert(name == "docs"); train })
    assert(out.columns.contains("ppl") && out.count() == 2)
    intercept[IllegalArgumentException] {
      graft.pipeline.Pipeline.run(spark,
        """source: docs
          |steps:
          |  - perplexity: {id: id, text: text, smoothing: oops}
          |""".stripMargin,
        name => train)
    }
  }

  test("discount outside (0,1) is refused") {
    intercept[IllegalArgumentException] {
      LangModel.scorePerplexityKneserNey(
        Seq((1L, "a b")).toDF("id", "text"), "id", "text",
        train, "text", discount = 1.0)
    }
  }
}
