package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Corpus data card: planted-duplicate rate, exact means/median, and the
  * informational language column.
  */
class CorpusReportSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  test("report on a hand-built corpus") {
    // 4 docs, one exact duplicate pair -> dup rate 1 - 3/4 = 0.25
    val df = Seq(
      "the cat sat",          // 3 tokens, 11 chars
      "the cat sat",
      "a dog barks loudly !", // 5 tokens (one punct token)
      "it is a test"          // 4 tokens
    ).toDF("text")
    val r = Corpus.report(df, "text").head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("total_tokens") == 3 + 3 + 5 + 4)
    assert(r.getAs[Double]("exact_dup_rate") == 0.25)
    // median of (3,3,5,4) = 3.5
    assert(r.getAs[Double]("p50_tokens") == 3.5)
    assert(r.getAs[Double]("mean_tokens") == 3.75)
    assert(r.getAs[String]("lang_top") == "en")
  }

  test("reportBy: per-group cards, group totals sum to the global card") {
    val df = Seq(
      ("a", "one two three"), ("a", "four five"),
      ("b", "six seven eight nine")).toDF("src", "text")
    val by = Corpus.reportBy(df, "text", Seq("src"))
      .orderBy("src").collect()
    assert(by.map(_.getAs[String]("src")).toSeq == Seq("a", "b"))
    assert(by.map(_.getAs[Long]("total_tokens")).sum ==
      Corpus.report(df, "text").head().getAs[Long]("total_tokens"))
    assert(by(0).getAs[Long]("n_docs") == 2L && by(1).getAs[Long]("n_docs") == 1L)
  }

  test("report is invariant to partitioning (decimal-exact means)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Corpus.report(docs.repartition(1), "text").drop("lang_top").head()
    val b = Corpus.report(docs.repartition(13), "text").drop("lang_top").head()
    assert(a == b)
  }
}
