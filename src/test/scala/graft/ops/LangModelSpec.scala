package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

class LangModelSpec extends SparkTestBase {

  import spark.implicits._

  test("bigramPairs: interior bigrams only; short docs contribute nothing") {
    val d = Seq((1L, "a b c"), (2L, "x"), (3L, ""), (4L, "p  q")).toDF("id", "text")
    val got = LangModel.bigramPairs(d, "id", "text")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "a", "b"), (1L, "b", "c"), (4L, "p", "q")))
  }

  test("scorePerplexity: hand-derived Laplace bigram arithmetic") {
    // corpus: "a b a", "a b" — V = 2; c(a,b)=2, c(b,a)=1; c_prev(a)=2, c_prev(b)=1
    val d = Seq((1L, "a b a"), (2L, "a b")).toDF("id", "text")
    val got = LangModel.scorePerplexity(d, "id", "text", d, "text")
      .orderBy("id").collect()
    // doc 1: ln(3/4) + ln(2/3) = -0.287682 - 0.405465 → avg -0.3465735,
    //        ppl = exp(0.3465735) ≈ sqrt(2)
    assert(got(0).getLong(1) == 2L)
    assert(math.abs(got(0).getDouble(2) - -0.346574) < 2e-6)
    assert(math.abs(got(0).getDouble(3) - 1.4142) < 2e-4)
    // doc 2: one bigram, P = 3/4 → avg ln(0.75), ppl = 4/3
    assert(got(1).getLong(1) == 1L)
    assert(math.abs(got(1).getDouble(2) - -0.287682) < 2e-6)
    assert(math.abs(got(1).getDouble(3) - 1.3333) < 2e-4)
  }

  test("deterministic across partitionings (decimal-sum contract)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = LangModel.scorePerplexity(docs, "doc_id", "text", docs, "text")
      .select("doc_id", "avg_logp", "ppl")
      .as[(Long, Double, Double)].collect().toSet
    val re = docs.repartition(7)
    val b = LangModel.scorePerplexity(re, "doc_id", "text", re, "text")
      .select("doc_id", "avg_logp", "ppl")
      .as[(Long, Double, Double)].collect().toSet
    assert(a == b, "bit-stable scores regardless of partitioning")
    // self-scored perplexity is a proper positive score; fluent docs score
    // far below vocabulary size
    assert(a.forall(_._3 >= 1.0))
  }

  test("scoring against a separate reference corpus handles unseen bigrams") {
    val train = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val docs = Seq((10L, "the cat"), (11L, "zz qq")).toDF("id", "text")
    val got = LangModel.scorePerplexity(docs, "id", "text", train, "text")
      .orderBy("id").collect()
    // "the cat": seen bigram → P = (1+1)/(2+5)... c(the,cat)=1, c_prev(the)=2, V=5
    assert(math.abs(got(0).getDouble(2) - math.log(2.0 / 7.0)) < 2e-6)
    // "zz qq": unseen everything → P = 1/(0+V) = 1/5
    assert(math.abs(got(1).getDouble(2) - math.log(1.0 / 5.0)) < 2e-6)
    assert(math.abs(got(1).getDouble(3) - 5.0) < 2e-3)
  }

  test("iso639_3 bridge: single + multi-code re-spell, unknown/und/null " +
    "pass through; every Langs code has a mapping") {
    import graft.ops.expr.{LangIso639, LangModel}
    import org.apache.spark.unsafe.types.UTF8String
    def c(s: String) = LangIso639.convert(UTF8String.fromString(s)).toString
    assert(c("en") == "eng")
    assert(c("fr,en") == "fra,eng")
    assert(c("ru,uk,xx") == "rus,ukr,xx")
    assert(c("und") == "und")
    assert(c("") == "")
    assert(LangIso639.convert(null) == null)
    // the mapping covers exactly the classifier's alphabet
    assert(LangModel.Langs.toSet == LangIso639.Mapping.keySet)
    assert(LangIso639.Mapping.values.forall(_.length == 3))
    // column path agrees
    val sq2 = spark
    import sq2.implicits._
    val viaCol = Seq("fr,en").toDF("l")
      .select(graft.ops.TextStats.toIso639_3(col("l"))).as[String].head()
    assert(viaCol == "fra,eng")
  }
}
