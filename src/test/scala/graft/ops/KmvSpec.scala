package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** KMV distinct sketch: rank parity with the SQL formulation, exact
  * regime, partitioning invariance, sketch-regime accuracy, SQL function.
  */
class KmvSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  test("rank matches conv(substring(md5(seed:value),1,13),16,10)") {
    val vals = Seq("abc", "", "hello world", "δοκιμή", "7:tricky")
    val viaSql = vals.toDF("v")
      .select(conv(substring(md5(concat_ws(":", lit("7"), col("v"))), 1, 13), 16, 10)
        .cast("long").as("r"))
      .as[Long].collect().toSeq
    val viaKernel = vals.map(v =>
      graft.ops.expr.KmvSketch.rank(7L, org.apache.spark.unsafe.types.UTF8String.fromString(v)))
    assert(viaKernel == viaSql)
  }

  test("exact regime: below k the estimate IS the distinct count") {
    val df = (1 to 300).map(i => ("g", s"v${i % 100}")).toDF("g", "v")
    val r = Corpus.approxDistinct(df, Seq("g"), "v", k = 256, seed = 7L)
      .select(col("estimate"), col("exact"), col("sketch_size"))
      .as[(Double, Boolean, Int)].head()
    assert(r == ((100.0, true, 100)))
  }

  test("estimate is invariant to partitioning (pure function of the data)") {
    val data = (1 to 5000).map(i => ("g", s"value-$i")).toDF("g", "v")
    val a = Corpus.approxDistinct(data.repartition(1), Seq("g"), "v", k = 128, seed = 3L)
      .select(col("estimate")).as[Double].head()
    val b = Corpus.approxDistinct(data.repartition(13), Seq("g"), "v", k = 128, seed = 3L)
      .select(col("estimate")).as[Double].head()
    assert(a == b)
  }

  test("sketch regime: ~1/sqrt(k) relative error, exact=false") {
    val data = (1 to 5000).map(i => ("g", s"value-$i")).toDF("g", "v")
    val (est, exact) = Corpus.approxDistinct(data, Seq("g"), "v", k = 256, seed = 7L)
      .select(col("estimate"), col("exact")).as[(Double, Boolean)].head()
    assert(!exact)
    assert(math.abs(est / 5000.0 - 1.0) < 0.25, s"estimate $est too far from 5000")
  }

  test("duplicates don't move the estimate (distinct semantics)") {
    val once = (1 to 1000).map(i => ("g", s"v$i")).toDF("g", "v")
    val thrice = (1 to 3000).map(i => ("g", s"v${i % 1000 + 1}")).toDF("g", "v")
    val a = Corpus.approxDistinct(once, Seq("g"), "v", k = 64, seed = 1L)
      .select(col("estimate")).as[Double].head()
    val b = Corpus.approxDistinct(thrice, Seq("g"), "v", k = 64, seed = 1L)
      .select(col("estimate")).as[Double].head()
    assert(a == b)
  }

  test("kmv_distinct registered as a SQL aggregate") {
    graft.ops.expr.NativeSig.register(spark)
    (1 to 50).map(i => s"x$i").toDF("v").createOrReplaceTempView("kmv_in")
    val r = spark.sql("SELECT kmv_distinct(v, 256, 7).estimate AS e FROM kmv_in")
      .as[Double].head()
    assert(r == 50.0)
  }
}
