package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Compression-ratio quality signal: ordering across entropy regimes,
  * empty-input convention, and the SQL registration.
  */
class EntropySpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  test("ratio separates repetition from high-entropy text; empty is 1.0") {
    val cases = Seq(
      ("rep", Seq.fill(100)("spam spam spam").mkString(" ")),
      ("prose", "The quick brown fox jumps over the lazy dog while " +
        "seventeen sparrows argue about crumbs near the fountain."),
      ("hex", (1 to 50).map(i => (i * 2654435761L).toHexString).mkString),
      ("empty", ""))
    val got = cases.toDF("k", "t")
      .select(col("k"), TextStats.compressionRatio(col("t")).as("r"))
      .as[(String, Double)].collect().toMap
    // robust claims only: repetition lands far below everything; short
    // prose and hex both sit high (deflate overhead dominates short
    // strings, so prose-vs-hex ORDER is length-dependent — not asserted)
    assert(got("rep") < 0.1, s"repetitive ratio ${got("rep")}")
    assert(got("prose") > 0.4 && got("hex") > 0.4, s"high-entropy floor: $got")
    assert(got("empty") == 1.0)
  }

  test("pure per-row: invariant to partitioning") {
    val df = (1 to 200).map(i => s"doc $i " + ("na" * (i % 50))).toDF("t")
    val a = df.repartition(1).select(sum(TextStats.compressionRatio(col("t")).cast("decimal(38,12)")))
      .head().getDecimal(0)
    val b = df.repartition(7).select(sum(TextStats.compressionRatio(col("t")).cast("decimal(38,12)")))
      .head().getDecimal(0)
    assert(a == b)
  }

  test("deflate_ratio registered as a SQL function") {
    graft.ops.expr.NativeSig.register(spark)
    val r = spark.sql("SELECT deflate_ratio('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS r")
      .as[Double].head()
    assert(r < 0.5)
  }
}
