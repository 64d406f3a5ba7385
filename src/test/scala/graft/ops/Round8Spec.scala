package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Round-8 regression pins: the scan-parallelism guard at the reader, and
  * partition-order-independent profile means (BENCH_NOTES.md documents the
  * incidents both guard against).
  */
class Round8Spec extends SparkTestBase {

  import spark.implicits._

  test("single-row-group parquet scans are re-parallelized by the reader guard") {
    val d = java.nio.file.Files.createTempDirectory("graft_onerg").toFile
    d.deleteOnExit()
    // one task writes one file with one row group — parquet's minimum read
    // unit, unsplittable: the exact shape the r7 testdata regen produced
    spark.range(100000).select($"id", ($"id" % 97).as("v"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${d.getPath}/t.parquet")
    val raw = spark.read.parquet(s"${d.getPath}/t.parquet")
    assert(raw.queryExecution.toRdd.getNumPartitions == 1,
      "fixture must reproduce the unsplittable single-row-group layout")
    val guarded = Dedup.ensureParallelism(raw)
    assert(guarded.queryExecution.toRdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // and the guard is a no-op when splits are already plentiful
    val wide = raw.repartition(spark.sparkContext.defaultParallelism * 2)
    assert(Dedup.ensureParallelism(wide).queryExecution.toRdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism * 2)
  }

  test("profile mean is bit-identical across partitionings (exact decimal sum)") {
    // values chosen so the true mean lands ON a round-half boundary (the
    // l_discount incident): double avg() flips the rounded 6th decimal
    // with partition order; the decimal-sum mean must not
    val vals = Seq.fill(2000)(Seq(0.01, 0.05, 0.07, 0.0867404)).flatten // mean 0.0541851
    val means = Seq(1, 7, 32).map { p =>
      val df = vals.toDF("v").repartition(p)
      Corpus.profile(df, Seq("v")).select($"mean").as[Double].head()
    }
    assert(means.distinct.size == 1,
      s"mean must not depend on partitioning, got $means")
    // and it equals the exactly-computed value
    val exact = (vals.map(BigDecimal(_)).sum / vals.length).toDouble
    assert(math.abs(means.head - exact) < 1e-12)
  }

  test("profile decimal-sum mean: null / empty / zero-row edge cases") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.0, null), (3.0, null)).toDF("v", "allnull")
    val p = Corpus.profile(df, Seq("v", "allnull")).collect()
      .map(r => r.getString(r.fieldIndex("column")) ->
        Option(r.get(r.fieldIndex("mean"))).map(_.asInstanceOf[Double]))
      .toMap
    assert(p("v").contains(2.0))
    assert(p("allnull").isEmpty, "all-null column must profile to null mean")
    val empty = Corpus.profile(df.filter($"v" < 0), Seq("v")).collect()
    assert(empty.length == 1 && empty.head.isNullAt(empty.head.fieldIndex("mean")))
  }
}
