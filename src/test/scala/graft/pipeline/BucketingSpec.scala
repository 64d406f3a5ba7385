package graft.pipeline

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Bucketed-sink co-location: writing both join sides bucketed on the join
  * key must make the later sort-merge join EXCHANGE-FREE — the setup for
  * repeatedly-joined big tables, where one write-time shuffle amortizes
  * every downstream join/aggregation at 100 TB.
  */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("joining two bucketed tables runs without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    // a crashed run can leave an orphaned managed-table location behind
    for (t <- Seq("b_lineitem", "b_orders")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    Pipeline.runOnDir(spark,
      """source: lineitem
        |steps:
        |  - select:
        |      l_orderkey: $l_orderkey
        |      l_quantity: $l_quantity
        |sink:
        |  table: b_lineitem
        |  bucketBy: {n: 4, cols: [l_orderkey]}
        |  sortBy: [l_orderkey]
        |""".stripMargin, dir)
    Pipeline.runOnDir(spark,
      """source: orders
        |steps:
        |  - select:
        |      o_orderkey: $o_orderkey
        |      o_totalprice: $o_totalprice
        |sink:
        |  table: b_orders
        |  bucketBy: {n: 4, cols: [o_orderkey]}
        |""".stripMargin, dir)

    // tiny test tables would be broadcast — disable it so the plan shows
    // what bucketing buys on two BIG sides: a sort-merge join with NO
    // shuffle exchange on either side
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // and it is still correct
      val expected = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketBy on a path sink is rejected with a clear message") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.runOnDir(spark,
        """source: orders
          |steps: []
          |sink:
          |  path: /tmp/bucketed_wrong
          |  bucketBy: {n: 4, cols: [o_orderkey]}
          |""".stripMargin, dir)
    }
    assert(e.getMessage.contains("table"), e.getMessage)
  }
}
