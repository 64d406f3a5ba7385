package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

class TemporalJoinSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val events =
    graft.sources.Readers.readEvents(spark, "/root/testdata/sf0.001").cache()

  test("asOfJoin matches the brute-force inequality join on real events") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("signup_ts"), $"event_id".as("signup_id"))

    val asof = TemporalJoin.asOfJoin(
      purchases, signups.withColumnRenamed("signup_ts", "sts"),
      keys = Seq("user_id"), leftTs = "ts", rightTs = "sts",
      rightCols = Seq("signup_id"))
      .select($"event_id", $"signup_id")
      .as[(Long, Option[Long])].collect().toMap

    // brute force: latest signup at or before each purchase
    val brute = purchases.as("p")
      .join(signups.as("s"),
        $"p.user_id" === $"s.user_id" && $"s.signup_ts" <= $"p.ts", "left")
      .groupBy($"p.event_id")
      .agg(max_by(struct($"s.signup_ts", $"s.signup_id"), $"s.signup_ts").as("m"))
      .select($"event_id", $"m.signup_id")
      .as[(Long, Option[Long])].collect().toMap

    assert(asof.keySet == brute.keySet)
    val diffs = asof.keySet.filter(k => asof(k) != brute(k))
    assert(diffs.isEmpty, s"as-of mismatches: ${diffs.take(5).map(k => (k, asof(k), brute(k)))}")
    assert(asof.values.exists(_.isDefined), "expected at least some matches")
    assert(asof.values.exists(_.isEmpty), "expected at least some non-matches")
  }

  test("tolerance nulls matches older than the lookback window") {
    val left = Seq((1L, "2024-01-01 10:00:00", "L1"), (1L, "2024-01-01 12:00:00", "L2"))
      .toDF("k", "ts", "name")
      .withColumn("ts", to_timestamp_ntz($"ts"))
    val right = Seq((1L, "2024-01-01 09:30:00", "R1"))
      .toDF("k", "rts", "rname")
      .withColumn("rts", to_timestamp_ntz($"rts"))
    val noTol = TemporalJoin.asOfJoin(left, right, Seq("k"), "ts", "rts", Seq("rname"))
      .select("name", "rname").as[(String, Option[String])].collect().toMap
    assert(noTol == Map("L1" -> Some("R1"), "L2" -> Some("R1")))
    val tol = TemporalJoin.asOfJoin(left, right, Seq("k"), "ts", "rts", Seq("rname"),
      tolerance = Some(expr("INTERVAL 1 HOUR")))
      .select("name", "rname").as[(String, Option[String])].collect().toMap
    assert(tol == Map("L1" -> Some("R1"), "L2" -> None)) // 2.5h old > 1h lookback
  }

  test("rangeJoin matches brute-force containment join on real events") {
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    // window per signup: [ts, ts + 2 days]
    val windows = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 2 DAYS")).as("w_end"),
        $"event_id".as("signup_id"))
    val ranged = TemporalJoin.rangeJoin(
      purchases, windows, Seq("user_id"), "ts", "w_start", "w_end",
      bucketMicros = 6L * 3600 * 1000000 // 6-hour cells
    ).select($"event_id", $"signup_id").as[(Long, Long)].collect().toSet
    val brute = purchases.as("p").join(windows.as("w"),
      $"p.user_id" === $"w.user_id" && $"p.ts" >= $"w.w_start" && $"p.ts" <= $"w.w_end")
      .select($"event_id", $"signup_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(ranged == brute, s"diff: ${(ranged -- brute).take(3)} / ${(brute -- ranged).take(3)}")
    // no duplicate pairs from the cell explode
    val rangedList = TemporalJoin.rangeJoin(
      purchases, windows, Seq("user_id"), "ts", "w_start", "w_end",
      bucketMicros = 6L * 3600 * 1000000
    ).select($"event_id", $"signup_id").count()
    assert(rangedList == ranged.size)
  }

  test("rangeJoin drops pathologically long intervals instead of exploding") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 0L, 10000000000L, "huge")).toDF("k", "s", "e", "tag")
    val out = TemporalJoin.rangeJoin(left, right, Seq("k"), "ts", "s", "e",
      bucketMicros = 10, maxCellsPerInterval = 100)
    assert(out.count() == 0) // interval spans 1e9 cells > cap → dropped
  }

  test("single shuffle: exactly one exchange in the plan") {
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "x")
    val right = Seq((1L, 5L, "r")).toDF("k", "rts", "y")
    val plan = TemporalJoin.asOfJoin(left, right, Seq("k"), "ts", "rts", Seq("y"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("null right timestamps never match (DuckDB ASOF semantics)") {
    val left = Seq((1L, 10L, "L1")).toDF("k", "ts", "name")
    val right = Seq((1L, Option.empty[Long], "RNULL"), (1L, Option(5L), "R1"))
      .toDF("k", "rts", "rname")
    val out = TemporalJoin.asOfJoin(left, right, Seq("k"), "ts", "rts", Seq("rname"))
      .select("name", "rname").as[(String, Option[String])].collect().toMap
    assert(out == Map("L1" -> Some("R1")))

    val onlyNull = right.filter($"rts".isNull)
    val none = TemporalJoin.asOfJoin(left, onlyNull, Seq("k"), "ts", "rts", Seq("rname"))
      .select("name", "rname").as[(String, Option[String])].collect().toMap
    assert(none == Map("L1" -> None))
  }

}
