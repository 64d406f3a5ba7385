package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

class SamplingSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"text $i", s"src${i % 3}")).toDF("id", "text", "src")

  test("thresholdHex: endpoints and monotone") {
    assert(Sampling.thresholdHex(0.0) == "0000000000000")
    assert(Sampling.thresholdHex(1.0) == "g")
    val ts = Seq(0.1, 0.25, 0.5, 0.9).map(Sampling.thresholdHex)
    assert(ts == ts.sorted)
    assert(ts.forall(_.length == 13))
    // 0.5 is exactly 8 << 48
    assert(Sampling.thresholdHex(0.5) == "8000000000000")
  }

  test("deterministicSample: partitioning-invariant row set, ~fraction size") {
    val d = docs(2000)
    val a = Sampling.deterministicSample(d, "id", 0.3, seed = 7)
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(d.repartition(13), "id", 0.3, seed = 7)
      .select("id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    // binomial(2000, 0.3): sd ~ 20.5; allow 5 sigma
    assert(math.abs(a.size - 600) < 103, s"got ${a.size}")
    // different seed draws a (nearly) disjointly-shifted set
    val c = Sampling.deterministicSample(d, "id", 0.3, seed = 8)
      .select("id").as[Long].collect().toSet
    assert(c != a)
    // nesting: a 0.1 sample is a subset of the same-seed 0.3 sample
    val nested = Sampling.deterministicSample(d, "id", 0.1, seed = 7)
      .select("id").as[Long].collect().toSet
    assert(nested.subsetOf(a), "thresholds must nest for the same seed")
  }

  test("deterministicSample: fraction 1.0 keeps everything, 0.0 nothing") {
    val d = docs(50)
    assert(Sampling.deterministicSample(d, "id", 1.0).count() == 50)
    assert(Sampling.deterministicSample(d, "id", 0.0).count() == 0)
  }

  test("topKPerStratum: exact k, salted == unsalted, stable under repartition") {
    val d = docs(999) // src0/src1/src2 each 333
    val salted = Sampling.topKPerStratum(d, Seq("src"), 25, "id", seed = 7)
      .select("src", "id").as[(String, Long)].collect().toSet
    val plain = Sampling.topKPerStratum(d, Seq("src"), 25, "id", seed = 7, saltBuckets = 1)
      .select("src", "id").as[(String, Long)].collect().toSet
    assert(salted == plain, "salting must not change the selected rows")
    val re = Sampling.topKPerStratum(d.repartition(17), Seq("src"), 25, "id", seed = 7)
      .select("src", "id").as[(String, Long)].collect().toSet
    assert(re == salted)
    assert(salted.groupBy(_._1).forall(_._2.size == 25))
    // matches a direct computation of the k smallest ranks per stratum
    val byRank = d
      .withColumn("r", Sampling.rankHex(col("id"), 7))
      .select("src", "id", "r").as[(String, Long, String)].collect()
      .groupBy(_._1)
      .flatMap { case (_, rows) => rows.sortBy(t => (t._3, t._2)).take(25).toSeq }
      .map(t => (t._1, t._2)).toSet
    assert(salted == byRank)
  }

  test("topKPerStratum: strata smaller than k keep all rows") {
    val d = docs(30) // 10 per src
    val got = Sampling.topKPerStratum(d, Seq("src"), 25, "id", seed = 1)
    assert(got.count() == 30)
  }

  test("allocate: largest remainder sums to total, deterministic ties") {
    val a = Sampling.allocate(Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 100)
    assert(a.map(_._2).sum == 100)
    // 33.33 each; bonus seat goes to the lexicographically first name
    assert(a.toMap == Map("a" -> 34L, "b" -> 33L, "c" -> 33L))
    val b = Sampling.allocate(Seq("x" -> 0.5, "y" -> 0.3, "z" -> 0.2), 200)
    assert(b.toMap == Map("x" -> 100L, "y" -> 60L, "z" -> 40L))
    val c = Sampling.allocate(Seq("p" -> 3.0, "q" -> 1.0), 7)
    assert(c.map(_._2).sum == 7)
    assert(c.toMap == Map("p" -> 5L, "q" -> 2L)) // 5.25 -> 5, 1.75 -> 2
  }

  test("mixCorpora: exact allocated counts with a source tag") {
    val d = docs(900)
    val srcs = Seq(
      "web" -> d.filter($"id" % 3 === 0),
      "book" -> d.filter($"id" % 3 === 1),
      "code" -> d.filter($"id" % 3 === 2))
    val mixed = Sampling.mixCorpora(
      srcs, Seq("web" -> 0.5, "book" -> 0.3, "code" -> 0.2),
      totalRows = 200, keyCol = "id", seed = 7)
    val counts = mixed.groupBy("mix_source").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("web" -> 100L, "book" -> 60L, "code" -> 40L))
    // short source contributes everything it has
    val shortMix = Sampling.mixCorpora(
      Seq("big" -> d, "tiny" -> d.limit(5)),
      Seq("big" -> 0.5, "tiny" -> 0.5),
      totalRows = 100, keyCol = "id", seed = 7)
    val c2 = shortMix.groupBy("mix_source").count().as[(String, Long)].collect().toMap
    assert(c2 == Map("big" -> 50L, "tiny" -> 5L))
  }

  test("mixCorporaByFraction: map-only, deterministic, tagged") {
    val d = docs(3000)
    val srcs = Seq("a" -> d.filter($"id" < 1500), "b" -> d.filter($"id" >= 1500))
    val mixed = Sampling.mixCorporaByFraction(
      srcs, Seq("a" -> 0.2, "b" -> 0.6), keyCol = "id", seed = 3)
    val again = Sampling.mixCorporaByFraction(
      srcs.map { case (n, df) => n -> df.repartition(7) },
      Seq("a" -> 0.2, "b" -> 0.6), keyCol = "id", seed = 3)
    val s1 = mixed.select("mix_source", "id").as[(String, Long)].collect().toSet
    val s2 = again.select("mix_source", "id").as[(String, Long)].collect().toSet
    assert(s1 == s2)
    val counts = s1.groupBy(_._1).view.mapValues(_.size).toMap
    // binomial(1500, .2) sd~15.5 and (1500, .6) sd~19 — 5 sigma windows
    assert(math.abs(counts("a") - 300) < 78, counts.toString)
    assert(math.abs(counts("b") - 900) < 95, counts.toString)
    // the plan is shuffle-free: no Exchange anywhere
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("rank is identical to the documented md5 formula (oracle contract)") {
    // the DuckDB oracle replays substr(md5(seed || ':' || key), 1, 13) —
    // pin the Spark side to that exact byte recipe
    val got = docs(1).select(Sampling.rankHex(col("id"), 42).as("r"))
      .as[String].head()
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("42:0".getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString
    assert(got == hex.take(13))
  }
}
