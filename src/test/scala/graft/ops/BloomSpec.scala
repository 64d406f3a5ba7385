package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Bloom-filter cross-corpus membership: no false negatives (the hard
  * guarantee), bounded false-positive rate (the trade), drop semantics,
  * and the size cap.
  */
class BloomSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  test("no false negatives: every member probes seen") {
    val members = (1 to 10000).map(i => s"member-$i")
    val bloom = Decontam.buildBloom(members.toDF("v"), "v", 10000L, 0.01)
    val flagged = Decontam.markSeenBloom(members.toDF("v"), "v", bloom)
      .filter(!col("seen")).count()
    assert(flagged == 0, s"$flagged members probed unseen — bloom broke its contract")
  }

  test("false-positive rate on disjoint probes stays near fpp") {
    val members = (1 to 20000).map(i => s"member-$i")
    val bloom = Decontam.buildBloom(members.toDF("v"), "v", 20000L, 0.01)
    val probes = (1 to 20000).map(i => s"other-$i")
    val fp = Decontam.markSeenBloom(probes.toDF("v"), "v", bloom)
      .filter(col("seen")).count()
    val rate = fp.toDouble / 20000
    assert(rate < 0.03, s"fp rate $rate way above configured 0.01")
  }

  test("dropSeenBloom removes every true duplicate") {
    val reference = (1 to 500).map(i => s"doc-$i")
    val bloom = Decontam.buildBloom(reference.toDF("v"), "v", 500L, 0.01)
    val incoming = ((1 to 500).map(i => s"doc-$i") ++
      (1 to 500).map(i => s"new-$i")).toDF("v")
    val kept = Decontam.dropSeenBloom(incoming, "v", bloom)
      .as[String].collect().toSeq
    assert(kept.forall(_.startsWith("new-")), "a true duplicate survived")
    assert(kept.size >= 480, s"over-dropped far beyond fpp: ${kept.size}/500 kept")
  }

  test("undersized filter inflates fpp but still never loses members") {
    val members = (1 to 5000).map(i => s"m-$i")
    // sized for 100 items, fed 5000 — fpp explodes, membership must hold
    val bloom = Decontam.buildBloom(members.toDF("v"), "v", 100L, 0.01)
    val missed = Decontam.markSeenBloom(members.toDF("v"), "v", bloom)
      .filter(!col("seen")).count()
    assert(missed == 0)
  }

  test("size cap refuses a filter that cannot ship") {
    val e = intercept[IllegalArgumentException] {
      Decontam.buildBloom(Seq("x").toDF("v"), "v",
        expectedItems = 100000000000L, fpp = 1e-9)
    }
    assert(e.getMessage.contains("raise fpp or shard"))
  }
}
