package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Auto-tuned MinHash banding (`minhashParamsFor` /
  * `nearDuplicatePairsAuto`): S-curve model arithmetic, the
  * largest-rows-per-band selection rule, hash-budget escalation, the loud
  * degradation branch, and the parameter-independent identical-text recall
  * floor through the auto path.
  */
class MinhashAutoSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  // ------------------------------------------------------------------
  // bandingRecall: the S-curve itself
  // ------------------------------------------------------------------

  test("bandingRecall matches the closed form and handles underflow") {
    // hand-checked point: s=0.8, r=4, b=16 → 1-(1-0.4096)^16
    val expected = 1.0 - math.pow(1.0 - math.pow(0.8, 4), 16)
    assert(math.abs(Dedup.bandingRecall(0.8, 4, 16) - expected) < 1e-12)
    // s^r underflow at high r: 0.0, never NaN
    val tiny = Dedup.bandingRecall(0.01, 512, 1)
    assert(!tiny.isNaN && tiny >= 0.0 && tiny < 1e-300)
    // s = 1 (identical sets) → recall 1 at any split
    assert(Dedup.bandingRecall(1.0, 64, 1) == 1.0)
  }

  test("bandingRecall is monotone decreasing in rowsPerBand at fixed budget") {
    val h = 64
    val splits = (1 to h).filter(h % _ == 0)
    val recalls = splits.map(r => Dedup.bandingRecall(0.7, r, h / r))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      s"recalls not decreasing: ${splits.zip(recalls)}")
  }

  // ------------------------------------------------------------------
  // minhashParamsFor: selection rule
  // ------------------------------------------------------------------

  test("picks the largest rowsPerBand meeting the target (0.8/0.9 → 64/16)") {
    // r=8 gives 0.771 < 0.9; r=4 gives 0.9998 ≥ 0.9 → (h=64, bands=16)
    assert(Dedup.minhashParamsFor(0.8, 0.9, 64) == ((64, 16)))
  }

  test("returned bands always divide numHashes and recall meets target") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9, 0.95);
         rec <- Seq(0.5, 0.9, 0.99)) {
      val (h, b) = Dedup.minhashParamsFor(t, rec)
      assert(h % b == 0, s"bands $b !| numHashes $h for t=$t rec=$rec")
      assert(Dedup.bandingRecall(t, h / b, b) >= rec,
        s"recall model violated at t=$t rec=$rec → ($h, $b)")
    }
  }

  test("escalates the hash budget when 64 hashes cannot reach the target") {
    // t=0.2, rec=0.99: r=1 at h=64 gives 1-0.8^64 ≈ 0.99999938 — fine.
    // t=0.05, rec=0.99: r=1 at h=64 gives 1-0.95^64 ≈ 0.963 < 0.99; at
    // h=128, 1-0.95^128 ≈ 0.9986 ≥ 0.99 → escalation picks h=128.
    val (h, b) = Dedup.minhashParamsFor(0.05, 0.99, 64)
    assert(h == 128 && h % b == 0)
    assert(Dedup.bandingRecall(0.05, h / b, b) >= 0.99)
  }

  test("degrades loudly (max-recall split) when maxHashes cannot express it") {
    // t=0.01, rec=0.999: needs >688 hashes even at r=1 — cap at 512 →
    // (512, 512) with r=1, the best available
    val (h, b) = Dedup.minhashParamsFor(0.01, 0.999, 64, maxHashes = 512)
    assert(h == 512 && b == 512)
  }

  test("invalid arguments are rejected") {
    intercept[IllegalArgumentException](Dedup.minhashParamsFor(0.0, 0.9))
    intercept[IllegalArgumentException](Dedup.minhashParamsFor(0.8, 1.0))
    intercept[IllegalArgumentException](Dedup.minhashParamsFor(0.8, 0.9, 64, 32))
  }

  // ------------------------------------------------------------------
  // nearDuplicatePairsAuto: e2e floor + threshold verification
  // ------------------------------------------------------------------

  test("auto path finds identical and near-identical docs, rejects distant") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base), // identical — must pair with 1 at jaccard 1
      (3L, base + " tail"), // near: high shingle overlap
      (4L, "completely different content about spark catalyst plans here")
    ).toDF("id", "text")
    val got = Dedup.nearDuplicatePairsAuto(docs, "id", "text",
        threshold = 0.5, targetRecall = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"identical pair missing: $got")
    assert(got.contains((1L, 3L)) && got.contains((2L, 3L)),
      s"near pair missing: $got")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L),
      s"distant doc paired: $got")
  }

  test("dropNearDuplicatesAuto and the pipeline targetRecall flag") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, base), (2L, base), (3L, "something else entirely here"))
      .toDF("id", "text")
    val kept = Dedup.dropNearDuplicatesAuto(docs, "id", "text",
      threshold = 0.8, targetRecall = 0.9)
    assert(kept.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val out = graft.pipeline.Pipeline.run(spark,
      """source: t
        |steps:
        |  - dropNearDuplicates: {id: id, text: text, threshold: 0.8,
        |      targetRecall: 0.9}
        |""".stripMargin, _ => docs)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }
}
