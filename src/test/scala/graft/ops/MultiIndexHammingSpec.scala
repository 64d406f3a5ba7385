package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Multi-index Hamming search (the high-band candidate generator behind
  * media near-dup): exactness vs brute force, and the scale gate — the
  * corpus regime where 1-of-(h+1) banding's bucket space collapses and
  * drops everything, which multi-index must survive.
  */
class MultiIndexHammingSpec extends SparkTestBase {

  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** Driver-side brute force: all pairs within maxHamming. */
  private def brute(items: Seq[(Long, Long)], maxHamming: Int): Set[(Long, Long)] =
    (for {
      i <- items.indices.iterator
      j <- (i + 1) until items.size
      if java.lang.Long.bitCount(items(i)._2 ^ items(j)._2) <= maxHamming
    } yield {
      val (a, b) = (items(i)._1, items(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet

  test("ballMasks: counts, weights, distinctness") {
    val m16r2 = Dedup.ballMasks(16, 2)
    assert(m16r2.length == 1 + 16 + 120) // Σ C(16,k), k ≤ 2
    assert(m16r2.distinct.length == m16r2.length)
    assert(m16r2.forall(m => java.lang.Long.bitCount(m) <= 2))
    assert(m16r2.forall(m => (m & ~0xFFFFL) == 0L), "masks confined to low 16 bits")
    assert(m16r2.head == 0L, "identity mask first (radius-0 probe)")
    assert(Dedup.ballMasks(16, 0).toSeq == Seq(0L))
    assert(Dedup.ballMasks(8, 1).length == 9)
  }

  test("multi-index == brute force on random signatures with planted near pairs") {
    val r = rng(11)
    val base = (0L until 300L).map(i => (i, r.nextLong()))
    // planted: 10 exact copies and 10 copies with exactly 7 bit flips
    val exact = (0 until 10).map(i => (1000L + i, base(i)._2))
    val near = (0 until 10).map { i =>
      var s = base(50 + i)._2
      val flips = r.shuffle((0 until 64).toList).take(7)
      flips.foreach(b => s ^= (1L << b))
      (2000L + i, s)
    }
    val items = base ++ exact ++ near
    val df = items.toDF("id", "sig")
    val got = Dedup.multiIndexHammingPairs(df, "id", "sig", maxHamming = 10)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val expect = brute(items, 10)
    assert(expect.size >= 20, "planted pairs must be in range")
    assert(got == expect, s"missed=${expect -- got} extra=${got -- expect}")
  }

  test("duplicate (id, sig) input rows collapse: one output row per pair") {
    // the documented output contract — replaying the same row (a re-read
    // shard, an un-dedup'd union) must not duplicate keeper-star pairs
    val base = Seq((1L, 0x1234L), (2L, 0x1234L), (3L, 0x1234L), (9L, 0x1234L ^ 3L))
    val dup = (base ++ base ++ base).toDF("id", "sig")
    val rows = Dedup.multiIndexHammingPairs(dup, "id", "sig", maxHamming = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(rows.distinct.sorted == rows.sorted, s"duplicate pairs in $rows")
    assert(rows.toSet == brute(base, 4))
  }

  test("hamming verification: reported hamming matches, threshold respected") {
    val df = Seq(
      (1L, 0L), (2L, 255L), (3L, 0x0F0FL), (4L, 0x0F00L),
      (5L, -1L)                        // 64−8 ≥ 56 from everything else
    ).toDF("id", "sig")
    val rows = Dedup.multiIndexHammingPairs(df, "id", "sig", maxHamming = 8)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    // all pairwise distances among {0, 0x00FF, 0x0F0F, 0x0F00} that are ≤ 8
    assert(rows == Set(
      (1L, 2L, 8), (1L, 3L, 8), (1L, 4L, 4),
      (2L, 3L, 8), (3L, 4L, 4)))
  }

  test("dispatcher: low bands stay on banding, high bands use multi-index — same answer") {
    val r = rng(7)
    val items = (0L until 200L).map(i => (i, r.nextLong())) ++
      (0 until 5).map(i => (500L + i, r.nextLong() & 0xFFL)) // clustered low sigs
    val df = items.toDF("id", "sig")
    for (h <- Seq(3, 10)) {
      val got = Dedup.hammingNearDuplicatePairs(df, "id", "sig", maxHamming = h)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(got == brute(items, h), s"band $h")
    }
  }

  test("THE COLLAPSE GATE: banding drops every bucket past the cap regime; " +
    "multi-index finds the planted floor with zero truncation") {
    // 5000 random sigs at maxBucketSize=50: the banded shape at h=10 has
    // 11 chunks × 2⁵ = 352 possible buckets, ~156 rows each — ALL over the
    // cap, so banding emits nothing and reports wall-to-wall truncation.
    // Multi-index spreads the same corpus over 4 × 2¹⁶ keys.
    val r = rng(42)
    val base = (0L until 5000L).map(i => (i, r.nextLong()))
    val planted = (0 until 25).map(i => (1000000L + i, base(i * 100)._2))
    val df = (base ++ planted).toDF("id", "sig")

    val old = Dedup.bandedHammingPairs(df, "id", "sig", maxHamming = 10, maxBucketSize = 50)
    assert(old.collect().isEmpty, "the old shape's silent-collapse regime")
    val oldStats = Dedup.observedBucketStats(old)
    // an all-empty output can hit the documented AQE empty-propagation
    // caveat; when the observation survives, it must scream truncation
    oldStats.foreach { case (_, nTrunc, _) =>
      assert(nTrunc > 300L, s"every banded bucket should be over-cap, got $nTrunc")
    }

    val mih = Dedup.multiIndexHammingPairs(df, "id", "sig",
      maxHamming = 10, maxBucketSize = 50)
    val got = mih.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val expect = brute(base ++ planted, 10)
    assert(expect.size >= 25)
    assert(got == expect, s"missed=${(expect -- got).take(5)}")
    val Some((maxB, nTrunc, rowsTrunc)) = Dedup.observedBucketStats(mih)
    assert(nTrunc == 0L && rowsTrunc == 0L,
      s"multi-index must not truncate here: n=$nTrunc rows=$rowsTrunc max=$maxB")
  }

  test("over-cap identical-sig group: keeper-star covers EVERY member, truncation loud") {
    // 200 identical sigs with cap 20: the banded engine would drop the
    // bucket outright (zero pairs). The distinct-signature engine pairs
    // every member with the group keeper (min id) via the linear star
    // join-back — so "drop later copies" coverage is complete at ANY
    // multiplicity — plus all pairs among the retained non-keeper sample.
    val df = (0L until 200L).map(i => (i, 0x1234567890ABCDEFL)).toDF("id", "sig")
    val mih = Dedup.multiIndexHammingPairs(df, "id", "sig",
      maxHamming = 10, maxBucketSize = 20)
    // collect mih ITSELF (not a derived projection) so the bucket
    // observation lands on this frame's executed plan
    val rows = mih.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.forall(_._3 == 0))
    // star coverage: every non-keeper id appears as id_b of a keeper pair
    val starPairs = rows.filter(_._1 == 0L).map(_._2).toSet
    assert(starPairs == (1L until 200L).toSet,
      s"every member must pair with the keeper; missing=${((1L until 200L).toSet -- starPairs).take(5)}")
    // plus C(r, 2) pairs among the r retained non-keeper members (r is 19
    // or 20 depending on whether the arbitrary retained sample kept id 0)
    val inGroup = rows.filter(_._1 != 0L)
    assert(inGroup.length == 171 || inGroup.length == 190,
      s"retained-sample pairs: got ${inGroup.length}")
    val Some((maxB, nTrunc, _)) = Dedup.observedBucketStats(mih)
    assert(maxB == 200L && nTrunc == 1L, s"truncation must be loud: max=$maxB n=$nTrunc")
  }

  test("duplicate-heavy regime: 100k copies of ONE signature — floor found, " +
    "bounded per-task shuffle (the r11 probe-side skew gate)") {
    // The canonical near-dup input: pixel-identical re-encodes all hash to
    // one signature. The r11 engine put k probe rows × cap anchor members
    // into the single task owning the hot (chunk, value) key — k×cap row
    // expansions (1e8 at k=1e5) through the pair distinct's exchange. The
    // distinct-signature engine collapses the population map-side: the only
    // per-task linear cost is the keeper-star join-back (~k records), and
    // nothing quadratic crosses any exchange.
    val k = 100000L
    val r = rng(13)
    val distinctBase = (0 until 200).map(i => (10000000L + i, r.nextLong()))
    // 100 planted near pairs at hamming exactly 6 (0x111111 = six bits)
    val near = distinctBase.take(100).map { case (id, s) =>
      (id + 5000000L, s ^ 0x111111L)
    }
    val hot = spark.range(k).select(col("id"), lit(0x0BADCAFEL).as("sig"))
    val dd = hot
      .unionByName(distinctBase.toDF("id", "sig"))
      .unionByName(near.toDF("id", "sig"))

    val maxTaskShuffleRecords = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val rec = m.shuffleReadMetrics.recordsRead
          maxTaskShuffleRecords.getAndUpdate(cur => math.max(cur, rec))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val pairs = Dedup.multiIndexHammingPairs(dd, "id", "sig",
        maxHamming = 10, maxBucketSize = 1000)
      val agg = pairs.agg(
        sum(when($"hamming" === 0 && $"id_a" === 0L && $"id_b" < k, 1L)
          .otherwise(0L)).as("star"),
        count_distinct(when($"hamming" === 6, struct($"id_a", $"id_b")))
          .as("near")).head()
      // complete drop coverage over the hot group: every copy pairs with
      // the keeper (id 0) despite the member-sample cap
      assert(agg.getLong(0) == k - 1, s"star pairs: ${agg.getLong(0)}")
      // the planted distinct-sig floor is found THROUGH the hot regime
      assert(agg.getLong(1) >= 100, s"planted near pairs: ${agg.getLong(1)}")
      // listener events drain asynchronously: poll until the max is stable
      var prev = -1L
      var stable = 0
      while (stable < 2) {
        val cur = maxTaskShuffleRecords.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        Thread.sleep(200)
      }
      val maxRec = maxTaskShuffleRecords.get()
      assert(maxRec > 0, "listener must have observed shuffle traffic")
      assert(maxRec < 1000000L,
        s"per-task shuffle bounded: max=$maxRec (r11's quadratic shape put " +
          "~1e8 expansion rows through the hot task)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("null signatures excluded; non-integral sig column refused") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "sig")
    val got = Dedup.multiIndexHammingPairs(df, "id", "sig", maxHamming = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L)))
    val bad = Seq((1L, "abc")).toDF("id", "sig")
    intercept[IllegalArgumentException] {
      Dedup.multiIndexHammingPairs(bad, "id", "sig", maxHamming = 8)
    }
  }
}
