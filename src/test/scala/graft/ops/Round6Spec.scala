package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Round-6 hardening: bounded bucket aggregation, simhash chunk-mask edge,
  * minhash null-slot handling, lshParamsFor underflow, folded bucket stats,
  * join-free exact-dedup drop path.
  */
class Round6Spec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------------
  // BoundedCollectList
  // ------------------------------------------------------------------

  test("boundedCollectList: exact count, capped items, null skipping") {
    val df = (1 to 100).map(i => ("k", i.toLong)).toDF("k", "v")
      .union(Seq(("k2", 1L), ("k2", 2L)).toDF("k", "v"))
      .union(Seq(("k3", Option.empty[Long]), ("k3", Some(7L))).toDF("k", "v"))
    val got = df
      .groupBy("k")
      .agg(graft.ops.expr.NativeSig.boundedCollectList(col("v"), 10).as("bl"))
      .select(col("k"), col("bl.cnt"), size(col("bl.items")).as("n"),
        col("bl.items"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2), r.getSeq[Long](3))))
      .toMap
    // over the cap: all 100 counted, only 10 retained
    assert(got("k")._1 == 100L && got("k")._2 == 10)
    // under the cap: everything retained
    assert(got("k2") == ((2L, 2, Seq(1L, 2L))))
    // nulls skipped entirely (count AND items), like collect_list
    assert(got("k3") == ((1L, 1, Seq(7L))))
  }

  test("boundedCollectList survives serialization (partial-agg merge path)") {
    // many input partitions force partial buffers through serialize/merge
    val df = spark.range(0, 1000, 1, 32)
      .select((col("id") % 4).as("k"), col("id").as("v"))
    val got = df
      .groupBy("k")
      .agg(graft.ops.expr.NativeSig.boundedCollectList(
        struct(col("v"), (col("v") * 2).as("w")), 50).as("bl"))
      .select(col("k"), col("bl.cnt"), size(col("bl.items")).as("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    assert(got.values.forall(_ == ((250L, 50))), s"got $got")
  }

  test("over-cap buckets are dropped with exact stats, never expanded") {
    // 40 identical docs (black hole) + 3 copies of another: the minhash
    // verify path must still report the TRUE bucket size (40) even though
    // its aggregation buffer held at most maxBucketSize members
    val df = ((1 to 40).map(i => (i.toLong, "same words every time here")) ++
      (50 to 52).map(i => (i.toLong, "an entirely different sentence altogether")))
      .toDF("id", "text")
    val pairs = Dedup.nearDuplicatePairs(df, "id", "text",
      threshold = 0.5, maxBucketSize = 10)
    assert(pairs.collect().length == 3)
    val Some((maxB, nTrunc, rowsTrunc)) = Dedup.observedBucketStats(pairs)
    assert(maxB == 40L, s"true size must survive truncation, got $maxB")
    assert(nTrunc >= 1L && rowsTrunc >= 40L)
  }

  test("observedBucketStatsAll: one entry per composed operator, Option folds") {
    val df = ((1 to 40).map(i => (i.toLong, "same words every time here")) ++
      (50 to 52).map(i => (i.toLong, "an entirely different sentence altogether")))
      .toDF("id", "text")
    // compose two observed operators into ONE executed frame
    val mh = Dedup.nearDuplicatePairs(df, "id", "text",
      threshold = 0.5, maxBucketSize = 10)
    val sh = Dedup.simhashNearDuplicatePairs(df, "id", "text",
      maxHamming = 3, maxBucketSize = 1000)
    val composed = mh.select("id_a", "id_b").union(sh.select("id_a", "id_b"))
    composed.collect()
    val all = Dedup.observedBucketStatsAll(composed)
    assert(all.length == 2, s"expected both operators' stats, got $all")
    // the fold must surface the truncating operator even if the other is clean
    val Some((maxB, nTrunc, _)) = Dedup.observedBucketStats(composed)
    assert(maxB == 40L && nTrunc >= 1L, s"fold masked truncation: $maxB/$nTrunc")
  }

  // ------------------------------------------------------------------
  // SimHash chunk mask at the 64-bit boundary
  // ------------------------------------------------------------------

  test("chunkMask handles the 64-bit chunk (maxHamming = 0)") {
    assert(Dedup.chunkMask(64) == -1L)
    assert(Dedup.chunkMask(32) == 0xFFFFFFFFL)
    assert(Dedup.chunkMask(16) == 0xFFFFL)
  }

  test("simhash maxHamming = 0: exact-signature pairs only, distinct buckets") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // identical -> hamming 0
      (3L, "completely unrelated words here now"),
      (4L, "other disjoint vocabulary sentence tokens")
    ).toDF("id", "text")
    val pairs = Dedup.simhashNearDuplicatePairs(df, "id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // before the mask fix every chunk_val was 0 — one bucket of ALL docs.
    // With the fix, distinct signatures land in distinct buckets, so a
    // cap of 2 cannot drop the identical pair (its bucket has exactly 2).
    val capped = Dedup.simhashNearDuplicatePairs(df, "id", "text",
      maxHamming = 0, maxBucketSize = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L)),
      "distinct sigs must not share the maxHamming=0 bucket")
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDuplicatePairs(df, "id", "text", maxHamming = 64)
    }
  }

  // ------------------------------------------------------------------
  // minhash over array<bigint> with null slots
  // ------------------------------------------------------------------

  test("minhashLongs skips null slots (matches the string kernel)") {
    val df = Seq(1).toDF("x").select(
      graft.ops.expr.NativeSig.minhashSignature(
        array(lit(11L), lit(null).cast("long"), lit(22L)), 16).as("with_null"),
      graft.ops.expr.NativeSig.minhashSignature(
        array(lit(11L), lit(22L)), 16).as("without"))
    val r = df.head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1),
      "null slots must not perturb the signature")
    // all-null input: no token contributes — sentinel maxima, same as an
    // all-null string array (NOT the empty-array null signature)
    val allNull = Seq(1).toDF("x").select(
      graft.ops.expr.NativeSig.minhashSignature(
        array(lit(null).cast("long")), 4).as("s"),
      graft.ops.expr.NativeSig.minhashSignature(
        array(lit(null).cast("string")), 4).as("t")).head
    assert(allNull.getSeq[Long](0) == allNull.getSeq[Long](1))
  }

  // ------------------------------------------------------------------
  // lshParamsFor underflow
  // ------------------------------------------------------------------

  test("lshParamsFor never returns non-positive tables (pTable underflow)") {
    // threshold pathologically near -1: acos ≈ π, per-plane collision ≈ 0,
    // pTable underflows to 0 at high plane counts
    for (th <- Seq(-0.999999, -0.9, 0.0, 0.5, 0.99);
         n <- Seq(100L, 1000000L, 10000000000L)) {
      val (planes, tables) = Similarity.lshParamsFor(n, th)
      assert(planes >= 1 && planes <= 62, s"planes $planes for th=$th n=$n")
      assert(tables >= 1 && tables <= 64, s"tables $tables for th=$th n=$n")
    }
  }

  // ------------------------------------------------------------------
  // join-free exact-dedup drop path
  // ------------------------------------------------------------------

  test("dropExactDuplicates: min-id row kept, no join in the plan") {
    val df = Seq(
      (3L, "aa", 30), (1L, "aa", 10), (2L, "bb", 20), (4L, "aa", 40)
    ).toDF("id", "text", "payload")
    val kept = Dedup.dropExactDuplicates(df, "id", Seq("text"))
    assert(kept.columns.toSeq == Seq("id", "text", "payload"))
    assert(kept.orderBy("id").collect().toSeq ==
      Seq(Row(1L, "aa", 10), Row(2L, "bb", 20)))
    // ONE digest aggregation, no corpus join-back
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"drop path must not join:\n$plan")
  }
}
