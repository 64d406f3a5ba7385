package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

class PackingSpec extends SparkTestBase {

  import spark.implicits._

  // ---------------------------------------------------------------- index

  test("withGlobalIndex: contiguous 0..N-1 in sorted order") {
    val df = Seq(30L, 10L, 50L, 20L, 40L).toDF("id")
    val got = Packing.withGlobalIndex(df, Seq(col("id").asc), "pos")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 0L, 20L -> 1L, 30L -> 2L, 40L -> 3L, 50L -> 4L))
  }

  test("withGlobalIndex: descending and multi-column orders") {
    val df = Seq((1L, "b"), (2L, "a"), (3L, "b"), (4L, "a")).toDF("id", "k")
    val got = Packing
      .withGlobalIndex(df, Seq(col("k").asc, col("id").desc), "pos")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    // k=a: ids 4,2 then k=b: ids 3,1
    assert(got == Map(4L -> 0L, 2L -> 1L, 3L -> 2L, 1L -> 3L))
  }

  test("withGlobalIndex: large input spanning many partitions stays a permutation") {
    val n = 10000
    val df = spark.range(n).select((col("id") * 2654435761L % 1000003L).as("k"),
      col("id"))
    val got = Packing.withGlobalIndex(df, Seq(col("k").asc, col("id").asc), "pos")
      .select("pos").as[Long].collect().sorted
    assert(got.toSeq == (0L until n.toLong))
  }

  test("withGlobalIndex: skewed tied keys — each tie-group owns exactly its contiguous index range, every run") {
    // one dominant key (ties) plus sparse others: the per-partition counts
    // must agree between the offsets pass and the data pass even though the
    // range sampling sees a heavily skewed distribution.
    val rows = (0 until 5000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong))
    val df = rows.toDF("k", "id")
    val expectRanges: Map[Long, Set[Long]] = {
      val sortedKeys = rows.map(_._1).sorted
      sortedKeys.zipWithIndex.groupBy(_._1)
        .map { case (k, xs) => k -> xs.map(_._2.toLong).toSet }
    }
    for (_ <- 1 to 2) { // re-run: index ranges per key must be identical
      val got = Packing.withGlobalIndex(df, Seq(col("k").asc), "pos")
        .select("k", "pos").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
      assert(got == expectRanges)
    }
  }

  test("withGlobalIndex: empty frames and frames smaller than the partition count") {
    val empty = spark.range(0).toDF("id")
    assert(Packing.withGlobalIndex(empty, Seq(col("id").asc)).count() == 0)
    // 3 rows over local[4] default parallelism: most partitions are empty
    val tiny = Seq(5L, 1L, 9L).toDF("id")
    val got = Packing.withGlobalIndex(tiny, Seq(col("id").asc), "pos")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 5L -> 1L, 9L -> 2L))
  }

  test("packSequences: empty input and all-zero token counts yield no fragments") {
    val docs = Seq((1L, 0L), (2L, 0L)).toDF("id", "n")
    assert(Packing.packSequences(docs, "id", col("n"), 16, Seq(col("id").asc))
      .count() == 0)
    assert(Packing.packSequences(docs.filter(lit(false)), "id", col("n"), 16,
      Seq(col("id").asc)).count() == 0)
  }

  test("withGlobalIndex: refuses to clobber an existing column") {
    val df = Seq(1L).toDF("pos")
    intercept[IllegalArgumentException] {
      Packing.withGlobalIndex(df, Seq(col("pos").asc))
    }
  }

  test("withGlobalIndex: caller columns named like internals survive") {
    val df = Seq((2L, "x"), (1L, "y")).toDF("id", "__pid")
    val got = Packing.withGlobalIndex(df, Seq(col("id").asc), "pos")
    assert(got.columns.sorted.toSeq == Seq("__pid", "id", "pos"))
    assert(got.select("id", "pos").as[(Long, Long)].collect().toMap ==
      Map(1L -> 0L, 2L -> 1L))
  }

  // -------------------------------------------------------------- shuffle

  test("deterministicShuffle: permutation, reproducible per seed, seed-sensitive") {
    val df = spark.range(500).toDF("id")
    def run(seed: Long): Map[Long, Long] =
      Packing.deterministicShuffle(df, "id", seed)
        .select("id", "pos").as[(Long, Long)].collect().toMap
    val a1 = run(1L); val a2 = run(1L); val b = run(2L)
    assert(a1 == a2, "same seed must give the identical permutation")
    assert(a1.values.toSeq.sorted == (0L until 500L), "positions are a permutation")
    assert(a1 != b, "different seeds give different permutations")
    assert(a1.keySet == b.keySet)
  }

  test("deterministicShuffle: permutation independent of input partition layout") {
    // pos is the rank of the unique key (xxhash64(id, seed), id) in its
    // total order — where the range boundaries land cannot change ranks,
    // so any input partitioning (1 partition, 7, a cluster) agrees. This is
    // the "same permutation at any cluster size" contract.
    val df = spark.range(400).toDF("id")
    def run(parts: Int): Map[Long, Long] =
      Packing.deterministicShuffle(df.repartition(parts), "id", seed = 5L)
        .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(run(1) == run(7))
  }

  test("deterministicShuffle: actually permutes (not identity) and keeps other columns") {
    val df = (0L until 100L).map(i => (i, s"doc$i")).toDF("id", "text")
    val got = Packing.deterministicShuffle(df, "id", seed = 42L)
    assert(got.columns.sorted.toSeq == Seq("id", "pos", "text"))
    val m = got.select("id", "pos").as[(Long, Long)].collect().toMap
    assert(m.count { case (id, pos) => id != pos } > 50,
      "hash order should scatter most rows away from their input order")
    val texts = got.select("id", "text").as[(Long, String)].collect().toMap
    assert((0L until 100L).forall(i => texts(i) == s"doc$i"))
  }

  // -------------------------------------------------------------- packing

  /** Driver-side oracle: lay token counts end-to-end in id order and cut
    * every L tokens — the definition, computed imperatively.
    */
  private def packOracle(
      docs: Seq[(Long, Long)], // (id, nTokens), to be packed in id order
      L: Long
  ): Seq[(Long, Long, Long, Long, Long)] = { // (id, seq, seqOff, docOff, n)
    var cum = 0L
    docs.sortBy(_._1).filter(_._2 > 0).flatMap { case (id, n) =>
      val frags = (cum / L to (cum + n - 1) / L).map { seq =>
        val begin = math.max(cum, seq * L)
        val end = math.min(cum + n, (seq + 1) * L)
        (id, seq, begin - seq * L, begin - cum, end - begin)
      }
      cum += n
      frags
    }
  }

  private def runPack(docs: Seq[(Long, Long)], L: Int) =
    Packing.packSequences(
      docs.toDF("id", "n_toks"), "id", col("n_toks"), L, Seq(col("id").asc))
      .select("id", "seq_id", "seq_offset", "doc_offset", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("packSequences: matches the imperative oracle, incl. docs straddling many cuts") {
    val docs = Seq((1L, 5L), (2L, 0L), (3L, 23L), (4L, 8L), (5L, 1L), (6L, 64L))
    assert(runPack(docs, 8) == packOracle(docs, 8).toSet)
    assert(runPack(docs, 1) == packOracle(docs, 1).toSet)
    assert(runPack(docs, 1000) == packOracle(docs, 1000).toSet)
  }

  test("packSequences: every sequence except the tail is slot-exact, fragments tile each doc") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 300L).map(i => (i, rnd.nextInt(40).toLong))
    val L = 32
    val frags = runPack(docs, L).toSeq
    val totalTokens = docs.map(_._2).sum

    // per-sequence slot exactness
    val bySeq = frags.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    for ((seq, fs) <- bySeq) {
      val filled = fs.map(_._5).sum
      if (seq < lastSeq) assert(filled == L, s"seq $seq holds $filled of $L slots")
      else assert(filled == totalTokens - lastSeq * L)
      // fragments within a sequence tile [0, filled) without gaps/overlap
      assert(fs.map(f => (f._3, f._3 + f._5)).sortBy(_._1)
        .foldLeft(0L) { case (at, (b, e)) => assert(b == at); e } == filled)
    }
    assert(bySeq.keys.toSeq.sorted == (0L to lastSeq), "sequence ids are contiguous")

    // fragments reconstruct each document: doc_offsets tile [0, n)
    val byDoc = frags.groupBy(_._1)
    for ((id, n) <- docs if n > 0) {
      val fs = byDoc(id).sortBy(_._4)
      assert(fs.map(f => (f._4, f._4 + f._5))
        .foldLeft(0L) { case (at, (b, e)) => assert(b == at); e } == n)
    }
    assert(docs.filter(_._2 == 0).forall(d => !byDoc.contains(d._1)),
      "zero-token docs occupy no slots")
  }

  test("packSequencesByText: whitespace tokens, ordered by id") {
    val df = Seq(
      (1L, "a b c"), (2L, ""), (3L, "d e"), (4L, "   "), (5L, "f g h i j"))
      .toDF("doc_id", "text")
    val got = Packing.packSequencesByText(df, "doc_id", "text", seqTokens = 4)
      .select("doc_id", "seq_id", "seq_offset", "doc_offset", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val oracle = packOracle(Seq((1L, 3L), (2L, 0L), (3L, 2L), (4L, 0L), (5L, 5L)), 4L)
    assert(got == oracle.toSet)
  }

  test("packSequences: randomized sweep vs the imperative oracle") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 8) {
      val nDocs = 1 + rnd.nextInt(120)
      val L = 1 + rnd.nextInt(200)
      // ~1 in 6 docs empty; token counts skew small with occasional giants
      val docs = (1L to nDocs.toLong).map { i =>
        val n = rnd.nextInt(6) match {
          case 0 => 0L
          case 5 => rnd.nextInt(1000).toLong
          case _ => rnd.nextInt(30).toLong
        }
        (i, n)
      }
      assert(runPack(docs, L) == packOracle(docs, L).toSet,
        s"trial $trial: nDocs=$nDocs L=$L")
    }
  }

  // --------------------------------------------------------- token budget

  test("takeTokenBudget: longest in-budget prefix, no back-fill, nulls free") {
    val docs = Seq(
      (1L, java.lang.Long.valueOf(6L)),
      (2L, java.lang.Long.valueOf(7L)),  // overflows a 10-budget → cut here
      (3L, java.lang.Long.valueOf(2L)),  // would fit greedily — must NOT back-fill
      (4L, null.asInstanceOf[java.lang.Long])
    ).toDF("id", "n")
    def kept(budget: Long): Set[Long] =
      Packing.takeTokenBudget(docs, col("n"), budget, Seq(col("id").asc))
        .select("id").as[Long].collect().toSet
    assert(kept(10) == Set(1L))
    assert(kept(15) == Set(1L, 2L, 3L, 4L), "null counts occupy zero budget")
    // negative counts clamp to zero: the running total must stay monotone
    // or rows after the cut get re-admitted through a "hole" in the prefix
    val neg = Seq((1L, 6L), (2L, 7L), (3L, -5L), (4L, 2L)).toDF("id", "n")
    assert(Packing.takeTokenBudget(neg, col("n"), 10L, Seq(col("id").asc))
      .select("id").as[Long].collect().toSet == Set(1L),
      "nothing after the first over-budget doc survives, negative or not")
    assert(kept(13) == Set(1L, 2L), "exact fit at the boundary is kept")
    assert(kept(5) == Set.empty, "first doc bigger than the budget → nothing")
    assert(kept(0) == Set.empty)
    // null-at-front occupies nothing and survives any budget ≥ 0
    val nullFirst = Seq(
      (1L, null.asInstanceOf[java.lang.Long]), (2L, java.lang.Long.valueOf(3L)))
      .toDF("id", "n")
    assert(Packing.takeTokenBudget(nullFirst, col("n"), 0L, Seq(col("id").asc))
      .select("id").as[Long].collect().toSet == Set(1L))
  }

  test("takeTokenBudget: priority order decides who fits") {
    val docs = Seq((1L, 50L), (2L, 5L), (3L, 30L), (4L, 10L)).toDF("id", "n")
    // by ascending size: 5 + 10 + 30 ≤ 50, then 50 overflows
    val got = Packing.takeTokenBudget(docs, col("n"), 50L,
      Seq(col("n").asc, col("id").asc)).select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L))
  }

  test("packSequences: rejects nonpositive seqTokens") {
    intercept[IllegalArgumentException] {
      Packing.packSequences(Seq((1L, 1L)).toDF("id", "n"), "id", col("n"), 0,
        Seq(col("id").asc))
    }
  }

  test("packSequences: nested order column fails fast with the materialize hint") {
    val df = Seq((1L, 5L, ("a", 3))).toDF("id", "n", "meta")
    val e = intercept[IllegalArgumentException] {
      Packing.packSequences(df, "id", col("n"), 8, Seq(col("meta._2").asc))
    }
    assert(e.getMessage.contains("top-level"))
    // and the documented fix works
    val fixed = df.withColumn("m2", col("meta._2"))
    val got = Packing.packSequences(fixed, "id", col("n"), 8, Seq(col("m2").asc))
    assert(got.count() == 1)
  }
}
