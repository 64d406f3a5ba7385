package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Round-3 operators: chunking, BM25, column profiling. */
class Round3Spec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------------
  // chunkDocuments
  // ------------------------------------------------------------------

  test("chunking: overlapping windows, short tail, blank docs dropped") {
    val df = Seq(
      (1L, "a b c d e f g"),   // 7 tokens
      (2L, "a b c d e f g h"), // 8 tokens
      (3L, "x"),               // 1 token -> single short chunk
      (4L, "   ")              // blank -> no chunks
    ).toDF("id", "text")
    val got = Corpus.chunkDocuments(df, "id", "text", chunkTokens = 3, overlapTokens = 1)
      .orderBy("id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "a b c", 3L), (1L, 1L, "c d e", 3L), (1L, 2L, "e f g", 3L),
      (2L, 0L, "a b c", 3L), (2L, 1L, "c d e", 3L), (2L, 2L, "e f g", 3L), (2L, 3L, "g h", 2L),
      (3L, 0L, "x", 1L)))
  }

  test("chunking: no overlap, exact multiple") {
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    val got = Corpus.chunkDocuments(df, "id", "text", chunkTokens = 2)
      .orderBy("chunk_idx").as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, "a b", 2L), (1L, 1L, "c d", 2L)))
  }

  test("chunking: doc shorter than the window is one whole chunk") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    val got = Corpus.chunkDocuments(df, "id", "text", chunkTokens = 10, overlapTokens = 3)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, "a b", 2L)))
  }

  test("chunking rejects overlap >= chunk size") {
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Corpus.chunkDocuments(df, "id", "text", chunkTokens = 3, overlapTokens = 3)
    }
  }

  // ------------------------------------------------------------------
  // BM25
  // ------------------------------------------------------------------

  test("bm25 matches the hand-computed Okapi formula") {
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian")
    ).toDF("id", "text")
    val got = Retrieval.bm25(df, "id", "text", Seq("apple", "banana"))
      .as[(Long, Double)].collect().toMap

    val (k1, b) = (1.2, 0.75)
    val n = 3.0
    val avgdl = (3 + 2 + 1) / 3.0
    def idf(dfreq: Double) = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
    def term(tf: Double, dl: Double, dfreq: Double) =
      idf(dfreq) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    val exp1 = term(2, 3, 1) + term(1, 3, 2) // doc1: apple×2, banana×1
    val exp2 = term(1, 2, 2)                 // doc2: banana×1
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - exp1) < 1e-12, s"${got(1L)} vs $exp1")
    assert(math.abs(got(2L) - exp2) < 1e-12, s"${got(2L)} vs $exp2")
  }

  test("bm25TopK orders by score desc and caps at k") {
    val df = Seq(
      (1L, "apple apple apple"),
      (2L, "apple pear"),
      (3L, "apple"),
      (4L, "plum")
    ).toDF("id", "text")
    val got = Retrieval.bm25TopK(df, "id", "text", Seq("apple"), k = 2)
      .as[(Long, Double)].collect().toSeq
    assert(got.size == 2)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("bm25 requires a non-empty query") {
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Retrieval.bm25(df, "id", "text", Seq.empty)
    }
  }

  // ------------------------------------------------------------------
  // profile
  // ------------------------------------------------------------------

  test("profile: zero-row input yields n=0, nulls=0 (not NULL)") {
    val df = Seq((1.0, 2.0)).toDF("x", "odd name").filter(lit(false))
    val r = Corpus.profile(df, Seq("x", "odd name")).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getLong(1) == 0 && row.getLong(2) == 0)
      assert(row.isNullAt(3)) // mean of nothing is NULL
    }
  }

  test("profile: exact quartiles, null accounting, one row per column") {
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.0, 10L), (2.0, 20L), (3.0, null), (4.0, 40L)
    ).toDF("x", "y")
    val got = Corpus.profile(df, Seq("x", "y"), approx = false)
      .collect().map(r => r.getString(0) -> r).toMap
    val x = got("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 0)
    assert(x.getDouble(3) == 2.5) // mean
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 4.0)
    assert(x.getDouble(6) == 1.75 && x.getDouble(7) == 2.5 && x.getDouble(8) == 3.25)
    val y = got("y")
    assert(y.getLong(1) == 3 && y.getLong(2) == 1)
    assert(y.getDouble(7) == 20.0) // median of 10,20,40
  }

  test("profile: approx path — same schema, sketch-bounded quartiles near exact") {
    val df = spark.range(10001).select(col("id").cast("double").as("x"), col("id").as("y"))
    val exact = Corpus.profile(df, Seq("x", "y"), approx = false)
    val approx = Corpus.profile(df, Seq("x", "y"), approx = true)
    assert(approx.schema == exact.schema,
      "approx and exact profiles must be drop-in interchangeable")
    val a = approx.collect().map(r => r.getString(0) -> r).toMap
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("x", "y"); i <- 6 to 8) {
      // relative rank error ≤ 1/accuracy = 1e-4 → ±1 rank on 10001 rows
      assert(math.abs(a(c).getDouble(i) - e(c).getDouble(i)) <= 2.0,
        s"$c quantile $i: approx ${a(c).getDouble(i)} vs exact ${e(c).getDouble(i)}")
      // non-quantile stats identical on both paths
      assert(a(c).getLong(1) == e(c).getLong(1))
      assert(a(c).getDouble(3) == e(c).getDouble(3))
    }
  }

  test("profile: DEFAULT path is the sketch (approx_percentile), never the exact distinct-value map") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    val plan = Corpus.profile(df, Seq("x")).queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile"),
      s"default profile must aggregate with approx_percentile (bounded state at 100 TB); plan was:\n$plan")
    assert(!plan.replace("approx_percentile", "").contains("percentile("),
      "default profile must NOT carry the exact percentile's distinct-value-map state")
  }
}
