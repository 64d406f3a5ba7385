package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

class DecontamSpec extends SparkTestBase {

  import spark.implicits._

  // word-bigram (n=2) corpus with hand-checked overlaps
  private def train = Seq(
    (1L, "the cat sat on the mat"), // shares "sat on" with eval 101
    (2L, "dogs bark loudly"),
    (3L, "quantum flux capacitor"),
    (4L, "hello"),                  // ≤ n tokens: whole text is the one gram
    (5L, ""),                       // no grams at all
    (6L, "hello world")             // contains eval 102's text but as a
                                    // different (longer) gram — NOT a match
  ).toDF("id", "text")

  private def evalSet = Seq(
    (101L, "sat on a bench"),
    (102L, "hello"),
    (103L, "xyz")
  ).toDF("eid", "etext")

  test("markContaminated: n-gram overlaps flagged, including the short-doc whole-text gram") {
    val got = Decontam.markContaminated(train, "id", "text", evalSet, "etext", n = 2)
      .select("id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> false, 6L -> false))
  }

  test("markContaminated: a longer doc does NOT match a short eval text it merely contains") {
    // id=6 "hello world" vs eval "hello": documented shingle semantics —
    // the ≤n-token eval contributes its whole token sequence as one gram,
    // which only an identical short doc can share.
    val got = Decontam.markContaminated(train, "id", "text", evalSet, "etext", n = 2)
      .filter(col("id") === 6L).select("contaminated").as[Boolean].head()
    assert(!got)
  }

  test("removeContaminated: drops exactly the marked ids") {
    val kept = Decontam.removeContaminated(train, "id", "text", evalSet, "etext", n = 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 5L, 6L))
  }

  test("contaminationMatches: the per-(train, eval) audit pairs") {
    val got = Decontam.contaminationMatches(
      train, "id", "text", evalSet, "eid", "etext", n = 2)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 101L), (4L, 102L)))
  }

  test("broadcastEval=false gives identical results") {
    val a = Decontam.markContaminated(train, "id", "text", evalSet, "etext",
      n = 2, broadcastEval = false)
      .select("id", "contaminated").as[(Long, Boolean)].collect().toSet
    val b = Decontam.markContaminated(train, "id", "text", evalSet, "etext", n = 2)
      .select("id", "contaminated").as[(Long, Boolean)].collect().toSet
    assert(a == b)
  }

  test("markContaminated refuses an existing 'contaminated' column") {
    intercept[IllegalArgumentException] {
      Decontam.markContaminated(train.withColumn("contaminated", lit(false)),
        "id", "text", evalSet, "etext")
    }
  }

  test("markContaminatedMapSide agrees with the distinct-based shape, incl. NULL text") {
    val withNull = train.unionByName(
      Seq((99L, null: String)).toDF("id", "text"))
    val a = Decontam.markContaminated(withNull, "id", "text", evalSet, "etext", n = 2)
      .select("id", "contaminated").as[(Long, Boolean)].collect().toSet
    val b = Decontam.markContaminatedMapSide(withNull, "text", evalSet, "etext", n = 2)
      .select("id", "contaminated").as[(Long, Boolean)].collect().toSet
    assert(a == b)
    assert(a.contains((99L, false)), "NULL text is false, never NULL")
  }

  test("default n=8: only long-enough exact spans match") {
    val t8 = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "totally unrelated words here without any overlap at all")
    ).toDF("id", "text")
    val e8 = Seq((9L, "two three four five six seven eight nine"))
      .toDF("eid", "etext") // exactly 8 tokens — one gram, present in id=1
    val got = Decontam.markContaminated(t8, "id", "text", e8, "etext")
      .select("id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false))
  }

  test("contaminationFraction: per-eval-doc graded overlap, hand-derived") {
    // bigrams (n=2): eval doc 1 "a b c" → grams {a b, b c};
    // eval doc 2 "x y" → {x y}; eval doc 3 "solo" → too short ≤ n ⇒ one
    // 1-token gram "solo"; eval doc 4 "" → zero grams
    val evalDf = Seq(
      (1L, "a b c"), (2L, "x y"), (3L, "solo"), (4L, "")).toDF("eid", "etext")
    // train contains "a b" (in doc A) and "x y" (doc B), not "b c"/"solo"
    val train = Seq((10L, "a b z"), (11L, "q x y")).toDF("id", "text")
    val got = Decontam.contaminationFraction(
        evalDf, "eid", "etext", train, "text", n = 2)
      .select($"eval_id", $"n_grams", $"n_seen", $"contamination")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, 0.5)))  // "a b" seen, "b c" not
    assert(got(2L) == ((2L, 1L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 0L, 0.0)))
    assert(got(4L) == ((4L, 0L, 0L, 0.0)))  // blank doc: zero grams, 0.0
  }

  test("markContaminatedMapSide: oversized eval gram set fails fast, pointing at markContaminated") {
    val train = Seq((1L, "a b c")).toDF("id", "text")
    val evalSet = Seq((1L, "p q r s"), (2L, "s t u v")).toDF("eid", "etext")
    val e = intercept[IllegalArgumentException] {
      Decontam.markContaminatedMapSide(train, "text", evalSet, "etext",
        n = 2, maxEvalGrams = 3) // 6 distinct bigrams > 3
    }
    assert(e.getMessage.contains("markContaminated"))
    // cap disabled → same answer as the distinct-join shape
    val got = Decontam.markContaminatedMapSide(train, "text", evalSet, "etext",
      n = 2, maxEvalGrams = 0)
    assert(got.select("contaminated").as[Boolean].collect().toSeq == Seq(false))
  }
}
