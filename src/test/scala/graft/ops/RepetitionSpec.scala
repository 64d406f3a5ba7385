package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Extended Gopher repetition/format signals: hand-computed fixtures for
  * every fraction, kernel-vs-HOF parity for duplicate-n-gram coverage, and
  * the composite keep rule.
  */
class RepetitionSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("dupGroupStats: line duplicates count ALL copies, chars weighted") {
    // lines: a(1), bb(3), ccc(1) -> 5 lines, 10 chars; dup members 3 (the
    // bbs), dup chars 6
    val df = one("a\nbb\nbb\nccc\nbb")
      .select(Corpus.dupGroupStats(Corpus.segments(col("text"), "\n")).as("s"))
      .select(col("s.cnt"), col("s.chars"), col("s.dupCnt"), col("s.dupChars"))
    assert(df.as[(Long, Long, Long, Long)].head() == ((5L, 10L, 3L, 6L)))
  }

  test("dup fractions: empty text and no-dup text are 0.0") {
    val df = Seq("", "x\ny\nz").toDF("text").select(
      Corpus.dupSegmentFraction(Corpus.dupGroupStats(Corpus.segments(col("text"), "\n"))).as("f"),
      Corpus.dupSegmentCharFraction(Corpus.dupGroupStats(Corpus.segments(col("text"), "\n"))).as("cf"))
    assert(df.as[(Double, Double)].collect().toSeq == Seq((0.0, 0.0), (0.0, 0.0)))
  }

  test("blank-line runs are not duplicates (empty segments dropped)") {
    val df = one("para one\n\n\n\npara two")
      .select(Corpus.dupSegmentFraction(
        Corpus.dupGroupStats(Corpus.segments(col("text"), "\n"))).as("f"))
    assert(df.as[Double].head() == 0.0)
  }

  test("paragraph split on blank-line runs") {
    val text = "p1 line1\np1 line2\n\np2\n\n\np2"
    val df = one(text).select(
      Corpus.dupSegmentFraction(
        Corpus.dupGroupStats(Corpus.segments(col("text"), "\n{2,}"))).as("f"))
    // paragraphs: ["p1 line1\np1 line2", "p2", "p2"] -> 2/3 duplicated
    assert(math.abs(df.as[Double].head() - 2.0 / 3.0) < 1e-12)
  }

  test("bullet / ellipsis / alpha-word fractions") {
    val text = "- item one\n* item two\nplain line...\nword 123 ok…"
    val df = one(text).select(
      Corpus.bulletLineFraction(col("text")).as("b"),
      Corpus.ellipsisLineFraction(col("text")).as("e"),
      Corpus.alphaWordFraction(col("text")).as("a"))
    val (b, e, a) = df.as[(Double, Double, Double)].head()
    assert(b == 2.0 / 4.0)
    assert(e == 2.0 / 4.0)
    // tokens: -, item, one, *, item, two, plain, line..., word, 123, ok… -> 8 of 11 have letters
    assert(math.abs(a - 8.0 / 11.0) < 1e-12)
  }

  test("dupNgramCoverage: hand-computed coverage") {
    // tokens: a b c a b c d (k=7); 2-grams: ab bc ca ab bc cd — "a b","b c" each
    // twice -> positions {0,1,2} + {3,4,5} covered -> 6/7
    val df = one("a b c a b c d").select(Corpus.dupNgramCoverage(col("text"), 2).as("c"))
    assert(math.abs(df.as[Double].head() - 6.0 / 7.0) < 1e-12)
    // no repeats -> 0; fewer than n tokens -> 0
    val z = Seq("a b c", "a").toDF("text")
      .select(Corpus.dupNgramCoverage(col("text"), 2).as("c"))
    assert(z.as[Double].collect().toSeq == Seq(0.0, 0.0))
  }

  test("dupNgramCoverage kernel == HOF reference on the corpus") {
    // the interpreted HOF reference is O(G²) per row — keep the sample
    // small enough that suite time stays sane
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val cmp = docs.select(
      Corpus.dupNgramCoverage(col("text"), 3).as("k"),
      Corpus.dupNgramTokenCoverageHof(col("text"), 3).as("h"))
    assert(cmp.filter(col("k") =!= col("h")).count() == 0)
  }

  test("withRepetitionSignals: one-scan projection, keep_full sane") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sig = Corpus.withRepetitionSignals(docs, "text")
    val n = sig.count()
    val kept = sig.filter(col("keep_full")).count()
    assert(n > 0 && kept > 0 && kept <= n)
    // a machine-repeated doc must fail the coverage rule
    val spam = one(Array.fill(30)("buy now cheap deals").mkString(" "))
    val s = Corpus.withRepetitionSignals(spam, "text")
    assert(s.filter(col("keep_full")).count() == 0)
    assert(s.select(col("dup_ngram_cov")).as[Double].head() == 1.0)
  }

  test("lang-keyed stopword gate: de counts German hits, zh disables the floor") {
    // a clean German paragraph: every non-stopword signal passes, so the
    // keep decision turns ONLY on the stopword gate
    val dePara = "Der Hund lief schnell durch das weite grüne Feld und " +
      "war dabei ganz mit sich im Reinen denn die warme Sonne stand hoch " +
      "oben und der lange Tag war mild und die schwere Arbeit auf dem " +
      "alten Hof war endlich getan worden"
    val doc = one(dePara)
    val de = Corpus.withRepetitionSignals(doc, "text", lang = "de")
    val en = Corpus.withRepetitionSignals(doc, "text")
    val zh = Corpus.withRepetitionSignals(doc, "text", lang = "zh")
    // DISTINCT hits (array_intersect): der das und mit sich im die auf dem
    assert(de.select(col("stopword_hits")).as[Int].head() == 9)
    assert(de.filter(col("keep_full")).count() == 1, "German ladder keeps it")
    assert(en.select(col("stopword_hits")).as[Int].head() == 0)
    assert(en.filter(col("keep_full")).count() == 0,
      "the English list fails a good German doc — the gap the lang key closes")
    // stoplist-less lang: hits are 0 but the ≥2 floor is DISABLED, so
    // the other nine gates decide (all pass here)
    assert(zh.select(col("stopword_hits")).as[Int].head() == 0)
    assert(zh.filter(col("keep_full")).count() == 1)
    // en behavior preservation: default == explicit lang = en
    val exp = Corpus.withRepetitionSignals(doc, "text", lang = "en")
      .select(col("stopword_hits"), col("keep_full")).head()
    val dft = en.select(col("stopword_hits"), col("keep_full")).head()
    assert(exp == dft)
  }

  test("repetition signals apply to a stream unchanged (pure per-row layer)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    val sig = Corpus.withRepetitionSignals(
      input.toDF().toDF("doc_id", "text"), "text", ngramN = 2)
      .select(col("doc_id"), col("dup_ngram_cov"), col("keep_full"))
    val q = sig.writeStream.format("memory").queryName("stream_rep")
      .outputMode("append").start()
    try {
      input.addData((1L, "a b a b"), (2L, "all distinct words here now ok"))
      q.processAllAvailable()
      val got = spark.table("stream_rep")
        .as[(Long, Double, Boolean)].collect().sortBy(_._1)
      assert(got(0)._2 == 1.0) // fully repeated doc: full 2-gram coverage
      assert(got(1)._2 == 0.0)
    } finally q.stop()
  }

  test("dup_ngram_coverage registered as a SQL function") {
    graft.ops.expr.NativeSig.register(spark)
    val r = spark.sql("SELECT dup_ngram_coverage('a b a b', 2) AS c")
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
