package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Cross-corpus segment dedup: keep-first / unique-only semantics pinned
  * on a hand-built corpus, empty-segment participation, paragraph
  * separators, full-boilerplate husks, and the pipeline verb.
  */
class SegmentDedupSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def corpus = Seq(
    (1L, "nav bar\nalpha body\nfooter"),
    (2L, "nav bar\nbeta body\nfooter"),
    (3L, "nav bar\nfooter")
  ).toDF("id", "text")

  test("keep_first keeps every segment exactly once, at its minimal (id, pos)") {
    val out = Dedup.dedupSegmentsAcrossCorpus(corpus, "id", "text")
      .select("id", "text_dedup", "n_segments_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "nav bar\nalpha body\nfooter", 0L)))
    assert(out(1) == ((2L, "beta body", 2L)))
    assert(out(2) == ((3L, "", 2L)))
  }

  test("unique_only drops repeated segments everywhere") {
    val out = Dedup.dedupSegmentsAcrossCorpus(corpus, "id", "text",
        mode = "unique_only")
      .select("id", "text_dedup", "n_segments_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "alpha body", 2L)))
    assert(out(1) == ((2L, "beta body", 2L)))
    assert(out(2) == ((3L, "", 2L)))
  }

  test("empty segments participate: corpus-wide blank-line collapse") {
    val df = Seq((1L, "a\n\nb"), (2L, "c\n\nd")).toDF("id", "text")
    val out = Dedup.dedupSegmentsAcrossCorpus(df, "id", "text")
      .select("id", "text_dedup").as[(Long, String)].collect().sortBy(_._1)
    // doc 1 keeps its blank line (first occurrence); doc 2 loses it
    assert(out(0) == ((1L, "a\n\nb")))
    assert(out(1) == ((2L, "c\nd")))
  }

  test("paragraph separator dedups paragraphs, not lines") {
    val df = Seq(
      (1L, "p one line a\nline b\n\nshared para"),
      (2L, "p two\n\nshared para")
    ).toDF("id", "text")
    val out = Dedup.dedupSegmentsAcrossCorpus(df, "id", "text", sep = "\n\n")
      .select("id", "text_dedup").as[(Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "p one line a\nline b\n\nshared para")))
    assert(out(1) == ((2L, "p two")))
  }

  test("within-document repeats dedup too (first position wins)") {
    val df = Seq((1L, "x\ny\nx")).toDF("id", "text")
    val out = Dedup.dedupSegmentsAcrossCorpus(df, "id", "text")
      .select("text_dedup", "n_segments_removed")
      .as[(String, Long)].head()
    assert(out == (("x\ny", 1L)))
  }

  test("bad mode and empty sep are refused") {
    intercept[IllegalArgumentException] {
      Dedup.dedupSegmentsAcrossCorpus(corpus, "id", "text", mode = "oops")
    }
    intercept[IllegalArgumentException] {
      Dedup.dedupSegmentsAcrossCorpus(corpus, "id", "text", sep = "")
    }
  }

  test("pipeline dedupSegments verb") {
    val out = graft.pipeline.Pipeline.run(spark,
      """source: docs
        |steps:
        |  - dedupSegments: {id: id, text: text}
        |  - filter: "len_chars($text_dedup) > 0"
        |""".stripMargin,
      name => { assert(name == "docs"); corpus })
    assert(out.count() == 2) // doc 3 reduces to "" and is filtered
  }
}
