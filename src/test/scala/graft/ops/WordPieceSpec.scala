package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase
import graft.ops.expr.WordPieceModel

/** WordPiece (BERT-family) tokenization: the greedy longest-match-first
  * derivations behind every q91 oracle row, the published [UNK] and
  * maxInputChars rules, punctuation isolation, the lowercase fold, and
  * vocab.txt round-trip.
  *
  * Fixture vocab (ids = positions): [UNK]=0, hello=1, world=2, hell=3,
  * ##o=4, ##lo=5, ##l=6, un=7, ##aff=8, ##able=9, ##affable=10, '=11,
  * s=12, it=13, a=14, ##b=15, ##a=16.
  */
class WordPieceSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def model = graft.SparkEntry.WordPieceFixtureModel

  private def ids(text: String, m: WordPieceModel = model): Seq[Int] = {
    Seq(text).toDF("t")
      .select(TextStats.tokenizeWordPiece(col("t"), m).as("ids"))
      .as[Seq[Int]].head()
  }

  test("greedy longest match from the word start") {
    // "hello" matches whole (id 1) even though "hell" (3) is also a prefix
    assert(ids("hello") == Seq(1))
    // "hellol": longest prefix "hello", remainder "l" -> ##l (6)
    assert(ids("hellol") == Seq(1, 6))
    // "hellolo": continuation tries "##lo" (5) BEFORE "##l" — longest wins
    assert(ids("hellolo") == Seq(1, 5))
    // "unaffable": un (7) + ##affable (10), not ##aff + ##able
    assert(ids("unaffable") == Seq(7, 10))
  }

  test("whole word maps to [UNK] on any unmatchable remainder") {
    // "helloz": "hello" matches but "z" has no ##z — ALL-or-nothing
    assert(ids("helloz") == Seq(0))
    assert(ids("zzz") == Seq(0))
  }

  test("punctuation characters are isolated words") {
    // it's -> it (13), ' (11), s (12)
    assert(ids("it's") == Seq(13, 11, 12))
  }

  test("words over maxInputChars map to [UNK] without matching") {
    val tiny = WordPieceModel.fromTokens(
      Seq("[UNK]", "a", "##a"), maxInputChars = 3)
    assert(ids("aaa", tiny) == Seq(1, 2, 2))
    assert(ids("aaaa", tiny) == Seq(0))
  }

  test("lowercase fold reproduces the uncased family") {
    val uncased = WordPieceModel.fromTokens(
      Seq("[UNK]", "hello"), lowercase = true)
    assert(ids("HeLLo", uncased) == Seq(1))
    assert(ids("HeLLo") == Seq(0)) // cased fixture model: no match
  }

  test("vocab.txt round-trips exactly and missing [UNK] is refused") {
    val lines = model.toVocabLines
    val back = WordPieceModel.fromVocabLines(lines)
    assert(back.toVocabLines == lines)
    assert(ids("unaffable", back) == Seq(7, 10))
    intercept[IllegalArgumentException] {
      WordPieceModel.fromTokens(Seq("hello", "world"))
    }
    intercept[IllegalArgumentException] {
      WordPieceModel.fromTokens(Seq("[UNK]", "dup", "dup"))
    }
  }

  test("empty string and whitespace-only encode to nothing") {
    assert(ids("") == Seq.empty)
    assert(ids("   ") == Seq.empty)
    assert(ids(" hello  world ") == Seq(1, 2))
  }

  test("count equals encode length") {
    val df = Seq("hello world", "it's", "zq").toDF("t")
    val both = df.select(
      TextStats.tokenCountWordPiece(col("t"), model).as("n"),
      size(TextStats.tokenizeWordPiece(col("t"), model)).as("sz"))
    assert(both.filter(col("n") =!= col("sz")).count() == 0)
  }
}
