package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.dftly.SparkTestBase
import graft.ops.expr.BpeModel

class BpeSpec extends SparkTestBase {

  import spark.implicits._

  // A tiny but complete merge table: builds "hello" and " world" from
  // bytes through intermediate symbols, exercising multi-level merges and
  // the space-carrying Ġ (0x20 → U+0120) alphabet mapping.
  private val merges = Seq(
    "#version: 0.2 — fixture",
    "h e",
    "l l",
    "he ll",
    "hell o",
    "Ġ w",
    "o r",
    "Ġw or",
    "l d",
    "Ġwor ld")
  private lazy val model = BpeModel.fromMergesLines(merges)

  private def count(m: BpeModel, s: String): Int =
    m.countTokens(UTF8String.fromString(s))

  test("full merge chains collapse words to single tokens") {
    assert(count(model, "hello world") == 2) // [hello][ world]
    assert(count(model, "hello") == 1)
    // partial chains stop where the table stops
    assert(count(model, "hell or ld") == 1 + 2 + 2) // [hell][Ġ,or][Ġ,ld]
    // case matters at the byte level: H ≠ h, only "ll" merges
    assert(count(model, "Hello") == 4) // [H,e,ll,o]
    // repeated words merge within each pre-token, never across pre-tokens
    assert(count(model, "hellohello world world") == 4)
  }

  test("pre-tokenization: contractions, unicode, runs of spaces") {
    assert(count(model, "it's") == 4) // [i,t] + [',s]
    assert(count(model, "é") == 2) // two UTF-8 bytes, no merges
    // "a  b": pre-tokens "a", " ", " b" — \s+(?!\S) leaves the last
    // space attached to the following letter-run
    assert(count(model, "a  b") == 4)
    assert(count(model, "") == 0)
  }

  test("empty model counts UTF-8 bytes exactly (pre-tokenizer partitions the string)") {
    val texts = Seq("hello world", "it's  tested!", "üñíçødé ✓\n\ttab",
      "数字123 and punct?!", " leading and trailing ")
    for (t <- texts)
      assert(count(BpeModel.empty, t) ==
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length, s"text: '$t'")
  }

  test("malformed merge tables are rejected with the line number") {
    // out-of-order: 'he ll' before 'll' exists
    val e1 = intercept[IllegalArgumentException] {
      BpeModel.fromMergesLines(Seq("h e", "he ll"))
    }
    assert(e1.getMessage.contains("line 2"))
    val e2 = intercept[IllegalArgumentException] {
      BpeModel.fromMergesLines(Seq("three part line"))
    }
    assert(e2.getMessage.contains("line 1"))
  }

  test("merges file round-trips through disk") {
    val f = java.nio.file.Files.createTempFile("graft_merges", ".txt")
    java.nio.file.Files.write(f, merges.mkString("\n").getBytes("UTF-8"))
    val m2 = BpeModel.fromMergesFile(f.toString)
    assert(m2.numMerges == model.numMerges)
    assert(count(m2, "hello world") == 2)
  }

  test("column expression: codegen'd, null-safe, matches direct eval on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counted = docs
      .select($"doc_id", $"text",
        TextStats.tokenCountBpeExact($"text", model).as("n"))
      .as[(Long, String, Int)].collect()
    assert(counted.nonEmpty)
    for ((_, text, n) <- counted)
      assert(n == count(model, text))
    // null in → null out
    val r = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(TextStats.tokenCountBpeExact($"text", model)).head()
    assert(r.isNullAt(0))
  }

  test("exact counter meters packSequences") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = Packing.packSequences(docs, "doc_id",
      TextStats.tokenCountBpeExact(col("text"), BpeModel.empty),
      seqTokens = 256, orderCols = Seq(col("doc_id").asc))
    // fragments per sequence sum to exactly 256 slots except the tail
    val bySeq = packed.groupBy("seq_id").agg(sum("n_tokens").as("filled"))
      .orderBy("seq_id").as[(Long, Long)].collect()
    assert(bySeq.init.forall(_._2 == 256L))
    assert(bySeq.last._2 <= 256L)
    // total slots = total byte count of non-empty docs (empty model ⇒ bytes)
    val totalBytes = docs.filter(length($"text") > 0)
      .agg(sum(octet_length($"text"))).head().getLong(0)
    assert(bySeq.map(_._2).sum == totalBytes)
  }

  private def encode(m: BpeModel, s: String): Seq[Int] =
    m.encodeTokens(UTF8String.fromString(s)).toSeq

  test("encode: standard vocab numbering — bytes in alphabet order, merges at 256+r") {
    // byte symbols: '!' opens the printable block, 'A' is 32 positions in,
    // space is the 33rd non-printable after the 188 printables
    assert(encode(BpeModel.empty, "!") == Seq(0))
    assert(encode(BpeModel.empty, "A") == Seq(32))
    assert(encode(BpeModel.empty, " ") == Seq(220))
    // the q54d derivations, end to end (each also pinned in the oracle)
    assert(encode(model, "hello world") == Seq(259, 264))
    assert(encode(model, "hell or ld") == Seq(258, 220, 261, 220, 263))
    assert(encode(model, "Hello") == Seq(39, 68, 257, 78))
    assert(encode(model, "it's") == Seq(72, 83, 6, 82))
    assert(encode(model, "é") == Seq(127, 102))
    assert(encode(model, "a  b") == Seq(64, 220, 220, 65))
    assert(encode(model, "hellohello world world") == Seq(259, 259, 264, 264))
    assert(encode(model, "") == Seq.empty)
  }

  test("vocab.json interop: withVocab re-keys emission; missing tokens fail at build") {
    val model = BpeModel.fromMergesLines(Seq("h e", "l l", "he ll", "hell o"))
    // identity: the standard vocab reproduces standard numbering
    val std = model.withVocab(model.standardVocab)
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("hello h")
    assert(std.encodeTokens(s).toSeq == model.encodeTokens(s).toSeq)
    // a released-style vocab: offset ids + a special token; JSON round-trip
    // through the parser (keys include the quote byte's token '"')
    val shifted = model.standardVocab.map { case (k, v) => k -> (v + 500) } +
      ("<|endoftext|>" -> 0)
    val json = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString {
        val m = new java.util.HashMap[String, Integer]()
        shifted.foreach { case (k, v) => m.put(k, v) }
        m
      }
    val reloaded = model.withVocab(BpeModel.vocabFromJson(json))
    assert(reloaded.encodeTokens(s).toSeq ==
      model.encodeTokens(s).toSeq.map(_ + 500))
    // counting is numbering-independent
    assert(reloaded.countTokens(s) == model.countTokens(s))
    // a vocab missing a merge output fails loudly at model build
    val missing = model.standardVocab - "hello"
    val e = intercept[IllegalArgumentException](model.withVocab(missing))
    assert(e.getMessage.contains("hello"))
    // a vocab missing byte symbols fails loudly too
    val e2 = intercept[IllegalArgumentException](
      model.withVocab(Map("a" -> 1)))
    assert(e2.getMessage.contains("byte symbol"))
    // malformed vocab json
    val e3 = intercept[IllegalArgumentException](
      BpeModel.vocabFromJson("""["not", "an", "object"]"""))
    assert(e3.getMessage.contains("JSON object"))
  }

  test("encode: size(ids) == count on real documents; codegen'd and null-safe") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val checked = docs.select(
      TextStats.tokenizeBpe($"text", model).as("ids"),
      TextStats.tokenCountBpeExact($"text", model).as("n"))
    assert(checked.filter(size($"ids") =!= $"n").count() == 0)
    // null in → null out
    val row = Seq((1, null: String)).toDF("i", "text")
      .select(TextStats.tokenizeBpe($"text", model).as("ids")).head()
    assert(row.isNullAt(0))
    // the expression stays inside whole-stage codegen (rendered "*(n)")
    val plan = checked.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [bpe_encode"), plan)
  }
}
