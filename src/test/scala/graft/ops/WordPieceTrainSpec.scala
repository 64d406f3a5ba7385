package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase
import graft.ops.expr.WordPieceModel

/** WordPiece vocabulary training: hand-derived merges on the published
  * course fixture, a differential check against an independent
  * sort-based reference, vocab.txt round-trip through the encoder, and
  * the pre-tokenizer boundary contract.
  */
class WordPieceTrainSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  // the published teaching fixture: ("hug",10),("pug",5),("pun",12),
  // ("bun",4),("hugs",5). Hand derivation of round 1:
  //   piece freqs: h=15 ##u=36 ##g=20 p=17 ##n=16 b=4 ##s=5
  //   pair scores: (h,##u) 15/(15·36)=1/36; (##u,##g) 20/(36·20)=1/36;
  //     (p,##u) 17/(17·36)=1/36; (##u,##n) 16/(36·16)=1/36;
  //     (b,##u) 4/(4·36)=1/36; (##g,##s) 5/(20·5)=1/20 ← max
  //   → merge (##g,##s) = '##gs'.
  // Round 2 (hugs is now h ##u ##gs): every remaining pair scores 1/36 —
  // the tie-break picks the lexicographically smallest (left, right):
  // lefts {##u, b, h, p} → '##u'; its rights {##g, ##gs, ##n} → '##g'
  //   → merge (##u,##g) = '##ug'.
  private val fixture = Seq[(String, Long)](
    ("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))

  test("hand-derived merges on the course fixture; vocab order contract") {
    val specials = Seq("[UNK]")
    // alphabet sorted: ##g ##n ##s ##u b h p  (7) + 1 special = 8
    val lines = WordPieceTrain.train(fixture, vocabSize = 10, specials)
    assert(lines == Seq("[UNK]", "##g", "##n", "##s", "##u", "b", "h", "p",
      "##gs", "##ug"), lines.toString)
  }

  test("differential: sort-based reference selection agrees on random tables") {
    def referenceTrain(wf: Seq[(String, Long)], vocabSize: Int): Seq[String] = {
      import scala.collection.mutable
      val words = wf.filter(w => w._1.nonEmpty && w._2 > 0).map { case (w, n) =>
        (mutable.ArrayBuffer.from(w.zipWithIndex.map { case (c, i) =>
          if (i == 0) c.toString else "##" + c
        }), n)
      }
      val alphabet = words.flatMap(_._1).distinct.sorted
      val vocab = mutable.LinkedHashSet.empty[String]
      vocab += "[UNK]"
      alphabet.foreach(vocab += _)
      val merges = Seq.newBuilder[String]
      var continue = true
      while (continue && vocab.size < vocabSize) {
        val pf = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
        val prf = mutable.HashMap.empty[(String, String), Long].withDefaultValue(0L)
        words.foreach { case (ps, n) =>
          ps.foreach(p => pf(p) += n)
          ps.indices.dropRight(1).foreach(i => prf((ps(i), ps(i + 1))) += n)
        }
        // independent selection machinery: sort ALL candidates, take the head
        val ranked = prf.toSeq.sortBy { case ((a, b), c) =>
          (-(c.toDouble / (pf(a).toDouble * pf(b).toDouble)), a, b)
        }
        if (ranked.isEmpty) continue = false
        else {
          val (a, b) = ranked.head._1
          val merged = a + b.stripPrefix("##")
          words.foreach { case (ps, _) =>
            var i = 0
            while (i + 1 < ps.length) {
              if (ps(i) == a && ps(i + 1) == b) { ps(i) = merged; ps.remove(i + 1) }
              i += 1
            }
          }
          if (vocab.add(merged)) merges += merged
        }
      }
      (Seq("[UNK]") ++ alphabet).take(vocabSize) ++ merges.result()
    }
    val r = new scala.util.Random(29)
    for (trial <- 0 until 8) {
      val nWords = 5 + r.nextInt(30)
      val wf = (0 until nWords).map { _ =>
        val len = 1 + r.nextInt(6)
        (Seq.fill(len)(('a' + r.nextInt(4)).toChar).mkString,
          1L + r.nextInt(20))
      }.distinct
      val vs = 8 + r.nextInt(20)
      val got = WordPieceTrain.train(wf, vs, Seq("[UNK]"))
      val want = referenceTrain(wf, vs)
      assert(got == want, s"trial $trial: got=$got want=$want wf=$wf vs=$vs")
    }
  }

  test("trainFromCorpus: vocab.txt round-trips and encodes its own corpus without [UNK]") {
    val docs = Seq(
      "the hug pug", "pun bun hugs the", "hug hug pun").toDF("text")
    val (model, lines) = WordPieceTrain.trainFromCorpus(
      docs, "text", vocabSize = 40, specialTokens = Seq("[UNK]"))
    // round-trip through a temp vocab.txt file
    val f = java.nio.file.Files.createTempFile("wp_vocab_", ".txt")
    java.nio.file.Files.write(f,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val back = WordPieceModel.fromVocabFile(f.toString)
    assert(back.toVocabLines == model.toVocabLines)
    // every training word encodes without [UNK] (its alphabet is in-vocab)
    val ids = docs.select(explode(
        graft.ops.TextStats.tokenizeWordPiece(col("text"), back)).as("id"))
      .as[Int].collect()
    assert(ids.nonEmpty && !ids.contains(back.unkId))
  }

  test("pre-tokenizer boundaries differ from BPE where they must") {
    assert(WordPieceModel.preTokenize("it's fine.", lowercase = false).toSeq ==
      Seq("it", "'", "s", "fine", "."))
    assert(WordPieceModel.preTokenize("A B", lowercase = true).toSeq ==
      Seq("a", "b"))
    assert(WordPieceModel.preTokenize("", lowercase = false).isEmpty)
    // column API matches the java matcher
    val df = Seq("hello, world!  it's").toDF("t")
    val got = df.select(WordPieceTrain.preTokens(col("t")).as("w"))
      .as[Seq[String]].head()
    assert(got == Seq("hello", ",", "world", "!", "it", "'", "s"))
  }

  test("pipeline e2e: trainTokenizer writes vocab.txt, tokenize consumes it") {
    val dir = java.nio.file.Files.createTempDirectory("wp_train_").toString
    val out = s"$dir/vocab.txt"
    val docs = Seq(1L -> "hug pug pun", 2L -> "bun hugs hug").toDF("id", "text")
    val res = graft.pipeline.Pipeline.run(spark,
      s"""source: docs
         |steps:
         |  - trainTokenizer: {kind: wordpiece, text: text, vocabSize: 30, out: "$out"}
         |  - tokenize: {text: text, vocabTxt: "$out", as: toks}
         |""".stripMargin,
      name => docs)
    assert(new java.io.File(out).isFile)
    val toks = res.select(col("id"), col("toks")).as[(Long, Seq[Int])]
      .collect().toMap
    assert(toks(1L).nonEmpty && toks(2L).nonEmpty)
    // and the bpe flavor writes a merges.txt the tokenize verb loads
    val mOut = s"$dir/merges.txt"
    val res2 = graft.pipeline.Pipeline.run(spark,
      s"""source: docs
         |steps:
         |  - trainTokenizer: {kind: bpe, text: text, numMerges: 5, out: "$mOut"}
         |  - tokenize: {text: text, merges: "$mOut", as: toks}
         |""".stripMargin,
      name => docs)
    assert(new java.io.File(mOut).isFile)
    assert(res2.select(size(col("toks"))).as[Int].collect().forall(_ > 0))
    // unigram flavor round-trips through the .vocab loader
    val uOut = s"$dir/uni.vocab"
    graft.pipeline.Pipeline.run(spark,
      s"""source: docs
         |steps:
         |  - trainTokenizer: {kind: unigram, text: text, vocabSize: 280, out: "$uOut"}
         |  - tokenize: {text: text, vocab: "$uOut", as: toks}
         |""".stripMargin,
      name => docs).collect()
    assert(new java.io.File(uOut).isFile)
  }
}
