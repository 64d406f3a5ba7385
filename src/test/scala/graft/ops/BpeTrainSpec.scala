package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.dftly.SparkTestBase
import graft.ops.expr.BpeModel

/** BPE training: hand-derived merges on the classic word-table fixture,
  * merges.txt round-trip, pre-token parity, and the corpus path.
  */
class BpeTrainSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  test("hand-derived merges on the classic fixture") {
    // Sennrich-style table. Weighted pair counts round 1:
    //   es 9, st 9, we 8, lo 7, ow 7, ne 6, ew 6, er 2, wi 3, id 3, de 3
    // tie es/st at 9 → smaller (leftId,rightId) wins: 'e''s' < 's''t'.
    // Round 2: est 9 (es-t in newest 6 + widest 3). Round 3: lo/ow tie at
    // 7 → lo. Every step hand-checked against the tie-break contract.
    val freqs = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val lines = BpeTrain.train(freqs, 3)
    assert(lines == Seq("e s", "es t", "l o"))
  }

  test("early stop: no pair occurring twice") {
    assert(BpeTrain.train(Seq("ab" -> 1L), 10) == Seq.empty)
    // "aa" x2: merge (a,a); then the word is one symbol — nothing left
    assert(BpeTrain.train(Seq("aa" -> 2L), 10) == Seq("a a"))
  }

  test("left-to-right non-overlapping application: aaa -> (aa, a)") {
    // one word "aaa" x3: round 1 counts (a,a)=6 → merge. Round 2: words
    // are (aa, a) — pair (aa,a)=3 → merge "aa a". Overlap handling wrong
    // would instead see (a,aa) or double-count.
    val lines = BpeTrain.train(Seq("aaa" -> 3L), 2)
    assert(lines == Seq("a a", "aa a"))
  }

  test("rendered lines round-trip through BpeModel.fromMergesLines") {
    // space bytes render as the remapped alphabet (U+0120) and must load
    // back; count under the trained model is consistent with encode
    val freqs = Seq(" the" -> 10L, " then" -> 4L, " them" -> 3L, "x" -> 1L)
    val lines = BpeTrain.train(freqs, 5)
    assert(lines.nonEmpty)
    val model = BpeModel.fromMergesLines(lines)
    val s = UTF8String.fromString(" the them then")
    assert(model.countTokens(s) == model.encodeTokens(s).length)
    // " the" occurs in every word of the fixture → must have merged into
    // few symbols: the 4-byte pre-token " the" comes out as 1-2 tokens
    assert(model.countTokens(UTF8String.fromString(" the")) <= 2)
  }

  test("incremental trainer is bit-identical to a full recount per round") {
    // reference oracle: the O(rounds x total-symbols) recount algorithm
    // the incremental loop replaced — same tie-break contract
    def referenceTrain(wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[String] = {
      import scala.collection.mutable
      val symBytes = mutable.ArrayBuffer.tabulate[Array[Byte]](256)(b => Array(b.toByte))
      val words = wordFreqs.map { case (w, n) =>
        (mutable.ArrayBuffer.from(w.getBytes("UTF-8").map(_ & 0xFF)), n)
      }
      val lines = Seq.newBuilder[String]
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        val counts = mutable.LongMap.empty[Long]
        words.foreach { case (syms, n) =>
          var i = 0
          while (i < syms.length - 1) {
            val key = (syms(i).toLong << 32) | syms(i + 1).toLong
            counts.update(key, counts.getOrElse(key, 0L) + n)
            i += 1
          }
        }
        var bestKey = -1L
        var bestCount = 1L
        counts.foreach { case (k, c) =>
          if (c > bestCount || (c == bestCount && bestKey >= 0 && k < bestKey)) {
            bestKey = k; bestCount = c
          }
        }
        if (bestKey < 0) done = true
        else {
          val l = (bestKey >>> 32).toInt
          val r = (bestKey & 0xFFFFFFFFL).toInt
          val newId = 256 + rank
          symBytes += (symBytes(l) ++ symBytes(r))
          lines += BpeModel.renderSymbolBytes(symBytes(l)) + " " +
            BpeModel.renderSymbolBytes(symBytes(r))
          words.foreach { case (syms, _) =>
            var i = 0; var w = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                syms(w) = newId; i += 2
              } else { syms(w) = syms(i); i += 1 }
              w += 1
            }
            syms.takeInPlace(w)
          }
          rank += 1
        }
      }
      lines.result()
    }
    // randomized tables with heavy repetition (so counts collide and the
    // tie-break + stale-heap paths are exercised), fixed seed
    val rnd = new scala.util.Random(421)
    val alphabet = "aabbccde fé" // multi-byte char included
    for (trial <- 1 to 5) {
      val words = (1 to 120).map { _ =>
        val len = 1 + rnd.nextInt(8)
        val w = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        w -> (1L + rnd.nextInt(9))
      }
      // collapse duplicate words (the real input is a distinct-word table)
      val tbl = words.groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }.toSeq
      val merges = 1 + rnd.nextInt(60)
      assert(BpeTrain.train(tbl, merges) == referenceTrain(tbl, merges),
        s"divergence at trial $trial (merges=$merges)")
    }
  }

  test("preTokens column matches the java matcher") {
    val texts = Seq("it's  a test", "hello,world 123", "  leading", "trail  ")
    val viaCol = texts.toDF("t")
      .select(BpeTrain.preTokens(col("t")).as("p"))
      .as[Seq[String]].collect().toSeq
    val viaMatcher = texts.map { s =>
      val m = graft.ops.expr.BpeModel.preTokenize(UTF8String.fromString(s))
      (0 until m.numElements()).map(i => m.getUTF8String(i).toString)
    }
    assert(viaCol.map(_.toList) == viaMatcher.map(_.toList))
    // pre-tokens partition the string exactly
    assert(viaCol.zip(texts).forall { case (p, s) => p.mkString == s })
  }

  test("trainFromCorpus: merges compress the corpus it was trained on") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (model, lines) = BpeTrain.trainFromCorpus(docs, "text", numMerges = 50)
    assert(lines.size == 50)
    import org.apache.spark.sql.graft.ColumnBridge
    val counted = docs.select(
      ColumnBridge.column(graft.ops.expr.BpeCountExpr(
        ColumnBridge.expression(col("text")), model)).as("c"),
      length(col("text")).as("bytes"))
    val agg = counted.agg(sum("c"), sum("bytes")).as[(Long, Long)].head()
    // trained merges must strictly compress ASCII prose vs byte tokens
    assert(agg._1 < agg._2, s"token count ${agg._1} not below byte count ${agg._2}")
  }

  test("bpe_pre_tokens registered as a SQL function") {
    graft.ops.expr.NativeSig.register(spark)
    val r = spark.sql("SELECT bpe_pre_tokens('it''s ok') AS p")
      .as[Seq[String]].head()
    assert(r == Seq("it", "'s", " ok"))
  }
}
