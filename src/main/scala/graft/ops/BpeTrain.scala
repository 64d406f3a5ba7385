package graft.ops

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.expr.{BpeModel, BpePreTokensExpr}

/** Byte-level BPE tokenizer TRAINING — learn a merge table from the corpus
  * itself instead of loading a published one, completing the tokenizer
  * story: q54's [[graft.ops.expr.BpeCountExpr]]/[[graft.ops.expr.BpeEncodeExpr]]
  * consume exactly what this produces. (The reference has no tokenizer or
  * I/O surface at all — parser.py:326-344; this is beyond-reference,
  * motivated by pipelines that train a fresh vocabulary on the corpus they
  * curate.)
  *
  * Scale shape (the standard two-phase design every production trainer
  * uses): the ONLY corpus-scale pass is [[wordCounts]] — pre-tokenize each
  * document with the same compiled pattern the encoder uses
  * ([[BpePreTokensExpr]], codegen'd) and hash-aggregate (word, count).
  * Partial aggregation combines map-side, so the exchange carries one row
  * per distinct pre-token per partition, not per occurrence; the distinct
  * pre-token table of even a 100 TB corpus is tens of millions of rows.
  * Training then runs driver-side over the `maxWords` most frequent words
  * (bounded collect, like k-means centroids) — the merge loop's input is
  * the word-frequency TABLE, never the corpus. Truncation to `maxWords`
  * is the standard frequency cutoff; counts below it cannot win early
  * merges, and `log`-visibility comes from the returned coverage stats.
  *
  * Determinism: the winning pair each round is the highest weighted count
  * with ties broken by the smallest (leftId, rightId) — a fixed total
  * order, so the same word table always yields the same merges on any
  * engine. Merges apply left-to-right non-overlapping within each word
  * (`aaa` + merge(a,a) → `(aa, a)`), the convention of the published
  * format's reference trainer.
  */
object BpeTrain {

  /** Pre-token array column ([[BpePreTokensExpr]] — the encoder's exact
    * word boundaries).
    */
  def preTokens(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BpePreTokensExpr(ColumnBridge.expression(text)))
  }

  /** Distributed (word, n) frequency table over pre-tokens — the one
    * corpus-scale pass of training.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(preTokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges from a word-frequency table. Returns the
    * merge lines in the published `merges.txt` rendering (rank = position;
    * [[BpeModel.fromMergesLines]] round-trips them). Stops early when no
    * adjacent pair occurs twice.
    */
  def train(wordFreqs: Iterable[(String, Long)], numMerges: Int): Seq[String] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    // internal symbol ids follow the encoder: raw bytes 0–255, merge r → 256+r
    val symBytes = mutable.ArrayBuffer.tabulate[Array[Byte]](256)(b => Array(b.toByte))
    val words = wordFreqs.iterator.map { case (w, n) =>
      val bs = w.getBytes(StandardCharsets.UTF_8)
      val syms = new Array[Int](bs.length)
      var i = 0
      while (i < bs.length) { syms(i) = bs(i) & 0xFF; i += 1 }
      (mutable.ArrayBuffer.from(syms), n)
    }.toArray

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
      // max count, ties to the smallest (leftId, rightId) key — both ids
      // are < 2^31 so the packed long compares consistently
      var bestKey = -1L
      var bestCount = 1L // a pair must occur at least twice to merge
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
          var i = 0
          var w = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              syms(w) = newId; i += 2
            } else {
              syms(w) = syms(i); i += 1
            }
            w += 1
          }
          syms.takeInPlace(w)
        }
        rank += 1
      }
    }
    lines.result()
  }

  /** End-to-end: corpus → word counts → bounded driver-side training →
    * model + merge lines. `maxWords` caps the collected table (most
    * frequent first, ties by word — deterministic).
    */
  def trainFromCorpus(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 65536
  ): (BpeModel, Seq[String]) = {
    val wc = wordCounts(df, textCol)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val lines = train(wc, numMerges)
    (BpeModel.fromMergesLines(lines), lines)
  }
}
