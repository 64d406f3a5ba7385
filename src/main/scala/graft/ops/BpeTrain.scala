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
    *
    * The merge loop is INCREMENTAL: pair counts, an inverted index
    * pair → words-containing-it, and a lazy max-heap are maintained across
    * rounds, so round r touches only the words that actually contain the
    * winning pair (each re-counted locally before/after the merge) — not
    * the whole table. A full per-round recount is O(rounds × total
    * symbols): ~10^10 driver operations at a published-vocab 50k merges
    * over 65k words (hours); the incremental loop's total work is bounded
    * by Σ (affected-word lengths), minutes at the same scale. The winner
    * selection is bit-identical to the recount version: the lazy heap
    * pops stale entries (count changed since push) and re-inserts them at
    * their current count, so the first valid pop is the true
    * (max count, smallest packed (leftId, rightId)) — the same fixed
    * total order, same merges, any engine.
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

    @inline def pk(l: Int, r: Int): Long = (l.toLong << 32) | r.toLong

    /** Local pair multiset of one word's current symbols. */
    def localPairs(syms: mutable.ArrayBuffer[Int]): mutable.LongMap[Long] = {
      val m = mutable.LongMap.empty[Long]
      var i = 0
      while (i < syms.length - 1) {
        val key = pk(syms(i), syms(i + 1))
        m.update(key, m.getOrElse(key, 0L) + 1L)
        i += 1
      }
      m
    }

    // global weighted pair counts + inverted index pair → word indices.
    // Total index size is bounded by Σ word lengths (each position
    // contributes one membership), not pairs × words.
    val counts = mutable.LongMap.empty[Long]
    val occ = mutable.LongMap.empty[mutable.HashSet[Int]]
    var wi = 0
    while (wi < words.length) {
      val (syms, n) = words(wi)
      localPairs(syms).foreach { case (key, mult) =>
        counts.update(key, counts.getOrElse(key, 0L) + mult * n)
        occ.getOrElseUpdate(key, mutable.HashSet.empty[Int]) += wi
      }
      wi += 1
    }

    // lazy max-heap of (count, pairKey): max count first, ties to the
    // SMALLEST packed key (both ids < 2^31, so the packed long compares
    // consistently). Entries go stale when a count changes; pops validate
    // against `counts` and re-insert at the current value, preserving the
    // invariant that every pair with count >= 2 has a heap entry at >= its
    // current count.
    val heap = mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.Tuple2(Ordering.Long, Ordering.Long.reverse))
    counts.foreach { case (k, c) => if (c >= 2L) heap.enqueue((c, k)) }

    def popBest(): Long = {
      while (heap.nonEmpty) {
        val (c, key) = heap.dequeue()
        val cur = counts.getOrElse(key, 0L)
        if (cur == c) return key
        else if (cur >= 2L) heap.enqueue((cur, key)) // stale → correct it
        // cur < 2: can never win; increase re-enqueues it
      }
      -1L
    }

    val lines = Seq.newBuilder[String]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val bestKey = popBest()
      if (bestKey < 0) done = true
      else {
        val l = (bestKey >>> 32).toInt
        val r = (bestKey & 0xFFFFFFFFL).toInt
        val newId = 256 + rank
        symBytes += (symBytes(l) ++ symBytes(r))
        lines += BpeModel.renderSymbolBytes(symBytes(l)) + " " +
          BpeModel.renderSymbolBytes(symBytes(r))
        // only the words CONTAINING the winning pair change; re-count each
        // locally before/after its in-place merge and apply the diff.
        // Snapshot the index set: the loop itself drains occ(bestKey).
        val affected = occ.getOrElse(bestKey, mutable.HashSet.empty[Int]).toArray
        affected.foreach { idx =>
          val (syms, n) = words(idx)
          val before = localPairs(syms)
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
          val after = localPairs(syms)
          before.foreach { case (key, mult) =>
            val d = after.getOrElse(key, 0L) - mult
            if (d != 0L) {
              val nc = counts.getOrElse(key, 0L) + d * n
              if (nc == 0L) counts.remove(key) else counts.update(key, nc)
            }
            if (!after.contains(key)) occ.get(key).foreach { s =>
              s -= idx; if (s.isEmpty) occ.remove(key)
            }
          }
          after.foreach { case (key, mult) =>
            if (!before.contains(key)) {
              counts.update(key, counts.getOrElse(key, 0L) + mult * n)
              occ.getOrElseUpdate(key, mutable.HashSet.empty[Int]) += idx
            }
          }
        }
        // re-arm the heap for every pair whose count could have RISEN
        // (new neighbors of the merged symbol); pushing a few extra
        // entries is harmless — stale ones validate on pop
        affected.foreach { idx =>
          val (syms, _) = words(idx)
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == newId || syms(i + 1) == newId) {
              val key = pk(syms(i), syms(i + 1))
              val c = counts.getOrElse(key, 0L)
              if (c >= 2L) heap.enqueue((c, key))
            }
            i += 1
          }
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
