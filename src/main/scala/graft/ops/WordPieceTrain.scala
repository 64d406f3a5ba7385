package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.expr.{WordPieceModel, WordPiecePreTokensExpr}

/** WordPiece (BERT-family) vocabulary TRAINING — the third trainer leg
  * next to [[BpeTrain]] (merges.txt) and [[UnigramTrain]] (.vocab), so a
  * user can build any of the three published tokenizer families from the
  * corpus they curate. Re-implemented from the published algorithm
  * (Schuster & Nakajima 2012 as popularized by BERT; the normalized-score
  * selection is the one the open-source reference trainers document):
  * words start as `[c₀, ##c₁, …]`, and each round merges the adjacent
  * pair maximizing `freq(ab) / (freq(a) · freq(b))` — BPE's raw-count
  * objective favors frequent pairs, WordPiece's favors pairs whose parts
  * rarely occur APART, the likelihood-gain form. The reference has no
  * tokenizer surface (parser.py:326-344).
  *
  * Scale shape (identical to the siblings): the ONE corpus-scale pass is
  * [[wordCounts]] — the encoder's exact pre-tokenizer
  * ([[WordPiecePreTokensExpr]], codegen'd; NOT the BPE regex, whose word
  * boundaries differ) hash-aggregated map-side into a (word, n) table —
  * then a bounded `maxWords` collect and a driver-side merge loop over
  * the TABLE, never the corpus. The loop maintains piece/pair counts
  * incrementally through a pair→word inverted index and scans only the
  * LIVE PAIR MAP per round for the argmax — the heap BPE uses is unsound
  * here because the normalized score's denominators are global standalone
  * frequencies (an unrelated merge can RAISE an untouched pair's score),
  * so the exact per-round cost is O(distinct pairs), not O(table
  * symbols). Measured at published scale ([[graft.tools.WordPieceProbe]],
  * committed in BENCH_NOTES): 30k vocab over the 65,536-word capped table
  * in seconds driver-side.
  *
  * Determinism: winner = max score, ties to the lexicographically
  * smallest (left, right) piece pair — a fixed total order, same vocab on
  * any engine. Vocabulary order: special tokens as given, then the
  * initial alphabet sorted, then merged tokens in creation order —
  * rendered as `vocab.txt` lines (id = position), which
  * [[WordPieceModel.fromVocabLines]] round-trips exactly.
  */
object WordPieceTrain {

  /** Pre-token array column under the encoder's word boundaries. */
  def preTokens(text: Column, lowercase: Boolean = false): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      WordPiecePreTokensExpr(ColumnBridge.expression(text), lowercase))
  }

  /** Distributed (word, n) frequency table — the one corpus-scale pass. */
  def wordCounts(df: DataFrame, textCol: String, lowercase: Boolean = false): DataFrame =
    df.select(explode(preTokens(col(textCol), lowercase)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** Learn a WordPiece vocabulary from a word-frequency table. Returns
    * `vocab.txt` lines: `specialTokens`, the initial alphabet (first
    * characters bare, continuations `##`-prefixed; only forms that occur),
    * then merged tokens in creation order — capped at `vocabSize`. Stops
    * early when no adjacent pair remains.
    */
  def train(
      wordFreqs: Iterable[(String, Long)],
      vocabSize: Int,
      specialTokens: Seq[String] = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")
  ): Seq[String] = {
    require(vocabSize >= 0, s"vocabSize must be >= 0: $vocabSize")
    val words = splitWords(wordFreqs)
    val alphabet = words.iterator.flatMap(_._1).toSeq.distinct.sorted
    val known = mutable.HashSet.empty[String]
    specialTokens.foreach(known += _)
    alphabet.foreach(known += _)
    val budget = math.max(0, vocabSize - known.size)
    val merges = mergeLoop(words, budget, known)
    (specialTokens ++ alphabet).take(vocabSize) ++ merges
  }

  /** Just the merge products, `numMerges` rounds (or until no pair
    * remains) — the round-by-round gate surface (the first merge replays
    * in SQL; multi-merge is spec-pinned, the [[BpeTrain.train]] pattern).
    */
  def trainMerges(
      wordFreqs: Iterable[(String, Long)],
      numMerges: Int
  ): Seq[String] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    mergeLoop(splitWords(wordFreqs), numMerges, mutable.HashSet.empty[String])
  }

  /** Words as mutable piece sequences `[c0, ##c1, …]`. */
  private def splitWords(wordFreqs: Iterable[(String, Long)])
      : mutable.ArrayBuffer[(mutable.ArrayBuffer[String], Long)] = {
    val words = mutable.ArrayBuffer.empty[(mutable.ArrayBuffer[String], Long)]
    wordFreqs.foreach { case (w, n) =>
      if (w.nonEmpty && n > 0) {
        val pieces = mutable.ArrayBuffer.empty[String]
        var i = 0
        var first = true
        while (i < w.length) {
          val cp = w.codePointAt(i)
          val c = new String(Character.toChars(cp))
          pieces += (if (first) c else "##" + c)
          first = false
          i += Character.charCount(cp)
        }
        words += ((pieces, n))
      }
    }
    words
  }

  /** Up to `budget` NEW vocabulary entries by repeated best-pair merging;
    * `known` tracks already-present tokens (a merge product colliding with
    * one is applied but not re-emitted). Mutates `words` in place.
    *
    * Incremental (the r12 verdict's scale item): piece and pair counts
    * are maintained exactly via subtract-rewrite-re-add of each AFFECTED
    * word, found through a pair→word inverted index (the BpeTrain
    * machinery). The per-round argmax is a full scan of the LIVE pair
    * map — O(distinct pairs), far below the corpus table's total symbol
    * count — rather than a lazy max-heap, deliberately: the normalized
    * score's denominators are the parts' GLOBAL standalone frequencies,
    * so a merge touching piece `a` raises the score of every untouched
    * pair containing `a` (its denominator shrank) and a stale-top heap
    * would return wrong winners; the map scan is exact under any update.
    * Index buffers are append-only and verified on use (a stale id finds
    * no adjacency and is skipped — never a wrong count). Output is
    * bit-identical to the full-recount loop (same argmax total order,
    * same left-to-right replacement): WordPieceTrainSpec's differential
    * pins it against an independent sort-based reference.
    */
  private def mergeLoop(
      words: mutable.ArrayBuffer[(mutable.ArrayBuffer[String], Long)],
      budget: Int,
      known: mutable.HashSet[String]
  ): Seq[String] = {
    val out = Seq.newBuilder[String]
    if (budget <= 0) return out.result()
    val pieceFreq = mutable.HashMap.empty[String, Long]
    val pairFreq = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    def nz(v: Long): Option[Long] = if (v == 0L) None else Some(v)
    def applyWord(wi: Int, sign: Long): Unit = {
      val (ps, n) = words(wi)
      var i = 0
      while (i < ps.length) {
        pieceFreq.updateWith(ps(i))(v => nz(v.getOrElse(0L) + sign * n))
        if (i + 1 < ps.length) {
          val p = (ps(i), ps(i + 1))
          pairFreq.updateWith(p)(v => nz(v.getOrElse(0L) + sign * n))
          if (sign > 0) {
            val buf = index.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int])
            if (buf.isEmpty || buf.last != wi) buf += wi
          }
        }
        i += 1
      }
    }
    var w0 = 0
    while (w0 < words.length) { applyWord(w0, 1L); w0 += 1 }
    var emitted = 0
    var exhausted = false
    while (emitted < budget && !exhausted) {
      var best: (String, String) = null
      var bestScore = -1.0
      pairFreq.foreach { case (p @ (a, b), c) =>
        val score = c.toDouble / (pieceFreq(a).toDouble * pieceFreq(b).toDouble)
        val better = score > bestScore || (score == bestScore && best != null && {
          val cmp = a.compareTo(best._1)
          cmp < 0 || (cmp == 0 && b.compareTo(best._2) < 0)
        })
        if (better) { best = p; bestScore = score }
      }
      if (best == null) exhausted = true
      else {
        val (a, b) = best
        val merged = a + b.stripPrefix("##")
        // a merged pair can never re-form (its product is strictly longer
        // than either part), so its index entry retires with it
        val affected = index.remove(best)
          .getOrElse(mutable.ArrayBuffer.empty[Int])
        var k = 0
        while (k < affected.length) {
          val wi = affected(k)
          val ps = words(wi)._1
          var has = false
          var i = 0
          while (!has && i + 1 < ps.length) {
            if (ps(i) == a && ps(i + 1) == b) has = true
            i += 1
          }
          if (has) { // stale/duplicate index ids simply skip
            applyWord(wi, -1L)
            // left-to-right non-overlapping replacement (the original
            // loop's exact traversal)
            i = 0
            while (i + 1 < ps.length) {
              if (ps(i) == a && ps(i + 1) == b) {
                ps(i) = merged
                ps.remove(i + 1)
              }
              i += 1
            }
            applyWord(wi, 1L)
          }
          k += 1
        }
        if (known.add(merged)) {
          out += merged
          emitted += 1
        }
      }
    }
    out.result()
  }

  /** End-to-end: corpus → [[wordCounts]] → bounded collect of the
    * `maxWords` most frequent words → driver-side merge loop → model.
    * Mirrors [[BpeTrain.trainFromCorpus]] / [[UnigramTrain.trainFromCorpus]].
    */
  def trainFromCorpus(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxWords: Int = 65536,
      lowercase: Boolean = false,
      specialTokens: Seq[String] = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")
  ): (WordPieceModel, Seq[String]) = {
    val wc = wordCounts(df, textCol, lowercase)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val lines = train(wc, vocabSize, specialTokens)
    (WordPieceModel.fromVocabLines(lines, lowercase = lowercase), lines)
  }
}
