package graft.ops

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.expr.UnigramModel

/** Unigram-LM tokenizer TRAINING (the SentencePiece "unigram" algorithm):
  * learn a piece vocabulary with log probabilities from the corpus, for
  * [[graft.ops.expr.UnigramEncodeExpr]]/[[graft.ops.expr.UnigramCountExpr]]
  * to consume. Completes the trained-tokenizer story next to
  * [[BpeTrain]] — published model families split between BPE and Unigram
  * vocabularies, and a curation pipeline that trains its own tokenizer
  * needs whichever the downstream model family uses. (The reference has no
  * tokenizer surface — parser.py:326-344; beyond-reference.)
  *
  * Scale shape — IDENTICAL to [[BpeTrain]], deliberately: the ONLY
  * corpus-scale pass is [[BpeTrain.wordCounts]] (shared verbatim, so BPE
  * and Unigram train from the SAME word boundaries their encoders use);
  * map-side combine bounds the exchange at one row per distinct pre-token
  * per partition. Everything after runs driver-side over the `maxWords`
  * most-frequent-words table (bounded collect — the k-means-centroids
  * pattern), never the corpus.
  *
  * Algorithm (the published SentencePiece unigram trainer, reimplemented
  * from the paper — Kudo 2018, "Subword Regularization", §3.2 — and the
  * documented CLI semantics; no reference code consulted):
  *
  *   1. SEED: candidate pieces = all substrings of the word table up to
  *      `maxPieceLen` bytes with corpus frequency ≥ 2 occurrences, scored
  *      by frequency × length, top `seedSize` kept; plus all 256
  *      single-byte pieces (never pruned — the `byte_fallback` floor that
  *      keeps encode total).
  *   2. EM: alternate (E) forward–backward over each word's segmentation
  *      lattice collecting each piece's EXPECTED count under the current
  *      probabilities — every segmentation weighted by its posterior, not
  *      just the best path — with (M) maximum-likelihood re-estimation
  *      `p(piece) = E[count] / Σ E[count]`. (SentencePiece's M-step adds a
  *      Bayesian digamma correction; plain MLE keeps the arithmetic
  *      hand-checkable and preserves the monotonicity EM guarantees,
  *      which the property spec pins.)
  *   3. PRUNE: drop the `1 − shrinkFactor` fraction of multi-byte pieces
  *      with the smallest expected counts (never single bytes), re-run EM,
  *      repeat until `vocabSize` remains. Expected-count pruning is the
  *      documented simplification of SentencePiece's per-piece likelihood
  *      loss (the counts ARE the first-order loss term); the scaladoc
  *      states it so nobody mistakes this for the exact alt-segmentation
  *      loss.
  *
  * Determinism: every tie (seed scoring, pruning order) breaks by the
  * piece's byte sequence ascending — a fixed total order, so the same word
  * table yields the same model on any engine. EM itself is
  * order-independent (sums of per-word contributions).
  */
object UnigramTrain {

  /** One word's training view: UTF-8 bytes + corpus count. */
  private final case class W(bytes: Array[Byte], n: Long)

  private def key(bs: Array[Byte]): String =
    new String(bs, StandardCharsets.ISO_8859_1)

  /** Seed candidate pieces: all substrings (len 2..maxPieceLen) of the
    * word table weighted by word counts, scored count × length, top
    * `seedSize` kept (ties by byte sequence ascending), plus all 256
    * single-byte pieces. Returns (bytes, initial count) pairs — counts
    * seed the first M-step's relative masses.
    */
  private def seedPieces(
      words: Array[W], maxPieceLen: Int, seedSize: Int): Array[(Array[Byte], Long)] = {
    val subCounts = mutable.HashMap.empty[String, Long]
    words.foreach { w =>
      val n = w.bytes.length
      var i = 0
      while (i < n) {
        var l = 2
        while (l <= maxPieceLen && i + l <= n) {
          val k = key(java.util.Arrays.copyOfRange(w.bytes, i, i + l))
          subCounts.update(k, subCounts.getOrElse(k, 0L) + w.n)
          l += 1
        }
        i += 1
      }
    }
    val multi = subCounts.iterator
      .filter(_._2 >= 2L)
      .map { case (k, c) => (k, c * k.length) } // score = count × length
      .toArray
      .sortBy { case (k, score) => (-score, k) }
      .take(seedSize)
      .map { case (k, _) =>
        (k.getBytes(StandardCharsets.ISO_8859_1), subCounts(k)) }
    val bytes1 = Array.tabulate(256) { b =>
      val arr = Array(b.toByte)
      var c = 0L
      words.foreach { w =>
        var i = 0
        while (i < w.bytes.length) { if ((w.bytes(i) & 0xFF) == b) c += w.n; i += 1 }
      }
      (arr, math.max(1L, c)) // floor 1: unseen bytes stay representable
    }
    bytes1 ++ multi
  }

  /** One E-step over the word table: expected piece counts under `lp`,
    * plus the total log likelihood Σ n_w · log Z_w (the EM objective; each
    * word's Z marginalizes over ALL segmentations). Forward–backward in
    * log space.
    */
  private def eStep(
      words: Array[W],
      pieces: Array[Array[Byte]],
      lp: Array[Double],
      maxPieceLen: Int): (Array[Double], Double) = {
    val idOf = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { idOf.put(key(pieces(i)), i); i += 1 }
    val expected = new Array[Double](pieces.length)
    var totalLL = 0.0

    @inline def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))

    words.foreach { w =>
      val bs = w.bytes
      val n = bs.length
      val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
      val beta = Array.fill(n + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0
      var e = 1
      while (e <= n) {
        val lo = math.max(0, e - maxPieceLen)
        var s = e - 1
        while (s >= lo) {
          if (alpha(s) != Double.NegativeInfinity) {
            val id = idOf.get(new String(bs, s, e - s, StandardCharsets.ISO_8859_1))
            if (id != null) alpha(e) = lse(alpha(e), alpha(s) + lp(id.intValue()))
          }
          s -= 1
        }
        e += 1
      }
      val z = alpha(n) // byte fallback ⇒ finite
      beta(n) = 0.0
      var s2 = n - 1
      while (s2 >= 0) {
        val hi = math.min(n, s2 + maxPieceLen)
        var e2 = s2 + 1
        while (e2 <= hi) {
          if (beta(e2) != Double.NegativeInfinity) {
            val id = idOf.get(new String(bs, s2, e2 - s2, StandardCharsets.ISO_8859_1))
            if (id != null) beta(s2) = lse(beta(s2), lp(id.intValue()) + beta(e2))
          }
          e2 += 1
        }
        s2 -= 1
      }
      totalLL += w.n * z
      // posterior mass of piece occurrence [s,e): exp(α_s + lp + β_e − Z)
      var s3 = 0
      while (s3 < n) {
        if (alpha(s3) != Double.NegativeInfinity) {
          val hi = math.min(n, s3 + maxPieceLen)
          var e3 = s3 + 1
          while (e3 <= hi) {
            if (beta(e3) != Double.NegativeInfinity) {
              val id = idOf.get(new String(bs, s3, e3 - s3, StandardCharsets.ISO_8859_1))
              if (id != null) {
                val post = math.exp(alpha(s3) + lp(id.intValue()) + beta(e3) - z)
                expected(id.intValue()) += w.n * post
              }
            }
            e3 += 1
          }
        }
        s3 += 1
      }
    }
    (expected, totalLL)
  }

  /** MLE M-step: log p = log(E[count] / Σ). Zero-count pieces (matched
    * nowhere) get the floor so they stay finite — they cannot win any
    * Viterbi path but keep encode total (relevant only for the byte
    * fallback pieces).
    */
  private def mStep(expected: Array[Double], floorLogProb: Double): Array[Double] = {
    val total = expected.sum
    expected.map { e =>
      if (e > 0.0) math.max(math.log(e) - math.log(total), floorLogProb)
      else floorLogProb
    }
  }

  /** Driver-side training over a word-frequency table (the bounded collect
    * of [[trainFromCorpus]]). Returns the model plus the per-EM-iteration
    * total log likelihoods (the monotonicity evidence the property spec
    * asserts on).
    */
  def train(
      wordFreqs: Iterable[(String, Long)],
      vocabSize: Int,
      maxPieceLen: Int = 16,
      seedSize: Int = 100000,
      emIters: Int = 2,
      shrinkFactor: Double = 0.75,
      floorLogProb: Double = -30.0): (UnigramModel, Seq[Double]) = {
    require(vocabSize >= 256,
      s"vocabSize must be >= 256 (the single-byte fallback floor): $vocabSize")
    require(shrinkFactor > 0.0 && shrinkFactor < 1.0,
      s"shrinkFactor must be in (0,1): $shrinkFactor")
    val words = wordFreqs.iterator
      .map { case (w, n) => W(w.getBytes(StandardCharsets.UTF_8), n) }
      .filter(_.bytes.nonEmpty)
      .toArray

    val seeds = seedPieces(words, maxPieceLen, seedSize)
    // initial probabilities from seed counts
    var pieces = seeds.map(_._1)
    var lp = mStep(seeds.map(_._2.toDouble), floorLogProb)
    val llLog = Seq.newBuilder[Double]

    var done = false
    while (!done) {
      // EM rounds at the current vocabulary
      var it = 0
      var expected: Array[Double] = null
      while (it < emIters) {
        val (e, ll) = eStep(words, pieces, lp, maxPieceLen)
        llLog += ll
        lp = mStep(e, floorLogProb)
        expected = e
        it += 1
      }
      if (pieces.length <= vocabSize) done = true
      else {
        // prune: multi-byte pieces ranked by expected count ascending
        // (ties by byte sequence); keep max(vocabSize, shrinkFactor·|V|)
        val keepTarget = math.max(vocabSize, (pieces.length * shrinkFactor).toInt)
        val order = pieces.indices.toArray.sortBy { i =>
          (expected(i), key(pieces(i)))
        }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String))
        val drop = mutable.HashSet.empty[Int]
        var oi = 0
        while (oi < order.length && pieces.length - drop.size > keepTarget) {
          val idx = order(oi)
          if (pieces(idx).length > 1) drop += idx
          oi += 1
        }
        val keptIdx = pieces.indices.filterNot(drop).toArray
        pieces = keptIdx.map(pieces)
        lp = {
          // renormalize the kept masses so the next E-step starts proper
          val keptE = keptIdx.map(i => math.max(math.exp(lp(i)), 1e-300))
          mStep(keptE, floorLogProb)
        }
      }
    }
    // emission order: highest-probability pieces first (ties by bytes) —
    // a deterministic, human-auditable id assignment for the .vocab dump
    val order = pieces.indices.toArray.sortBy { i => (-lp(i), key(pieces(i))) }
    val finalPieces = order.map(i => (pieces(i), lp(i)))
    (UnigramModel.fromPieceBytes(finalPieces.toSeq), llLog.result())
  }

  /** End-to-end: corpus → [[BpeTrain.wordCounts]] (the one distributed
    * pass — the SAME pre-tokenizer the encoder uses) → bounded collect of
    * the `maxWords` most frequent words → driver-side EM. Mirrors
    * [[BpeTrain.trainFromCorpus]].
    */
  def trainFromCorpus(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxWords: Int = 65536,
      maxPieceLen: Int = 16,
      seedSize: Int = 100000): (UnigramModel, Seq[Double]) = {
    val wc = BpeTrain.wordCounts(df, textCol)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    train(wc, vocabSize, maxPieceLen, seedSize)
  }
}
