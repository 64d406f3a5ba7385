package graft.tools

/** Driver-side WordPiece-trainer scale probe (no Spark session): trains a
  * `vocabSize` vocabulary over a synthetic heavy-tailed word table of the
  * `maxWords` cap size — the published-scale measurement the BENCH_NOTES
  * BpeTrain row (32k merges / 63k words / 3.1 s) pins for the BPE leg.
  * The corpus-scale pass ([[graft.ops.WordPieceTrain.wordCounts]]) is
  * measured separately by the bench rows; this isolates the driver loop,
  * which is the scaling question (O(vocab × word-table) by construction).
  *
  * Table shape: Zipf ranks over deterministic letter words (lengths 3–12,
  * seeded RNG), the same heavy-tail regime a real crawl word table shows
  * at the 65k cap.
  *
  * Usage: `WordPieceProbe [maxWords] [vocabSize]` (defaults 65536 30000);
  * prints one JSON line with the timing.
  */
object WordPieceProbe {
  def main(args: Array[String]): Unit = {
    val maxWords = if (args.length > 0) args(0).toInt else 65536
    val vocabSize = if (args.length > 1) args(1).toInt else 30000
    val rng = new scala.util.Random(42)
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < maxWords) {
      val len = 3 + rng.nextInt(10)
      seen += Array.fill(len)(letters(rng.nextInt(letters.length))).mkString
    }
    val table = seen.iterator.zipWithIndex.map { case (w, i) =>
      (w, math.max(1L, (maxWords.toLong * 10) / (i + 1))) // Zipf-ish tail
    }.toSeq
    // warm once at a small budget so JIT noise stays out of the number
    graft.ops.WordPieceTrain.train(table.take(2000), 500)
    val t0 = System.nanoTime()
    val vocab = graft.ops.WordPieceTrain.train(table, vocabSize)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"wordpiece_train","max_words":$maxWords,""" +
      f""""vocab_size":$vocabSize,"vocab_emitted":${vocab.length},""" +
      f""""seconds":$secs%.2f}""")
  }
}
