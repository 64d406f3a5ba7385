package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * Everything is a pure `Column` expression over built-in functions
  * (higher-order functions where per-token work is needed) — no UDFs, fully
  * distributed, no shuffle: these are per-row map operations that scale
  * linearly with partitions at any data size.
  */
object TextStats {

  /** Whitespace tokens. Leading/trailing whitespace and empty text would
    * yield empty-string tokens from the bare regex split (so blank text
    * counted 1 token); the remove keeps only real tokens.
    */
  def tokens(text: Column): Column = array_remove(split(text, "\\s+"), "")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count ESTIMATE: word pieces + standalone punctuation,
    * the usual pre-tokenizer regex shape. For counts true to an actual
    * tokenizer, use [[tokenCountBpeExact]] with its merge table.
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("""[A-Za-z0-9]+|[^A-Za-z0-9\s]"""), lit(0)))

  /** EXACT byte-level BPE token count under a loaded merge table
    * ([[graft.ops.expr.BpeModel.fromMergesFile]] reads the published
    * GPT-2-style `merges.txt` format) — the counter to meter
    * [[Packing.packSequences]]/[[Packing.takeTokenBudget]] with when the
    * sequences feed the model the table belongs to. Codegen'd per-row
    * kernel; the model rides the task binary once per stage.
    */
  def tokenCountBpeExact(text: Column, model: graft.ops.expr.BpeModel): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.ops.expr.BpeCountExpr(ColumnBridge.expression(text), model))
  }

  /** EXACT byte-level BPE tokenization → `array<int>` of token ids under
    * the standard published numbering ([[graft.ops.expr.BpeModel
    * .encodeTokens]]): the column a pipeline materializes when sequences
    * leave text space — pack over it, write it, or feed it straight to a
    * trainer. Same codegen'd kernel as the counter;
    * `size(tokenizeBpe(x)) == tokenCountBpeExact(x)` always.
    */
  def tokenizeBpe(text: Column, model: graft.ops.expr.BpeModel): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.ops.expr.BpeEncodeExpr(ColumnBridge.expression(text), model))
  }

  /** Unigram-LM (SentencePiece-style) tokenization → `array<int>` of piece
    * ids under a loaded [[graft.ops.expr.UnigramModel]] (`.vocab`-format
    * text via [[graft.ops.expr.UnigramModel.fromVocabFile]], or trained by
    * [[UnigramTrain]]). Viterbi segmentation per pre-token — the SAME word
    * boundaries as the BPE kernels. Codegen'd, map-only.
    */
  def tokenizeUnigram(text: Column, model: graft.ops.expr.UnigramModel): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.ops.expr.UnigramEncodeExpr(ColumnBridge.expression(text), model))
  }

  /** Unigram-LM token count; `tokenCountUnigram(x) ==
    * size(tokenizeUnigram(x))` always.
    */
  def tokenCountUnigram(text: Column, model: graft.ops.expr.UnigramModel): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.ops.expr.UnigramCountExpr(ColumnBridge.expression(text), model))
  }

  /** WordPiece (BERT-family) tokenization to vocab ids — greedy
    * longest-match-first with `##` continuation pieces and the published
    * whole-word-to-[UNK] rule. Codegen'd, map-only.
    */
  def tokenizeWordPiece(text: Column, model: graft.ops.expr.WordPieceModel): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.ops.expr.WordPieceEncodeExpr(ColumnBridge.expression(text), model))
  }

  /** WordPiece token count; `tokenCountWordPiece(x) ==
    * size(tokenizeWordPiece(x))` always.
    */
  def tokenCountWordPiece(text: Column, model: graft.ops.expr.WordPieceModel): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.ops.expr.WordPieceCountExpr(ColumnBridge.expression(text), model))
  }

  /** Characters of punctuation / total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(text, lit("""[^\w\s]"""), lit(0))).cast(DoubleType) / n)
  }

  /** Fraction of tokens that are (deduplicated) stopwords — the classic
    * quality heuristic: natural language has a stable stopword density,
    * boilerplate and word salad don't.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(array_intersect(toks, lit(stopwords.toArray))).cast(DoubleType) / size(toks)
    )
  }

  /** Mean token length — crude signal for tokenizer-hostile content. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) / size(toks)
    )
  }

  /** English stopword list used by [[qualityScore]]'s default. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are"
  )

  /** Lang-keyed stopword list for the quality ladder: `en` keeps the
    * shipped [[EnglishStopwords]] (exact behavior preservation for every
    * existing default), any other code reuses
    * [[graft.ops.expr.LangModel]]'s 28-language function-word table —
    * real crawls are majority non-English, and an English stoplist
    * silently fails every good non-English document at the stopword
    * gates. Languages without whitespace-delimited function words
    * (th/zh/ja/ko) and unknown codes return an EMPTY list; callers must
    * disable their minimum-stopword gate in that case (the Gopher/jusText
    * entry points here do so automatically).
    */
  def stopwordsFor(lang: String): Seq[String] = lang match {
    case "en" => EnglishStopwords
    case l => graft.ops.expr.LangModel.functionWords(l)
  }

  /** Composite quality score in [0,1]: length saturation, stopword presence,
    * penalty for extreme punctuation density. Weights are fixed so the score
    * is deterministic and oracle-checkable.
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val lengthScore = least(lit(1.0), nChars.cast(DoubleType) / 500.0)
    val stopScore = least(lit(1.0), stopwordRatio(text, EnglishStopwords) * 4.0)
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    round(lengthScore * 0.4 + stopScore * 0.4 + punctPenalty * 0.2, 6)
  }

  /** Language ID: the 28-language linear classifier over weighted
    * function-word counts and Unicode-script character ranges — see
    * [[graft.ops.expr.LangModel]] for the model, feature tables, tie-break
    * order, and known coarse spots. One codegen'd two-pass classify per
    * row, no UDF; `"und"` when no feature fires.
    */
  def langId(text: Column): Column = graft.ops.expr.NativeSig.langId(text)

  /** Multi-code language ID: up to `maxLangs` comma-joined codes,
    * primary first — the published cc-index `languages` field shape for
    * genuinely mixed pages (a secondary needs ≥ half the primary's score
    * AND exclusive evidence — see
    * [[graft.ops.expr.LangModel.classifyTop]] for the margin gate).
    * `langId(c, 1)` equals `langId(c)`.
    */
  def langId(text: Column, maxLangs: Int): Column =
    graft.ops.expr.NativeSig.langId(text, maxLangs)

  /** Re-spell a [[langId]] code column — single (`en`) or comma-joined
    * multi-code (`fr,en`) — as ISO 639-3 (`eng`, `fra,eng`), the spelling
    * the PUBLISHED cc-index `languages` field uses: the documented edge
    * mapping for joining this library's language columns against the
    * published artifact ([[graft.sources.Warc.indexWarc]] scaladoc).
    * Unknown codes (incl. `und`) pass through unchanged — a join key must
    * never vanish. Codegen'd ([[graft.ops.expr.Iso6393Expr]], also the
    * SQL function `iso639_3`); null in, null out.
    */
  def toIso639_3(codes: Column): Column =
    graft.ops.expr.NativeSig.iso6393(codes)

  /** Mojibake repair: undo cp1252/latin-1-misdecoded UTF-8 (including
    * double-encoding, up to `maxPasses` layers) — see
    * [[graft.ops.expr.Mojibake]] for the repair-if-roundtrips contract.
    * Codegen'd, map-only; the natural first verb of a curation pipeline,
    * ahead of quality scoring (mojibake inflates punct ratios and kills
    * stopword hits, silently failing good documents).
    */
  def fixEncoding(text: Column, maxPasses: Int = 3): Column =
    graft.ops.expr.NativeSig.fixEncoding(text, maxPasses)

  /** DEFLATE compressed-over-raw size ratio ([[graft.ops.expr.DeflateRatio]],
    * SQL `deflate_ratio`) — the cheap entropy proxy: machine-repeated
    * boilerplate lands far below natural prose, random bytes near 1.0. A
    * `compressionRatio(text) < minRatio` drop rule catches long-period
    * repetition and templated spam that window-local n-gram rules miss.
    * Map-only; deterministic per JVM (fixed zlib level/strategy).
    */
  def compressionRatio(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.ops.expr.DeflateRatio(ColumnBridge.expression(text)))
  }

  /** Order-sensitive rolling-hash fingerprint of the token stream, mod a
    * 31-bit prime so the polynomial accumulation never overflows Long under
    * ANSI arithmetic. Deterministic across runs and partitionings (pure
    * per-row fold).
    */
  def fingerprint(text: Column): Column = {
    val p = 1000000007L
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => (acc * 1000003L + pmod(xxhash64(t), lit(p))) % p
    )
  }

  /** All stats in one pass (single projection — one scan at any scale). */
  def withTextStats(df: DataFrame, textCol: String): DataFrame =
    df.select(
      df.columns.toIndexedSeq.map(col) ++ Seq(
        tokenCountWs(col(textCol)).as("token_count_ws"),
        tokenCountBpe(col(textCol)).as("token_count_bpe"),
        punctRatio(col(textCol)).as("punct_ratio"),
        stopwordRatio(col(textCol), EnglishStopwords).as("stopword_ratio"),
        langId(col(textCol)).as("lang_id"),
        fingerprint(col(textCol)).as("fingerprint")
      ): _*
    )
}
