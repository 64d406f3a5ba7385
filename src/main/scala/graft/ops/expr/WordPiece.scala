package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer (the BERT-family vocabulary type) — the third leg
  * of the published tokenizer landscape next to the BPE family
  * ([[BpeModel]]) and Unigram-LM ([[UnigramModel]]). Re-implemented from
  * the published algorithm (greedy longest-match-first over a vocabulary
  * whose word-internal continuation pieces carry a `##` prefix; a word
  * with any unmatchable remainder maps WHOLE to `[UNK]`; words longer
  * than `maxInputChars` map to `[UNK]` without matching — all three rules
  * as published). The reference has no tokenizer surface (parser.py:
  * 326-344); beyond-reference, same motivation as the other two kernels.
  *
  * Model format interop: `vocab.txt` — one token per line, id = line
  * position, plain text (WordPiece vocabularies are character-level, not
  * the byte alphabet the BPE/Unigram text formats use).
  * [[WordPieceModel.fromVocabLines]]/[[WordPieceModel.toVocabLines]]
  * round-trip it exactly.
  *
  * Pre-tokenization: whitespace split, then every punctuation character
  * (the published classifier: the four ASCII symbol ranges plus Unicode
  * category P) becomes its own word — the BasicTokenizer contract.
  * `lowercase = true` reproduces the `uncased` model family's fold
  * (Locale.ROOT); accent stripping and CJK spacing are deliberately out
  * of scope and documented rather than half-implemented — this library's
  * corpus operators are byte/ASCII-faithful throughout.
  *
  * Scale shape: identical to the sibling kernels — the vocabulary rides
  * the expression into the task binary, encode/count are codegen'd
  * per-row kernels, map-only, no shuffle.
  */
final class WordPieceModel private (
    /** id → token text (continuation pieces carry their `##` prefix). */
    val tokens: Array[String],
    val unkToken: String,
    val lowercase: Boolean,
    val maxInputChars: Int
) extends Serializable {

  val numTokens: Int = tokens.length

  private val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](numTokens * 2)
    var i = 0
    while (i < numTokens) {
      require(m.put(tokens(i), i) == null,
        s"duplicate vocab token at ids ${m.get(tokens(i))} and $i: '${tokens(i)}'")
      i += 1
    }
    m
  }

  val unkId: Int = {
    val v = idOf.get(unkToken)
    require(v != null, s"vocabulary is missing the unk token '$unkToken'")
    v.intValue()
  }

  /** Token id of an exact vocab string, −1 if absent. */
  def tokenId(s: String): Int = {
    val v = idOf.get(s)
    if (v == null) -1 else v.intValue()
  }

  private def isPunct(cp: Int): Boolean = WordPieceModel.isPunct(cp)

  /** Greedy longest-match segmentation of one word; appends ids to `out`.
    * Any unmatchable remainder (or an over-length word) → the whole word
    * is `[UNK]` — the published all-or-nothing rule.
    */
  private def matchWord(word: String, out: scala.collection.mutable.ArrayBuilder[Int]): Unit = {
    if (word.length > maxInputChars) { out += unkId; return }
    val ids = new scala.collection.mutable.ArrayBuffer[Int](4)
    var start = 0
    while (start < word.length) {
      var end = word.length
      var cur = -1
      while (cur < 0 && end > start) {
        val sub =
          if (start > 0) "##" + word.substring(start, end)
          else word.substring(start, end)
        val v = idOf.get(sub)
        if (v != null) cur = v.intValue() else end -= 1
      }
      if (cur < 0) { out += unkId; return }
      ids += cur
      start = end
    }
    ids.foreach(out += _)
  }

  /** Token ids of `s`: whitespace split, punctuation isolation, optional
    * lowercase fold, greedy per-word matching.
    */
  def encodeTokens(s: UTF8String): Array[Int] = {
    val raw = s.toString
    val str = if (lowercase) raw.toLowerCase(java.util.Locale.ROOT) else raw
    val out = Array.newBuilder[Int]
    val word = new java.lang.StringBuilder(16)
    def flush(): Unit = if (word.length > 0) {
      matchWord(word.toString, out)
      word.setLength(0)
    }
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (Character.isWhitespace(cp)) flush()
      else if (isPunct(cp)) {
        flush()
        matchWord(new String(Character.toChars(cp)), out)
      } else word.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    flush()
    out.result()
  }

  /** [[encodeTokens]] boxed for codegen call sites. */
  def encodeArray(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(encodeTokens(s))

  def countTokens(s: UTF8String): Int = encodeTokens(s).length

  /** `vocab.txt` rendering: one token per line, id = position. */
  def toVocabLines: Seq[String] = tokens.toSeq
}

object WordPieceModel {

  /** Build from vocab tokens (ids = positions). `[UNK]` (or the supplied
    * `unkToken`) must be present.
    */
  def fromTokens(
      tokens: Seq[String],
      unkToken: String = "[UNK]",
      lowercase: Boolean = false,
      maxInputChars: Int = 200): WordPieceModel = {
    require(maxInputChars > 0, "maxInputChars must be positive")
    new WordPieceModel(tokens.toArray, unkToken, lowercase, maxInputChars)
  }

  /** Parse `vocab.txt`-format lines (one token per line, id = position).
    * Round-trips [[WordPieceModel.toVocabLines]] exactly.
    */
  def fromVocabLines(
      lines: Iterable[String],
      unkToken: String = "[UNK]",
      lowercase: Boolean = false,
      maxInputChars: Int = 200): WordPieceModel =
    fromTokens(lines.toSeq, unkToken, lowercase, maxInputChars)

  /** [[fromVocabLines]] over a driver-side local file. */
  def fromVocabFile(
      path: String,
      unkToken: String = "[UNK]",
      lowercase: Boolean = false,
      maxInputChars: Int = 200): WordPieceModel = {
    import scala.jdk.CollectionConverters._
    fromVocabLines(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path),
      java.nio.charset.StandardCharsets.UTF_8).asScala,
      unkToken, lowercase, maxInputChars)
  }

  /** The published punctuation classifier: ASCII 33–47, 58–64, 91–96,
    * 123–126 (symbol ranges treated as punctuation even where Unicode
    * disagrees, e.g. `$`, `+`) plus Unicode general category P.
    */
  private[expr] def isPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
        val t = Character.getType(cp)
        t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
        t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
        t == Character.INITIAL_QUOTE_PUNCTUATION ||
        t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
      }

  /** The encoder's exact word boundaries, standalone: whitespace split +
    * punctuation isolation + optional lowercase fold. The TRAINER's word
    * table must be built on these boundaries (not the BPE regex — e.g.
    * `it's` is `[it][']['s]` under BPE but `[it]['] [s]` here).
    */
  def preTokenize(raw: String, lowercase: Boolean): Array[String] = {
    val str = if (lowercase) raw.toLowerCase(java.util.Locale.ROOT) else raw
    val out = Array.newBuilder[String]
    val word = new java.lang.StringBuilder(16)
    def flush(): Unit = if (word.length > 0) {
      out += word.toString
      word.setLength(0)
    }
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (Character.isWhitespace(cp)) flush()
      else if (isPunct(cp)) {
        flush()
        out += new String(Character.toChars(cp))
      } else word.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    flush()
    out.result()
  }

  /** [[preTokenize]] boxed for codegen call sites. */
  def preTokenizeArray(s: UTF8String, lowercase: Boolean)
      : org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      preTokenize(s.toString, lowercase)
        .map(w => UTF8String.fromString(w): Any))
}

/** Codegen'd WordPiece pre-tokenization (`wordpiece_pre_tokens(text)`):
  * the BasicTokenizer word boundaries as `array<string>` — the trainer's
  * one corpus-scale pass builds its word table on exactly these.
  */
case class WordPiecePreTokensExpr(child: Expression, lowercase: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"wordpiece_pre_tokens needs a string column, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_pre_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WordPieceModel.preTokenizeArray(input.asInstanceOf[UTF8String], lowercase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.expr.WordPieceModel$$.MODULE$$.preTokenizeArray($c, $lowercase)")

  override protected def withNewChildInternal(newChild: Expression): WordPiecePreTokensExpr =
    copy(child = newChild)
}

/** Codegen'd WordPiece tokenization: `wordpiece_encode(text)` →
  * `array<int>` of vocab ids under a fixed [[WordPieceModel]]. Null in →
  * null out; empty string → empty array.
  */
case class WordPieceEncodeExpr(child: Expression, model: WordPieceModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode needs a string column, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override protected def nullSafeEval(input: Any): Any =
    model.encodeArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceModel", model, classOf[WordPieceModel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeArray($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeExpr =
    copy(child = newChild)
}

/** Codegen'd WordPiece token count: `wordpiece_count(text)` under a fixed
  * [[WordPieceModel]]. `wordpiece_count(x) == size(wordpiece_encode(x))`.
  */
case class WordPieceCountExpr(child: Expression, model: WordPieceModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"wordpiece_count needs a string column, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "wordpiece_count"

  override protected def nullSafeEval(input: Any): Any =
    model.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceModel", model, classOf[WordPieceModel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceCountExpr =
    copy(child = newChild)
}
