package graft.ops.expr

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Unigram-LM tokenizer (the SentencePiece "unigram" model
  * type) — the OTHER half of the published tokenizer landscape next to the
  * BPE family in [[BpeModel]]: a vocabulary of byte-sequence pieces with
  * log probabilities, segmented by Viterbi (encode picks the piece
  * sequence maximizing the sum of log probs). Published model families
  * split roughly evenly between BPE and Unigram vocabularies, so a
  * pipeline that meters/packs/exports token ids needs both. (The reference
  * has no tokenizer surface at all — parser.py:326-344; beyond-reference,
  * same motivation as [[BpeModel]].)
  *
  * Model format interop: [[UnigramModel.fromVocabLines]] /
  * [[UnigramModel.toVocabLines]] read/write the SentencePiece `.vocab`
  * TEXT format — one `piece<TAB>logprob` line per piece, id = line
  * position. Pieces are rendered in the same published byte-to-unicode
  * alphabet as `merges.txt` ([[BpeModel.renderSymbolBytes]]), so
  * non-printable/whitespace bytes round-trip losslessly (real
  * SentencePiece uses U+2581 for space and a protobuf binary model; the
  * text `.vocab` sibling it emits is this shape — a deployment loading a
  * real model converts U+2581 → space when exporting, documented here
  * rather than guessed).
  *
  * Byte fallback: the model REQUIRES all 256 single-byte pieces (the
  * `byte_fallback` convention) so encode is total on arbitrary UTF-8 —
  * no unk token, no dropped bytes. [[UnigramModel.withByteFallback]]
  * appends any missing byte pieces at a floor log prob; the trainer
  * ([[graft.ops.UnigramTrain]]) always seeds and never prunes them.
  *
  * Determinism (the gate/oracle contract): Viterbi ties — two
  * segmentations of EXACTLY equal score ending at the same position —
  * resolve to the LONGER final piece (fewer tokens; two distinct pieces of
  * the same length cannot tie at one end position, their byte content
  * would be identical). Fixed total order, same ids on any engine.
  *
  * Scale shape: identical to the BPE kernels — the model rides the
  * expression into the task binary (a 50k-piece vocab is ~1 MB),
  * encode/count are codegen'd per-row kernels, map-only, no shuffle.
  */
final class UnigramModel private (
    /** piece id → byte sequence (id = emission id). */
    val pieceBytes: Array[Array[Byte]],
    /** piece id → log probability (natural log). */
    val logProb: Array[Double]
) extends Serializable {

  val numPieces: Int = pieceBytes.length
  private val maxPieceLen: Int =
    if (pieceBytes.isEmpty) 0 else pieceBytes.iterator.map(_.length).max

  /** byte-sequence (latin-1 interned, injective) → piece id. Built once at
    * model construction on the driver; read-only on executors.
    */
  private val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](numPieces * 2)
    var i = 0
    while (i < numPieces) {
      val k = new String(pieceBytes(i), StandardCharsets.ISO_8859_1)
      require(m.put(k, i) == null,
        s"duplicate piece at ids ${m.get(k)} and $i: " +
          s"'${BpeModel.renderSymbolBytes(pieceBytes(i))}'")
      i += 1
    }
    m
  }

  // byte fallback check: encode must be total on arbitrary bytes
  {
    var b = 0
    while (b < 256) {
      require(idOf.containsKey(
        new String(Array(b.toByte), StandardCharsets.ISO_8859_1)),
        s"unigram model is missing single-byte piece for byte $b — " +
          "encode would not be total; use withByteFallback(...)")
      b += 1
    }
  }

  /** Piece id of an exact byte sequence, −1 if absent. */
  def pieceId(bytes: Array[Byte]): Int = {
    val v = idOf.get(new String(bytes, StandardCharsets.ISO_8859_1))
    if (v == null) -1 else v.intValue()
  }

  /** Viterbi-segment one pre-token's bytes; appends piece ids to `out`. */
  private def viterbi(bytes: Array[Byte], out: scala.collection.mutable.ArrayBuilder[Int]): Unit = {
    val n = bytes.length
    if (n == 0) return
    val best = new Array[Double](n + 1)
    val backLen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      val lo = math.max(0, i - maxPieceLen)
      var j = i - 1
      while (j >= lo) {
        if (best(j) != Double.NegativeInfinity) {
          val id = idOf.get(new String(bytes, j, i - j, StandardCharsets.ISO_8859_1))
          if (id != null) {
            val s = best(j) + logProb(id.intValue())
            // strict > : on exact ties the LONGER piece wins because j
            // descends from i-1 (short pieces are seen first and replaced)
            if (s > best(i) || (s == best(i) && (i - j) > backLen(i))) {
              best(i) = s
              backLen(i) = i - j
            }
          }
        }
        j -= 1
      }
      i += 1
    }
    // byte fallback guarantees best(n) > -inf; walk back, then reverse
    val rev = new scala.collection.mutable.ArrayBuffer[Int](8)
    var p = n
    while (p > 0) {
      val l = backLen(p)
      rev += idOf.get(new String(bytes, p - l, l, StandardCharsets.ISO_8859_1)).intValue()
      p -= l
    }
    var r = rev.length - 1
    while (r >= 0) { out += rev(r); r -= 1 }
  }

  /** Token ids of `s`: pre-tokenize with the standard byte-level pattern
    * ([[BpeModel.preTokenize]] — the SAME word boundaries as the BPE
    * kernels and the trainer's corpus pass), Viterbi-segment each
    * pre-token's UTF-8 bytes, concatenate.
    */
  def encodeTokens(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = Array.newBuilder[Int]
    val m = BpeModel.PreToken.matcher(str)
    while (m.find()) {
      viterbi(str.substring(m.start, m.end).getBytes(StandardCharsets.UTF_8), out)
    }
    out.result()
  }

  /** [[encodeTokens]] boxed for codegen call sites. */
  def encodeArray(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(encodeTokens(s))

  /** Token count = encode length (Viterbi runs either way; counting skips
    * only the output materialization).
    */
  def countTokens(s: UTF8String): Int = encodeTokens(s).length

  /** Sum of piece log probs of the Viterbi segmentation of `s` — the
    * model's (max-approximation) log likelihood of the text, the number
    * training drives up.
    */
  def viterbiLogLikelihood(bytes: Array[Byte]): Double = {
    val out = Array.newBuilder[Int]
    viterbi(bytes, out)
    out.result().iterator.map(logProb).sum
  }

  /** SentencePiece `.vocab` text rendering: `piece<TAB>logprob` per line,
    * id = line index, pieces in the merges.txt byte alphabet.
    */
  def toVocabLines: Seq[String] = {
    val b = Seq.newBuilder[String]
    var i = 0
    while (i < numPieces) {
      b += BpeModel.renderSymbolBytes(pieceBytes(i)) + "\t" +
        UnigramModel.renderLogProb(logProb(i))
      i += 1
    }
    b.result()
  }
}

object UnigramModel {

  private[expr] def renderLogProb(lp: Double): String = {
    // Locale-independent, round-trips through java.lang.Double.parseDouble
    java.lang.Double.toString(lp)
  }

  /** Build from (piece bytes, log prob) pairs; ids = positions. Fails if
    * any single-byte piece is missing (use [[withByteFallback]]).
    */
  def fromPieceBytes(pieces: Seq[(Array[Byte], Double)]): UnigramModel =
    new UnigramModel(pieces.map(_._1).toArray, pieces.map(_._2).toArray)

  /** Build from (piece string, log prob) pairs — piece strings are plain
    * text (UTF-8 bytes). Ids = positions.
    */
  def fromPieces(pieces: Seq[(String, Double)]): UnigramModel =
    fromPieceBytes(pieces.map { case (p, lp) =>
      (p.getBytes(StandardCharsets.UTF_8), lp)
    })

  /** `pieces` plus any MISSING single-byte pieces at `floorLogProb`
    * (appended after, in byte order) — the standard `byte_fallback`
    * completion, so hand-built and trained vocabularies alike are total.
    */
  def withByteFallback(
      pieces: Seq[(Array[Byte], Double)],
      floorLogProb: Double = -20.0): UnigramModel = {
    val have = pieces.iterator
      .filter(_._1.length == 1).map(p => p._1(0) & 0xFF).toSet
    val fallback = (0 until 256).filterNot(have)
      .map(b => (Array(b.toByte), floorLogProb))
    fromPieceBytes(pieces ++ fallback)
  }

  /** Parse SentencePiece `.vocab`-format text lines (`piece<TAB>logprob`,
    * id = line position, pieces in the merges.txt byte alphabet — see the
    * class scaladoc for the interop contract). Round-trips
    * [[UnigramModel.toVocabLines]] exactly.
    */
  def fromVocabLines(lines: Iterable[String]): UnigramModel = {
    val pieces = lines.iterator.zipWithIndex.map { case (line, i) =>
      val tab = line.indexOf('\t')
      require(tab > 0, s"vocab line ${i + 1}: expected 'piece<TAB>logprob', got '$line'")
      val bytes = sideBytes(line.substring(0, tab), i + 1)
      val lp = java.lang.Double.parseDouble(line.substring(tab + 1))
      (bytes, lp)
    }.toSeq
    fromPieceBytes(pieces)
  }

  /** [[fromVocabLines]] over a driver-side local file. */
  def fromVocabFile(path: String): UnigramModel = {
    import scala.jdk.CollectionConverters._
    fromVocabLines(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path), StandardCharsets.UTF_8).asScala)
  }

  /** Decode a rendered piece back to bytes via the merges.txt alphabet —
    * same mapping [[BpeModel.fromMergesLines]] uses for merge sides.
    */
  private def sideBytes(side: String, lineNo: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(side.length)
    var i = 0
    while (i < side.length) {
      val cp = side.codePointAt(i)
      val b = if (cp < uniToByte.length) uniToByte(cp) else -1
      require(b >= 0,
        s"vocab line $lineNo: '$side' contains U+${cp.toHexString}, " +
          "not in the byte-level alphabet")
      out.write(b)
      i += Character.charCount(cp)
    }
    out.toByteArray
  }

  /** merges.txt codepoint → byte (−1 = not in the alphabet). */
  private lazy val uniToByte: Array[Int] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = Array.fill(512)(-1)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) arr(b) = b
      else { arr(256 + n) = b; n += 1 }
      b += 1
    }
    arr
  }
}

/** Codegen'd Unigram-LM tokenization: `unigram_encode(text)` →
  * `array<int>` of piece ids under a fixed [[UnigramModel]] (Viterbi —
  * see the model scaladoc for the tie rule). Null in → null out; empty
  * string → empty array.
  */
case class UnigramEncodeExpr(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"unigram_encode needs a string column, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override protected def nullSafeEval(input: Any): Any =
    model.encodeArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeArray($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

/** Codegen'd Unigram token count: `unigram_count(text)` under a fixed
  * [[UnigramModel]]. `unigram_count(x) == size(unigram_encode(x))` always.
  */
case class UnigramCountExpr(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"unigram_count needs a string column, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "unigram_count"

  override protected def nullSafeEval(input: Any): Any =
    model.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramCountExpr =
    copy(child = newChild)
}
