package graft.ops.expr

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Open-addressing long→long hash map for the BPE merge table — the hot
  * loop probes it once per adjacent symbol pair per merge round, so boxing
  * through `java.util.HashMap[JLong, JLong]` would dominate the count.
  * Keys are `(leftId << 32) | rightId` (always ≥ 0), values are
  * `(rank << 32) | newSymbolId` (always > 0); −1 is the free/missing
  * sentinel for both. Fixed-size (sized at build from the merge count),
  * write-once at model load, read-only afterwards — safely shared across
  * executor threads.
  */
private[expr] final class LongLongMap(expected: Int) extends Serializable {
  private val cap = Integer.highestOneBit(math.max(16, expected * 4 - 1)) * 2
  private val mask = cap - 1
  private val keys = Array.fill[Long](cap)(-1L)
  private val vals = new Array[Long](cap)

  def put(key: Long, value: Long): Unit = {
    var i = (java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L)) & mask
    while (keys(i) != -1L && keys(i) != key) i = (i + 1) & mask
    keys(i) = key
    vals(i) = value
  }

  def get(key: Long): Long = {
    var i = (java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L)) & mask
    while (keys(i) != -1L) {
      if (keys(i) == key) return vals(i)
      i = (i + 1) & mask
    }
    -1L
  }
}

/** Byte-level BPE token counting over a LOADABLE merge table — the exact
  * counter for [[graft.ops.Packing.packSequences]] /
  * [[graft.ops.Packing.takeTokenBudget]], replacing the regex
  * pre-tokenizer ESTIMATE ([[graft.ops.TextStats.tokenCountBpe]]) with the
  * token count the model being trained will actually see. The estimate's
  * 15–30% systematic error on non-English/code text flows straight into
  * sequence-length overruns when packing is metered with it.
  *
  * The merge table is the `merges.txt` format published with GPT-2-family
  * vocabularies (one `left right` pair per line, rank = line order, an
  * optional `#version` header) — the same file the HuggingFace `tokenizers`
  * BPE loader consumes, so any publicly released byte-level BPE vocabulary
  * drops in. Counting needs no vocab.json: token COUNT is fully determined
  * by the merge ranks.
  *
  * Algorithm (byte-level BPE as published with GPT-2, reimplemented from
  * the format spec — no reference code consulted; dftly has no tokenizer
  * at all, cf. reference parser.py:326-344 — this is beyond-reference):
  *   1. pre-tokenize with the standard contraction/letter-run/number-run/
  *      punct-run/whitespace pattern (Unicode classes);
  *   2. each pre-token's UTF-8 bytes start as single-byte symbols;
  *   3. repeatedly merge the adjacent pair with the LOWEST rank until no
  *      adjacent pair is in the table;
  *   4. count = surviving symbols, summed over pre-tokens.
  *
  * Merging one occurrence at a time while re-scanning for the global
  * minimum is equivalent to the merge-all-occurrences formulation: a pair
  * involving a rank-r merge's output can only have been defined AFTER rank
  * r (both sides of a merge must exist when it is defined), so merging one
  * occurrence never unlocks a lower-ranked pair elsewhere.
  *
  * Scale shape: the model rides the expression into the task binary
  * (~16 bytes per merge; a full 50k-merge GPT-2 table is ~1 MB, serialized
  * once per stage and shared by every task in the executor) and the count
  * itself is a codegen'd per-row kernel — no UDF, no shuffle, linear scan
  * over the corpus like every other TextStats signal.
  */
final class BpeModel private (
    ranks: LongLongMap,
    val numMerges: Int,
    /** Rendered token string of each merge's output (merges.txt
      * byte-to-unicode form) — the key a published `vocab.json` uses.
      */
    mergeSymbols: Array[String],
    /** internal symbol id → EMITTED id. Default = the standard-script
      * numbering (byte-alphabet discovery order, merge r → 256+r);
      * [[withVocab]] rebuilds it from a released `vocab.json` so encode
      * emits the model's true embedding-table rows.
      */
    emitIds: Array[Int]
) extends Serializable {

  /** Re-key emission to a published `vocab.json` mapping (token string in
    * the byte-to-unicode rendering → id). Every byte symbol and every
    * merge output must be present — a vocab that does not cover the merge
    * table would emit ids from two different numberings, so missing
    * entries fail loudly here, at model build, not mid-job. Special
    * tokens (`<|endoftext|>` …) may occupy any ids; they are simply never
    * emitted by pure BPE encode. Counting is unaffected (the count is a
    * function of the merge ranks alone).
    */
  /** The vocab the standard publishing script would emit for this model:
    * 256 byte symbols at their discovery-order ids, merge r's output at
    * 256 + r — i.e. the numbering [[encodeTokens]] uses by default.
    * `withVocab(standardVocab)` is the identity; fixtures offset it to
    * simulate a released vocab with special tokens re-numbering the table.
    */
  def standardVocab: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    var i = 0
    while (i < 256) {
      b += (BpeModel.renderSymbolBytes(Array(i.toByte)) -> BpeModel.byteExternalId(i))
      i += 1
    }
    var r = 0
    while (r < numMerges) { b += (mergeSymbols(r) -> (256 + r)); r += 1 }
    b.result()
  }

  def withVocab(vocab: Map[String, Int]): BpeModel = {
    val emit = new Array[Int](256 + numMerges)
    var b = 0
    while (b < 256) {
      val tok = BpeModel.renderSymbolBytes(Array(b.toByte))
      emit(b) = vocab.getOrElse(tok,
        throw new IllegalArgumentException(
          s"vocab.json does not contain the byte symbol '$tok' (byte $b) — " +
            "not a byte-level BPE vocabulary, or truncated"))
      b += 1
    }
    var r = 0
    while (r < numMerges) {
      emit(256 + r) = vocab.getOrElse(mergeSymbols(r),
        throw new IllegalArgumentException(
          s"vocab.json does not contain merge ${r}'s output " +
            s"'${mergeSymbols(r)}' — vocab and merges.txt are from " +
            "different models"))
      r += 1
    }
    new BpeModel(ranks, numMerges, mergeSymbols, emit)
  }

  /** Total surviving BPE symbols across the pre-tokens of `s`. */
  def countTokens(s: UTF8String): Int = {
    val str = s.toString
    var total = 0
    val m = BpeModel.PreToken.matcher(str)
    while (m.find()) {
      total += countPiece(
        str.substring(m.start, m.end).getBytes(StandardCharsets.UTF_8))
    }
    total
  }

  private def countPiece(bytes: Array[Byte]): Int = {
    val n = bytes.length
    if (n <= 1 || numMerges == 0) return n
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) { ids(i) = bytes(i) & 0xFF; i += 1 }
    mergeLoop(ids, n)
  }

  /** Run the merge loop in place over `ids(0 until n)`; returns the
    * surviving symbol count (the prefix of `ids` holds the symbols).
    */
  private def mergeLoop(ids: Array[Int], n: Int): Int = {
    var len = n
    while (len > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var bestNew = -1
      var j = 0
      while (j < len - 1) {
        val v = ranks.get((ids(j).toLong << 32) | ids(j + 1).toLong)
        if (v >= 0) {
          val rank = (v >>> 32).toInt
          if (rank < bestRank) {
            bestRank = rank; bestPos = j; bestNew = (v & 0xFFFFFFFFL).toInt
          }
        }
        j += 1
      }
      if (bestPos < 0) return len
      ids(bestPos) = bestNew
      var k = bestPos + 1
      while (k < len - 1) { ids(k) = ids(k + 1); k += 1 }
      len -= 1
    }
    len
  }

  /** Token IDS under the standard published numbering: the 256 byte
    * symbols take ids 0–255 in the byte-alphabet's discovery order
    * (printable latin-1 bytes first, then the remapped rest — the order
    * the GPT-2 `vocab.json` was generated in, so ids match any vocab
    * produced by the standard script), and merge r's output is `256 + r`.
    * `count == encode.length` by construction.
    */
  def encodeTokens(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = Array.newBuilder[Int]
    val m = BpeModel.PreToken.matcher(str)
    while (m.find()) {
      val bytes =
        str.substring(m.start, m.end).getBytes(StandardCharsets.UTF_8)
      val n = bytes.length
      val ids = new Array[Int](n)
      var i = 0
      while (i < n) { ids(i) = bytes(i) & 0xFF; i += 1 }
      val len = if (n <= 1 || numMerges == 0) n else mergeLoop(ids, n)
      i = 0
      while (i < len) {
        out += emitIds(ids(i))
        i += 1
      }
    }
    out.result()
  }

  /** [[encodeTokens]] boxed for codegen call sites. */
  def encodeArray(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(encodeTokens(s))
}

object BpeModel {

  /** The standard byte-level pre-tokenizer: contractions, optionally
    * space-prefixed letter/number/punctuation runs, then residual
    * whitespace (`\s+(?!\S)` leaves the last space attached to the next
    * run). UNICODE_CHARACTER_CLASS so `\s` means Unicode whitespace, as in
    * the Python `regex` semantics the format was published with.
    */
  private[expr] val PreToken = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** All pre-token matches of `s` in order (they partition the string).
    * The trainer's corpus pass uses this through [[BpePreTokensExpr]], so
    * training and encoding are guaranteed the same word boundaries.
    */
  def preTokenize(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString
    val out = Array.newBuilder[UTF8String]
    val m = PreToken.matcher(str)
    while (m.find()) out += UTF8String.fromString(str.substring(m.start, m.end))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.result().asInstanceOf[Array[AnyRef]])
  }

  /** Render a symbol's bytes in the published merges.txt alphabet
    * (printable latin-1 bytes as themselves, the rest remapped to
    * U+0100+n in byte discovery order — the inverse of [[sideToBytes]]'s
    * mapping). [[fromMergesLines]] round-trips the output exactly.
    */
  def renderSymbolBytes(bs: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bs.length)
    var i = 0
    while (i < bs.length) {
      sb.appendCodePoint(byteToUni(bs(i) & 0xFF))
      i += 1
    }
    sb.toString
  }

  /** byte → merges.txt codepoint (inverse of [[uniToByte]]; lazy — declared
    * above uniToByte, and vals initialize in declaration order).
    */
  private lazy val byteToUni: Array[Int] = {
    val arr = new Array[Int](256)
    uniToByte.forEach((cp, b) => arr(b.intValue()) = cp.intValue())
    arr
  }

  /** GPT-2's printable byte alphabet: bytes that are "visible" latin-1
    * characters represent themselves in merges.txt; the rest are remapped
    * to codepoints 256+n in discovery order. Published alongside the
    * format; needed here only to decode merge-table SIDES back to bytes.
    */
  private val uniToByte: java.util.HashMap[Integer, Integer] = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val m = new java.util.HashMap[Integer, Integer]()
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) m.put(b, b)
      else { m.put(256 + n, b); n += 1 }
      b += 1
    }
    m
  }

  private def sideToBytes(side: String, lineNo: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(side.length)
    var i = 0
    while (i < side.length) {
      val cp = side.codePointAt(i)
      val b = uniToByte.get(cp)
      if (b == null)
        throw new IllegalArgumentException(
          s"merges line $lineNo: '$side' contains U+${cp.toHexString}, " +
            "not in the byte-level BPE alphabet")
      out.write(b.intValue())
      i += Character.charCount(cp)
    }
    out.toByteArray
  }

  /** Build from merge lines (rank = position). Lines that are blank or a
    * `#version` header are skipped, preserving rank order of the rest.
    */
  def fromMergesLines(lines: Iterable[String]): BpeModel = {
    val merges = lines.iterator.zipWithIndex
      .filterNot { case (l, _) => l.isEmpty || l.startsWith("#version") }
      .toVector
    val ranks = new LongLongMap(merges.size)
    // symbol interning: latin-1 decodes bytes 1:1 into chars, so a String
    // key is injective on byte sequences
    val symbolId = new java.util.HashMap[String, Integer]()
    var b = 0
    while (b < 256) {
      symbolId.put(new String(Array(b.toByte), StandardCharsets.ISO_8859_1), b)
      b += 1
    }
    val mergeSymbols = new scala.collection.mutable.ArrayBuffer[String](merges.size)
    var rank = 0
    for ((line, lineNo) <- merges) {
      val sp = line.indexOf(' ')
      if (sp <= 0 || line.indexOf(' ', sp + 1) >= 0)
        throw new IllegalArgumentException(
          s"merges line ${lineNo + 1}: expected 'left right', got '$line'")
      val lb = sideToBytes(line.substring(0, sp), lineNo + 1)
      val rb = sideToBytes(line.substring(sp + 1), lineNo + 1)
      def idOf(bs: Array[Byte], side: String): Int = {
        val id = symbolId.get(new String(bs, StandardCharsets.ISO_8859_1))
        if (id == null)
          throw new IllegalArgumentException(
            s"merges line ${lineNo + 1}: side '$side' is not a byte or a " +
              "previously-merged symbol — merge table is out of order")
        id.intValue()
      }
      val leftId = idOf(lb, line.substring(0, sp))
      val rightId = idOf(rb, line.substring(sp + 1))
      val newId = 256 + rank
      symbolId.put(
        new String(lb ++ rb, StandardCharsets.ISO_8859_1), newId)
      mergeSymbols += renderSymbolBytes(lb ++ rb)
      ranks.put((leftId.toLong << 32) | rightId.toLong,
        (rank.toLong << 32) | newId.toLong)
      rank += 1
    }
    new BpeModel(ranks, rank, mergeSymbols.toArray,
      Array.tabulate(256 + rank)(i => if (i < 256) byteExternalId(i) else i))
  }

  /** Parse a published `vocab.json` (token string → id) with Spark's own
    * Jackson — the sibling file of `merges.txt` in every released
    * byte-level BPE vocabulary. Feed the result to [[BpeModel.withVocab]].
    */
  def vocabFromJson(text: String): Map[String, Int] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(text)
    require(node != null && node.isObject,
      "vocab.json must be a single JSON object of token -> id")
    val b = Map.newBuilder[String, Int]
    node.properties().forEach { e =>
      require(e.getValue.isIntegralNumber,
        s"vocab.json id for '${e.getKey}' is not an integer: ${e.getValue}")
      b += (e.getKey -> e.getValue.asInt())
    }
    b.result()
  }

  /** [[vocabFromJson]] over a driver-side local file. */
  def vocabFromJsonFile(path: String): Map[String, Int] =
    vocabFromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      StandardCharsets.UTF_8))

  /** Load a published `merges.txt` (driver-side local path; the built model
    * is what ships to executors, not the file).
    */
  def fromMergesFile(path: String): BpeModel = {
    import scala.jdk.CollectionConverters._
    fromMergesLines(
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(path), StandardCharsets.UTF_8).asScala)
  }

  /** No merges: every UTF-8 byte is a token — `countTokens` equals the
    * byte length of the text (the pre-tokenizer partitions the string
    * exactly). Useful as a fixture and as a byte-metered packing unit.
    */
  val empty: BpeModel = fromMergesLines(Nil)

  /** External id of each raw byte under the published numbering: vocab
    * position = index in the byte-alphabet's discovery order (printable
    * latin-1 bytes 33–126, 161–172, 174–255 first, then the remapped
    * non-printables in byte order). E.g. '!'=0, 'A'=32, space=220 — the
    * ids any standard-script `vocab.json` assigns them.
    */
  // lazy: fromMergesLines (thus the `empty` val above) touches this during
  // object init, before a plain val declared here would have initialized
  private[expr] lazy val byteExternalId: Array[Int] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toVector
    val rest = (0 to 255).filterNot(printable.toSet)
    val arr = new Array[Int](256)
    (printable ++ rest).zipWithIndex.foreach { case (b, i) => arr(b) = i }
    arr
  }
}

/** Codegen'd exact-BPE token count: `bpe_count(text)` under a fixed
  * [[BpeModel]]. Null in → null out; empty string → 0.
  */
case class BpeCountExpr(child: Expression, model: BpeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"bpe_count needs a string column, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    model.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** Codegen'd exact-BPE tokenization: `bpe_encode(text)` → `array<int>` of
  * token ids under a fixed [[BpeModel]] (standard vocab numbering — see
  * [[BpeModel.encodeTokens]]). Null in → null out; empty string → empty
  * array. `size(bpe_encode(x)) == bpe_count(x)` always.
  */
case class BpeEncodeExpr(child: Expression, model: BpeModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"bpe_encode needs a string column, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    model.encodeArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeArray($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** Codegen'd `bpe_pre_tokens(text)` → `array<string>`: the standard
  * byte-level pre-tokenizer's matches, in order (they partition the
  * string). Model-free — usable from SQL; [[graft.ops.BpeTrain]]'s corpus
  * pass is built on it so trained merges see exactly the word boundaries
  * [[BpeCountExpr]]/[[BpeEncodeExpr]] will use.
  */
case class BpePreTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"bpe_pre_tokens needs a string column, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pre_tokens"

  override protected def nullSafeEval(input: Any): Any =
    BpeModel.preTokenize(input.asInstanceOf[UTF8String])

  // BpeModel has a companion CLASS, so the generated Java must go through
  // the module instance rather than relying on static forwarders
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expr.BpeModel$$.MODULE$$.preTokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): BpePreTokensExpr =
    copy(child = newChild)
}
