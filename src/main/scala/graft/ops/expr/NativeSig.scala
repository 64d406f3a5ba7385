package graft.ops.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the native signature expressions. Public so generated
  * code can call them: `doGenCode` emits a plain static-method call, which
  * keeps the whole-stage-codegen pipeline intact (the JIT sees one tight
  * loop per row instead of a tree of interpreted higher-order functions).
  */
object SigKernels {

  val Seed = 42L // same default seed as Spark's xxhash64 builtin

  /** One-pass MinHash: k minima of affine permutations of the token hashes.
    * ~k·n multiply-adds per row in a JIT-friendly loop; the HOF equivalent
    * (k array_min∘transform passes) allocates k intermediate arrays.
    */
  def minhash(tokens: ArrayData, a: Array[Long], b: Array[Long], prime: Long): ArrayData = {
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUTF8String(s, Seed) & 0xFFFFFFFFL
        var j = 0
        while (j < k) {
          val v = (a(j) * h + b(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over a token array: per bit, sum +1/−1 by the bit of each
    * token's hash; the result packs the signs. Near-identical token multisets
    * differ in few bits (compare with `bit_count(a ^ b)`).
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUTF8String(s, Seed)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

/** Native MinHash signature of an `array<string>` token/shingle column.
  *
  * Same contract as [[graft.ops.Dedup.minhashSignature]] composed with
  * [[graft.ops.Dedup.shingleHashes]] (identical affine-permutation scheme and
  * xxhash64 seed), but evaluated in one fused pass with codegen — this is the
  * hot loop of corpus dedup at scale, where interpreted HOF evaluation is the
  * bottleneck (see the staging note in Dedup.scala).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private lazy val (aCoeffs, bCoeffs) = {
    val cs = graft.ops.Dedup.affineCoeffs(numHashes)
    (cs.map(_._1), cs.map(_._2))
  }
  private val prime = 4294967311L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_signature needs array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // Empty token arrays yield null, matching the HOF Dedup.minhashSignature
  // size guard — a Long.MaxValue sentinel signature would band-match every
  // other empty document.
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    if (tokens.numElements() == 0) null
    else SigKernels.minhash(tokens, aCoeffs, bCoeffs, prime)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aCoeffs", aCoeffs, "long[]")
    val bRef = ctx.addReferenceObj("bCoeffs", bCoeffs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.ops.expr.SigKernels.minhash($c, $aRef, $bRef, ${prime}L);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Native 64-bit SimHash of an `array<string>` token column. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"simhash64 needs array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.SigKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object NativeSig {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API for [[MinHashSignature]]. */
  def minhashSignature(tokens: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokens), numHashes))

  /** Column API for [[SimHash64]]. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Register both as SQL functions: `simhash64(toks)`,
    * `minhash_signature(toks, k)` (k must be a literal int).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => {
        require(exprs.length == 2, "minhash_signature(tokens, numHashes)")
        val k = exprs(1).eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other   => throw new IllegalArgumentException(
            s"numHashes must be a literal integer; got $other")
        }
        MinHashSignature(exprs.head, k)
      },
      "built-in")
  }
}
