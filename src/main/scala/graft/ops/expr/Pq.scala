package graft.ops.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnBridge

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011 — the FAISS IVFADC design).
  * Static methods so whole-stage codegen calls them directly, same pattern
  * as [[SigKernels]].
  *
  * Layout conventions: a codebook for `m` subspaces × `ksub` centroids ×
  * `subDim` dims is flattened row-major as
  * `flat[(j*ksub + c)*subDim + d]`; a query lookup table is `m × ksub`
  * flattened as `lut[j*ksub + c]`. Codes are `array<byte>` of length `m`
  * (centroid id 0..ksub-1 stored as the raw low byte; decode with `& 0xFF`)
  * — a d-dim float vector (4·d bytes) compresses to m bytes, e.g. 32× for
  * d=64, m=8.
  */
object PqKernels {

  /** Encode: per subspace, the nearest sub-centroid by squared L2 (strict <,
    * so ties keep the smaller id — identical vectors always get identical
    * codes). O(m · ksub · subDim) per row in one JIT-friendly loop.
    */
  def encode(
      vec: ArrayData, flat: Array[Double], m: Int, ksub: Int, isFloat: Boolean): ArrayData = {
    val subDim = flat.length / (m * ksub)
    if (vec.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${vec.numElements()} dims, codebook expects ${m * subDim}")
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val vOff = j * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val cOff = (j * ksub + c) * subDim
        var d = 0.0
        var i = 0
        if (isFloat) {
          while (i < subDim) { val t = vec.getFloat(vOff + i) - flat(cOff + i); d += t * t; i += 1 }
        } else {
          while (i < subDim) { val t = vec.getDouble(vOff + i) - flat(cOff + i); d += t * t; i += 1 }
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance cosine estimate: subspaces are disjoint coordinate
    * blocks, so the reconstruction's dot product and squared norm BOTH
    * decompose exactly into per-subspace table lookups —
    * `cos(q, v̂) = Σⱼ ipLut[j][code_j] / (|q| · sqrt(Σⱼ sqLut[j][code_j]))`.
    * m additions + m lookups per row; zero distance computation at query
    * time (the whole point of ADC).
    */
  def adcCosine(
      codes: ArrayData, ipLut: Array[Double], sqLut: Array[Double],
      qNorm: Double, ksub: Int): Double = {
    val m = codes.numElements()
    var ip = 0.0
    var sq = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getByte(j) & 0xFF
      ip += ipLut(j * ksub + c)
      sq += sqLut(j * ksub + c)
      j += 1
    }
    val den = qNorm * math.sqrt(sq)
    if (den == 0.0) 0.0 else ip / den
  }

  /** Decode a code array back to the reconstructed vector (codebook
    * centroid concatenation) — test/diagnostic path, not used in search.
    */
  def decode(codes: ArrayData, flat: Array[Double], m: Int, ksub: Int): Array[Double] = {
    val subDim = flat.length / (m * ksub)
    val out = new Array[Double](m * subDim)
    var j = 0
    while (j < m) {
      val c = codes.getByte(j) & 0xFF
      System.arraycopy(flat, (j * ksub + c) * subDim, out, j * subDim, subDim)
      j += 1
    }
    out
  }
}

/** `array<float|double>` → `array<byte>` PQ codes. */
case class PqEncode(child: Expression, flat: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression {

  require(m >= 1 && ksub >= 2 && ksub <= 256 && flat.length % (m * ksub) == 0,
    s"pq_encode: codebook length ${flat.length} must be m*ksub*subDim with ksub in [2,256]")

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs array<float> or array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], flat, m, ksub, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.expr.PqKernels.encode($c, $fRef, $m, $ksub, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `array<byte>` PQ codes → ADC cosine estimate against a fixed query. */
case class PqAdcCosine(
    child: Expression, ipLut: Array[Double], sqLut: Array[Double],
    qNorm: Double, ksub: Int)
    extends UnaryExpression {

  require(ipLut.length == sqLut.length && ipLut.length % ksub == 0,
    "pq_adc_cosine: LUTs must be m*ksub, equal length")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pq_adc_cosine needs array<byte>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.adcCosine(input.asInstanceOf[ArrayData], ipLut, sqLut, qNorm, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ipRef = ctx.addReferenceObj("pqIpLut", ipLut, "double[]")
    val sqRef = ctx.addReferenceObj("pqSqLut", sqLut, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.expr.PqKernels.adcCosine($c, $ipRef, $sqRef, $qNorm, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcCosine =
    copy(child = newChild)
}

object PqExprs {
  def pqEncode(vec: Column, flat: Array[Double], m: Int, ksub: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), flat, m, ksub))

  def pqAdcCosine(
      codes: Column, ipLut: Array[Double], sqLut: Array[Double],
      qNorm: Double, ksub: Int): Column =
    ColumnBridge.column(
      PqAdcCosine(ColumnBridge.expression(codes), ipLut, sqLut, qNorm, ksub))
}
