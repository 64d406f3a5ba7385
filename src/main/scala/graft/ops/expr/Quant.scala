package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** int8 vector quantization for the similarity shuffle path.
  *
  * The memory hotspot of bucketed near-duplicate search is the vectors
  * riding the groupBy(cell) exchange inside bucket structs: a 64-dim float
  * embedding is 256 payload bytes per (vector, probe) entry. Symmetric
  * int8 quantization stores the same vector in `4 + d` bytes (float32
  * scale + d int8 codes) — ~4x smaller exchange and bucket state.
  *
  * Layout (BinaryType): [scale: float32 LE][q_0 ... q_{d-1}: int8] with
  * q_i = round(v_i / scale), scale = maxAbs / 127. A zero vector gets
  * scale 0 and all-zero codes.
  *
  * COSINE IS SCALE-FREE over these codes — cos_q = dot8(a,b) /
  * (|a|_8 |b|_8), the scales cancel — so the in-bucket approximate filter
  * needs no dequantization at all; the scale is kept in the payload for
  * dot/L2 consumers. The quantization error is bounded: each component is
  * off by ≤ scale/2 = maxAbs/254, so the per-vector relative error is
  * ‖e‖/‖v‖ ≤ (maxAbs/rms)/254 — ~0.012-0.016 for typical embedding
  * distributions (maxAbs/rms ≈ 3-4) — and the cosine of two quantized
  * vectors is within ~2·0.016 ≈ 0.03 of exact. The candidate filter
  * therefore runs at `threshold − margin` (margin default 0.04 > bound)
  * and survivors are re-scored EXACTLY from the full-precision column, so
  * the final pair set loses nothing and admits nothing approximate.
  *
  * Beyond-reference scale work (the reference has no vector ops at all);
  * the standard SQ8 design from the ANN literature (e.g. Faiss
  * ScalarQuantizer), re-expressed as codegen'd Catalyst kernels.
  */
object QuantKernels {

  /** v (array<float|double>) → [scale f32 LE][int8 codes]. */
  def quantize(v: ArrayData, isFloat: Boolean): Array[Byte] = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0f else (maxAbs / 127.0).toFloat
    val out = new Array[Byte](4 + n)
    val bits = java.lang.Float.floatToIntBits(scale)
    out(0) = bits.toByte
    out(1) = (bits >>> 8).toByte
    out(2) = (bits >>> 16).toByte
    out(3) = (bits >>> 24).toByte
    if (scale != 0.0f) {
      val s = scale.toDouble
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        out(4 + i) = math.max(-127, math.min(127, math.round(x / s))).toByte
        i += 1
      }
    }
    out
  }

  /** Approximate cosine from two quantized payloads — integer dot
    * products, scales cancel. 0.0 when either vector is all-zero.
    */
  def cosineQ(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"cosine_sim_q: payloads have ${a.length - 4} vs ${b.length - 4} dims")
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 4
    while (i < a.length) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // single sqrt of the integer product: identical codes give EXACTLY
    // dot/sqrt(dot²) = 1.0 — the recall-floor guarantee with no float
    // residue. na·nb ≤ (d·127²)² stays exact in a double up to ~4k dims.
    val d = math.sqrt((na * nb).toDouble)
    if (d == 0) 0.0 else dot / d
  }
}

/** `quantize_vec(vec)` — int8-quantize an embedding to a binary payload. */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec needs array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantize_vec"

  override protected def nullSafeEval(input: Any): Any =
    QuantKernels.quantize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expr.QuantKernels.quantize($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** `cosine_sim_q(qa, qb)` — approximate cosine over quantized payloads. */
case class CosineSimQ(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_q needs two binary payloads, got $l, $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_q"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantKernels.cosineQ(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.expr.QuantKernels.cosineQ($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimQ =
    copy(left = newLeft, right = newRight)
}
