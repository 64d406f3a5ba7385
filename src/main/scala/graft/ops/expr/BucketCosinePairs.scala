package graft.ops.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Fused in-bucket pair expansion + cosine verify for the vector near-dup
  * paths (sign-bit LSH buckets, IVF cell buckets, and the int8-quantized
  * IVF variant) — the [[BucketJaccardPairs]] treatment applied to vectors:
  * the double-explode spelling materialized both members' payloads per
  * candidate pair; this generator walks the bucket array in place and
  * allocates only survivor triples `(id_a, id_b, cosine)`.
  *
  * The member payload type selects the kernel: `array<float|double>` →
  * [[SigKernels.cosine]] (exact), `binary` → [[QuantKernels.cosineQ]]
  * (scale-free int8 cosine — the quantized caller passes
  * `threshold − margin` here and re-scores survivors exactly).
  *
  * Input: `array<struct<id, payload>>`; same once-per-shared-bucket pair
  * duplication as the explode spelling (downstream distinct() dedups).
  */
case class BucketCosinePairs(child: Expression, threshold: Double)
  extends UnaryExpression with Generator with CodegenFallback {

  private lazy val structType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val idType: DataType = structType(0).dataType
  private lazy val payloadType: DataType = structType(1).dataType
  private lazy val isQuantized: Boolean = payloadType == BinaryType
  private lazy val isFloat: Boolean = payloadType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(idType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if st.length == 2 &&
        (st(1).dataType match {
          case BinaryType | ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
          case _ => false
        }) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "bucket_cosine_pairs needs array<struct<id, " +
        s"array<float|double> | binary>>, got ${other.simpleString}")
  }

  override def elementSchema: StructType = new StructType()
    .add("id_a", idType, nullable = structType(0).nullable)
    .add("id_b", idType, nullable = structType(0).nullable)
    .add("cosine", DoubleType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr == null || arr.numElements() < 2) return Nil
    val n = arr.numElements()
    // pre-extract payloads ONCE per bucket (n view objects / byte arrays)
    // instead of 2 per candidate pair — the m² inner loop then touches
    // only primitive reads and the kernel
    val bins: Array[Array[Byte]] =
      if (isQuantized) Array.tabulate(n)(k => arr.getStruct(k, 2).getBinary(1))
      else null
    val vecs: Array[org.apache.spark.sql.catalyst.util.ArrayData] =
      if (!isQuantized) Array.tabulate(n)(k => arr.getStruct(k, 2).getArray(1))
      else null
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var nextRow: InternalRow = null

      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && i < n - 1) {
          val cos =
            if (isQuantized) QuantKernels.cosineQ(bins(i), bins(j))
            else SigKernels.cosine(vecs(i), vecs(j), isFloat, isFloat)
          if (cos >= threshold) {
            val ida = InternalRow.copyValue(arr.getStruct(i, 2).get(0, idType))
            val idb = InternalRow.copyValue(arr.getStruct(j, 2).get(0, idType))
            val cmp = idOrdering.compare(ida, idb)
            if (cmp != 0) {
              val out = new GenericInternalRow(3)
              if (cmp < 0) { out(0) = ida; out(1) = idb }
              else { out(0) = idb; out(1) = ida }
              out(2) = cos
              nextRow = out
            }
          }
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
        }
      }

      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow
        advance()
        r
      }
    }
  }

  override def prettyName: String = "bucket_cosine_pairs"
  override protected def withNewChildInternal(newChild: Expression): BucketCosinePairs =
    copy(child = newChild)
}
