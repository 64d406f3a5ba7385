package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe against a FIXED serialized filter —
  * `bloom_probe(text)` under a reference set baked at plan time.
  *
  * The filter is Spark's own `util.sketch.BloomFilter` (the public sketch
  * behind `DataFrameStatFunctions.bloomFilter`), serialized once on the
  * driver and shipped in the task binary like [[BpeCountExpr]]'s merge
  * table — deserialized once per executor (lazy), probed per row inside
  * whole-stage codegen. No false negatives ever; false-positive rate is
  * the filter's configured `fpp` (the caller's contract to size).
  */
case class BloomProbeExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"bloom_probe needs a string column, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  /** Probe with the value's UTF-8 bytes — the representation
    * `BloomFilter.putBinary`/`mightContainBinary` hash, so build and probe
    * agree for any string content.
    */
  def probe(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomProbeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
}
