package graft.ops.expr

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_ratio(text)` — compressed size over raw size under DEFLATE
  * (zlib level 6, default strategy): the classic cheap entropy proxy for
  * corpus quality. Machine-repeated boilerplate compresses to a tiny
  * fraction of its size; natural prose sits in a stable band; random or
  * encrypted bytes approach (or exceed) 1.0 — so a low-ratio filter
  * catches the repetitive junk that n-gram rules miss (long-period
  * repetition, templated spam) in one map-only pass.
  *
  * Determinism: `java.util.zip.Deflater` with a fixed level and strategy
  * is deterministic for a given input on a given JVM — the value is
  * partition-order independent (pure per-row). Cross-engine replay is NOT
  * possible (no SQL engine exposes zlib), so the gate pins the signal on
  * planted fixtures with wide margins (repetitive ≪ threshold ≪ random)
  * rather than exact values — robust to zlib version drift.
  *
  * Ratio = deflated bytes / UTF-8 input bytes; empty input → 1.0 (no
  * evidence of redundancy). One Deflater per call: the object is cheap
  * relative to the compression itself and thread-safety beats pooling.
  */
object EntropyKernels {

  def deflateRatio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / bytes.length
    } finally d.end()
  }
}

case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"text must be STRING, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    EntropyKernels.deflateRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.EntropyKernels.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}
