package graft.ops.expr

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge

/** Static kernel for [[UnicodeNormalize]]: `java.text.Normalizer` with a
  * fast-path skip — `isNormalized` is a cheap scan (quick-check properties)
  * and the overwhelming majority of real text is already NFC, so the
  * common case does no allocation at all.
  */
object UnicodeNormKernel {
  def normalize(s: UTF8String, formOrdinal: Int): UTF8String = {
    val form = Normalizer.Form.values()(formOrdinal)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val formOrdinal: Int = {
    val f = Normalizer.Form.values().find(_.name == form)
    require(f.isDefined,
      s"unicode_normalize: form must be one of NFC/NFD/NFKC/NFKD, got $form")
    f.get.ordinal()
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"unicode_normalize needs string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormKernel.normalize(input.asInstanceOf[UTF8String], formOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.expr.UnicodeNormKernel.normalize($c, $formOrdinal)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormExprs {
  def normalizeUnicode(text: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), form))
}
