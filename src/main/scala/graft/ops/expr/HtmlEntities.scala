package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Numeric character references (`&#8217;` decimal, `&#x2019;` hex) decoded
  * to their codepoints — the forms real crawl text is full of (curly
  * quotes, dashes, ©/®) that a named-entity table can never cover. One
  * linear scan per row inside whole-stage codegen; no regex backtracking.
  *
  * Rules (lenient-lexical, matching the strip chain's conventions):
  *   - `&#` + digits + `;` / `&#x|X` + hex digits + `;` only — no
  *     semicolon, no digits, or >8 digits → left as literal text;
  *   - valid Unicode scalar values only (1..0x10FFFF, surrogates
  *     excluded) — out-of-range refs stay literal;
  *   - codepoint 38 (`&#38;`/`&#x26;`) is deliberately NOT decoded here:
  *     [[graft.ops.WebText.stripHtml]] decodes every ampersand form in its
  *     LAST step, preserving the decode-once discipline
  *     (`&amp;#8217;` → the literal `&#8217;`, never `'`).
  */
case class NumericCharRefDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"numeric_charref_decode needs a string column, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "numeric_charref_decode"

  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = str.indexOf("&#")
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(str.length)
    var from = 0
    while (i >= 0) {
      sb.append(str, from, i)
      var j = i + 2
      val hex = j < str.length && (str.charAt(j) == 'x' || str.charAt(j) == 'X')
      if (hex) j += 1
      val digits0 = j
      var cp = 0L
      var ok = true
      while (ok && j < str.length && j - digits0 < 9 && isDigit(str.charAt(j), hex)) {
        cp = cp * (if (hex) 16 else 10) + digitVal(str.charAt(j))
        j += 1
      }
      ok = j > digits0 && j - digits0 <= 8 && j < str.length && str.charAt(j) == ';' &&
        cp >= 1 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF) && cp != 38
      if (ok) {
        sb.appendCodePoint(cp.toInt)
        from = j + 1
      } else {
        sb.append("&#")
        from = i + 2
      }
      i = str.indexOf("&#", from)
    }
    sb.append(str, from, str.length)
    UTF8String.fromString(sb.toString)
  }

  @inline private def isDigit(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
      (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))

  @inline private def digitVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c <= 'F') c - 'A' + 10
    else c - 'a' + 10

  override protected def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charrefExpr", this, classOf[NumericCharRefDecode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.decode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NumericCharRefDecode =
    copy(child = newChild)
}
