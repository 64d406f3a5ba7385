package graft.ops.expr

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Charset-aware decoding of crawl payload bytes to text — the front-door
  * step between a WARC archive and every downstream text operator. Real
  * CommonCrawl HTML is ~10% legacy-encoded (cp1252 / latin-1 / shift-jis
  * / gbk …); decoding everything as UTF-8 silently mojibakes that tail.
  *
  * Charset resolution follows the published WHATWG Encoding sniffing
  * precedence (https://encoding.spec.whatwg.org/#decode — a BOM wins over
  * ALL other labels) restricted to what a batch pipeline can know:
  *
  *   1. BOM: `EF BB BF` → UTF-8, `FF FE` → UTF-16LE, `FE FF` → UTF-16BE
  *      (the BOM bytes are not part of the document and are stripped).
  *   2. The HTTP `Content-Type` header's `charset=` parameter.
  *   3. An HTML meta declaration sniffed from the first 1024 bytes
  *      (`<meta charset=X>` or the http-equiv `content="…; charset=X"`
  *      form — the WHATWG prescan window).
  *   4. UTF-8.
  *
  * Unknown/unsupported labels fall through to the next step; malformed
  * byte sequences decode to U+FFFD (REPLACE — never throw on crawl
  * garbage); a decoded leading U+FEFF is dropped. The kernel DETECTS and
  * DECODES; repairing text that was already mojibaked upstream (bytes
  * double-encoded before they reached the archive) is the downstream
  * [[FixEncodingExpr]]'s job — composing it automatically would rewrite
  * legitimate "Ã©"-containing text, so that repair stays opt-in.
  */
object CharsetText {

  /** Number of leading bytes scanned for a meta charset declaration (the
    * WHATWG prescan window).
    */
  val MetaScanWindow = 1024

  private def charsetOrNull(label: String): Charset = {
    val t = label.trim
    if (t.isEmpty) null
    else
      try Charset.forName(t)
      catch { case _: Exception => null }
  }

  /** `charset=` parameter of a Content-Type value, or null. */
  private[expr] def headerCharset(contentType: String): Charset = {
    if (contentType == null) return null
    val lc = contentType.toLowerCase(java.util.Locale.ROOT)
    val at = lc.indexOf("charset=")
    if (at < 0) return null
    var s = at + "charset=".length
    var e = s
    val n = contentType.length
    if (s < n && (contentType.charAt(s) == '"' || contentType.charAt(s) == '\'')) {
      val q = contentType.charAt(s)
      s += 1
      e = s
      while (e < n && contentType.charAt(e) != q) e += 1
    } else {
      while (e < n && !";, \t".contains(contentType.charAt(e))) e += 1
    }
    charsetOrNull(contentType.substring(s, e))
  }

  /** Sniff a meta-declared charset from the first [[MetaScanWindow]]
    * bytes, read as ISO-8859-1 (an ASCII superset — charset labels are
    * ASCII by construction). Finds both `<meta charset=X>` and the
    * http-equiv `content="text/html; charset=X"` spelling.
    */
  private[expr] def metaCharset(payload: Array[Byte]): Charset = {
    val win = new String(payload, 0, math.min(payload.length, MetaScanWindow),
      StandardCharsets.ISO_8859_1)
    val lc = win.toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (true) {
      val at = lc.indexOf("charset", from)
      if (at < 0) return null
      var s = at + "charset".length
      val n = win.length
      while (s < n && (win.charAt(s) == ' ' || win.charAt(s) == '\t')) s += 1
      if (s < n && win.charAt(s) == '=') {
        s += 1
        while (s < n && (win.charAt(s) == ' ' || win.charAt(s) == '\t')) s += 1
        var e = s
        if (s < n && (win.charAt(s) == '"' || win.charAt(s) == '\'')) {
          val q = win.charAt(s)
          s += 1
          e = s
          while (e < n && win.charAt(e) != q) e += 1
        } else {
          while (e < n && !";, \t\r\n\"'/>".contains(win.charAt(e))) e += 1
        }
        val cs = charsetOrNull(win.substring(s, e))
        if (cs != null) return cs
      }
      from = at + "charset".length
    }
    null // unreachable
  }

  private def decodeWith(payload: Array[Byte], off: Int, cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val out = dec.decode(java.nio.ByteBuffer.wrap(payload, off, payload.length - off))
      .toString
    if (out.nonEmpty && out.charAt(0) == '\uFEFF') out.substring(1) else out
  }

  /** Decode `payload` per the precedence above. Null payload → null
    * upstream (the expression handles it); null `contentType` just skips
    * step 2.
    */
  def decode(payload: Array[Byte], contentType: String): String = {
    val n = payload.length
    // 1. BOM
    if (n >= 3 && (payload(0) & 0xff) == 0xef && (payload(1) & 0xff) == 0xbb &&
        (payload(2) & 0xff) == 0xbf)
      return decodeWith(payload, 3, StandardCharsets.UTF_8)
    if (n >= 2 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xfe)
      return decodeWith(payload, 2, StandardCharsets.UTF_16LE)
    if (n >= 2 && (payload(0) & 0xff) == 0xfe && (payload(1) & 0xff) == 0xff)
      return decodeWith(payload, 2, StandardCharsets.UTF_16BE)
    // 2. header param
    val hc = headerCharset(contentType)
    if (hc != null) return decodeWith(payload, 0, hc)
    // 3. meta prescan
    val mc = metaCharset(payload)
    if (mc != null) return decodeWith(payload, 0, mc)
    // 4. UTF-8
    decodeWith(payload, 0, StandardCharsets.UTF_8)
  }
}

/** `payload_text(payload: binary, content_type: string)` — charset-aware
  * crawl-payload decode per [[CharsetText]]. Null payload → null; a null
  * content type only skips the header step (the BOM / meta / UTF-8 chain
  * still runs), so the standard null-propagating eval is overridden.
  */
case class PayloadTextExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"payload_text needs (payload binary, content_type string), got ($l, $r)")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "payload_text"

  override def eval(input: InternalRow): Any = {
    val p = left.eval(input)
    if (p == null) null
    else {
      val ct = right.eval(input)
      UTF8String.fromString(CharsetText.decode(
        p.asInstanceOf[Array[Byte]],
        if (ct == null) null else ct.asInstanceOf[UTF8String].toString))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull};
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${rightGen.code}
          ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
            graft.ops.expr.CharsetText$$.MODULE$$.decode(
              ${leftGen.value},
              ${rightGen.isNull} ? null : ${rightGen.value}.toString()));
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PayloadTextExpr =
    copy(left = newLeft, right = newRight)
}
