package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SURT host normalization beyond pure string rules — the two host
  * families whose published-index keys a byte-level canonicalizer cannot
  * reproduce (closing the r14 scope-out at Cdx.surt):
  *
  *   - INTERNATIONALIZED hosts fold to punycode (`münchen.example` →
  *     `xn--mnchen-3ya.example`) — the registry form the published index
  *     keys by; an IDN host keyed verbatim would join NOTHING against it.
  *     `java.net.IDN.toASCII` with `ALLOW_UNASSIGNED`, result lowercased;
  *     a host the encoder rejects (empty label, oversize label) passes
  *     through unchanged — a key must never vanish because its host is
  *     garbage.
  *   - IP-ADDRESS hosts normalize to canonical dotted-quad: a pure
  *     decimal host (`3232235777`) renders as its IPv4
  *     (`192.168.1.1` — browsers accept the integer form, so crawls
  *     contain it), and dotted-decimal octets drop leading zeros
  *     (`192.168.001.010` → `192.168.1.10`). DECIMAL interpretation
  *     throughout, matching the surt library's `attemptIPFormats`;
  *     octal/hex component spellings and IPv6 are documented non-goals.
  *     Out-of-range spellings (`999.1.1.1`, five parts, > 2^32) pass
  *     through unchanged.
  *
  * Plain ASCII non-IP hosts — the overwhelming majority — take a
  * zero-allocation fast path (one byte scan, input returned as-is).
  */
object SurtHostNorm {

  def normalize(h: UTF8String): UTF8String = {
    if (h == null) return null
    val n = h.numBytes()
    var i = 0
    var ascii = true
    var ipish = n > 0
    while (i < n && (ascii || ipish)) {
      val b = h.getByte(i) & 0xff
      if (b >= 0x80) ascii = false
      if (!((b >= '0' && b <= '9') || b == '.')) ipish = false
      i += 1
    }
    if (ascii && !ipish) h
    else {
      val s = h.toString
      val out = normalizeString(s)
      if (out eq s) h else UTF8String.fromString(out)
    }
  }

  def normalizeString(h: String): String = {
    if (h == null || h.isEmpty) return h
    val folded =
      if (h.forall(_ < 0x80)) h
      else
        try java.net.IDN.toASCII(h, java.net.IDN.ALLOW_UNASSIGNED)
          .toLowerCase(java.util.Locale.ROOT)
        catch { case _: IllegalArgumentException => h }
    ipNormalize(folded).getOrElse(folded)
  }

  /** Canonical dotted-quad for decimal IP spellings; None = not an IP
    * (or not one this normalizer claims).
    */
  private def ipNormalize(h: String): Option[String] = {
    if (h.isEmpty || !h.forall(c => (c >= '0' && c <= '9') || c == '.'))
      None
    else if (h.indexOf('.') < 0) {
      // pure decimal 32-bit address (length-capped before parseLong so a
      // 100-digit host cannot overflow into a NumberFormatException path
      // carrying the whole string)
      if (h.length > 10) None
      else {
        val v = java.lang.Long.parseLong(h)
        if (v <= 0xffffffffL)
          Some(s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}")
        else None
      }
    } else {
      val parts = h.split("\\.", -1)
      if (parts.length != 4 || parts.exists(p => p.isEmpty || p.length > 3))
        None
      else {
        val vals = parts.map(java.lang.Integer.parseInt)
        if (vals.forall(_ <= 255)) Some(vals.mkString(".")) else None
      }
    }
  }
}

/** `surt_host_norm(host)` — [[SurtHostNorm.normalize]] as a codegen'd
  * unary expression (no UDF; one static call per row, identity fast path
  * for ASCII non-IP hosts).
  */
case class SurtHostNormExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"surt_host_norm needs a string column, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "surt_host_norm"
  override protected def nullSafeEval(input: Any): Any =
    SurtHostNorm.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.SurtHostNorm.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): SurtHostNormExpr =
    copy(child = newChild)
}
