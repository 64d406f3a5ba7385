package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SURT host normalization beyond pure string rules — the host families
  * whose published-index keys a byte-level canonicalizer cannot
  * reproduce:
  *
  *   - INTERNATIONALIZED hosts fold to punycode (`münchen.example` →
  *     `xn--mnchen-3ya.example`) — the registry form the published index
  *     keys by; an IDN host keyed verbatim would join NOTHING against it.
  *     `java.net.IDN.toASCII` with `ALLOW_UNASSIGNED`, result lowercased;
  *     a host the encoder rejects (empty label, oversize label) passes
  *     through unchanged — a key must never vanish because its host is
  *     garbage.
  *   - IPv4 hosts normalize to canonical dotted-quad under the WHATWG URL
  *     spec's IPv4 parser (the `inet_aton` convention browsers — and so
  *     crawled link graphs — resolve by): 1–4 dot-separated numeric
  *     parts, each `0x…` hex, `0…` (two or more digits) octal, else
  *     decimal; every part but the last an octet, the LAST part filling
  *     the remaining bytes (`0x7f.1` → `127.0.0.1`; `3232235777` →
  *     `192.168.1.1`; `017700000001` → `127.0.0.1`; `192.168.001.010` →
  *     `192.168.1.8` — the leading-zero parts are octal, exactly as
  *     `inet_aton` reads them). Out-of-range spellings (`999.1.1.1`,
  *     five parts, > 2^32) are not IPs per the same parser and pass
  *     through unchanged.
  *   - BRACKETED IPv6 hosts canonicalize per RFC 5952 (lowercase hex, no
  *     leading zeros, the longest ≥2-word zero run — leftmost on ties —
  *     compressed to `::`), keeping the brackets: `[2001:0DB8:0:0:0:0:2:1]`
  *     → `[2001:db8::2:1]`. A v4-mapped tail is parsed (`[::ffff:1.2.3.4]`)
  *     but rendered in pure hex groups (`[::ffff:102:304]`) — ONE
  *     canonical spelling per address beats the RFC's aesthetic
  *     preference for mixed notation, and is documented here as this
  *     library's convention. Zone ids (`%eth0`) and malformed literals
  *     pass through unchanged.
  *
  * Plain ASCII non-IP hosts — the overwhelming majority — take a
  * zero-allocation fast path (one byte scan, input returned as-is).
  */
object SurtHostNorm {

  def normalize(h: UTF8String): UTF8String = {
    if (h == null) return null
    val n = h.numBytes()
    if (n == 0) return h
    // fast-path scan: a host that could be an IPv4 spelling STARTS with a
    // digit (every valid part form — decimal, 0-octal, 0x-hex — does) and
    // contains only [0-9a-fx.] bytes; IPv6 literals start with '['.
    // Anything else ASCII is returned as-is untouched (letter-led
    // hex-alphabet domains like cafe.be never leave the fast path).
    val bracket = h.getByte(0) == '['
    var i = 0
    var ascii = true
    var ipish = h.getByte(0) >= '0' && h.getByte(0) <= '9'
    while (i < n && (ascii || ipish)) {
      val b = h.getByte(i) & 0xff
      if (b >= 0x80) ascii = false
      if (!((b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') ||
          b == 'x' || b == '.')) ipish = false
      i += 1
    }
    if (ascii && !ipish && !bracket) h
    else {
      val s = h.toString
      val out = normalizeString(s)
      if (out eq s) h else UTF8String.fromString(out)
    }
  }

  def normalizeString(h: String): String = {
    if (h == null || h.isEmpty) return h
    if (h.charAt(0) == '[') {
      return if (h.length > 2 && h.charAt(h.length - 1) == ']')
        ipv6Normalize(h.substring(1, h.length - 1)
          .toLowerCase(java.util.Locale.ROOT))
          .map("[" + _ + "]").getOrElse(h)
      else h
    }
    val folded =
      if (h.forall(_ < 0x80)) h
      else
        try java.net.IDN.toASCII(h, java.net.IDN.ALLOW_UNASSIGNED)
          .toLowerCase(java.util.Locale.ROOT)
        catch { case _: IllegalArgumentException => h }
    ipv4Normalize(folded).getOrElse(folded)
  }

  /** Canonical dotted-quad per the WHATWG IPv4 parser; None = not an IPv4
    * (or not one that parser accepts — such hosts pass through).
    */
  private def ipv4Normalize(h: String): Option[String] = {
    if (h.isEmpty || h.charAt(0) < '0' || h.charAt(0) > '9' ||
        !h.forall(c => (c >= '0' && c <= '9') ||
          (c >= 'a' && c <= 'f') || c == 'x' || c == '.'))
      return None
    val parts = h.split("\\.", -1)
    if (parts.length > 4 || parts.exists(_.isEmpty)) return None
    var i = 0
    val vals = new Array[Long](parts.length)
    while (i < parts.length) {
      val p = parts(i)
      val v: Long =
        if (p.startsWith("0x")) {
          // "0x" alone is value 0 per the spec
          val d = p.substring(2).dropWhile(_ == '0')
          if (d.length > 8 ||
              !d.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
            return None
          if (d.isEmpty) 0L else java.lang.Long.parseLong(d, 16)
        } else if (p.length > 1 && p.charAt(0) == '0') {
          val d = p.dropWhile(_ == '0')
          if (d.length > 11 || !d.forall(c => c >= '0' && c <= '7'))
            return None
          if (d.isEmpty) 0L else java.lang.Long.parseLong(d, 8)
        } else {
          if (p.length > 10 || !p.forall(c => c >= '0' && c <= '9'))
            return None
          java.lang.Long.parseLong(p)
        }
      vals(i) = v
      i += 1
    }
    val n = vals.length
    i = 0
    while (i < n - 1) {
      if (vals(i) > 255L) return None
      i += 1
    }
    if (vals(n - 1) >= (1L << (8 * (5 - n)))) return None
    var v = vals(n - 1)
    i = 0
    while (i < n - 1) { v |= vals(i) << (8 * (3 - i)); i += 1 }
    Some(s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}")
  }

  /** RFC 5952 canonical form of an (unbracketed, lowercased) IPv6
    * literal; None = not a literal this parser accepts.
    */
  private def ipv6Normalize(s: String): Option[String] =
    parseIpv6(s).map(formatIpv6)

  /** Parse to 8 16-bit words: at most one `::`, 1–4 lowercase hex digits
    * per group, an optional strict dotted-quad (decimal octets) as the
    * final group. Returns None on anything else.
    */
  private def parseIpv6(s: String): Option[Array[Int]] = {
    if (s.isEmpty) return None
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return None
    def side(part: String, allowV4: Boolean): Option[Array[Int]] = {
      if (part.isEmpty) return Some(Array.emptyIntArray)
      val gs = part.split(":", -1)
      if (gs.exists(_.isEmpty)) return None
      val buf = new scala.collection.mutable.ArrayBuffer[Int](8)
      var i = 0
      while (i < gs.length) {
        val g = gs(i)
        if (g.indexOf('.') >= 0) {
          if (!allowV4 || i != gs.length - 1) return None
          val ps = g.split("\\.", -1)
          if (ps.length != 4 || ps.exists(p => p.isEmpty || p.length > 3 ||
              !p.forall(c => c >= '0' && c <= '9'))) return None
          val os = ps.map(Integer.parseInt)
          if (os.exists(_ > 255)) return None
          buf += ((os(0) << 8) | os(1))
          buf += ((os(2) << 8) | os(3))
        } else {
          if (g.length > 4 ||
              !g.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
            return None
          buf += Integer.parseInt(g, 16)
        }
        i += 1
      }
      Some(buf.toArray)
    }
    if (dc < 0) {
      side(s, allowV4 = true).filter(_.length == 8)
    } else {
      for {
        l <- side(s.substring(0, dc), allowV4 = false)
        r <- side(s.substring(dc + 2), allowV4 = true)
        if l.length + r.length <= 7
      } yield l ++ new Array[Int](8 - l.length - r.length) ++ r
    }
  }

  /** RFC 5952 render: lowercase hex, no leading zeros, longest ≥2-word
    * zero run (leftmost wins) as `::`.
    */
  private def formatIpv6(w: Array[Int]): String = {
    var bestStart = -1
    var bestLen = 0
    var curStart = -1
    var curLen = 0
    var i = 0
    while (i < 8) {
      if (w(i) == 0) {
        if (curStart < 0) curStart = i
        curLen += 1
        if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
      } else { curStart = -1; curLen = 0 }
      i += 1
    }
    if (bestLen < 2) bestStart = -1
    val sb = new java.lang.StringBuilder(39)
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::")
        i += bestLen
      } else {
        if (sb.length() > 0 && sb.charAt(sb.length() - 1) != ':')
          sb.append(':')
        sb.append(java.lang.Integer.toHexString(w(i)))
        i += 1
      }
    }
    sb.toString
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
