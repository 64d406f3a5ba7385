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
  *      form — the WHATWG prescan window), confined to actual `<meta>`
  *      tags: comments are skipped per `<!--…-->`, other tags are walked
  *      over quote-aware, and the http-equiv `content` spelling only
  *      counts when the SAME tag carries `http-equiv=content-type` (so a
  *      `<meta name=description content="charset=big5 …">` never wins).
  *      Two spec quirks apply here: a meta-declared UTF-16 is read as
  *      UTF-8 (the document self-describing as UTF-16 in ASCII-compatible
  *      bytes is lying about itself), and `x-user-defined` in a meta
  *      means windows-1252 (encoding.spec.whatwg.org/#prescan-a-byte-
  *      stream-to-determine-its-encoding, steps 2.c.8 / 2.c.9).
  *   4. UTF-8.
  *
  * LABELS resolve through the spec's label→encoding table
  * (encoding.spec.whatwg.org/#names-and-labels), NOT raw
  * `Charset.forName`: the load-bearing rows map the entire
  * `iso-8859-1` / `latin1` / `us-ascii` / `ascii` family to
  * **windows-1252** — the web's most common mislabel; pages so labeled
  * are overwhelmingly cp1252-authored, and a true latin-1 decode turns
  * their 0x80–0x9F punctuation (€, –, curly quotes) into invisible C1
  * controls. Same spec table: `iso-8859-9` family → windows-1254,
  * `tis-620`/`iso-8859-11` → windows-874, `gb2312` → GBK, `ks_c_5601` /
  * `euc-kr` → the full UHC (windows-949), and the escape-sequence
  * encodings (`iso-2022-kr`, `hz-gb-2312`, …) → the *replacement*
  * encoding, which decodes any non-empty payload to a single U+FFFD
  * (the spec's injection-attack firewall). A label not in the spec table
  * is a failure and falls through to the next sniffing step — exactly
  * the browser behavior crawl content was authored against; no
  * `Charset.forName` leniency (that is what produced the latin-1 bug).
  * Spec-table encodings the JDK cannot represent (iso-8859-10/14) also
  * fall through; `x-user-defined` decodes through the spec's own
  * byte→PUA mapping ([[CharsetText.XUserDefinedCharset]]) in the header
  * position and remaps to windows-1252 in the meta position (quirk).
  *
  * Unknown/unsupported labels fall through to the next step; malformed
  * byte sequences decode to U+FFFD (REPLACE — never throw on crawl
  * garbage); a decoded leading U+FEFF is dropped. The kernel DETECTS and
  * DECODES; repairing text that was already mojibaked upstream (bytes
  * double-encoded before they reached the archive) is the downstream
  * [[FixEncodingExpr]]'s job — composing it automatically would rewrite
  * legitimate "Ã©"-containing text, so that repair stays opt-in.
  *
  * JDK decoder approximations, documented: `shift_jis`-family labels use
  * the JDK `Shift_JIS` decoder, which lacks the NEC/IBM extension rows of
  * the WHATWG jis0208 index (those bytes decode to U+FFFD, never wrong
  * text); `big5` uses the JDK decoder without the HKSCS extension rows.
  */
object CharsetText {

  /** Number of leading bytes scanned for a meta charset declaration (the
    * WHATWG prescan window).
    */
  val MetaScanWindow = 1024

  /** Resolution outcome of a charset label. */
  private[expr] sealed trait Resolved
  private[expr] final case class Known(cs: Charset) extends Resolved
  /** The spec's *replacement* encoding: non-empty input → one U+FFFD. */
  private[expr] case object ReplacementEnc extends Resolved
  /** `x-user-defined`: decoded by [[XUserDefinedCharset]] in the header
    * position; the meta prescan quirk remaps it to windows-1252 (spec
    * step 2.c.8 — a page self-describing as byte-opaque is, in the meta
    * position, overwhelmingly a mislabeled cp1252 page).
    */
  private[expr] case object UserDefinedLabel extends Resolved

  /** The spec's `x-user-defined` single-byte encoding
    * (encoding.spec.whatwg.org/#x-user-defined): ASCII maps through,
    * bytes 0x80–0xFF map to the Private Use Area at U+F780 + (byte −
    * 0x80) — a reversible byte-preserving decode for content that labels
    * itself byte-opaque (legacy font-hack pages). The JDK has no such
    * charset, so this is a minimal decode-only implementation.
    */
  private[expr] object XUserDefinedCharset
      extends Charset("x-graft-user-defined", Array.empty[String]) {
    override def contains(cs: Charset): Boolean = cs eq this
    override def newEncoder(): java.nio.charset.CharsetEncoder =
      throw new UnsupportedOperationException(
        "x-user-defined is decode-only here")
    override def newDecoder(): java.nio.charset.CharsetDecoder =
      new java.nio.charset.CharsetDecoder(this, 1.0f, 1.0f) {
        override def decodeLoop(
            in: java.nio.ByteBuffer,
            out: java.nio.CharBuffer): java.nio.charset.CoderResult = {
          while (in.hasRemaining) {
            if (!out.hasRemaining) return java.nio.charset.CoderResult.OVERFLOW
            val b = in.get() & 0xff
            out.put(if (b < 0x80) b.toChar else (0xF780 + (b - 0x80)).toChar)
          }
          java.nio.charset.CoderResult.UNDERFLOW
        }
      }
  }

  /** The WHATWG label table (encoding.spec.whatwg.org/#names-and-labels),
    * keyed by the spec's lowercased label, valued by the JDK charset name
    * (or a marker handled by [[resolveLabel]]). Built once, ~220 entries.
    */
  private val LabelTable: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](512)
    def put(jdkName: String, labels: String*): Unit =
      labels.foreach(l => m.put(l, jdkName))
    put("UTF-8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8",
      "utf-8", "utf8", "x-unicode20utf8")
    put("IBM866", "866", "cp866", "csibm866", "ibm866")
    put("ISO-8859-2", "csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2",
      "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2", "latin2")
    put("ISO-8859-3", "csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3",
      "iso88593", "iso_8859-3", "iso_8859-3:1988", "l3", "latin3")
    put("ISO-8859-4", "csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4",
      "iso88594", "iso_8859-4", "iso_8859-4:1988", "l4", "latin4")
    put("ISO-8859-5", "csisolatincyrillic", "cyrillic", "iso-8859-5",
      "iso-ir-144", "iso8859-5", "iso88595", "iso_8859-5", "iso_8859-5:1988")
    put("ISO-8859-6", "arabic", "asmo-708", "csiso88596e", "csiso88596i",
      "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-8859-6-e",
      "iso-8859-6-i", "iso-ir-127", "iso8859-6", "iso88596", "iso_8859-6",
      "iso_8859-6:1987")
    put("ISO-8859-7", "csisolatingreek", "ecma-118", "elot_928", "greek",
      "greek8", "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597",
      "iso_8859-7", "iso_8859-7:1987", "sun_eu_greek")
    // the -I (logical order) variant shares the byte mapping; the I is
    // directionality metadata a byte decoder cannot act on
    put("ISO-8859-8", "csiso88598e", "csisolatinhebrew", "hebrew",
      "iso-8859-8", "iso-8859-8-e", "iso-ir-138", "iso8859-8", "iso88598",
      "iso_8859-8", "iso_8859-8:1988", "visual",
      "csiso88598i", "iso-8859-8-i", "logical")
    // iso-8859-10 / -14: in the spec table, absent from the JDK — resolve
    // to the spec name so the miss is an explicit unsupported-fallthrough
    put("ISO-8859-10", "csisolatin6", "iso-8859-10", "iso-ir-157",
      "iso8859-10", "iso885910", "l6", "latin6")
    put("ISO-8859-13", "iso-8859-13", "iso8859-13", "iso885913")
    put("ISO-8859-14", "iso-8859-14", "iso8859-14", "iso885914",
      "iso-celtic")
    put("ISO-8859-15", "csisolatin9", "iso-8859-15", "iso8859-15",
      "iso885915", "iso_8859-15", "l9")
    put("ISO-8859-16", "iso-8859-16")
    put("KOI8-R", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r")
    put("KOI8-U", "koi8-ru", "koi8-u")
    put("x-MacRoman", "csmacintosh", "mac", "macintosh", "x-mac-roman")
    put("x-MacCyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
    put("x-windows-874", "dos-874", "iso-8859-11", "iso8859-11",
      "iso885911", "tis-620", "windows-874")
    put("windows-1250", "cp1250", "windows-1250", "x-cp1250")
    put("windows-1251", "cp1251", "windows-1251", "x-cp1251")
    // THE load-bearing family: latin-1/ascii labels mean cp1252 on the web
    put("windows-1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819",
      "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1",
      "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1", "latin1",
      "us-ascii", "windows-1252", "x-cp1252")
    put("windows-1253", "cp1253", "windows-1253", "x-cp1253")
    put("windows-1254", "cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148",
      "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5",
      "latin5", "windows-1254", "x-cp1254")
    put("windows-1255", "cp1255", "windows-1255", "x-cp1255")
    put("windows-1256", "cp1256", "windows-1256", "x-cp1256")
    put("windows-1257", "cp1257", "windows-1257", "x-cp1257")
    put("windows-1258", "cp1258", "windows-1258", "x-cp1258")
    put("GBK", "chinese", "csgb2312", "csiso58gb231280", "gb2312",
      "gb_2312", "gb_2312-80", "gbk", "iso-ir-58", "x-gbk")
    put("GB18030", "gb18030")
    put("Big5", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
    put("EUC-JP", "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp")
    put("ISO-2022-JP", "csiso2022jp", "iso-2022-jp")
    put("Shift_JIS", "csshiftjis", "ms932", "ms_kanji", "shift-jis",
      "shift_jis", "sjis", "windows-31j", "x-sjis")
    // spec euc-kr is the full UHC repertoire — the JDK's MS949 decoder
    put("x-windows-949", "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149",
      "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601",
      "windows-949")
    put("UTF-16BE", "unicodefffe", "utf-16be")
    put("UTF-16LE", "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
      "unicodefeff", "utf-16", "utf-16le")
    // escape-sequence encodings the spec neutralizes (injection firewall)
    put("!replacement", "csiso2022kr", "hz-gb-2312", "iso-2022-cn",
      "iso-2022-cn-ext", "iso-2022-kr", "replacement")
    put("!x-user-defined", "x-user-defined")
    m
  }

  /** Resolve a raw label per the spec's "get an encoding": strip ASCII
    * whitespace, lowercase, table lookup. Returns null on a label outside
    * the table (spec: failure) or one the JDK cannot represent.
    */
  private[expr] def resolveLabel(label: String): Resolved = {
    if (label == null) return null
    val t = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty) return null
    LabelTable.get(t) match {
      case null => null
      case "!replacement" => ReplacementEnc
      case "!x-user-defined" => UserDefinedLabel
      case name =>
        try Known(Charset.forName(name))
        catch { case _: Exception => null } // JDK-absent spec encoding
    }
  }

  /** `charset=` parameter of a Content-Type value, resolved, or null.
    * Search and slicing both run on one lowercased copy (labels are
    * case-insensitive by spec), so lowercase expansion (e.g. U+0130 → two
    * chars) can never misalign indices — crawl headers are adversarial.
    */
  private[expr] def headerCharset(contentType: String): Resolved = {
    if (contentType == null) return null
    val lc = contentType.toLowerCase(java.util.Locale.ROOT)
    val at = lc.indexOf("charset=")
    if (at < 0) return null
    var s = at + "charset=".length
    var e = s
    val n = lc.length
    if (s < n && (lc.charAt(s) == '"' || lc.charAt(s) == '\'')) {
      val q = lc.charAt(s)
      s += 1
      e = s
      while (e < n && lc.charAt(e) != q) e += 1
    } else {
      while (e < n && !";, \t".contains(lc.charAt(e))) e += 1
    }
    resolveLabel(lc.substring(s, e)) match {
      // a header-declared UTF-16 label is honored as the encoding it names
      // (the header is out-of-band — the meta UTF-16→UTF-8 quirk does not
      // apply); the BOM check already ran and outranks it
      case UserDefinedLabel => Known(XUserDefinedCharset)
      case r => r
    }
  }

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Position just past the '>' closing the tag whose body starts at
    * `from`, quote-aware in ATTRIBUTE-VALUE POSITION ONLY — per the spec's
    * get-an-attribute rules a quote opens a span only when it immediately
    * follows '=' (plus optional whitespace); a stray apostrophe elsewhere
    * in the tag (`<a title=don't>`) is a plain character, NOT a span
    * opener that would swallow the rest of the window and hide a real
    * `<meta charset>` after it. `n` if unterminated.
    */
  private def tagEnd(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '=') {
        i += 1
        while (i < n && isAsciiWs(s.charAt(i))) i += 1
        if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
          val q = s.charAt(i)
          i += 1
          while (i < n && s.charAt(i) != q) i += 1
          if (i < n) i += 1
        }
      } else if (c == '>') return i + 1
      else i += 1
    }
    n
  }

  /** "Get an encoding from a meta element" (the spec's extraction from a
    * `content` attribute value): find `charset`, optional whitespace, '=',
    * the value possibly quoted. Input is already lowercased.
    */
  private def charsetFromContentValue(v: String): String = {
    var from = 0
    val n = v.length
    while (true) {
      val at = v.indexOf("charset", from)
      if (at < 0) return null
      var s = at + "charset".length
      while (s < n && isAsciiWs(v.charAt(s))) s += 1
      if (s < n && v.charAt(s) == '=') {
        s += 1
        while (s < n && isAsciiWs(v.charAt(s))) s += 1
        var e = s
        if (s < n && (v.charAt(s) == '"' || v.charAt(s) == '\'')) {
          val q = v.charAt(s)
          s += 1
          e = s
          while (e < n && v.charAt(e) != q) e += 1
        } else {
          while (e < n && v.charAt(e) != ';' && !isAsciiWs(v.charAt(e))) e += 1
        }
        return v.substring(s, e)
      }
      from = at + "charset".length
    }
    null // unreachable
  }

  /** Prescan the first [[MetaScanWindow]] bytes for a meta-declared
    * charset per the WHATWG prescan: only actual `<meta>` tags count,
    * comments skip to `-->`, every other tag is walked over quote-aware
    * (so `charset=` in body text, scripts, or another tag's attribute
    * never wins), and the http-equiv `content` spelling needs
    * `http-equiv=content-type` on the same tag. The window is read as
    * ISO-8859-1 (an ASCII superset — labels are ASCII) and lowercased
    * once; latin-1 chars lowercase 1:1, so indices stay aligned.
    */
  private[expr] def metaCharset(payload: Array[Byte]): Resolved = {
    val win = new String(payload, 0, math.min(payload.length, MetaScanWindow),
      StandardCharsets.ISO_8859_1).toLowerCase(java.util.Locale.ROOT)
    val n = win.length
    var i = 0
    while (i < n) {
      if (win.charAt(i) != '<') i += 1
      else if (win.startsWith("<!--", i)) {
        // search from i+2: the spec lets the opening "--" double as the
        // closer, so "<!-->" and "<!--->" are complete (empty) comments —
        // starting past them would miss the overlap and abort the prescan
        val e = win.indexOf("-->", i + 2)
        if (e < 0) return null
        i = e + 3
      } else if (win.startsWith("<meta", i) && i + 5 < n &&
          (isAsciiWs(win.charAt(i + 5)) || win.charAt(i + 5) == '/')) {
        val end = tagEnd(win, i + 5)
        val r = metaTagCharset(win, i + 5, math.min(end, n))
        if (r != null) return r
        i = end
      } else if (i + 1 < n &&
          (isAsciiLetter(win.charAt(i + 1)) || win.charAt(i + 1) == '/')) {
        i = tagEnd(win, i + 1) // any other open/close tag: skip, quote-aware
      } else if (i + 1 < n && (win.charAt(i + 1) == '!' || win.charAt(i + 1) == '?')) {
        val e = win.indexOf('>', i)
        if (e < 0) return null
        i = e + 1
      } else i += 1
    }
    null
  }

  /** Attribute walk of one `<meta>` tag body `s[from, end)` (lowercased):
    * `charset=X` wins outright; `content="…charset=X…"` wins only with
    * `http-equiv=content-type` on the same tag. Duplicate attribute names
    * keep the first occurrence (spec). Meta-declared UTF-16 reads as
    * UTF-8; meta `x-user-defined` reads as windows-1252 (spec quirks).
    */
  private def metaTagCharset(s: String, from: Int, end: Int): Resolved = {
    var i = from
    var gotPragma = false
    var charsetAttr: String = null
    var contentCharset: String = null
    var seenHttpEquiv = false
    var seenContent = false
    while (i < end) {
      // skip whitespace and stray '/'
      while (i < end && (isAsciiWs(s.charAt(i)) || s.charAt(i) == '/')) i += 1
      if (i >= end || s.charAt(i) == '>') {
        i = end
      } else {
        // attribute name
        val ns = i
        while (i < end && s.charAt(i) != '=' && s.charAt(i) != '>' &&
          !isAsciiWs(s.charAt(i)) && s.charAt(i) != '/') i += 1
        val name = s.substring(ns, i)
        while (i < end && isAsciiWs(s.charAt(i))) i += 1
        var value = ""
        if (i < end && s.charAt(i) == '=') {
          i += 1
          while (i < end && isAsciiWs(s.charAt(i))) i += 1
          if (i < end && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            i += 1
            val vs = i
            while (i < end && s.charAt(i) != q) i += 1
            value = s.substring(vs, i)
            if (i < end) i += 1
          } else {
            val vs = i
            while (i < end && !isAsciiWs(s.charAt(i)) && s.charAt(i) != '>') i += 1
            value = s.substring(vs, i)
          }
        }
        name match {
          case "http-equiv" if !seenHttpEquiv =>
            seenHttpEquiv = true
            if (value.trim == "content-type") gotPragma = true
          case "content" if !seenContent =>
            seenContent = true
            contentCharset = charsetFromContentValue(value)
          case "charset" if charsetAttr == null =>
            charsetAttr = value
          case _ =>
        }
      }
    }
    val label = if (charsetAttr != null) charsetAttr
      else if (contentCharset != null && gotPragma) contentCharset
      else null
    if (label == null) return null
    resolveLabel(label) match {
      case Known(cs) if cs == StandardCharsets.UTF_16LE ||
          cs == StandardCharsets.UTF_16BE =>
        Known(StandardCharsets.UTF_8) // spec step 2.c.9: a document that
      // self-describes as UTF-16 in ASCII-compatible bytes is lying
      case UserDefinedLabel => // spec step 2.c.8
        try Known(Charset.forName("windows-1252"))
        catch { case _: Exception => null }
      case r => r
    }
  }

  private def decodeWith(payload: Array[Byte], off: Int, cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val out = dec.decode(java.nio.ByteBuffer.wrap(payload, off, payload.length - off))
      .toString
    if (out.nonEmpty && out.charAt(0) == '\uFEFF') out.substring(1) else out
  }

  private def decodeResolved(payload: Array[Byte], r: Resolved): String =
    r match {
      case Known(cs) => decodeWith(payload, 0, cs)
      case ReplacementEnc => if (payload.length == 0) "" else "\uFFFD"
      case _ => null
    }

  /** The charset NAME the precedence above would decode with — what a
    * capture index's `charset` field carries (the cc-index populates it so
    * consumers can filter before fetching). Returns the winning step's
    * canonical JDK charset name ("UTF-8", "windows-1252", "GBK", …);
    * "replacement" for the spec's replacement encoding; "x-user-defined"
    * for a header-position x-user-defined label; "UTF-8" for the step-4
    * fallback. Same resolution path as [[decode]] — the name names what
    * the decode would actually do, not the raw label the page claimed.
    */
  def detectedName(payload: Array[Byte], contentType: String): String = {
    val n = payload.length
    if (n >= 3 && (payload(0) & 0xff) == 0xef && (payload(1) & 0xff) == 0xbb &&
        (payload(2) & 0xff) == 0xbf) return "UTF-8"
    if (n >= 2 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xfe)
      return "UTF-16LE"
    if (n >= 2 && (payload(0) & 0xff) == 0xfe && (payload(1) & 0xff) == 0xff)
      return "UTF-16BE"
    headerCharset(contentType) match {
      case Known(cs) =>
        return if (cs eq XUserDefinedCharset) "x-user-defined" else cs.name()
      case ReplacementEnc => return "replacement"
      case _ => ()
    }
    metaCharset(payload) match {
      case Known(cs) => return cs.name()
      case ReplacementEnc => return "replacement"
      case _ => ()
    }
    "UTF-8"
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
    val hd = decodeResolved(payload, headerCharset(contentType))
    if (hd != null) return hd
    // 3. meta prescan
    val md = decodeResolved(payload, metaCharset(payload))
    if (md != null) return md
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
