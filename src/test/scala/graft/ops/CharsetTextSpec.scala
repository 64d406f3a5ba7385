package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase
import graft.ops.expr.CharsetText

/** Charset-aware payload decode (WHATWG sniffing precedence): BOM over
  * header over meta prescan over UTF-8, label parsing forms, REPLACE on
  * malformed bytes, and the column/null path.
  */
class CharsetTextSpec extends SparkTestBase {

  import spark.implicits._

  test("header charset param: bare, quoted, trailing params, unknown label") {
    def d(bytes: Array[Byte], ct: String) = CharsetText.decode(bytes, ct)
    val cp = "café €".getBytes("windows-1252")
    assert(d(cp, "text/html; charset=windows-1252") == "café €")
    assert(d(cp, "text/html; charset=\"windows-1252\"") == "café €")
    assert(d(cp, "text/html; CHARSET=Windows-1252; boundary=x") == "café €")
    // unknown label falls through to UTF-8 (no meta here): cp1252 é = 0xE9
    // is malformed UTF-8 → U+FFFD, never a throw
    assert(d(cp, "text/html; charset=x-nope").contains('�'))
    assert(d("ok".getBytes("UTF-8"), null) == "ok")
  }

  test("meta prescan: <meta charset=X> and http-equiv form, window-limited") {
    val sj = "<meta charset=shift_jis><p>日本</p>".getBytes("Shift_JIS")
    assert(CharsetText.decode(sj, "text/html") == "<meta charset=shift_jis><p>日本</p>")
    val he = ("<html><meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=windows-1252\">–").getBytes("windows-1252")
    assert(CharsetText.decode(he, null).endsWith("–"))
    // declaration outside the 1024-byte prescan window is not seen
    val far = (" " * 1100 + "<meta charset=shift_jis>日本").getBytes("Shift_JIS")
    assert(CharsetText.decode(far, "text/html").contains('�'))
  }

  test("WHATWG label table: latin-1/ascii family decodes as windows-1252") {
    // 0x80–0x9F bytes — €, curly quotes, en-dash — are C1 controls in
    // true latin-1; the spec maps the whole label family to cp1252
    val cp = "€ “quoted” – dash".getBytes("windows-1252")
    for (label <- Seq("iso-8859-1", "latin1", "us-ascii", "ascii",
        "ISO_8859-1:1987", "l1", "ansi_x3.4-1968", "cp819"))
      assert(CharsetText.decode(cp, s"text/html; charset=$label") ==
        "€ “quoted” – dash", s"label $label")
  }

  test("WHATWG label table: spec remaps beyond latin-1") {
    // iso-8859-9 family → windows-1254 (0x80-0x9F punctuation survives)
    val tr = "€ “tr” şğ".getBytes("windows-1254")
    assert(CharsetText.decode(tr, "text/html; charset=iso-8859-9") == "€ “tr” şğ")
    // gb2312 label → full GBK repertoire
    val gb = "你好€".getBytes("GBK")
    assert(CharsetText.decode(gb, "text/html; charset=gb2312") == "你好€")
    // euc-kr label → full UHC (windows-949)
    val kr = "한국어".getBytes("x-windows-949")
    assert(CharsetText.decode(kr, "text/html; charset=euc-kr") == "한국어")
    // tis-620 / iso-8859-11 → windows-874
    val th = "ไทย".getBytes("x-windows-874")
    assert(CharsetText.decode(th, "text/html; charset=tis-620") == "ไทย")
    // x-sjis / windows-31j aliases resolve to the shift_jis decoder
    val sj = "日本".getBytes("Shift_JIS")
    assert(CharsetText.decode(sj, "text/html; charset=x-sjis") == "日本")
  }

  test("replacement encoding: escape-sequence labels decode to one U+FFFD") {
    // the spec's injection firewall: iso-2022-kr / hz-gb-2312 / utf-7-era
    // escape encodings never decode content
    val payload = "<html>attack</html>".getBytes("UTF-8")
    for (label <- Seq("iso-2022-kr", "hz-gb-2312", "iso-2022-cn", "csiso2022kr"))
      assert(CharsetText.decode(payload, s"text/html; charset=$label") ==
        "�", s"label $label")
    assert(CharsetText.decode(Array.empty[Byte],
      "text/html; charset=iso-2022-kr") == "")
  }

  test("meta prescan is tag-confined: comments, scripts, other tags never win") {
    // decoy charset= in a leading comment, a script BODY, and another
    // tag's attribute — the real <meta> after them must win
    val html = "<!-- charset=shift_jis --><script>var s='charset=big5';" +
      "</script><a href=\"/x?charset=utf-16be\">x</a>" +
      "<meta charset=windows-1252>–€"
    val bytes = html.getBytes("windows-1252")
    assert(CharsetText.decode(bytes, "text/html") == html)
    // with NO real meta, the decoys must not fire either: utf-8 fallback
    val noMeta = ("<!-- charset=shift_jis --><a href=\"?charset=big5\">é</a>")
      .getBytes("UTF-8")
    assert(CharsetText.decode(noMeta, "text/html") ==
      "<!-- charset=shift_jis --><a href=\"?charset=big5\">é</a>")
  }

  test("http-equiv content form needs the content-type pragma on the SAME tag") {
    // a description meta carrying charset= in its content must NOT win
    val html = "<meta name=\"description\" content=\"charset=big5 tutorial\">é"
    assert(CharsetText.decode(html.getBytes("UTF-8"), "text/html") == html)
    // …and with the pragma present it does
    val h2 = "<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\">–"
    assert(CharsetText.decode(h2.getBytes("windows-1252"), null) == h2)
  }

  test("stray quote in an unquoted attribute value does not swallow the window") {
    // per the get-an-attribute rules the apostrophe in don't is a plain
    // character (quotes only open spans immediately after '='), so the
    // following real meta declaration must still win
    val html = "<a title=don't>x</a><meta charset=windows-1252>€–"
    assert(CharsetText.decode(html.getBytes("windows-1252"), "text/html") == html)
    // a quote in VALUE position still protects '>' inside it
    val html2 = "<a title=\"a>b\">x</a><meta charset=windows-1252>€"
    assert(CharsetText.decode(html2.getBytes("windows-1252"), "text/html") == html2)
  }

  test("empty comments <!--> and <!---> close at the overlapping dashes") {
    val h1 = "<!--><meta charset=windows-1252>€“”"
    assert(CharsetText.decode(h1.getBytes("windows-1252"), "text/html") == h1)
    val h2 = "<!---><meta charset=windows-1252>–"
    assert(CharsetText.decode(h2.getBytes("windows-1252"), "text/html") == h2)
    // a real comment still hides its decoys
    val h3 = "<!-- <meta charset=big5> --><meta charset=windows-1252>€"
    assert(CharsetText.decode(h3.getBytes("windows-1252"), "text/html") == h3)
  }

  test("meta quirks: utf-16 label reads as utf-8; x-user-defined as cp1252") {
    val u16 = "<meta charset=utf-16le>tricky é"
    assert(CharsetText.decode(u16.getBytes("UTF-8"), "text/html") == u16)
    val xud = "<meta charset=x-user-defined>€–"
    assert(CharsetText.decode(xud.getBytes("windows-1252"), "text/html") == xud)
  }

  test("header x-user-defined: the spec's byte→PUA decode (ASCII through)") {
    // encoding.spec.whatwg.org/#x-user-defined: 0x80+b → U+F780+b
    val bytes = "abc".getBytes("US-ASCII") ++ Array(0x80.toByte, 0xFF.toByte)
    val got = CharsetText.decode(bytes, "text/html; charset=x-user-defined")
    assert(got == "abc\uF780\uF7FF")
    // reversible: every PUA char maps back to its source byte
    assert(got.drop(3).map(c => c - 0xF780 + 0x80).toSeq == Seq(0x80, 0xFF))
  }

  test("capstone twin contract: cp1252/iso-8859-1 and utf-8 spellings decode equal") {
    // q99's charset detector: byte-divergent, decode-convergent twins.
    // Only the label-table remap makes them equal — raw latin-1 (the old
    // Charset.forName behavior) and a utf-8 fallthrough both diverge.
    val marker = graft.SparkEntry.CapstoneMarker
    val cpBytes = marker.getBytes("windows-1252")
    val u8Bytes = marker.getBytes("UTF-8")
    val viaLabel = CharsetText.decode(cpBytes, "text/html; charset=iso-8859-1")
    val viaUtf8 = CharsetText.decode(u8Bytes, "text/html; charset=utf-8")
    assert(viaLabel == marker && viaUtf8 == marker)
    // the failure modes the capstone guards: both are length-preserving
    // (so a token-count plant can't catch them) but text-divergent
    val latin1 = new String(cpBytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(latin1 != marker && latin1.length == marker.length)
    val fallthrough = CharsetText.decode(cpBytes, "text/html")
    assert(fallthrough != marker, "utf-8 fallthrough mangles cp1252 bytes")
  }

  test("label resolution is table-only: JDK-known non-spec labels fall through") {
    // ibm037 (EBCDIC) resolves in the JDK but is NOT a WHATWG label —
    // spec behavior is failure → next step (utf-8 here)
    assert(CharsetText.decode("plain".getBytes("UTF-8"),
      "text/html; charset=ibm037") == "plain")
  }

  test("adversarial header: lowercase-expanding chars cannot misalign slices") {
    // U+0130 lowercases to two chars; label slicing runs on the same
    // lowercased copy, so this must neither throw nor mis-slice
    val ct = "text/htmlİİİ; charset=windows-1252"
    val cp = "café €".getBytes("windows-1252")
    assert(CharsetText.decode(cp, ct) == "café €")
  }

  test("BOM wins over a lying header; UTF-16 BOMs; BOM stripped") {
    val bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "é".getBytes("UTF-8")
    assert(CharsetText.decode(bom, "text/html; charset=windows-1252") == "é")
    val le = Array(0xff.toByte, 0xfe.toByte) ++ "abé".getBytes("UTF-16LE")
    assert(CharsetText.decode(le, null) == "abé")
    val be = Array(0xfe.toByte, 0xff.toByte) ++ "abé".getBytes("UTF-16BE")
    assert(CharsetText.decode(be, null) == "abé")
  }

  test("column API: null payload → null, null content type → sniff chain") {
    val df = Seq(
      (1L, Option("hi ü".getBytes("UTF-8")), Option("text/plain")),
      (2L, None: Option[Array[Byte]], Option("text/plain")),
      (3L, Option("señor".getBytes("windows-1252")),
        Option("text/plain; charset=windows-1252")),
      (4L, Option("bare".getBytes("UTF-8")), None: Option[String])
    ).toDF("id", "payload", "ct")
    val got = df.select(col("id"),
        WebText.payloadText(col("payload"), col("ct")).as("t"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("hi ü"), 2L -> None,
      3L -> Some("señor"), 4L -> Some("bare")))
  }

  test("SQL registration: payload_text") {
    graft.ops.expr.NativeSig.register(spark)
    val got = spark.sql(
      "SELECT payload_text(cast('plain' AS BINARY), cast(NULL AS STRING))")
      .head().getString(0)
    assert(got == "plain")
  }
}
