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
