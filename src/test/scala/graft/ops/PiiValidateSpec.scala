package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase
import graft.ops.expr.PiiValidate

/** Checksum-validated PII redaction: Luhn/mod-97/entropy arithmetic on
  * published test vectors, scanner boundary rules, separator uniformity,
  * pass composition, SQL registration, and the pipeline verb.
  */
class PiiValidateSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  private def redactAll(s: String): String =
    PiiValidate.redact(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      true, true, true).toString

  // ------------------------------------------------------------------
  // Luhn cards
  // ------------------------------------------------------------------

  test("Luhn: published test numbers validate, off-by-one check digit fails") {
    // 4111111111111111 (Visa test), 5500005555555559 (MC test),
    // 378282246310005 (Amex test, 15 digits) all Luhn-valid
    assert(redactAll("pay 4111111111111111 now") == "pay <CARD> now")
    assert(redactAll("mc 5500005555555559.") == "mc <CARD>.")
    assert(redactAll("amex 378282246310005!") == "amex <CARD>!")
    // check digit off by one → untouched
    assert(redactAll("pay 4111111111111112 now") == "pay 4111111111111112 now")
  }

  test("grouped digits with a uniform separator match; mixed separators don't") {
    assert(redactAll("card 4111 1111 1111 1111 ok") == "card <CARD> ok")
    assert(redactAll("card 4111-1111-1111-1111 ok") == "card <CARD> ok")
    // mixed ' ' and '-' breaks the uniform rule mid-walk: the walked span
    // is the first uniformly-joined prefix (8 digits) → not 13-19 → kept
    assert(redactAll("card 4111 1111-1111 1111 ok") ==
      "card 4111 1111-1111 1111 ok")
  }

  test("a valid card followed by an unrelated number still redacts") {
    // merge-then-fail leak (review finding): the card must not escape
    // because a following number pushed the merged span past 19 digits
    assert(redactAll("pay 4111111111111111 2023 now") == "pay <CARD> 2023 now")
    // grouped card + trailing small group: longest Luhn-passing
    // group-aligned prefix redacts, the tail survives
    assert(redactAll("card 4111 1111 1111 1111 22 x") == "card <CARD> 22 x")
    // two adjacent cards both redact
    assert(redactAll("a 4111111111111111 378282246310005 b") == "a <CARD> <CARD> b")
  }

  test("a valid card PRECEDED by a uniformly-joined number still redacts") {
    // leading-group leak (advisor finding): every group-aligned window is
    // evaluated — on prefix failure the scan restarts at the second group
    assert(redactAll("invoice 12 4111111111111111 due") ==
      "invoice 12 <CARD> due")
    assert(redactAll("2024 4111 1111 1111 1111") == "2024 <CARD>")
    // leading AND trailing unrelated numbers around the card
    assert(redactAll("12 4111111111111111 2023") == "12 <CARD> 2023")
    // several small leading groups before a grouped card
    assert(redactAll("1 2 3 4111 1111 1111 1111 z") == "1 2 3 <CARD> z")
    // no card anywhere: small uniformly-joined groups stay untouched
    assert(redactAll("12 34 5678 90") == "12 34 5678 90")
  }

  test("length and boundary rules: 12/20-digit runs and embedded runs kept") {
    assert(redactAll("n 411111111111 x") == "n 411111111111 x") // 12 digits
    assert(redactAll("n 41111111111111111111 x") ==
      "n 41111111111111111111 x") // 20 digits
    // alnum-embedded: an id, not a card
    assert(redactAll("ORD4111111111111111 x") == "ORD4111111111111111 x")
    assert(redactAll("4111111111111111X") == "4111111111111111X")
  }

  // ------------------------------------------------------------------
  // IBAN
  // ------------------------------------------------------------------

  test("IBAN: ISO 13616 examples validate, corrupted check digits fail") {
    assert(redactAll("iban GB82WEST12345698765432 ok") == "iban <IBAN> ok")
    assert(redactAll("de DE89370400440532013000;") == "de <IBAN>;")
    // last digit corrupted → mod-97 != 1 → untouched
    assert(redactAll("iban GB82WEST12345698765433 ok") ==
      "iban GB82WEST12345698765433 ok")
    // lowercase BBAN accepted (banks print both)
    assert(redactAll("x GB82west12345698765432 y") == "x <IBAN> y")
  }

  test("IBAN shape rules: bad prefix or embedded token kept") {
    // digits where country letters should be
    assert(redactAll("n 1282WEST12345698765432 x") ==
      "n 1282WEST12345698765432 x")
    // embedded in a longer alnum token → maximal-token shape fails (length
    // grows past the match but checksum runs on the WHOLE token)
    assert(redactAll("xGB82WEST12345698765432 x") ==
      "xGB82WEST12345698765432 x")
  }

  // ------------------------------------------------------------------
  // Secrets
  // ------------------------------------------------------------------

  test("secrets: high-entropy mixed tokens redact; low-entropy/short kept") {
    // 28-char mixed-case+digits random-ish: entropy well above 4 bits
    val key = "A1b2C3d4E5f6G7h8J9k0LmNoPqRs"
    assert(PiiValidate.entropyBits(key, 0, key.length) >= 4.0)
    assert(redactAll(s"token $key end") == "token <SECRET> end")
    // 64-char hex digest (sha256 shape): hex rule
    val hex = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    assert(redactAll(s"sha $hex.") == "sha <SECRET>.")
    // low entropy long token: kept
    assert(redactAll("x aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa y") ==
      "x aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa y")
    // letters-only natural word run: tokens too short / no digits
    assert(redactAll("the quick brown fox jumps over lazy dogs") ==
      "the quick brown fox jumps over lazy dogs")
  }

  // ------------------------------------------------------------------
  // composition + null + column/SQL/pipeline surfaces
  // ------------------------------------------------------------------

  test("passes compose and later passes never re-match redactions") {
    val s = "pay 4111111111111111 via GB82WEST12345698765432 " +
      "key A1b2C3d4E5f6G7h8J9k0LmNoPqRs"
    assert(redactAll(s) == "pay <CARD> via <IBAN> key <SECRET>")
  }

  test("column API, SQL function, and redactPiiAll regex composition") {
    val df = Seq(
      (1L, "card 4111111111111111 mail a@b.co"),
      (2L, Option.empty[String].orNull)
    ).toDF("id", "text")
    val got = df.select(col("id"),
        Corpus.redactPiiAll(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "card <CARD> mail <EMAIL>")
    assert(got(2L) == null)
    graft.ops.expr.NativeSig.register(spark)
    val viaSql = spark.sql(
      "SELECT redact_validated('n 4111111111111111 x') AS r")
      .as[String].head()
    assert(viaSql == "n <CARD> x")
  }

  test("pipeline redact verb: validated flag runs the checksum classes") {
    val out = graft.pipeline.Pipeline.run(spark,
      """source: t
        |steps:
        |  - redact: {text: text, as: clean, validated: true}
        |""".stripMargin,
      _ => Seq((1L, "pay 4111111111111111 or 4111111111111112 mail a@b.co"))
        .toDF("id", "text"))
    assert(out.select("clean").as[String].head() ==
      "pay <CARD> or 4111111111111112 mail <EMAIL>")
  }
}
