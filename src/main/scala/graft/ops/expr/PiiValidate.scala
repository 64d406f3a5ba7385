package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Checksum-validated PII redaction: payment-card numbers (Luhn mod-10),
  * IBANs (ISO 13616 mod-97), and high-entropy secret tokens (the
  * detect-secrets heuristic family). The regex-only scrub
  * ([[graft.ops.Corpus.redactPii]]) stays for the pattern-sufficient
  * classes (email/IPv4/phone); these three classes NEED per-match
  * validation a `regexp_replace` cannot express — a bare 16-digit regex
  * redacts order ids, timestamps and primary keys wholesale (9 in 10
  * random 16-digit strings fail Luhn; validation is what makes the scrub
  * precise enough to run over a whole corpus).
  *
  * All three detectors are single-pass scanners over the char array —
  * map-side, shuffle-free, codegen'd via the static [[PiiValidate.redact]]
  * entry point. Detection rules (deterministic, engine-replayable):
  *
  *   - CARD: a maximal run of 13–19 digits, contiguous or in groups
  *     joined by a UNIFORM single separator (space or '-'), not adjacent
  *     to other digits, whose digits pass Luhn mod-10 → `<CARD>`.
  *     Digit runs outside 13–19 or failing the checksum are untouched.
  *   - IBAN: `[A-Z]{2}[0-9]{2}[A-Za-z0-9]{11,30}` as a maximal
  *     alphanumeric token (letters-digits boundary on both sides) whose
  *     ISO 13616 rearranged mod-97 value is 1 → `<IBAN>`. Spaced IBAN
  *     presentation ("DE89 3704 ...") is out of scope here — grouped
  *     digits fall to the CARD detector's uniform-separator rule only if
  *     they Luhn-pass (~10% base rate), the documented trade.
  *   - SECRET: a maximal token of the base64/url charset
  *     `[A-Za-z0-9+/=_-]`, length ≥ 24, containing BOTH letters and
  *     digits, with Shannon char entropy ≥ 4.0 bits → `<SECRET>`; or a
  *     pure-hex token of length ≥ 32 with entropy ≥ 3.0 bits → `<SECRET>`
  *     (detect-secrets' published thresholds are 4.5/3.0 over base64/hex;
  *     4.0 here because real 28–40-char API keys measure 4.0–4.6 and the
  *     base64 gate also requires the letters+digits mix, which the
  *     natural-language false-positive class fails first).
  *
  * Passes run card → iban → secret, each over the previous pass's output;
  * replacement tokens contain no digits so later passes never re-match
  * earlier redactions.
  *
  * Reference has no PII layer (dftly is typed-expression only,
  * parser.py:326-344); beyond-reference corpus-curation surface.
  */
object PiiValidate {

  final val CardToken = "<CARD>"
  final val IbanToken = "<IBAN>"
  final val SecretToken = "<SECRET>"

  /** Luhn mod-10 over digits already collected left-to-right. */
  private[ops] def luhnOk(digits: Array[Int], n: Int): Boolean = {
    var sum = 0
    var i = 0
    while (i < n) {
      var d = digits(n - 1 - i) // i = 0 is the rightmost (check) digit
      if (i % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      i += 1
    }
    sum % 10 == 0
  }

  /** ISO 13616: move the first 4 chars to the end, expand letters to two
    * digits (A=10..Z=35), big-number mod 97 must be 1. Case-insensitive on
    * the BBAN part (banks print both); the leading country/check chars are
    * required upper by the caller's match rule.
    */
  private[ops] def ibanOk(s: String): Boolean = {
    val n = s.length
    if (n < 15 || n > 34) return false
    var rem = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt((i + 4) % n)
      val u = if (c >= 'a' && c <= 'z') (c - 32).toChar else c
      if (u >= '0' && u <= '9') rem = (rem * 10 + (u - '0')) % 97
      else if (u >= 'A' && u <= 'Z') {
        val v = u - 'A' + 10
        rem = (rem * 100 + v) % 97
      } else return false
      i += 1
    }
    rem == 1L
  }

  /** Shannon entropy in bits/char over the token's chars (ASCII subset by
    * construction of both callers).
    */
  private[ops] def entropyBits(s: String, from: Int, until: Int): Double = {
    val counts = new Array[Int](128)
    var i = from
    while (i < until) { counts(s.charAt(i) & 0x7f) += 1; i += 1 }
    val n = (until - from).toDouble
    var h = 0.0
    var c = 0
    while (c < 128) {
      if (counts(c) > 0) {
        val p = counts(c) / n
        h -= p * (math.log(p) / math.log(2.0))
      }
      c += 1
    }
    h
  }

  private def isDigit(c: Char) = c >= '0' && c <= '9'
  private def isUpper(c: Char) = c >= 'A' && c <= 'Z'
  private def isAlnum(c: Char) =
    isDigit(c) || isUpper(c) || (c >= 'a' && c <= 'z')
  private def isB64(c: Char) =
    isAlnum(c) || c == '+' || c == '/' || c == '=' || c == '_' || c == '-'
  private def isHex(c: Char) =
    isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Card pass: scan digit runs with an optional uniform single separator;
    * Luhn-validate; replace. Linear, no regex machinery.
    *
    * Boundary ambiguity is resolved group-prefix-wise: the walk records a
    * candidate boundary at every separator-joined group edge, stops
    * consuming groups once the digit total would exceed 19 (a card
    * followed by an unrelated number — "4111111111111111 2023" — must not
    * merge-and-fail), and when the full span fails Luhn, trailing GROUPS
    * are trimmed while ≥ 13 digits remain, redacting the longest
    * Luhn-passing group-aligned prefix ("4111 1111 1111 1111 22" redacts
    * the 16-digit card and leaves " 22"). When NO group-aligned prefix
    * passes, the scan restarts at the SECOND group's first digit rather
    * than skipping the whole span — so a card preceded by a small
    * uniformly-joined number ("invoice 12 4111111111111111",
    * "2024 4111 1111 1111 1111") is still found from its own group
    * boundary; every group-aligned window gets evaluated. A single
    * CONTIGUOUS run of more than 19 digits stays untouched — there is no
    * group boundary to trim at, and sub-slicing an unbroken digit run
    * redacts ids wholesale.
    */
  private[ops] def redactCards(s: String): String = {
    val n = s.length
    var i = 0
    var out: java.lang.StringBuilder = null
    var copied = 0 // s[0, copied) already appended when out != null
    while (i < n) {
      if (isDigit(s.charAt(i)) && (i == 0 || !isAlnum(s.charAt(i - 1)))) {
        // walk grouped digits from i (start boundary is non-alphanumeric,
        // matching the end boundary below: "ORD4111…" is an id, not a
        // card); group edges are candidate card ends
        val digits = new Array[Int](19)
        val groupEnds = new Array[Int](20) // string pos after each group
        val groupCounts = new Array[Int](20) // digit total at that edge
        var nGroups = 0
        var nd = 0
        var j = i
        var sep = '\u0000' // uniform separator once seen
        var end = i // end of the last digit consumed (exclusive)
        var overflow = false
        var done = false
        while (!done && j < n) {
          val c = s.charAt(j)
          if (isDigit(c)) {
            if (nd < 19) { digits(nd) = c - '0'; nd += 1; j += 1; end = j }
            else { overflow = true; done = true } // contiguous run past 19
          } else if ((c == ' ' || c == '-') && j + 1 < n &&
              isDigit(s.charAt(j + 1)) && (sep == '\u0000' || sep == c)) {
            // group edge: record the candidate boundary; stop consuming
            // further groups once the NEXT group would push past 19
            if (nGroups < 20) {
              groupEnds(nGroups) = end; groupCounts(nGroups) = nd; nGroups += 1
            }
            var k = j + 1
            var nextLen = 0
            while (k < n && isDigit(s.charAt(k))) { nextLen += 1; k += 1 }
            if (nd + nextLen > 19) done = true
            else { sep = c; j += 1 }
          } else done = true
        }
        if (nGroups < 20) { // the final group's edge
          groupEnds(nGroups) = end; groupCounts(nGroups) = nd; nGroups += 1
        }
        // a contiguous (single-group) run that kept going past 19 digits
        // is an id — skip the WHOLE run so no sub-slice ever matches
        if (overflow && nGroups == 1) {
          while (end < n && isDigit(s.charAt(end))) end += 1
        } else {
          // longest Luhn-passing group-aligned prefix with 13-19 digits
          var g = nGroups - 1
          var matched = false
          while (!matched && g >= 0) {
            val cnt = groupCounts(g)
            val e = groupEnds(g)
            if (cnt >= 13 && cnt <= 19 &&
                (e == n || !isAlnum(s.charAt(e))) && luhnOk(digits, cnt)) {
              if (out == null) out = new java.lang.StringBuilder(n)
              out.append(s, copied, i).append(CardToken)
              copied = e
              end = e
              matched = true
            } else g -= 1
          }
          // no group-aligned prefix passed: re-enter the scan at the
          // second group's first digit (just past the recorded first
          // edge's separator) so windows NOT starting at group 0 are
          // evaluated too — strictly forward progress (end > i)
          if (!matched && nGroups >= 2) end = groupEnds(0) + 1
        }
        i = end
      } else i += 1
    }
    if (out == null) s else out.append(s, copied, n).toString
  }

  /** IBAN pass: maximal alphanumeric tokens shaped CC##…, mod-97 == 1. */
  private[ops] def redactIbans(s: String): String = {
    val n = s.length
    var i = 0
    var out: java.lang.StringBuilder = null
    var copied = 0
    while (i < n) {
      if (isAlnum(s.charAt(i)) && (i == 0 || !isAlnum(s.charAt(i - 1)))) {
        var j = i
        while (j < n && isAlnum(s.charAt(j))) j += 1
        val len = j - i
        val shaped = len >= 15 && len <= 34 &&
          isUpper(s.charAt(i)) && isUpper(s.charAt(i + 1)) &&
          isDigit(s.charAt(i + 2)) && isDigit(s.charAt(i + 3))
        if (shaped && ibanOk(s.substring(i, j))) {
          if (out == null) out = new java.lang.StringBuilder(n)
          out.append(s, copied, i).append(IbanToken)
          copied = j
        }
        i = j
      } else i += 1
    }
    if (out == null) s else out.append(s, copied, n).toString
  }

  /** Secret pass: maximal base64-charset tokens, entropy-gated. */
  private[ops] def redactSecrets(s: String): String = {
    val n = s.length
    var i = 0
    var out: java.lang.StringBuilder = null
    var copied = 0
    while (i < n) {
      if (isB64(s.charAt(i)) && (i == 0 || !isB64(s.charAt(i - 1)))) {
        var j = i
        var letters = false
        var digitsSeen = false
        var allHex = true
        while (j < n && isB64(s.charAt(j))) {
          val c = s.charAt(j)
          if (isDigit(c)) digitsSeen = true
          else if (isAlnum(c)) letters = true
          if (!isHex(c)) allHex = false
          j += 1
        }
        val len = j - i
        val hit =
          (len >= 24 && letters && digitsSeen &&
            entropyBits(s, i, j) >= 4.0) ||
          (len >= 32 && allHex && entropyBits(s, i, j) >= 3.0)
        if (hit) {
          if (out == null) out = new java.lang.StringBuilder(n)
          out.append(s, copied, i).append(SecretToken)
          copied = j
        }
        i = j
      } else i += 1
    }
    if (out == null) s else out.append(s, copied, n).toString
  }

  /** Static codegen entry: all three validated passes in order. The flags
    * fold at plan time (constructor params on the expression), so a
    * disabled class costs nothing.
    */
  def redact(u: UTF8String, cards: Boolean, ibans: Boolean,
      secrets: Boolean): UTF8String = {
    if (u == null) return null
    var s = u.toString
    if (cards) s = redactCards(s)
    if (ibans) s = redactIbans(s)
    if (secrets) s = redactSecrets(s)
    UTF8String.fromString(s)
  }
}

/** `redact_validated(text)` — checksum/entropy-validated PII redaction
  * (Luhn cards, mod-97 IBANs, high-entropy secrets). See [[PiiValidate]].
  */
case class RedactValidatedExpr(
    child: Expression,
    cards: Boolean = true,
    ibans: Boolean = true,
    secrets: Boolean = true
) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"redact_validated needs a STRING argument, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "redact_validated"

  override protected def nullSafeEval(input: Any): Any =
    PiiValidate.redact(input.asInstanceOf[UTF8String], cards, ibans, secrets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expr.PiiValidate.redact($c, $cards, $ibans, $secrets)")

  override protected def withNewChildInternal(newChild: Expression): RedactValidatedExpr =
    copy(child = newChild)
}
