package graft.dftly.strform

import scala.util.matching.Regex

/** Tokens of the dftly string grammar (reference: str_form/grammar.lark:32-82). */
sealed trait Tok { def pos: Int; def end: Int }
final case class TNum(value: Any, pos: Int, end: Int) extends Tok // Int or Double
final case class TStr(s: String, pos: Int, end: Int) extends Tok // quotes stripped, escapes verbatim
final case class TFStr(s: String, pos: Int, end: Int) extends Tok // f-string content, quotes stripped
final case class TBool(b: Boolean, raw: String, pos: Int, end: Int) extends Tok
final case class TTime(raw: String, pos: Int, end: Int) extends Tok
final case class TDate(raw: String, pos: Int, end: Int) extends Tok
final case class TDateTime(raw: String, pos: Int, end: Int) extends Tok
final case class TRegex(pattern: String, pos: Int, end: Int) extends Tok
final case class TName(s: String, pos: Int, end: Int) extends Tok
final case class TBacktick(s: String, pos: Int, end: Int) extends Tok
final case class TKw(kw: String, raw: String, pos: Int, end: Int) extends Tok // kw lowercased; raw as written
final case class TOp(sym: String, pos: Int, end: Int) extends Tok
final case class TEnd(pos: Int) extends Tok { def end: Int = pos }

final class LexError(val offset: Int, msg: String) extends IllegalArgumentException(msg)

/** On-demand maximal-munch lexer. The one context-dependent decision — `/`
  * starts a regex literal at operand position, divides at infix position — is
  * passed in by the parser (`operandPos`), standing in for Lark's contextual
  * lexer (reference: str_form/interpolation.py module doc). `prefixMode`
  * converts "cannot lex this char" into a recorded stop offset instead of an
  * error, which is exactly the signal the f-string field splitter needs.
  */
final class Lexer(input: String, prefixMode: Boolean) {

  /** Where lexing stopped on an unlexable char (prefix mode only). */
  var stopOffset: Option[Int] = None

  // Anchored terminal patterns (reference grammar.lark terminal defs).
  private val DATETIME: Regex =
    """(?i)\d{4}-\d{2}-\d{2}[ T][0-2]?\d:[0-5]\d(:[0-5]\d)?( [AP]\.?M\.?)?""".r
  private val DATE: Regex = """\d{4}-\d{2}-\d{2}""".r
  private val TIME: Regex = """(?i)[0-2]?\d:[0-5]\d(:[0-5]\d)?( [AP]\.?M\.?)?""".r
  private val NUMBER: Regex = """\d+(\.\d+)?""".r
  private val NAME: Regex = """[A-Za-z_][A-Za-z0-9_]*""".r
  private val REGEXLIT: Regex = """/([^/\\\n]|\\.)*/""".r
  private val SQ_STRING: Regex = """'([^'\\]|\\.)*'""".r
  private val DQ_STRING: Regex = """"([^"\\]|\\.)*"""".r

  private val KEYWORDS =
    Set("as", "if", "else", "and", "or", "not", "in", "extract", "group", "of", "from")

  private val MULTI_OPS = Seq("**", "??", "::", "==", "!=", ">=", "<=", "&&", "||")
  private val SINGLE_OPS = "+-*/$@><!?[]:(),".toSet

  private def matchAt(r: Regex, p: Int): Option[String] = {
    // region + lookingAt: no per-token substring copies (lexing stays O(n))
    val m = r.pattern.matcher(input)
    m.region(p, input.length)
    if (m.lookingAt()) Some(m.group()) else None
  }

  def lex(p0: Int, operandPos: Boolean): Tok = {
    var p = p0
    // lark common.WS is /[ \t\f\r\n]+/ — Unicode spaces (\u3000, \u2028,
    // \x0B...) are NOT skippable in the reference and must fail to lex
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\f' || c == '\r' || c == '\n'
    while (p < input.length && isWs(input.charAt(p))) p += 1
    if (p >= input.length) return TEnd(p)
    val c = input.charAt(p)

    // Digit-led terminals: longest match wins (lark standard-lexer rule).
    if (c.isDigit) {
      val cands = Seq(
        matchAt(DATETIME, p).map(s => TDateTime(s, p, p + s.length)),
        matchAt(DATE, p).map(s => TDate(s, p, p + s.length)),
        matchAt(TIME, p).map(s => TTime(s, p, p + s.length)),
        matchAt(NUMBER, p).map { s =>
          val v: Any = if (s.contains('.')) s.toDouble else {
            // ints that overflow Int become Long; past Long, BigInt — the
            // reference parses arbitrary-precision ints and lets the engine
            // reject them (the compiler raises on >64-bit literals)
            try Integer.parseInt(s) catch {
              case _: NumberFormatException =>
                try s.toLong catch { case _: NumberFormatException => BigInt(s) }
            }
          }
          TNum(v, p, p + s.length)
        }
      ).flatten
      return cands.maxBy(_.end)
    }

    if (c == '\'' || c == '"') {
      val r = if (c == '\'') SQ_STRING else DQ_STRING
      matchAt(r, p) match {
        case Some(s) => return TStr(s.substring(1, s.length - 1), p, p + s.length)
        case None    => return fail(p, s"unterminated string starting at $p")
      }
    }

    // FORMAT_PFX STRING — `f"..."` (grammar.lark:211). Lowercase `f` only.
    if (c == 'f' && p + 1 < input.length &&
      (input.charAt(p + 1) == '\'' || input.charAt(p + 1) == '"')) {
      val r = if (input.charAt(p + 1) == '\'') SQ_STRING else DQ_STRING
      matchAt(r, p + 1) match {
        case Some(s) => return TFStr(s.substring(1, s.length - 1), p, p + 1 + s.length)
        case None    => return fail(p, s"unterminated f-string starting at $p")
      }
    }

    if (c == '`') {
      val close = input.indexOf('`', p + 1)
      // reference BACKTICK_NAME is /`[^`\n]+`/ — no newlines inside
      if (close < 0 || close == p + 1 ||
        input.substring(p + 1, close).contains('\n'))
        return fail(p, s"No terminal matches '`' at position $p")
      return TBacktick(input.substring(p + 1, close), p, close + 1)
    }

    if (c.isLetter || c == '_') {
      val s = matchAt(NAME, p).get
      val lower = s.toLowerCase
      if (lower == "true" || lower == "false")
        return TBool(lower == "true", s, p, p + s.length)
      if (KEYWORDS.contains(lower)) return TKw(lower, s, p, p + s.length)
      return TName(s, p, p + s.length)
    }

    if (c == '/' && operandPos) {
      matchAt(REGEXLIT, p) match {
        case Some(s) => return TRegex(s.substring(1, s.length - 1), p, p + s.length)
        case None    => return fail(p, s"unterminated regex literal at $p")
      }
    }

    MULTI_OPS.find(op => input.startsWith(op, p)) match {
      case Some(op) => return TOp(op, p, p + op.length)
      case None     =>
    }
    if (SINGLE_OPS.contains(c)) return TOp(c.toString, p, p + 1)

    fail(p, s"No terminal matches '$c' at position $p")
  }

  private def fail(p: Int, msg: String): Tok = {
    if (prefixMode) { stopOffset = Some(p); TEnd(p) }
    else throw new LexError(p, msg)
  }
}
