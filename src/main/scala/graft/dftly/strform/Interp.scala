package graft.dftly.strform

/** Splits `f"…"` patterns into a format string and the expressions that fill it.
  *
  * Port of reference src/dftly/str_form/interpolation.py:92-159. The grammar
  * lexes an f-string as one opaque token, so field boundaries are recovered
  * afterwards by handing the text to the real parser and seeing where it
  * stops: `}` is not a terminal anywhere in the grammar, and a `}` belonging
  * to a string literal, regex literal, or backtick-quoted column name is
  * *inside* a token, so the first `}` the parser cannot consume is exactly the
  * one that closes the field. Brace-counting and lexing-only both provably
  * fail (reference module docstring, interpolation.py:1-15) — e.g. a lexer
  * alone reads `f"{($a / $a)}{extract /0/ from $x}"` as one giant regex
  * literal spanning the two division-vs-regex slashes.
  */
object Interp {

  /** `pattern with {} placeholders` + field texts, verbatim.
    * `{{`/`}}` unescape to literal braces (reference: interpolation.py:92-159).
    */
  def splitInterpolation(pattern: String): (String, Seq[String]) = {
    val out = new StringBuilder
    val fields = Seq.newBuilder[String]
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '{') {
        if (pattern.startsWith("{{", i)) { out.append('{'); i += 2 }
        else {
          val stop = findFieldEnd(pattern, i + 1)
          val field = pattern.substring(i + 1, stop)
          if (field.trim.isEmpty)
            throw new ParseError(
              s"Empty interpolation field at position $i of '$pattern'; each `{...}` " +
                "must hold a dftly expression."
            )
          fields += field
          out.append("{}")
          i = stop + 1
        }
      } else if (c == '}') {
        if (pattern.startsWith("}}", i)) { out.append('}'); i += 2 }
        else
          throw new ParseError(
            s"Unmatched `}` at position $i of '$pattern'; write `}}` for a literal brace."
          )
      } else { out.append(c); i += 1 }
    }
    (out.toString, fields.result())
  }

  /** Index of the `}` closing the field whose contents begin at `start`
    * (reference: interpolation.py:25-89).
    */
  private def findFieldEnd(pattern: String, start: Int): Int = {
    val rest = pattern.substring(start)
    val stopRel =
      try StrParser.prefixStop(rest)
      catch {
        case e: ParseError =>
          // The parser rejected a token before reaching any `}` — the field is
          // not a dftly expression at all.
          throw new ParseError(
            s"Invalid expression in the interpolation field starting at position ${start - 1} " +
              s"of '$pattern': ${e.getMessage}"
          )
      }
    stopRel match {
      case Some(rel) =>
        val stop = start + rel
        if (pattern.charAt(stop) == '}') stop
        else
          throw new ParseError(
            s"Cannot lex '${pattern.charAt(stop)}' at position $stop of '$pattern'. Interpolation " +
              "fields hold dftly expressions; literal text belongs outside the `{...}`."
          )
      case None =>
        throw new ParseError(
          s"Unterminated interpolation field starting at position ${start - 1} of '$pattern'; " +
            "every `{` must be closed by a matching `}`, or doubled (`{{`) for a literal brace."
        )
    }
  }
}
