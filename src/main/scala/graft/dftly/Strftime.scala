package graft.dftly

/** chrono/strftime `%`-format handling for [[Strptime]].
  *
  * Two jobs, both ported from the reference (src/dftly/nodes/str.py:594-717):
  *   - classify a format into date / time / datetime by which directives appear
  *     (ported verbatim, including the substring-containment matching);
  *   - translate the chrono directives into the Java/Spark datetime-pattern
  *     dialect used by `to_date` / `to_timestamp_ntz` / `to_time`.
  *
  * Locale-dependent directives (%c %x %X) and a few chrono-only ones have no
  * faithful Spark pattern and raise — SURVEY.md §2.8.4 documents this; oracle
  * queries stay in the common subset.
  */
object Strftime {

  // reference: str.py:609-619 (DATE_PARTS)
  val DATE_PARTS: Set[String] = Set(
    "Y", "G", "C", "q", "y", "g", "m", "b", "B", "h", "d", "e", "a", "A",
    "w", "u", "j", "U", "W", "V", "D", "x", "F", "v"
  )

  // reference: str.py:621-643 (TIME_PARTS)
  val TIME_PARTS: Set[String] = Set(
    "H", "k", "I", "l", "M", "S", "f", "3f", "6f", "9f", "p", "P",
    "r", "R", "T", "X", "z", ":z", "::z", ":::z", "Z"
  )

  // reference: str.py:645-649 (DATETIME_PARTS)
  val DATETIME_PARTS: Set[String] = Set("c", "+", "s")

  /** "date" | "time" | "datetime", exactly as the reference classifies
    * (str.py:678-696). Throws if no date/time component is present.
    */
  def classify(fmt: String): String = {
    def has(parts: Set[String]): Boolean = parts.exists(p => fmt.contains("%" + p))
    val hasDate = has(DATE_PARTS)
    val hasTime = has(TIME_PARTS)
    val hasDatetime = has(DATETIME_PARTS)
    if (hasDatetime || (hasDate && hasTime)) "datetime"
    else if (hasDate) "date"
    else if (hasTime) "time"
    else
      throw new IllegalArgumentException(
        "The format string must contain at least one date or time component. The format string " +
          "should be in the syntax used by the `chrono` crate: " +
          "https://docs.rs/chrono/latest/chrono/format/strftime/index.html"
      )
  }

  /** chrono directive → Spark/Java datetime pattern fragment. */
  private val DIRECTIVES: Map[String, String] = Map(
    "Y" -> "yyyy", "y" -> "yy", "q" -> "Q",
    "m" -> "MM", "b" -> "MMM", "h" -> "MMM", "B" -> "MMMM",
    "d" -> "dd", "e" -> "d",
    "a" -> "EEE", "A" -> "EEEE",
    "j" -> "DDD",
    "D" -> "MM/dd/yy", "F" -> "yyyy-MM-dd", "v" -> "d-MMM-yyyy",
    "H" -> "HH", "k" -> "H", "I" -> "hh", "l" -> "h",
    "M" -> "mm", "S" -> "ss",
    // chrono %f here means fractional-seconds digits (the reference's comment
    // reads it as microseconds, str.py:628); %3f/%6f/%9f are ms/µs/ns digits.
    "f" -> "SSSSSS", "3f" -> "SSS", "6f" -> "SSSSSS", "9f" -> "SSSSSSSSS",
    "p" -> "a", "P" -> "a",
    "r" -> "hh:mm:ss a", "R" -> "HH:mm", "T" -> "HH:mm:ss",
    "z" -> "xx", ":z" -> "xxx", "::z" -> "xxxxx", ":::z" -> "x",
    "Z" -> "zzz",
    "+" -> "yyyy-MM-dd'T'HH:mm:ssXXX",
    "%" -> "%", "t" -> "\t", "n" -> "\n"
  )

  private val UNSUPPORTED: Set[String] =
    Set("C", "G", "g", "w", "u", "U", "W", "V", "x", "X", "c", "s")

  /** True when the format's year comes from a TWO-digit directive (%y, or
    * %D = %m/%d/%y): chrono uses the POSIX pivot (00-68 → 20xx, 69-99 →
    * 19xx) while Java's `yy` maps everything to 20xx — the compiler
    * century-shifts parsed years ≥ 2069 to match.
    */
  def usesTwoDigitYear(fmt: String): Boolean = {
    var i = 0
    while (i < fmt.length - 1) {
      if (fmt.charAt(i) == '%') {
        val d = fmt.charAt(i + 1)
        if (d == 'y' || d == 'D') return true
        i += 2 // skip the directive char (multi-char dirs never start y/D)
      } else i += 1
    }
    false
  }

  /** Translate a chrono format to a Spark datetime pattern. `%s` (unix epoch)
    * is handled specially by the compiler before calling this.
    *
    * Documented delta (SURVEY §2.8.4): %e/%k/%l translate to unpadded
    * `d`/`H`/`h`, which parse "5" but not chrono's space-padded " 5" —
    * Spark's pattern dialect has no pad modifier.
    */
  def toJavaPattern(fmt: String): String = {
    val out = new StringBuilder
    val literal = new StringBuilder

    def flushLiteral(): Unit = {
      if (literal.nonEmpty) {
        val s = literal.toString
        // Java patterns treat letters as pattern symbols; quote any literal
        // run containing a letter or a quote.
        if (s.exists(c => c.isLetter || c == '\'')) {
          out.append('\'').append(s.replace("'", "''")).append('\'')
        } else out.append(s)
        literal.clear()
      }
    }

    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        // longest-first: 4-char (:::z), 3-char (::z), 2-char (3f, :z), 1-char
        val rest = fmt.substring(i + 1)
        val dir = Seq(4, 3, 2, 1).iterator
          .map(n => if (rest.length >= n) rest.substring(0, n) else null)
          .find(d => d != null && (DIRECTIVES.contains(d) || UNSUPPORTED.contains(d)))
          .getOrElse(
            throw new IllegalArgumentException(s"Unknown strftime directive at '%$rest' in format '$fmt'")
          )
        if (UNSUPPORTED.contains(dir))
          throw new IllegalArgumentException(
            s"strftime directive '%$dir' has no Spark datetime-pattern equivalent (format '$fmt')"
          )
        flushLiteral()
        out.append(DIRECTIVES(dir))
        i += 1 + dir.length
      } else {
        literal.append(c)
        i += 1
      }
    }
    flushLiteral()
    out.toString
  }
}
