package graft.dftly

import java.time.{LocalDate, LocalDateTime, LocalTime}

/** Serializers for [[Node]] trees — beyond-reference tooling (the reference
  * offers only dataclass `repr`): programmatic pipeline builders can emit
  * configs, error messages can show canonical forms, and tests can
  * round-trip.
  *
  *   - [[Render.toDict]] is TOTAL (every parseable node): emits the
  *     dict/YAML short form, `DictParser.parse(toDict(n)) == n`.
  *   - [[Render.toExprString]] is PARTIAL: emits the string form where the
  *     grammar can express the node (throws [[RenderError]] otherwise —
  *     array literals, f-strings, non-literal time in `@`, exotic doubles);
  *     `Dftly.parse(toExprString(n)) == n` when it succeeds.
  */
final class RenderError(msg: String) extends IllegalArgumentException(msg)

object Render {

  // ----------------------------------------------------------------- dict

  def toDict(n: Node): Any = n match {
    case Lit(s: String) => Map("literal" -> s) // a bare string would re-parse as string form
    case Lit(xs: Seq[_]) => Map("literal" -> xs) // the whole payload IS the value
    case Lit(v)         => v
    case Col(name)      => Map("column" -> name)

    case Hash(a)       => Map("hash" -> Seq(toDict(a)))
    case SignedHash(a) => Map("signed_hash" -> Seq(toDict(a)))
    case Not(a)        => Map("not" -> Seq(toDict(a)))
    case Negate(a)     => Map("negate" -> Seq(toDict(a)))
    case LenChars(a)   => Map("len_chars" -> Seq(toDict(a)))

    case And(as)      => Map("and" -> as.map(toDict))
    case Or(as)       => Map("or" -> as.map(toDict))
    case Add(as)      => Map("add" -> as.map(toDict))
    case Multiply(as) => Map("multiply" -> as.map(toDict))
    case Mean(as)     => Map("mean" -> as.map(toDict))
    case Min(as)      => Map("min" -> as.map(toDict))
    case Max(as)      => Map("max" -> as.map(toDict))
    case Coalesce(as) => Map("coalesce" -> as.map(toDict))

    case Subtract(l, r) => Map("subtract" -> Seq(toDict(l), toDict(r)))
    case Divide(l, r)   => Map("divide" -> Seq(toDict(l), toDict(r)))
    case Power(b, e)    => Map("power" -> Seq(toDict(b), toDict(e)))
    case SetTime(d, t)  => Map("set_time" -> Seq(toDict(d), toDict(t)))

    case Gt(l, r)  => Map("greater_than" -> Seq(toDict(l), toDict(r)))
    case Lt(l, r)  => Map("less_than" -> Seq(toDict(l), toDict(r)))
    case Eq(l, r)  => Map("equal" -> Seq(toDict(l), toDict(r)))
    case Neq(l, r) => Map("not_equal" -> Seq(toDict(l), toDict(r)))
    case Gte(l, r) => Map("greater_than_or_equal" -> Seq(toDict(l), toDict(r)))
    case Lte(l, r) => Map("less_than_or_equal" -> Seq(toDict(l), toDict(r)))

    case Conditional(w, t, o) =>
      Map("conditional" ->
        (Map("when" -> toDict(w), "then" -> toDict(t)) ++
          o.map(x => "otherwise" -> toDict(x))))
    case StringInterpolate(p, fs) =>
      Map("string_interpolate" -> (toDict(p) +: fs.map(toDict)))
    case RegexExtract(p, s, g) =>
      Map("regex_extract" ->
        (Map("pattern" -> toDict(p), "source" -> toDict(s)) ++
          g.map(x => "group_index" -> toDict(x))))
    case RegexMatch(p, s) =>
      Map("regex_match" -> Map("pattern" -> toDict(p), "source" -> toDict(s)))
    case Strptime(f, s, st) =>
      Map("strptime" ->
        (Map("format" -> toDict(f), "source" -> toDict(s)) ++
          st.map(x => "strict" -> toDict(x))))
    case Substring(s, a, b) =>
      Map("substring" ->
        (Map("source" -> toDict(s), "start" -> toDict(a)) ++
          b.map(x => "stop" -> toDict(x))))
    case Split(s, by) =>
      Map("split" -> Map("source" -> toDict(s), "by" -> toDict(by)))
    case Cast(s, t, st) =>
      Map("cast" ->
        (Map("source" -> toDict(s), "type" -> toDict(t)) ++
          st.map(x => "strict" -> toDict(x))))

    case d: DtAccessor => Map(dtAccessorKey(d) -> Seq(toDict(d.arg)))
    case d: DtTotal    => Map(dtTotalKey(d) -> Seq(toDict(d.arg)))

    case Extension(name, args, _) => Map(name -> args.map(toDict))
    case BareWordNode(w) =>
      throw new RenderError(s"bare word '$w' is a parse-time marker, not a renderable node")
  }

  // --------------------------------------------------------------- string

  def toExprString(n: Node): String = n match {
    case Lit(v)    => litStr(v)
    case Col(name) => colStr(name)

    case Hash(a)       => s"hash(${toExprString(a)})"
    case SignedHash(a) => s"signed_hash(${toExprString(a)})"
    case LenChars(a)   => s"len_chars(${toExprString(a)})"
    // unary binds tighter than `::` in the ladder, so the operand must be
    // parenthesized or a trailing cast would re-associate onto the result
    case Not(a)        => s"(not (${toExprString(a)}))"
    case Negate(a)     => s"(-(${toExprString(a)}))"

    // infix only at arity 2 — the grammar folds chains pairwise, so a flat
    // 3-arg Add has no infix spelling; the function form covers any arity
    // EXCEPT and/or, whose names are grammar keywords (not callable) — a
    // non-binary And/Or has no string form at all.
    case And(Seq(l, r))      => s"(${toExprString(l)} and ${toExprString(r)})"
    case Or(Seq(l, r))       => s"(${toExprString(l)} or ${toExprString(r)})"
    case Add(Seq(l, r))      => s"(${toExprString(l)} + ${toExprString(r)})"
    case Multiply(Seq(l, r)) => s"(${toExprString(l)} * ${toExprString(r)})"
    case Coalesce(Seq(l, r)) => s"(${toExprString(l)} ?? ${toExprString(r)})"
    case And(as) =>
      throw new RenderError(
        s"and of arity ${as.size} has no string form ('and' is a keyword, not callable); use toDict")
    case Or(as) =>
      throw new RenderError(
        s"or of arity ${as.size} has no string form ('or' is a keyword, not callable); use toDict")
    case Add(as)      => fnCall("add", as)
    case Multiply(as) => fnCall("multiply", as)
    case Coalesce(as) => fnCall("coalesce", as)
    case Mean(as)     => fnCall("mean", as)
    case Min(as)      => fnCall("min", as)
    case Max(as)      => fnCall("max", as)

    case Subtract(l, r) => s"(${toExprString(l)} - ${toExprString(r)})"
    case Divide(l, r)   => s"(${toExprString(l)} / ${toExprString(r)})"
    case Power(b, e)    => s"(${toExprString(b)} ** ${toExprString(e)})"

    case Gt(l, r)  => s"(${toExprString(l)} > ${toExprString(r)})"
    case Lt(l, r)  => s"(${toExprString(l)} < ${toExprString(r)})"
    case Eq(l, r)  => s"(${toExprString(l)} == ${toExprString(r)})"
    case Neq(l, r) => s"(${toExprString(l)} != ${toExprString(r)})"
    case Gte(l, r) => s"(${toExprString(l)} >= ${toExprString(r)})"
    case Lte(l, r) => s"(${toExprString(l)} <= ${toExprString(r)})"

    case Conditional(w, t, None) =>
      s"(${toExprString(t)} if ${toExprString(w)})"
    case Conditional(w, t, Some(o)) =>
      s"(${toExprString(t)} if ${toExprString(w)} else ${toExprString(o)})"

    case RegexExtract(p, s, None) => fnCall("regex_extract", Seq(p, s))
    case RegexExtract(p, s, Some(g)) => fnCall("regex_extract", Seq(g, p, s))
    case RegexMatch(p, s) => fnCall("regex_match", Seq(p, s))
    case Substring(s, a, b) => fnCall("substring", Seq(s, a) ++ b)
    case Split(s, by) => fnCall("split", Seq(s, by))

    case Strptime(Lit(fmt: String), s, st) =>
      val op = strictOp(st, "strptime")
      s"(${toExprString(s)})$op${quote(fmt)}"
    case Strptime(f, _, _) =>
      throw new RenderError(s"strptime format must be a string literal to render; got $f")

    case Cast(s, Lit(t: String), st) =>
      s"(${toExprString(s)})${strictOp(st, "cast")}$t"
    case Cast(_, t, _) =>
      throw new RenderError(s"cast type must be a string literal to render; got $t")

    case SetTime(d, Lit(t: LocalTime)) =>
      val hhmmss = f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
      if (t.getNano != 0)
        throw new RenderError("sub-second literal times have no string form")
      s"(${toExprString(d)} @ $hhmmss)"
    case SetTime(d, t) => fnCall("set_time", Seq(d, t))

    case d: DtAccessor => s"(${toExprString(d.arg)})::${dtAccessorCast(d)}"
    case d: DtTotal    => s"(${toExprString(d.arg)})::${dtTotalCast(d)}"

    case StringInterpolate(_, _) =>
      throw new RenderError(
        "string_interpolate has no canonical string form (f-string fields are raw text); use toDict")
    case Extension(name, args, _) => fnCall(name, args)
    case BareWordNode(w) =>
      throw new RenderError(s"bare word '$w' is a parse-time marker, not a renderable node")
  }

  // -------------------------------------------------------------- helpers

  private def fnCall(name: String, args: Seq[Node]): String =
    args.map(toExprString).mkString(s"$name(", ", ", ")")

  private def strictOp(st: Option[Node], what: String): String = st match {
    case None             => "::"
    case Some(Lit(false)) => "::?"
    case Some(other) =>
      throw new RenderError(s"$what strict=$other has no string form; use toDict")
  }

  private val PlainName = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private def colStr(name: String): String =
    if (PlainName.matches(name)) s"$$$name"
    else if (!name.contains('`')) s"$$`$name`"
    else throw new RenderError(s"column name with backtick has no string form: $name")

  private val PlainNumber = "^[0-9]+(\\.[0-9]+)?$".r

  // NB: negative numeric literals have NO string form — the grammar always
  // parses `-x` as Negate(Lit(x)); a faithful round-trip must refuse.
  // Likewise Lit(Long) within Int range: the lexer produces Int for such
  // digits, so "5" would silently reparse as Lit(5: Int) != Lit(5L).
  private def litStr(v: Any): String = v match {
    case i: Int if i >= 0 => i.toString
    case l: Long if l > Int.MaxValue => l.toString // reparses as Long
    case l: Long if l >= 0 =>
      throw new RenderError(
        s"Lit(${l}L) would reparse as Int (the lexer yields Int in Int range); use Lit(Int) or toDict")
    case b: Boolean => b.toString
    case d: Double =>
      val s = d.toString
      if (PlainNumber.matches(s)) s
      else throw new RenderError(s"double $s has no plain-decimal string form (negative or scientific); use toDict")
    case s: String => quote(s)
    case d: LocalDate => d.toString
    case dt: LocalDateTime =>
      if (dt.getNano != 0)
        throw new RenderError("sub-second datetime literals have no string form")
      f"${dt.toLocalDate} ${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"
    case other =>
      throw new RenderError(s"literal $other (${if (other == null) "null" else other.getClass.getSimpleName}) has no string form; use toDict")
  }

  private def quote(s: String): String = {
    if (s.contains('\n') || s.endsWith("\\"))
      throw new RenderError(s"string literal not expressible in the grammar: $s")
    if (!s.contains('\'')) s"'$s'"
    else if (!s.contains('"')) "\"" + s + "\""
    else throw new RenderError(s"string with both quote kinds has no string form: $s")
  }

  private def dtAccessorKey(d: DtAccessor): String = d match {
    case _: DtYear           => "dt_year"
    case _: DtMonthOfYear    => "dt_month_of_year"
    case _: DtDayOfMonth     => "dt_day_of_month"
    case _: DtDayOfWeek      => "dt_day_of_week"
    case _: DtDayOfYear      => "dt_day_of_year"
    case _: DtHourOfDay      => "dt_hour_of_day"
    case _: DtMinuteOfHour   => "dt_minute_of_hour"
    case _: DtSecondOfMinute => "dt_second_of_minute"
    case _: DtWeekOfYear     => "dt_week_of_year"
    case _: DtQuarterOfYear  => "dt_quarter_of_year"
  }

  private def dtAccessorCast(d: DtAccessor): String = d match {
    case _: DtYear           => "year_of_date"
    case _: DtMonthOfYear    => "month_of_year"
    case _: DtDayOfMonth     => "day_of_month"
    case _: DtDayOfWeek      => "day_of_week"
    case _: DtDayOfYear      => "day_of_year"
    case _: DtHourOfDay      => "hour_of_day"
    case _: DtMinuteOfHour   => "minute_of_hour"
    case _: DtSecondOfMinute => "second_of_minute"
    case _: DtWeekOfYear     => "week_of_year"
    case _: DtQuarterOfYear  => "quarter_of_year"
  }

  private def dtTotalKey(d: DtTotal): String = d match {
    case _: DtTotalSeconds      => "dt_total_seconds"
    case _: DtTotalMilliseconds => "dt_total_milliseconds"
    case _: DtTotalMicroseconds => "dt_total_microseconds"
    case _: DtTotalNanoseconds  => "dt_total_nanoseconds"
    case _: DtTotalMinutes      => "dt_total_minutes"
    case _: DtTotalHours        => "dt_total_hours"
    case _: DtTotalDays         => "dt_total_days"
  }

  private def dtTotalCast(d: DtTotal): String = d match {
    case _: DtTotalSeconds      => "total_seconds"
    case _: DtTotalMilliseconds => "total_milliseconds"
    case _: DtTotalMicroseconds => "total_microseconds"
    case _: DtTotalNanoseconds  => "total_nanoseconds"
    case _: DtTotalMinutes      => "total_minutes"
    case _: DtTotalHours        => "total_hours"
    case _: DtTotalDays         => "total_days"
  }
}
