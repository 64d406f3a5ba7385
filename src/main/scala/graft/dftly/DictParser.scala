package graft.dftly

import java.time.{Instant, LocalDate, LocalDateTime, LocalTime}

/** Parses the dict/YAML "base form" into [[Node]] trees.
  *
  * Mirrors the reference's `Parser.__call__` (src/dftly/parser.py:178-222):
  * POD values are literals; a one-key map is either a short form
  * (`{key: args}`, base.py:361-387) or the resolved form
  * (`{expression: {type: key, arguments: ...}}`, base.py:322-359); strings are
  * handed to the string-form grammar; Node instances pass through; bare words
  * become string literals with a warning when nested (parser.py:185-194).
  */
object DictParser {

  def parse(value: Any): Node = DftlyParser.active.value.parse(value)

  /** Recursion entry: non-map forms resolve directly; map forms go through
    * the ACTIVE registry's try-all matching loop (reference:
    * parser.py:178-222), which aggregates per-node failure causes and
    * detects ambiguous matches.
    */
  private[dftly] def parse0(value: Any, nested: Boolean): Node = value match {
    case BareWordNode(word) => bareWord(word, nested)
    case n: Node            => n
    case s: String          => strform.StrParser.parseValue(s, nested)
    case v if isPod(v)           => Lit(normalizePod(v))
    case m: collection.Map[_, _] =>
      val map = m.asInstanceOf[collection.Map[String, Any]]
      if (map.size == 1 && map.contains("bare_word"))
        bareWord(map("bare_word").toString, nested)
      else {
        // A typeless resolved form matches no node by construction; add the
        // actionable cause instead of a bare no-match (beyond-reference UX).
        map.get("expression") match {
          case Some(inner: collection.Map[_, _])
              if map.size == 1 &&
                !inner.asInstanceOf[collection.Map[String, Any]].contains("type") =>
            throw fail(value, Seq("expression" ->
              new IllegalArgumentException("resolved form needs a 'type' key")))
          case _ => ()
        }
        DftlyParser.active.value.tryAll(map, nested)
      }
    case _ => throw fail(value, Nil)
  }

  private def bareWord(word: String, nested: Boolean): Node = {
    if (nested) {
      System.err.println(
        s"[dftly] Warning: Bare word '$word' interpreted as string literal in a subexpression. " +
          s"Did you mean the column '$$$word'? Use $$$word for a column reference or " +
          s""""$word" for an explicit string literal."""
      )
    }
    Lit(word)
  }

  /** POD types map straight to literals (reference: base.py:757-782 plus the
    * grammar's date/time literal support).
    */
  private def isPod(v: Any): Boolean = v match {
    case null => true
    case _: Int | _: Long | _: Double | _: Float | _: Boolean | _: Byte | _: Short => true
    case _: BigDecimal | _: java.math.BigDecimal | _: BigInt | _: java.math.BigInteger => true
    case _: LocalDate | _: LocalTime | _: LocalDateTime | _: Instant => true
    case _: java.util.Date => true
    case _ => false
  }

  private def normalizePod(v: Any): Any = v match {
    case bi: java.math.BigInteger => BigInt(bi)
    case d: java.util.Date =>
      // always a datetime: PyYAML gives the reference datetime objects and
      // `x: 2024-01-01 00:00:00` stays Datetime-typed there — a
      // midnight→date heuristic silently changed the output schema.
      // (SnakeYAML cannot distinguish YAML dates from midnight datetimes;
      // accepting bare dates as midnight datetimes is our one leniency —
      // the reference rejects bare date literals outright.)
      LocalDateTime.ofInstant(d.toInstant, java.time.ZoneOffset.UTC)
    case other => other
  }

  /** The reference's aggregated no-match error (parser.py:212-219): every
    * node that matched but failed to build contributes a cause line.
    */
  private[dftly] def fail(value: Any, causes: Seq[(String, Throwable)]): IllegalArgumentException = {
    val lines = Seq(s"No matching node found for value: $value.") ++
      (if (causes.nonEmpty)
         Seq("Errors from attempted matches:") ++
           causes.map { case (k, e) => s"- $k: ${e.getMessage}" }
       else Nil)
    new IllegalArgumentException(lines.mkString("\n"))
  }

  /** Built-in node keys, reference registration order
    * (nodes/__init__.py:60-113).
    */
  private[dftly] val builtinKeys: Seq[String] = Seq(
    "literal", "column",
    "hash", "signed_hash", "not", "negate", "len_chars",
    "and", "or", "add", "multiply", "mean", "min", "max", "coalesce",
    "subtract", "divide", "power", "set_time",
    "greater_than", "less_than", "equal", "not_equal",
    "greater_than_or_equal", "less_than_or_equal",
    "conditional", "string_interpolate",
    "regex_extract", "regex_match", "strptime", "substring", "split", "cast",
    "dt_year", "dt_month_of_year", "dt_day_of_month", "dt_day_of_week",
    "dt_day_of_year", "dt_hour_of_day", "dt_minute_of_hour",
    "dt_second_of_minute", "dt_week_of_year", "dt_quarter_of_year",
    "dt_total_seconds", "dt_total_milliseconds", "dt_total_microseconds",
    "dt_total_nanoseconds", "dt_total_minutes", "dt_total_hours",
    "dt_total_days"
  )

  private[dftly] def isBuiltinKey(k: String): Boolean = builtinKeys.contains(k)

  /** The default registry: one [[NodeSpec]] per built-in node, delegating to
    * [[buildBuiltin]].
    */
  private[dftly] lazy val builtinSpecs: Seq[(String, NodeSpec)] =
    builtinKeys.map { k =>
      k -> new NodeSpec {
        val key: String = k
        def build(value: Any, ctx: NodeSpec.Ctx): Node =
          buildBuiltin(k, ctx.rawArgs(k, value), value, ctx.nested)
      }
    }

  /** Split raw short-form/resolved-form arguments into positional + keyword
    * (reference: base.py:230-291).
    */
  private def splitArgs(raw: Any): (Seq[Any], Map[String, Any]) = raw match {
    case null => (Nil, Map.empty)
    case m: collection.Map[_, _] =>
      (Nil, m.asInstanceOf[collection.Map[String, Any]].toSeq.toMap)
    case s: Seq[_]           => (s, Map.empty)
    case l: java.util.List[_] =>
      (scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq, Map.empty)
    case other => (Seq(other), Map.empty)
  }

  // Ordered kwargs (preserve user order for error messages only).
  private def kwargsNode(
      key: String,
      kwargs: Map[String, Any],
      required: Set[String],
      optional: Set[String],
      nested: Boolean
  ): Map[String, Node] = {
    val missing = required -- kwargs.keySet
    if (missing.nonEmpty)
      throw new IllegalArgumentException(s"Missing required keys for $key: $missing")
    val extra = kwargs.keySet -- required -- optional
    if (extra.nonEmpty)
      throw new IllegalArgumentException(s"Extra unallowed keys for $key: $extra")
    kwargs.map { case (k, v) => k -> parse0(v, nested = true) }
  }

  private[dftly] def buildBuiltin(key: String, raw: Any, whole: Any, nested: Boolean): Node = {
    val (args, kwargs) = splitArgs(raw)

    def children: Seq[Node] = {
      if (kwargs.nonEmpty)
        throw new IllegalArgumentException(s"$key does not accept keyword arguments")
      args.map(parse0(_, nested = true))
    }
    def variadic(mk: Seq[Node] => Node): Node = {
      val cs = children
      if (cs.isEmpty)
        throw new IllegalArgumentException(s"$key requires at least one argument")
      mk(cs)
    }
    def unary(mk: Node => Node): Node = {
      val cs = children
      if (cs.size != 1)
        throw new IllegalArgumentException(
          s"$key requires exactly one positional argument; got ${cs.size}"
        )
      mk(cs.head)
    }
    def binary(mk: (Node, Node) => Node): Node = {
      val cs = children
      if (cs.size != 2)
        throw new IllegalArgumentException(
          s"$key requires exactly two positional arguments; got ${cs.size}"
        )
      mk(cs.head, cs(1))
    }

    key match {
      case "literal" =>
        // the WHOLE payload is the one argument (reference
        // Literal.args_from_value, base.py:836-845): {"literal": [1,2,3]}
        // is the LIST literal [1,2,3], {"literal": null} is Literal(None) —
        // generic positional splitting would splat the list into three args
        Lit(raw match {
          case v if isPod(v)        => normalizePod(v)
          case s: Seq[_]            => s
          case l: java.util.List[_] =>
            scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
          case other => other
        })
      case "column" =>
        if (kwargs.nonEmpty || args.size != 1)
          throw new IllegalArgumentException(s"column takes exactly one name; got $raw")
        args.head match {
          case s: String => Col(s)
          case other =>
            throw new IllegalArgumentException(s"column name must be a string; got $other")
        }

      case "hash"        => unary(Hash)
      case "signed_hash" => unary(SignedHash)
      case "not"         => unary(Not)
      case "negate"      => unary(Negate)
      case "len_chars"   => unary(LenChars)

      case "and"      => variadic(And)
      case "or"       => variadic(Or)
      case "add"      => variadic(Add)
      case "multiply" => variadic(Multiply)
      case "mean"     => variadic(Mean)
      case "min"      => variadic(Min)
      case "max"      => variadic(Max)
      case "coalesce" => variadic(Coalesce)

      case "subtract" => binary(Subtract)
      case "divide"   => binary(Divide)
      case "power"    => binary(Power)
      case "set_time" => binary(SetTime)

      case "greater_than"          => binary(Gt)
      case "less_than"             => binary(Lt)
      case "equal"                 => binary(Eq)
      case "not_equal"             => binary(Neq)
      case "greater_than_or_equal" => binary(Gte)
      case "less_than_or_equal"    => binary(Lte)

      case "conditional" =>
        if (args.nonEmpty)
          throw new IllegalArgumentException("conditional only accepts keyword arguments")
        val kw = kwargsNode(key, kwargs, Set("when", "then"), Set("otherwise"), nested)
        Conditional(kw("when"), kw("then"), kw.get("otherwise"))

      case "string_interpolate" =>
        val cs = children
        if (cs.size <= 1)
          throw new IllegalArgumentException(
            "StringInterpolate requires more than one argument; it takes both the pattern " +
              "string (first) and the fields to interpolate into the pattern (subsequent)."
          )
        // parse-time validation, like the reference's __post_init__
        // (str.py:135-149): the pattern must const-evaluate to a string
        if (ConstEval.evalString(cs.head).isEmpty)
          throw new IllegalArgumentException(
            "The pattern argument must be a string, Literal, or Literal-evaluatable instance.")
        StringInterpolate(cs.head, cs.tail)

      case "regex_extract" =>
        if (args.nonEmpty)
          throw new IllegalArgumentException("regex_extract only accepts keyword arguments")
        val kw = kwargsNode(key, kwargs, Set("pattern", "source"), Set("group_index"), nested)
        // parse-time validation like the reference __post_init__
        // (str.py:345-356): pattern const-evaluates to a string, group_index
        // to a non-negative int
        if (ConstEval.evalString(kw("pattern")).isEmpty)
          throw new IllegalArgumentException(
            "The pattern argument of regex_extract must evaluate to a string literal.")
        kw.get("group_index").foreach { g =>
          val i = ConstEval.evalInt(g).getOrElse(
            throw new IllegalArgumentException(
              "The group_index argument of regex_extract must evaluate to a non-negative integer."))
          if (i < 0)
            throw new IllegalArgumentException(
              s"The group_index argument of regex_extract must be non-negative; got $i")
        }
        RegexExtract(kw("pattern"), kw("source"), kw.get("group_index"))

      case "regex_match" =>
        if (args.nonEmpty)
          throw new IllegalArgumentException("regex_match only accepts keyword arguments")
        val kw = kwargsNode(key, kwargs, Set("pattern", "source"), Set.empty, nested)
        RegexMatch(kw("pattern"), kw("source"))

      case "strptime" =>
        if (args.nonEmpty)
          throw new IllegalArgumentException("strptime only accepts keyword arguments")
        val kw = kwargsNode(key, kwargs, Set("format", "source"), Set("strict"), nested)
        val node = Strptime(kw("format"), kw("source"), kw.get("strict"))
        // Parse-time validation, like the reference's __post_init__
        // (str.py:651-662): format must const-evaluate to a classifiable string.
        val fmt = ConstEval.evalString(kw("format")).getOrElse(
          throw new IllegalArgumentException(
            "The format argument must be a NodeBase instance that evaluates to a string."
          )
        )
        Strftime.classify(fmt)
        node

      case "substring" =>
        if (args.nonEmpty)
          throw new IllegalArgumentException("substring only accepts keyword arguments")
        val kw = kwargsNode(key, kwargs, Set("source", "start"), Set("stop"), nested)
        Substring(kw("source"), kw("start"), kw.get("stop"))

      case "split" =>
        if (args.nonEmpty)
          throw new IllegalArgumentException("split only accepts keyword arguments")
        val kw = kwargsNode(key, kwargs, Set("source", "by"), Set.empty, nested)
        Split(kw("source"), kw("by"))

      case "cast" =>
        // Positional sugar Cast(source, type) normalizes to the keyword form
        // (reference: types.py:248-264).
        val node =
          if (args.nonEmpty) {
            if (kwargs.nonEmpty)
              throw new IllegalArgumentException(
                s"cast cannot mix positional and keyword arguments; got positional args with ${kwargs.keySet}"
              )
            if (args.size != 2)
              throw new IllegalArgumentException(
                s"cast requires exactly two positional arguments (source, type); got ${args.size}"
              )
            Cast(parse0(args.head, nested = true), parse0(args(1), nested = true), None)
          } else {
            val kw = kwargsNode(key, kwargs, Set("source", "type"), Set("strict"), nested)
            Cast(kw("source"), kw("type"), kw.get("strict"))
          }
        validateCast(node)
        node

      case "dt_year"             => unary(DtYear)
      case "dt_month_of_year"    => unary(DtMonthOfYear)
      case "dt_day_of_month"     => unary(DtDayOfMonth)
      case "dt_day_of_week"      => unary(DtDayOfWeek)
      case "dt_day_of_year"      => unary(DtDayOfYear)
      case "dt_hour_of_day"      => unary(DtHourOfDay)
      case "dt_minute_of_hour"   => unary(DtMinuteOfHour)
      case "dt_second_of_minute" => unary(DtSecondOfMinute)
      case "dt_week_of_year"     => unary(DtWeekOfYear)
      case "dt_quarter_of_year"  => unary(DtQuarterOfYear)

      case "dt_total_seconds"      => unary(DtTotalSeconds)
      case "dt_total_milliseconds" => unary(DtTotalMilliseconds)
      case "dt_total_microseconds" => unary(DtTotalMicroseconds)
      case "dt_total_nanoseconds"  => unary(DtTotalNanoseconds)
      case "dt_total_minutes"      => unary(DtTotalMinutes)
      case "dt_total_hours"        => unary(DtTotalHours)
      case "dt_total_days"         => unary(DtTotalDays)

      case other => throw fail(whole, Nil)
    }
  }

  /** Cast construction-time validation (reference: types.py:266-289). */
  private[dftly] def validateCast(c: Cast): Unit = {
    val name = ConstEval.evalString(c.typeName).getOrElse(
      throw new IllegalArgumentException(
        "The type argument of a Cast operation must evaluate to a string literal."
      )
    )
    if (!Types.TYPES.contains(name))
      throw new IllegalArgumentException(s"Unsupported type: $name")
    c.strict.foreach { s =>
      val strict = ConstEval.evalBool(s).getOrElse(
        throw new IllegalArgumentException(
          s"The strict argument must be a boolean, got ${ConstEval.eval(s).getOrElse(s)}"
        )
      )
      if (!strict && !Types.lowersToCast(name))
        throw new IllegalArgumentException(
          s"Non-strict casting is not supported for unit '$name'; `strict` applies only to dtype casts."
        )
    }
  }
}
