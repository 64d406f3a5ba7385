package graft.dftly

/** Parse-time constant evaluation of config-like arguments.
  *
  * The reference evaluates such arguments by executing a one-row Polars query
  * (reference: src/dftly/nodes/base.py:541-556, types.py:283-289,
  * str.py:137-143, 412-418, 670-676), so *any* engine-evaluatable expression is
  * accepted in a const position (e.g. `Add(Lit("a"), Lit("b"))` as a regex
  * pattern). We replicate that with a small AST-level interpreter covering the
  * node types that are meaningful over literals — no SparkSession is needed at
  * parse time. Column references (or anything else data-dependent) are not
  * const-evaluatable and return None, which callers turn into the same errors
  * the reference raises.
  */
object ConstEval {

  /** Evaluate `node` to a plain constant if possible. Returns Some(null) for an
    * expression that evaluates to null, None for non-constant expressions.
    */
  def eval(node: Node): Option[Any] = node match {
    case Lit(v)  => Some(v)
    case Col(_)  => None
    case Not(a)  => evalBool(a).map(b => !b)
    case Negate(a) =>
      eval(a).flatMap {
        case i: Int     => Some(-i)
        case l: Long    => Some(-l)
        case d: Double  => Some(-d)
        case f: Float   => Some(-f)
        case _          => None
      }
    case Add(args) =>
      val vs = args.map(eval)
      if (vs.exists(_.isEmpty)) None
      else {
        val values = vs.map(_.get)
        if (values.forall(_.isInstanceOf[String])) Some(values.mkString)
        else if (values.forall(isNumeric)) Some(values.map(toD).sum)
        else None
      }
    case Multiply(args) =>
      val vs = args.map(eval)
      if (vs.exists(_.isEmpty) || !vs.forall(v => isNumeric(v.get))) None
      else Some(vs.map(v => toD(v.get)).product)
    case Coalesce(args) =>
      args.iterator.map(eval).collectFirst { case Some(v) if v != null => v }
        .orElse(Some(null))
    case Conditional(w, t, o) =>
      evalBool(w).flatMap { b =>
        if (b) eval(t) else o.map(eval).getOrElse(Some(null))
      }
    case _ => None
  }

  /** Evaluate to a string, as required for cast type names / regex patterns /
    * interpolation patterns / strptime formats.
    */
  def evalString(node: Node): Option[String] = eval(node).collect { case s: String => s }

  /** Evaluate to a strict boolean (reference literal_kwarg rejects non-bools,
    * base.py:541-556).
    */
  def evalBool(node: Node): Option[Boolean] = eval(node).collect { case b: Boolean => b }

  /** Evaluate to an int, rejecting booleans like the reference does
    * (base.py:548-556: "bool subclasses int" guard).
    */
  def evalInt(node: Node): Option[Int] = eval(node).collect {
    case i: Int                         => i
    case l: Long if l.isValidInt        => l.toInt
  }

  private def isNumeric(v: Any): Boolean = v match {
    case _: Int | _: Long | _: Double | _: Float => true
    case _                                       => false
  }

  private def toD(v: Any): Double = v match {
    case i: Int    => i.toDouble
    case l: Long   => l.toDouble
    case d: Double => d
    case f: Float  => f.toDouble
    case _         => throw new IllegalArgumentException(s"not numeric: $v")
  }
}
