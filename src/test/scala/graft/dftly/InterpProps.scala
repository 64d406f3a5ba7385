package graft.dftly

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.dftly.strform.Interp

/** Port of the reference's Hypothesis property suite
  * (tests/test_interpolation_properties.py): the f-string field splitter must
  * carry each field's text verbatim and resolve it to the identical tree the
  * bare expression produces, and literal text must round-trip with `{{`/`}}`
  * unescaping. The generator walks the same grammar surface, including the
  * historical killer cases (braces inside strings/regexes/backtick names,
  * division vs regex-start).
  */
object InterpProps extends Properties("Interpolation") {

  // --- expression generator over the string grammar ---------------------

  private val genName: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val column: Gen[String] = Gen.oneOf(
    genName.map("$" + _),
    genName.map(n => s"$$`$n x`"), // quoted column with a space
    Gen.const("$`a}b`")         // brace inside backtick name
  )

  private val intLit: Gen[String] = Gen.choose(0, 9999).map(_.toString)

  private val strLit: Gen[String] = Gen.oneOf(
    Gen.const("'plain'"),
    Gen.const("'has } brace'"),
    // NB: no double-quoted literals — inside a double-quoted f-string they
    // terminate the f-string token early (same limitation in the reference
    // grammar's STRING terminal).
    Gen.const("'open { brace'")
  )

  private val regexForm: Gen[String] = for {
    src <- column
    pat <- Gen.oneOf("\\d+", "a{2}", "[}]", "x|y")
  } yield s"/$pat/ in $src"

  private def binary(depth: Int): Gen[String] = for {
    op <- Gen.oneOf("+", "-", "*", "/", "and", "or", "==", "??")
    l <- expr(depth - 1)
    r <- expr(depth - 1)
  } yield s"($l $op $r)"

  private def castExpr(depth: Int): Gen[String] = for {
    e <- expr(depth - 1)
    t <- Gen.oneOf("int", "float64", "str", "?int64")
  } yield s"($e)::$t"

  private def sliceExpr(depth: Int): Gen[String] = for {
    e <- column
    i <- Gen.choose(0, 5)
    j <- Gen.choose(6, 9)
  } yield s"$e[$i:$j]"

  private def expr(depth: Int): Gen[String] =
    if (depth <= 0) Gen.oneOf(column, intLit, strLit)
    else Gen.frequency(
      3 -> column,
      2 -> intLit,
      2 -> strLit,
      3 -> binary(depth),
      2 -> castExpr(depth),
      1 -> sliceExpr(depth),
      1 -> regexForm
    )

  private val genExpr: Gen[String] = Gen.choose(0, 3).flatMap(expr)

  private val literalText: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "),
      Gen.const("{{"), Gen.const("}}"), Gen.const("."), Gen.const("-")
    )).map(_.mkString)

  // --- properties -------------------------------------------------------

  property("field text is carried verbatim and parses to the same tree") =
    Prop.forAllNoShrink(genExpr) { e =>
      val (pattern, fields) = Interp.splitInterpolation(s"{$e}")
      (pattern == "{}") :| s"pattern was $pattern" &&
        (fields == Seq(e)) :| s"field was ${fields.headOption}" && {
          val viaFString = Dftly.parse(s"""f"X{$e}Y"""")
          val direct = Dftly.parse(e)
          viaFString match {
            case StringInterpolate(Lit("X{}Y"), Seq(f)) =>
              (f == direct) :| s"f-string field $f != direct $direct"
            case other => Prop.falsified :| s"unexpected parse: $other"
          }
        }
    }

  property("literal text round-trips with {{ }} unescaping") =
    Prop.forAllNoShrink(literalText, genExpr) { (txt, e) =>
      val (pattern, fields) = Interp.splitInterpolation(s"$txt{$e}")
      val unescaped = txt.replace("{{", "{").replace("}}", "}")
      (pattern == unescaped + "{}") :| s"pattern $pattern vs ${unescaped + "{}"}" &&
        (fields == Seq(e))
    }

  property("multiple fields split independently") =
    Prop.forAllNoShrink(genExpr, genExpr) { (e1, e2) =>
      val (pattern, fields) = Interp.splitInterpolation(s"{$e1} and {$e2}")
      pattern == "{} and {}" && fields == Seq(e1, e2)
    }

  // Pinned regressions from the reference (@example decorators)
  property("pinned killer cases") = Prop.all(
    Prop(Interp.splitInterpolation("{($a / $a)}{extract /0/ from $x}") ==
      ("{}{}", Seq("($a / $a)", "extract /0/ from $x"))),
    Prop(Interp.splitInterpolation("{$a ?? '}'}") == ("{}", Seq("$a ?? '}'"))),
    Prop(Interp.splitInterpolation("{$`}`}") == ("{}", Seq("$`}`"))),
    Prop(Interp.splitInterpolation("{extract /a{2}/ from $x}") ==
      ("{}", Seq("extract /a{2}/ from $x")))
  )
}
