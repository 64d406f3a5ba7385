package graft.dftly

import org.scalatest.funsuite.AnyFunSuite

import graft.dftly.strform.Interp

/** Port of the reference interpolation-splitter doctests
  * (src/dftly/str_form/interpolation.py) — the cases that prove the splitter
  * must be the real parser, not brace counting or lexing.
  */
class InterpSpec extends AnyFunSuite {

  test("basic splitting") {
    assert(Interp.splitInterpolation("hello {$name}") == ("hello {}", Seq("$name")))
    assert(Interp.splitInterpolation("{{literal}} {$a} and {$b}") ==
      ("{literal} {} and {}", Seq("$a", "$b")))
  }

  test("fields are dftly expressions, not format specs") {
    assert(Interp.splitInterpolation("{$dose::?float64} {$code[0:3]}") ==
      ("{} {}", Seq("$dose::?float64", "$code[0:3]")))
  }

  test("brace inside a regex quantifier is passed over") {
    assert(Interp.splitInterpolation("{extract /a{2}/ from $x}") ==
      ("{}", Seq("extract /a{2}/ from $x")))
  }

  test("brace inside a regex literal") {
    assert(Interp.splitInterpolation("{/}/ in $x}") == ("{}", Seq("/}/ in $x")))
  }

  test("brace inside a string literal") {
    assert(Interp.splitInterpolation("{$a ?? '}'}") == ("{}", Seq("$a ?? '}'")))
  }

  test("brace inside a backtick-quoted column name") {
    assert(Interp.splitInterpolation("{$`}`}") == ("{}", Seq("$`}`")))
  }

  test("division does not open a regex literal (the lexer-only killer)") {
    assert(Interp.splitInterpolation("{($a / $a)}{extract /0/ from $x}") ==
      ("{}{}", Seq("($a / $a)", "extract /0/ from $x")))
  }

  test("unterminated field") {
    val e = intercept[Exception](Interp.splitInterpolation("a {$a"))
    assert(e.getMessage.contains("Unterminated interpolation field"))
  }

  test("invalid expression in field") {
    val e = intercept[Exception](Interp.splitInterpolation("{$a $b}"))
    assert(e.getMessage.contains("Invalid expression"))
  }

  test("unlexable char in field") {
    val e = intercept[Exception](Interp.splitInterpolation("{$a # 1}"))
    assert(e.getMessage.contains("Cannot lex"))
  }

  test("lone closing brace") {
    val e = intercept[Exception](Interp.splitInterpolation("a } b"))
    assert(e.getMessage.contains("Unmatched"))
  }

  test("empty field") {
    val e = intercept[Exception](Interp.splitInterpolation("a {} b"))
    assert(e.getMessage.contains("Empty interpolation field"))
  }
}
