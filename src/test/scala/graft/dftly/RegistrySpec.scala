package graft.dftly

import org.apache.spark.sql.functions._

/** User-extensible node registry: custom nodes end-to-end through the YAML
  * dict form and string-form function calls, plus the reference Parser's
  * doctested error semantics (parser.py:120-176: duplicate-key registration,
  * aggregated match-failure causes, ambiguity detection).
  */
class RegistrySpec extends SparkTestBase {

  import spark.implicits._

  private val clamp = NodeSpec.expression("clamp", 3, 3) {
    case Seq(x, lo, hi) => greatest(lo, least(hi, x))
  }

  test("custom node via YAML dict form, end-to-end to a DataFrame") {
    val parser = DftlyParser.withDefaults("clamp" -> clamp)
    val df = Seq(-5.0, 3.0, 42.0).toDF("x")
    val out = Dftly.select(df,
      """c: {clamp: [$x, 0, 10]}
        |twice: {multiply: [{clamp: [$x, 0, 10]}, 2]}
        |""".stripMargin, parser)
    assert(out.as[(Double, Double)].collect().toSeq ==
      Seq((0.0, 0.0), (3.0, 6.0), (10.0, 20.0)))
  }

  test("custom node via string-form function call, nested in an expression") {
    val parser = DftlyParser.withDefaults("clamp" -> clamp)
    val df = Seq(-5.0, 3.0, 42.0).toDF("x")
    val out = Dftly.select(df, "c: 1 + clamp($x, 0, 10)\n", parser)
    assert(out.as[Double].collect().toSeq == Seq(1.0, 4.0, 11.0))
  }

  test("resolved form and referencedColumns work for custom nodes") {
    val parser = DftlyParser.withDefaults("clamp" -> clamp)
    val node = parser.parse(
      Map("expression" -> Map("type" -> "clamp",
        "arguments" -> Seq("$a", 0, Map("column" -> Seq("b"))))))
    assert(node.isInstanceOf[Extension])
    assert(node.referencedColumns == Set("a", "b"))
  }

  test("duplicate registered keys are rejected at construction") {
    val e = intercept[IllegalArgumentException] {
      DftlyParser.withDefaults("also_add" -> NodeSpec.expression("add", 1, 9)(_.head))
    }
    assert(e.getMessage ==
      "multiple nodes registered with key 'add': ['add', 'also_add']")
  }

  test("no-match error aggregates causes from nodes that matched but failed") {
    val e = intercept[IllegalArgumentException] {
      Dftly.parse(Map("add" -> Seq(1, Map("fake" -> Seq(2, 3)))))
    }
    val msg = e.getMessage
    assert(msg.startsWith("No matching node found for value:"), msg)
    assert(msg.contains("Errors from attempted matches:"), msg)
    assert(msg.contains("- add: No matching node found for value:"), msg)
    // the unknown inner key appears in the reported cause
    assert(msg.contains("fake"), msg)
  }

  test("unknown key alone reports no-match without a causes section") {
    val e = intercept[IllegalArgumentException] {
      Dftly.parse(Map("fake" -> Seq(2, 3)))
    }
    assert(e.getMessage.startsWith("No matching node found for value:"), e.getMessage)
    assert(!e.getMessage.contains("Errors from attempted matches:"), e.getMessage)
  }

  test("two nodes matching the same value is an ambiguity error") {
    val alsoNeg = new NodeSpec {
      val key: String = "also_negate"
      override def matches(value: Any): Boolean =
        NodeSpec.standardMatch("negate", value) // claims negate's form too
      def build(value: Any, ctx: NodeSpec.Ctx): Node =
        Negate(ctx.parseChild(ctx.positional(ctx.rawArgs("negate", value)).head))
    }
    val parser = DftlyParser.withDefaults("also_negate" -> alsoNeg)
    val e = intercept[IllegalArgumentException] {
      parser.parse(Map("negate" -> Seq(1)))
    }
    assert(e.getMessage.startsWith("multiple matching nodes for "), e.getMessage)
    assert(e.getMessage.endsWith("['negate', 'also_negate']"), e.getMessage)
  }

  test("custom-node arity errors surface as aggregated causes") {
    val parser = DftlyParser.withDefaults("clamp" -> clamp)
    val e = intercept[IllegalArgumentException] {
      parser.parse(Map("clamp" -> Seq(1, 2)))
    }
    assert(e.getMessage.contains("- clamp: clamp takes 3 arguments; got 2"), e.getMessage)
  }

  test("default parse behavior is unchanged (all three forms still resolve)") {
    assert(Dftly.parse(Map("add" -> Seq(1, 2))) == Add(Seq(Lit(1), Lit(2))))
    assert(Dftly.parse("1 + 2") == Add(Seq(Lit(1), Lit(2))))
    assert(Dftly.parse(Map("expression" ->
      Map("type" -> "negate", "arguments" -> Seq(7)))) == Negate(Lit(7)))
  }

  test("unknown string-form function names still fail cleanly under defaults") {
    val e = intercept[Exception](Dftly.parse("frobnicate($a)"))
    assert(e.getMessage.contains("No matching node found"), e.getMessage)
  }

  test("custom nodes flow through Pipeline configs and missingColumns") {
    val parser = DftlyParser.withDefaults("clamp" -> clamp)
    val df = Seq((1L, -5.0), (2L, 3.0), (3L, 42.0)).toDF("id", "x")
    df.createOrReplaceTempView("clamp_in")
    val out = graft.pipeline.Pipeline.run(spark,
      """source: clamp_in
        |steps:
        |  - withColumns:
        |      c: clamp($x, 0, 10)
        |  - filter: $c > 0
        |""".stripMargin,
      { case "clamp_in" => spark.table("clamp_in") }, parser)
    assert(out.select("id").as[Long].collect().toSet == Set(2L, 3L))

    val missing = Dftly.missingColumns(df.schema, "c: clamp($y, 0, 10)\n", parser)
    assert(missing == Map("c" -> Set("y")))
  }


  test("dftly() SQL function resolves custom nodes when bound to a registry") {
    val parser = DftlyParser.withDefaults("clamp" -> clamp)
    Dftly.registerSql(spark, parser)
    Seq(-5.0, 3.0, 42.0).toDF("x").createOrReplaceTempView("clamp_sql_in")
    val got = spark.sql("SELECT dftly('clamp($x, 0, 10)') AS c FROM clamp_sql_in")
      .as[Double].collect().toSeq
    assert(got == Seq(0.0, 3.0, 10.0))
    Dftly.registerSql(spark) // restore the default binding for other tests
  }


  test("a restricted registry rejects absent builtins in BOTH forms") {
    val restricted = new DftlyParser(Seq("clamp" -> clamp,
      "literal" -> DftlyParser.defaultSpecs.toMap.apply("literal"),
      "column" -> DftlyParser.defaultSpecs.toMap.apply("column")))
    // dict form: add is not registered
    val e1 = intercept[IllegalArgumentException] {
      restricted.parse(Map("add" -> Seq(1, 2)))
    }
    assert(e1.getMessage.contains("No matching node found"), e1.getMessage)
    // string form must agree (function calls resolve through the registry)
    val e2 = intercept[Exception] {
      restricted.parse("add(1, 2)")
    }
    assert(e2.getMessage.contains("No matching node found"), e2.getMessage)
    // while the registered custom node still works in both
    assert(restricted.parse(Map("clamp" -> Seq(1, 2, 3))).isInstanceOf[Extension])
    assert(restricted.parse("clamp(1, 2, 3)").isInstanceOf[Extension])
  }

  test("typeless resolved form reports the actionable cause") {
    val e = intercept[IllegalArgumentException] {
      Dftly.parse(Map("expression" -> Map("arguments" -> Seq(1, 2))))
    }
    assert(e.getMessage.contains("resolved form needs a 'type' key"), e.getMessage)
  }

}
