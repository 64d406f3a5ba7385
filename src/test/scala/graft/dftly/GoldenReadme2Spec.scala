package graft.dftly

import java.time.{LocalDate, LocalDateTime, LocalTime}

import org.apache.spark.sql.Row

/** Golden tests for the reference README's feature sections
  * (reference: README.md:228-520): chaining casts, non-strict conversion,
  * regex capture groups, f-string contents, position-based string ops,
  * null-coalescing, literal columns.
  */
class GoldenReadme2Spec extends SparkTestBase {

  import spark.implicits._

  test("chaining casts: extract → int → year → datetime") {
    val years = Seq("2003-2004", "2010-2011").toDF("admissionyeargroup")
    val out = Dftly.select(years,
      "admit_year: '(extract /2003|2010/ from $admissionyeargroup)::int::year::datetime'\n")
    assert(out.collect().map(_.get(0)).toSeq == Seq(
      LocalDateTime.of(2003, 1, 1, 0, 0), LocalDateTime.of(2010, 1, 1, 0, 0)))
  }

  test("non-strict conversion: ::?float64 and ::?strptime null out bad rows") {
    val messy = Seq(
      ("25", "2020-06-20"), ("1000 MG", "not a date"),
      ("1.5E-3", "2021-01-05"), ("", "2019-12-31")
    ).toDF("dose", "dod")
    val out = Dftly.select(messy,
      """numeric_value: $dose::?float64
        |death_date: '$dod::?"%Y-%m-%d"'
        |""".stripMargin).collect()
    assert(out(0) == Row(25.0, java.sql.Date.valueOf("2020-06-20")))
    assert(out(1) == Row(null, null))
    assert(out(2) == Row(0.0015, java.sql.Date.valueOf("2021-01-05")))
    assert(out(3) == Row(null, java.sql.Date.valueOf("2019-12-31")))
  }

  test("regex capture groups, chained and interpolated") {
    val bands = Seq("40-49", "80+").toDF("agegroup")
    val out = Dftly.select(bands,
      """whole_match: extract /^[0-9]{2}/ from $agegroup
        |age_lo: extract group 1 of /^([0-9]{2})/ from $agegroup
        |age_hi: (extract group 1 of /([0-9]{2}).?$/ from $agegroup)::int
        |span: 'f"{extract group 1 of /^([0-9]{2})/ from $agegroup} to {extract group 1 of /([0-9]{2}).?$/ from $agegroup}"'
        |""".stripMargin).collect()
    assert(out(0) == Row("40", "40", 49, "40 to 49"))
    assert(out(1) == Row("80", "80", 80, "80 to 80"))
  }

  test("f-string field contents: casts, regex braces, ??, literal braces") {
    val df = Seq((3.7, "12345", None: Option[String])).toDF("dose", "icd", "unit")
    val out = Dftly.select(df,
      """rounded: 'f"dose={$dose::int}"'
        |dotted: 'f"{extract group 1 of /^([0-9]{3})/ from $icd}.{$icd[3:]}"'
        |guarded: "f\"{$icd}//{$unit ?? 'UNK'}\""
        |braced: 'f"{{{$icd}}}"'
        |""".stripMargin).head
    assert(out == Row("dose=3", "123.45", "12345//UNK", "{12345}"))
  }

  test("position-based string operations incl. the ICD dot pattern") {
    val codes = Seq("12345", "1", "A420").toDF("code")
    val out = Dftly.select(codes,
      """length: len_chars($code)
        |first_three: $code[0:3]
        |trailing: $code[3:]
        |last_two: $code[-2:]
        |dotted: 'f"{$code[0:3]}.{$code[3:]}" if len_chars($code) > 3 else $code'
        |""".stripMargin).collect()
    assert(out(0) == Row(5, "123", "45", "45", "123.45"))
    assert(out(1) == Row(1, "1", "", "1", "1"))
    assert(out(2) == Row(4, "A42", "0", "20", "A42.0"))
  }

  test("?? null-coalescing table") {
    val df = Seq(
      (Some("x"), None: Option[String], None: Option[Int]),
      (None, Some("y"), Some(5))
    ).toDF("a", "b", "n")
    val out = Dftly.select(df,
      """filled: $a ?? 'UNK'
        |count: $n ?? 0
        |first_present: $a ?? $b ?? 'UNK'
        |joined: "f\"{$a ?? 'UNK'}//{$b ?? 'UNK'}\""
        |""".stripMargin).collect()
    assert(out(0) == Row("x", 0, "x", "x//UNK"))
    assert(out(1) == Row("UNK", 5, "y", "UNK//y"))
  }

  test("literal columns of every literal kind") {
    val df = Seq(1).toDF("x")
    val out = Dftly.select(df,
      """str: '"hello"'
        |int: '42'
        |float: '3.14'
        |bool: 'true'
        |time: '11:30 a.m.'
        |date: '2024-01-01'
        |datetime: '2024-01-01 11:30 a.m.'
        |""".stripMargin).head
    assert(out.get(0) == "hello")
    assert(out.get(1) == 42)
    assert(out.get(2) == 3.14)
    assert(out.get(3) == true)
    assert(out.get(4) == LocalTime.of(11, 30))
    assert(out.get(5) == java.sql.Date.valueOf("2024-01-01"))
    assert(out.get(6) == LocalDateTime.of(2024, 1, 1, 11, 30))
  }

  test("cast strictness matrix (reference types.py doctests)") {
    // ["25","1000 MG","","1.5E-3","+5","inf"] ::?float64
    val df = Seq("25", "1000 MG", "", "1.5E-3", "+5", "inf").toDF("dose")
    val got = Dftly.select(df, "v: $dose::?float64\n").collect().map(_.get(0))
    assert(got(0) == 25.0 && got(1) == null && got(2) == null)
    assert(got(3) == 0.0015 && got(4) == 5.0)
    assert(got(5) == Double.PositiveInfinity)
  }

  test("duration construction matrix: strings, sub-second, fractional months/years") {
    def secs(e: String): Any = {
      val df = Seq(1).toDF("x")
      Dftly.select(df, s"v: ($e)::total_seconds\n").head.get(0)
    }
    def micros(e: String): Any = {
      val df = Seq(1).toDF("x")
      Dftly.select(df, s"v: ($e)::total_microseconds\n").head.get(0)
    }
    assert(secs("3::days") == 3L * 86400)
    assert(secs("3::minutes") == 180L)
    assert(secs("'4'::weeks") == 28L * 86400) // string → duration
    assert(micros("1500::milliseconds") == 1500000L)
    assert(micros("1500::microseconds") == 1500L)
    assert(micros("1500000::nanoseconds") == 1500L) // µs-precision (SURVEY §2.8.2)
    // months/years approximations, fractional inputs, exact to the reference
    assert(secs("1.5::years") == (1.5 * 365.25 * 86400).toLong)
    assert(secs("-0.1::months") == -262980L)
  }

  test("cast construction errors match the reference") {
    val e1 = intercept[Exception](Dftly.parse(Map("cast" -> Seq(Map("literal" -> "3")))))
    assert(e1.getMessage.contains("exactly two positional arguments"))
    val e2 = intercept[Exception](
      Dftly.parse(Map("cast" -> Map("source" -> 3, "type" -> "int", "strict" -> "yes"))))
    assert(e2.getMessage.contains("strict argument must be a boolean"))
    val e3 = intercept[Exception](Dftly.parse("$x::notatype"))
    assert(e3.getMessage.contains("Unsupported type: notatype"))
    val e4 = intercept[Exception](
      Dftly.parse(Map("cast" -> Map("source" -> 3, "type" -> "minutes", "strict" -> false))))
    assert(e4.getMessage.contains("Non-strict casting is not supported for unit 'minutes'"))
  }

  test("dftly() SQL function embeds string-form expressions in spark.sql") {
    Dftly.registerSql(spark)
    Seq((10.0, 0.1, "AB-12"), (200.0, 0.25, "CD-34")).toDF("price", "discount", "code")
      .createOrReplaceTempView("sqlreg_t")
    val rows = spark.sql(
      """SELECT dftly('$price * (1 - $discount)') AS rev,
        |       dftly('$code[0:2]') AS prefix,
        |       dftly('"HIGH" if $price > 100 else "LOW"') AS flag
        |FROM sqlreg_t ORDER BY rev""".stripMargin).collect()
    assert(rows(0) == Row(9.0, "AB", "LOW"))
    assert(rows(1) == Row(150.0, "CD", "HIGH"))
  }

  test("hash doctests: null fallback via coalesce (reference arithmetic.py)") {
    val df = Seq(Some("a"), Some("b"), None, None, Some("a"))
      .toDF("mrn")
    val hashed = Dftly.select(df,
      """h: hash($mrn)
        |h_filled: hash($mrn ?? 'UNKNOWN')
        |""".stripMargin).collect()
    // null → null for plain hash; filled never null; equal inputs hash equal
    assert(hashed(2).get(0) == null && hashed(3).get(0) == null)
    assert(hashed.forall(_.get(1) != null))
    assert(hashed(0).get(0) == hashed(4).get(0))
    assert(hashed(2).get(1) == hashed(3).get(1))
  }

  test("power doctest: the streaming-stddev formula (reference arithmetic.py:420-426)") {
    val df = Seq((10.0, 60.0, 2L)).toDF("sum", "sum_sqd", "n")
    val out = Dftly.select(df, "stddev: ($sum_sqd/$n - ($sum/$n)**2)**0.5\n").head
    assert(math.abs(out.getDouble(0) - math.sqrt(60.0 / 2 - 25.0)) < 1e-12)
  }

  test("backtick-quoted column names") {
    val df = Seq(("mg", 5.0)).toDF("Unit Name", "v")
    val out = Dftly.select(df, "u: $`Unit Name`\n")
    assert(out.head.getString(0) == "mg")
  }
}
