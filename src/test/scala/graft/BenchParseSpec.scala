package graft

import org.scalatest.funsuite.AnyFunSuite

/** The forked bench's child-JSON merge parsers: the committed artifact is
  * assembled from these, so their edge cases (scientific notation, empty
  * maps, failed lists, adjacent objects) are pinned without spinning up a
  * Spark session.
  */
class BenchParseSpec extends AnyFunSuite {

  private val child =
    """{"metric":"total","value":1.23,"unit":"sec",""" +
      """"queries":{"q01_arith":0.202692275,"q35_salted_join":1.0E-4},""" +
      """"spread":{"q01_arith":0.122,"q35_salted_join":0.000},""" +
      """"sf":"/root/testdata/sf0.01","cold_total":5.964434024,""" +
      """"failed":["q99_zzz","q98_yyy"],"mode":"single-jvm"}"""

  test("parseMap: flat maps, scientific notation, stops at the first brace") {
    val q = Bench.parseMap(child, "queries")
    assert(q == Map("q01_arith" -> 0.202692275, "q35_salted_join" -> 1.0e-4))
    // the spread object directly follows — parseMap must not bleed into it
    val s = Bench.parseMap(child, "spread")
    assert(s("q01_arith") == 0.122 && s("q35_salted_join") == 0.0)
    assert(Bench.parseMap(child, "nonexistent").isEmpty)
    assert(Bench.parseMap("""{"queries":{}}""", "queries").isEmpty)
  }

  test("parseNum and parseFailed") {
    assert(Bench.parseNum(child, "cold_total") == 5.964434024)
    assert(Bench.parseNum(child, "value") == 1.23)
    assert(Bench.parseNum(child, "missing") == 0.0)
    assert(Bench.parseFailed(child) == Seq("q99_zzz", "q98_yyy"))
    assert(Bench.parseFailed("""{"failed":[]}""") == Seq.empty)
  }
}
