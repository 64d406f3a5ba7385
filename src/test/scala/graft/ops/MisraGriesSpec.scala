package graft.ops

import org.apache.spark.sql.functions._
import graft.dftly.SparkTestBase
import graft.ops.expr.MisraGriesSketch
import org.apache.spark.unsafe.types.UTF8String

class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish skewed corpus: token "t<i>" appears ~1000/i times. */
  private def skewedDocs(nTokens: Int) = {
    val words = (1 to nTokens).flatMap { i =>
      val reps = math.max(1, 1000 / i)
      Seq.fill(reps)(s"t$i")
    }
    // shuffle deterministically so heavy tokens aren't clustered
    val r = new scala.util.Random(42)
    val shuffled = r.shuffle(words)
    shuffled.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("sketch is exact (err=0, true counts) when budget >= distinct tokens") {
    val df = skewedDocs(200)
    val sk = Corpus.tokenSketch(df, "text", budget = 1024).head()
    assert(sk.getLong(1) == 0L) // err
    val exact = Corpus.tokenFrequencies(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val items = sk.getSeq[org.apache.spark.sql.Row](2)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(items == exact)
    assert(sk.getLong(0) == exact.values.sum) // n
  }

  test("MG guarantee holds at tiny budget: est <= true <= est + err, heavy items present") {
    val df = skewedDocs(500).repartition(7)
    val sk = Corpus.tokenSketch(df, "text", budget = 16).head()
    val n = sk.getLong(0)
    val err = sk.getLong(1)
    assert(err > 0L && err <= n / 17 + 1)
    val est = sk.getSeq[org.apache.spark.sql.Row](2)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Corpus.tokenFrequencies(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (tok, truth) =>
      val e = est.getOrElse(tok, 0L)
      assert(e <= truth, s"$tok overestimated: $e > $truth")
      assert(truth <= e + err, s"$tok undercount beyond bound: $truth > $e + $err")
      if (truth > err) assert(est.contains(tok), s"heavy token $tok missing (true=$truth, err=$err)")
    }
  }

  test("buffer merge matches the mergeable-summaries contract") {
    // direct unit check of the combine: counter sum, subtract (budget+1)-th
    // largest, fold into err
    val a = new MisraGriesSketch.Buffer(2)
    val b = new MisraGriesSketch.Buffer(2)
    Seq("x", "x", "x", "y", "y").foreach(t => a.add(UTF8String.fromString(t)))
    Seq("z", "z", "y").foreach(t => b.add(UTF8String.fromString(t)))
    a.mergeIn(b)
    // merged: x=3 y=3 z=2 → cut 3rd largest (2): x=1, y=1, z dropped, err += 2
    val items = a.sortedItems.map { case (t, e) => t.toString -> e }.toMap
    assert(items == Map("x" -> 1L, "y" -> 1L))
    assert(a.err == 2L)
    assert(a.n == 8L)
  }

  test("topTokensSketch returns the exact top-k with a valid certificate") {
    val df = skewedDocs(400)
    val expected = Corpus.topTokens(df, "text", 15).collect().toSeq
    // modest budget — certificate must hold on this skew
    val got = Corpus.topTokensSketch(df, "text", 15, budget = 256, strict = true)
      .collect().toSeq
    assert(got == expected)
  }

  test("topTokensSketch is partitioning-invariant (exact either way)") {
    val df = skewedDocs(400)
    val a = Corpus.topTokensSketch(df.repartition(3), "text", 10, budget = 256).collect().toSeq
    val b = Corpus.topTokensSketch(df.repartition(13), "text", 10, budget = 256).collect().toSeq
    assert(a == b)
  }

  test("certificate failure: strict throws, default falls back to exact") {
    // near-uniform: 800 distinct tokens, 2 occurrences each — at budget 8
    // err ≈ n/9 >> 2, so no rank is certifiable
    val words = (1 to 800).flatMap(i => Seq(s"u$i", s"u$i"))
    val r = new scala.util.Random(7)
    val df = r.shuffle(words).grouped(40).map(_.mkString(" ")).toSeq.toDF("text")
    intercept[IllegalStateException] {
      Corpus.topTokensSketch(df, "text", 5, budget = 8, strict = true).collect()
    }
    val fallback = Corpus.topTokensSketch(df, "text", 5, budget = 8).collect().toSeq
    val exact = Corpus.topTokens(df, "text", 5).collect().toSeq
    assert(fallback == exact)
  }
}
