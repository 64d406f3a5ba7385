package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row repetition-coverage kernel for Gopher-style quality filtering
  * (Rae et al. 2021, "Scaling Language Models", table A1 — the
  * duplicate-n-gram family; the reference has no quality surface at all,
  * its pipeline starts after curation: parser.py:326-344).
  *
  * [[RepKernels.dupNgramTokenCoverage]] answers: what fraction of a
  * document's TOKENS sit inside some word n-gram that occurs at least
  * twice in the document? (Gopher's metric is character-weighted; the
  * token-position variant used here replays exactly in portable SQL —
  * DuckDB unnest + count window + position coverage — so the oracle can
  * hash-compare values instead of spot-checking. Both saturate on the
  * same pathology: machine-repeated spans.)
  *
  * One pass per row, no shuffle: tokenize → count n-gram multiset in a
  * hash map → mark covered token positions for grams seen ≥ 2 times →
  * covered / tokenCount. Exact integer-over-integer division; 0.0 when
  * the document has fewer than `n` tokens. The staged HOF formulation
  * ([[graft.ops.Corpus.dupNgramTokenCoverageHof]]) is the reference
  * semantics, pinned bit-identical in RepetitionSpec.
  */
object RepKernels {

  def dupNgramTokenCoverage(text: UTF8String, n: Int): Double = {
    val s = text.toString
    val len = s.length
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isWs(s.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val k = starts.size()
    if (k < n || k == 0) return 0.0
    val total = k - n + 1
    val grams = new Array[String](total)
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder()
    var st = 0
    while (st < total) {
      sb.setLength(0)
      var j = st
      while (j < st + n) {
        if (j > st) sb.append(' ')
        sb.append(s, starts.get(j), ends.get(j))
        j += 1
      }
      grams(st) = sb.toString
      counts.merge(grams(st), 1, Integer.sum)
      st += 1
    }
    val covered = new Array[Boolean](k)
    st = 0
    while (st < total) {
      if (counts.get(grams(st)) >= 2) {
        var j = st
        while (j < st + n) { covered(j) = true; j += 1 }
      }
      st += 1
    }
    var c = 0
    i = 0
    while (i < k) { if (covered(i)) c += 1; i += 1 }
    c.toDouble / k
  }
}

/** `dup_ngram_coverage(text, n)` — codegen'd wrapper over
  * [[RepKernels.dupNgramTokenCoverage]]; same expression shape as
  * [[TopNgramFraction]].
  */
case class DupNgramCoverage(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"dup_ngram_coverage n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"text must be STRING, got $other")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dup_ngram_coverage"

  override protected def nullSafeEval(input: Any): Any =
    RepKernels.dupNgramTokenCoverage(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.RepKernels.dupNgramTokenCoverage($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DupNgramCoverage =
    copy(child = newChild)
}
