package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parsed Public Suffix List rules — the full eTLD+1 algorithm as
  * published at publicsuffix.org (normal, `*.` wildcard, and `!`
  * exception rules; longest match wins, exceptions beat wildcards,
  * unlisted TLDs fall to the implicit `*` rule). Built from a
  * caller-supplied copy of the (public) list via [[PslRules.parse]];
  * [[PslRules.default]] is the compact built-in subset
  * ([[graft.ops.WebText.TwoLevelSuffixes]]) so the zero-dependency path
  * keeps its exact prior behavior.
  *
  * The rule sets ship inside the task binary like
  * [[BpeCountExpr]]'s merge table and [[BloomProbeExpr]]'s filter — the
  * full list is ~10k rules / a few hundred KB, serialized once per task,
  * probed per row inside whole-stage codegen with O(#labels) set lookups.
  */
case class PslRules(
    normal: Set[String],
    wildcard: Set[String], // the part after "*." — "*.ck" stored as "ck"
    exception: Set[String] // the part after "!" — "!www.ck" as "www.ck"
) extends Serializable {

  /** Longest rule length in labels, bounding the per-host suffix walk. */
  val maxLabels: Int = {
    val all = normal.iterator.map(_.count(_ == '.') + 1) ++
      wildcard.iterator.map(_.count(_ == '.') + 2) ++
      exception.iterator.map(_.count(_ == '.') + 1)
    if (normal.isEmpty && wildcard.isEmpty && exception.isEmpty) 1
    else all.max
  }

  /** Registrable domain (eTLD+1) per the published algorithm. The host is
    * lowercased here (step 1 of the published algorithm is case
    * normalization; rules are lowercased at parse) so a direct caller
    * passing `Example.CO.UK` matches the `co.uk` rule instead of falling
    * to the implicit-* rule. When the host IS a public suffix (or a single
    * label), it passes through unchanged — quota/blocklist keying wants a
    * deterministic non-null key for those, matching the compact variant's
    * behavior — and null stays null.
    */
  def registrable(rawHost: String): String = {
    if (rawHost == null || rawHost.isEmpty) return rawHost
    val host = rawHost.toLowerCase(java.util.Locale.ROOT)
    val labels = host.split('.')
    val n = labels.length
    if (n <= 1) return host
    def suffix(len: Int): String = {
      val sb = new java.lang.StringBuilder()
      var i = n - len
      while (i < n) {
        if (i > n - len) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
    // prevailing rule per the published algorithm: "if more than one rule
    // matches, the prevailing rule is the one which is an exception rule"
    // — at ANY length, not just longer ones — else the longest matching
    // normal/wildcard rule, else the implicit "*" (last label). The
    // exception pass runs to completion first: a longer normal rule must
    // NOT shadow a shorter exception.
    var psLen = 1
    var decided = false
    var l = math.min(n, maxLabels)
    while (l >= 1 && !decided) {
      if (exception.contains(suffix(l))) { psLen = l - 1; decided = true }
      l -= 1
    }
    l = math.min(n, maxLabels)
    while (l >= 1 && !decided) {
      val s = suffix(l)
      if (normal.contains(s)) { psLen = l; decided = true }
      else if (l >= 2 && wildcard.contains(suffix(l - 1))) { psLen = l; decided = true }
      l -= 1
    }
    if (psLen >= n) host // the host is itself a public suffix
    else suffix(psLen + 1)
  }
}

object PslRules {

  /** Parse text in the published PSL format: one rule per line, `//`
    * comments and blanks skipped, rules lowercased. (The real list's
    * ICANN/PRIVATE section markers are comments, so both sections load.)
    */
  def parse(text: String): PslRules = {
    val normal = Set.newBuilder[String]
    val wildcard = Set.newBuilder[String]
    val exception = Set.newBuilder[String]
    text.linesIterator.foreach { raw =>
      // per the spec only the part up to the first whitespace is the rule
      val line = raw.trim.takeWhile(c => !c.isWhitespace).toLowerCase
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!")) exception += line.substring(1)
        else if (line.startsWith("*.")) wildcard += line.substring(2)
        else normal += line
      }
    }
    PslRules(normal.result(), wildcard.result(), exception.result())
  }

  /** The compact built-in subset — identical keying to the literal-only
    * [[graft.ops.WebText.registrableDomain]] column expression.
    */
  lazy val default: PslRules =
    PslRules(graft.ops.WebText.TwoLevelSuffixes.toSet, Set.empty, Set.empty)
}

/** `psl_registrable_domain(host)` under a fixed rule set — the full-PSL
  * variant of eTLD+1, evaluated per row inside whole-stage codegen.
  */
case class PslRegistrableDomainExpr(child: Expression, rules: PslRules)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"psl_registrable_domain needs a string host column, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "psl_registrable_domain"

  def compute(host: UTF8String): UTF8String =
    UTF8String.fromString(rules.registrable(host.toString))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslExpr", this, classOf[PslRegistrableDomainExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PslRegistrableDomainExpr =
    copy(child = newChild)
}
