package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation per the published Robots Exclusion Protocol
  * (RFC 9309; the wildcard/anchor extensions are the spec's own) — the
  * compliance gate a crawl-curation pipeline applies before keeping a
  * URL's content. Re-implemented from the RFC; the reference has no URL
  * surface at all (parser.py:326-344).
  *
  * Split into two kernels so the EXPENSIVE step runs once per domain and
  * the cheap step once per URL (a domain's robots.txt is joined to
  * millions of its URLs — re-parsing the grammar per URL would dominate):
  *
  *   - [[RobotsRulesExpr]] (`robots_rules(txt)` under a fixed agent):
  *     parse the full grammar — group selection for the agent (exact
  *     product-token match case-insensitively, else the `*` group; all
  *     groups naming the agent merge, per the RFC), allow/disallow lines,
  *     empty-pattern lines ignored — into a compact one-line-per-rule
  *     string (`A:<pattern>` / `D:<pattern>`, newline-joined; patterns
  *     cannot contain newlines, the grammar is line-based).
  *   - [[RobotsAllowedExpr]] (`robots_allowed(rules, path)`): split the
  *     compact encoding and take the LONGEST-matching rule (specificity =
  *     pattern octet length per the RFC), allow winning length ties;
  *     no matching rule — or a NULL/absent robots.txt — means allowed.
  *     `*` matches any octet sequence, `$` at pattern end anchors the
  *     path end; both are literal anywhere else is out of spec and
  *     treated as written (a mid-pattern `$` matches itself, the
  *     published de-facto behavior).
  *
  * Scale shape: both kernels are codegen'd map-only row functions; the
  * only exchange in a robots-filter pipeline is the URL↔robots join the
  * caller already owns (host-keyed; broadcast when the robots table is a
  * crawl frontier's, sort-merge when it is the whole web's).
  */
object RobotsMatch {

  /** Parse robots.txt for `agent` → compact rules encoding. */
  def compileRules(txt: String, agent: String): String = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // pass 1: does any group name the agent specifically?
    // group structure per RFC: one or more user-agent lines, then rules;
    // a user-agent line after rules starts a NEW group
    val lines = txt.split("\n", -1).iterator.map { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      noComment.trim
    }.filter(_.nonEmpty).toArray

    def parse(wantSpecific: Boolean): (Boolean, Seq[(Boolean, String)]) = {
      var inAgents = false        // currently reading a group's agent lines
      var groupActive = false     // current group applies to us
      var sawSpecific = false
      val out = Seq.newBuilder[(Boolean, String)]
      lines.foreach { line =>
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inAgents) { inAgents = true; groupActive = false }
              val v = value.toLowerCase(java.util.Locale.ROOT)
              val hit = if (wantSpecific) v == agentLc else v == "*"
              if (v == agentLc) sawSpecific = true
              if (hit) groupActive = true
            case "allow" | "disallow" =>
              inAgents = false
              // empty pattern = no rule (an empty Disallow allows all)
              if (groupActive && value.nonEmpty)
                out += ((key == "allow", value))
            case _ =>
              // sitemap / crawl-delay / unknown: ends the agent-line run
              // but does not end the group
              inAgents = false
          }
        }
      }
      (sawSpecific, out.result())
    }

    val (sawSpecific, specificRules) = parse(wantSpecific = true)
    val rules = if (sawSpecific) specificRules else parse(wantSpecific = false)._2
    rules.map { case (allow, p) => (if (allow) "A:" else "D:") + normalizePercent(p) }
      .mkString("\n")
  }

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
  @inline private def isUnreserved(v: Int): Boolean =
    (v >= 'a' && v <= 'z') || (v >= 'A' && v <= 'Z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** RFC 9309 §2.2.2 percent-encoding normalization, applied to compiled
    * patterns and to paths before octet comparison: decode percent-triplets
    * of UNRESERVED characters (ALPHA / DIGIT / `-._~`, RFC 3986 §2.3) and
    * uppercase the hex of the triplets that remain, so `/a%7Eb` matches a
    * `Disallow: /a~b` rule and `%2f` compares equal to `%2F`. Reserved
    * triplets stay encoded — decoding them would change path-segment
    * structure (and `%2A`/`%24` would forge `*`/`$` metacharacters into a
    * pattern). Malformed triplets pass through literally.
    */
  def normalizePercent(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Does `pattern` (with `*` wildcards and an optional trailing `$`
    * anchor) match a PREFIX of `path` starting at position 0?
    */
  def patternMatches(pattern: String, path: String): Boolean = {
    val (p, anchored) =
      if (pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$')
        (pattern.substring(0, pattern.length - 1), true)
      else (pattern, false)
    // greedy segment match: split on '*', first segment anchored at 0,
    // later segments found left-to-right, anchored tail must END the path
    val segs = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      if (i == 0) {
        if (!path.startsWith(s)) return false
        pos = s.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment must end the path at/after pos
        if (path.length - s.length < pos || !path.endsWith(s)) return false
        pos = path.length
      } else {
        val at = path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    if (anchored && segs.length == 1) pos == path.length else true
  }

  /** RFC decision: longest (most-specific) matching pattern wins, allow
    * wins length ties, no match ⇒ allowed.
    */
  def allowed(compiledRules: String, path: String): Boolean = {
    if (compiledRules.isEmpty) return true
    // patterns were normalized at compile time; normalize the path once
    // here so the comparison is over RFC 9309 §2.2.2 canonical octets
    val npath = normalizePercent(path)
    var bestLen = -1
    var bestAllow = true
    compiledRules.split("\n", -1).foreach { line =>
      if (line.length >= 2) {
        val allow = line.charAt(0) == 'A'
        val pattern = line.substring(2)
        if (patternMatches(pattern, npath)) {
          val len = pattern.length
          if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
            bestLen = len
            bestAllow = allow
          }
        }
      }
    }
    bestAllow
  }
}

/** Codegen'd robots.txt compilation for a fixed agent:
  * `robots_rules(txt)` → the compact `A:`/`D:` rules encoding. Null in →
  * null out (a missing robots.txt is "allowed" downstream).
  */
case class RobotsRulesExpr(child: Expression, agent: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"robots_rules needs a string column, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "robots_rules"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(RobotsMatch.compileRules(
      input.asInstanceOf[UTF8String].toString, agent))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.ops.expr.RobotsMatch$$.MODULE$$" +
        s".compileRules($c.toString(), $agentRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): RobotsRulesExpr =
    copy(child = newChild)
}

/** Codegen'd robots decision: `robots_allowed(rules, path)` under the
  * RFC longest-match semantics. NULL rules (no robots.txt for the
  * domain) → true, the protocol's default-allow.
  */
case class RobotsAllowedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"robots_allowed needs (rules string, path string), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = right.nullable
  override def prettyName: String = "robots_allowed"

  // default-allow on missing robots: null rules evaluate to TRUE, so the
  // standard null-propagating eval is overridden
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val p = right.eval(input)
    if (p == null) null
    else {
      val r = left.eval(input)
      if (r == null) true
      else RobotsMatch.allowed(
        r.asInstanceOf[UTF8String].toString,
        p.asInstanceOf[UTF8String].toString)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${rightGen.code}
        boolean ${ev.isNull} = ${rightGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${leftGen.code}
          if (${leftGen.isNull}) {
            ${ev.value} = true;
          } else {
            ${ev.value} = graft.ops.expr.RobotsMatch$$.MODULE$$.allowed(
              ${leftGen.value}.toString(), ${rightGen.value}.toString());
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowedExpr =
    copy(left = newLeft, right = newRight)
}
