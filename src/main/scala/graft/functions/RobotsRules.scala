package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Robots Exclusion Protocol core (RFC 9309 — the published standard
  * of the de-facto robots.txt format): group selection, wildcard
  * path rules, longest-match precedence. The DataFrame-level
  * politeness screen is [[graft.operators.Robots.filterAllowed]];
  * this file holds the parser, the matcher, and the native
  * [[RobotsAllowed]] expression that evaluates them per row.
  *
  * Matching semantics (RFC 9309 §2.2):
  *   - `Allow`/`Disallow` values are PATH PREFIXES with `*` matching
  *     any char sequence and `$` anchoring the end; an empty
  *     `Disallow:` matches nothing;
  *   - the MOST SPECIFIC matching rule wins — longest value by
  *     length; on an Allow/Disallow tie, Allow wins;
  *   - no matching rule, no group for the agent (falling back to the
  *     `*` groups), or no robots.txt ⇒ allowed.
  */
object RobotsRules {

  /** One compiled rule: raw value (for specificity), its wildcard
    * segments, end-anchored or not, allow or disallow. */
  final case class Rule(value: String, allow: Boolean) {
    val anchored: Boolean = value.endsWith("$")
    val segments: Array[String] =
      (if (anchored) value.dropRight(1) else value).split("\\*", -1)

    /** Wildcard prefix match. Middles match leftmost (minimizing the
      * consumed prefix — the easiest-to-satisfy arrangement, so no
      * backtracking is ever needed); an anchored final segment must
      * end the path. */
    def matches(path: String): Boolean = {
      if (value.isEmpty) return false // empty Disallow: matches nothing
      var pos = 0
      var i = 0
      while (i < segments.length) {
        val seg = segments(i)
        if (i == 0) {
          if (!path.startsWith(seg)) return false
          pos = seg.length
        } else if (i == segments.length - 1 && anchored) {
          if (path.length - pos < seg.length || !path.endsWith(seg))
            return false
          pos = path.length
        } else {
          val at = path.indexOf(seg, pos)
          if (at < 0) return false
          pos = at + seg.length
        }
        i += 1
      }
      !anchored || pos == path.length
    }
  }

  /** The compiled rule group one agent sees over one robots text.
    * `crawlDelay` is the group's `Crawl-delay` in seconds (the widely
    * honored extension directive; RFC 9309 leaves it undefined) —
    * `None` when the selected groups carry none; multiple values
    * merge to the MAX (the most polite reading). Parsed here so the
    * fetch-wave scheduler ([[graft.operators.UrlCuration.fetchWaves]])
    * reads it through the same memoized parse the allow/deny match
    * uses. */
  final case class Group(rules: IndexedSeq[Rule],
      crawlDelay: Option[Double] = None,
      sitemaps: IndexedSeq[String] = Vector.empty) {
    /** Longest-value matching rule wins; Allow wins ties; no match ⇒
      * allowed. */
    def isAllowed(path: String): Boolean = {
      var bestLen = -1
      var bestAllow = true
      var i = 0
      while (i < rules.length) {
        val r = rules(i)
        if (r.matches(path)) {
          val len = r.value.length
          if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
            bestLen = len; bestAllow = r.allow
          }
        }
        i += 1
      }
      bestLen < 0 || bestAllow
    }
  }

  /** Parse a robots.txt for `agent` (case-insensitive product token):
    * groups are runs of `User-agent` lines followed by rule lines;
    * all groups naming the agent (or, if none do, all `*` groups)
    * merge. Unknown directives and `#` comments are ignored per the
    * RFC; a missing group ⇒ empty rule set ⇒ allow-all. `Sitemap:`
    * lines are GLOBAL per the sitemaps.org protocol (they belong to
    * no group), so they are collected position-independently for
    * every agent: the value's first whitespace-delimited token (a
    * sitemap value is a URL — it carries no spaces; the oracle's
    * `\S+` extraction mirrors the same cut), deduped preserving
    * first-occurrence order. */
  def parse(text: String, agent: String): Group = {
    val want = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = Vector.newBuilder[Rule]
    val star = Vector.newBuilder[Rule]
    val maps = Vector.newBuilder[String]
    var delayExact: Option[Double] = None
    var delayStar: Option[Double] = None
    var exactHit = false
    var groupExact = false
    var groupStar = false
    var inAgentRun = false
    text.linesIterator.foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i => raw.substring(0, i).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            // a User-agent line after rule lines starts a NEW group
            if (!inAgentRun) { groupExact = false; groupStar = false }
            inAgentRun = true
            val v = value.toLowerCase(java.util.Locale.ROOT)
            if (v == want) { groupExact = true; exactHit = true }
            else if (v == "*") groupStar = true
          case "allow" | "disallow" =>
            inAgentRun = false
            val rule = Rule(value, allow = key == "allow")
            if (groupExact) exact += rule
            if (groupStar) star += rule
          case "crawl-delay" =>
            // group-scoped like the path rules; an unparsable value is
            // ignored per the RFC's unknown-line tolerance; repeated
            // values merge to the MAX (most polite)
            inAgentRun = false
            value.toDoubleOption.filter(d => d >= 0 && d.isFinite).foreach { d =>
              if (groupExact) delayExact = Some(delayExact.fold(d)(math.max(_, d)))
              if (groupStar) delayStar = Some(delayStar.fold(d)(math.max(_, d)))
            }
          case "sitemap" =>
            // global, group-independent (sitemaps.org): collected for
            // every agent; the value's first token is the URL
            inAgentRun = false
            if (value.nonEmpty) maps += value.split("\\s+")(0)
          case _ => inAgentRun = false // Host, …
        }
      }
    }
    val sitemaps = maps.result().distinct
    if (exactHit) Group(exact.result(), delayExact, sitemaps)
    else Group(star.result(), delayStar, sitemaps)
  }

  /** Bounded per-JVM parse memo (the [[BpeTable]] cache posture): a
    * crawl partition evaluates the same few domains' texts over and
    * over, so the steady state is one digest + hash probe per row.
    * Keys are SHA-256 digests of (agent, text) — the map never pins
    * the robots TEXTS themselves (hundreds of KB each are common in
    * the wild; 4096 of those would be real executor memory), only the
    * compiled groups. On overflow the map is CLEARED, not frozen —
    * a stop-inserting-at-cap policy would re-parse every new distinct
    * text on every row forever (the r18 ADVICE fix). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Group]()
  private val CacheCap = 1 << 12

  private val sha = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-256"))

  /** The memoized compiled group for (robots text, agent). */
  private[graft] def groupFor(robotsTxt: UTF8String, agent: String): Group = {
    val md = sha.get()
    md.reset()
    md.update(agent.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(0.toByte) // unambiguous (agent, text) framing
    md.update(robotsTxt.getBytes)
    val key = java.util.Base64.getEncoder.encodeToString(md.digest())
    var g = cache.get(key)
    if (g == null) {
      g = parse(robotsTxt.toString, agent)
      if (cache.size() >= CacheCap) cache.clear()
      cache.put(key, g)
    }
    g
  }

  def isAllowed(robotsTxt: UTF8String, path: UTF8String,
      agent: String): Boolean =
    groupFor(robotsTxt, agent).isAllowed(path.toString)

  /** The selected group's `Crawl-delay` in seconds, or NaN when none
    * (the codegen seam can't carry an Option — NaN maps to NULL in
    * [[RobotsCrawlDelay]]). */
  def crawlDelayOf(robotsTxt: UTF8String, agent: String): Double =
    groupFor(robotsTxt, agent).crawlDelay.getOrElse(Double.NaN)

  /** The text's global `Sitemap:` URLs as Catalyst array data — the
    * codegen seam for [[RobotsSitemaps]]; same memoized parse as the
    * allow/deny match, so a pipeline evaluating both pays one parse
    * per distinct text. */
  def sitemapArrayOf(robotsTxt: UTF8String, agent: String):
      org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      groupFor(robotsTxt, agent).sitemaps
        .map(UTF8String.fromString).toArray[Any])
}

/** `robots_allowed(robots_txt, path)` — may `agent` fetch `path`
  * under this robots.txt? Per-row native evaluation with the parse
  * memoized per distinct text ([[RobotsRules.isAllowed]]). */
case class RobotsAllowed(left: Expression, right: Expression,
    agent: String) extends BinaryExpression {

  require(agent.nonEmpty && !agent.contains("*"),
    s"agent='$agent' must be a concrete product token")

  override def prettyName: String = "robots_allowed"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"robots_allowed expects (string, string) columns, got $other")
    }

  override def nullSafeEval(t: Any, p: Any): Any =
    RobotsRules.isAllowed(
      t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ag = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.functions.RobotsRules.isAllowed($t, $p, $ag);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `robots_sitemaps(robots_txt)` — the `Sitemap:` URLs the text
  * declares (sitemaps.org protocol; GLOBAL, group-independent —
  * collected from anywhere in the file), first-occurrence order,
  * deduped; empty array when none. Same memoized parse as
  * [[RobotsAllowed]], keyed by the supplied agent so the pipeline's
  * screens share one memo entry. Seeds the crawl frontier
  * ([[graft.operators.Robots.sitemapSeeds]]). */
case class RobotsSitemaps(child: Expression, agent: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(agent.nonEmpty && !agent.contains("*"),
    s"agent='$agent' must be a concrete product token")

  override def prettyName: String = "robots_sitemaps"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"robots_sitemaps expects a string column, got $other")
  }

  override def nullSafeEval(t: Any): Any =
    RobotsRules.sitemapArrayOf(t.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ag = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.RobotsRules.sitemapArrayOf($t, $ag);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `robots_crawl_delay(robots_txt)` — the `Crawl-delay` (seconds) the
  * selected agent group declares, NULL when none. Same memoized parse
  * as [[RobotsAllowed]] ([[RobotsRules.groupFor]]), so a frontier
  * evaluating both pays ONE parse per distinct text. */
case class RobotsCrawlDelay(child: Expression, agent: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(agent.nonEmpty && !agent.contains("*"),
    s"agent='$agent' must be a concrete product token")

  override def prettyName: String = "robots_crawl_delay"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"robots_crawl_delay expects a string column, got $other")
  }

  override def nullSafeEval(t: Any): Any = {
    val d = RobotsRules.crawlDelayOf(t.asInstanceOf[UTF8String], agent)
    if (d.isNaN) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ag = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    val childGen = child.genCode(ctx)
    val d = ctx.freshName("delay")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${childGen.isNull}) {
          double $d = graft.functions.RobotsRules.crawlDelayOf(${childGen.value}, $ag);
          if (!Double.isNaN($d)) { ${ev.isNull} = false; ${ev.value} = $d; }
        }
      """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
