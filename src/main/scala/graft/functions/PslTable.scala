package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix-list table + registered-domain (eTLD+1) extraction —
  * the unit C4/RefinedWeb cap documents on (Penedo et al. 2023 §3.1):
  * a template farm spread across subdomains (`a.spam.com`,
  * `b.spam.com`, …) evades a host-level cap, and no fixed label count
  * separates `bbc.co.uk` from `news.bbc.co.uk` — only the public
  * suffix list does (publicsuffix.org; the algorithm and file format
  * are public).
  *
  * PSL algorithm implemented exactly (publicsuffix.org/list/):
  * among rules whose labels are a suffix of the host's labels (`*`
  * matching exactly one label), an EXCEPTION rule (`!www.ck`) wins
  * outright with public suffix = the rule minus its leftmost label;
  * otherwise the longest match wins; no match ⇒ the implicit `*` rule
  * (the TLD itself is public). Registered domain = public suffix plus
  * one preceding label. Hosts that ARE a public suffix, empty hosts,
  * and IPv4-shaped hosts return themselves (a stable, never-NULL cap
  * key). A trailing `:port` is ignored for matching and stripped from
  * the result (one farm, any port).
  *
  * Carried by [[RegisteredDomain]] as a codegen reference object (the
  * [[NbKernel]]/[[BpeTable]] pattern): per row one label walk over
  * three hash sets — map-only, zero exchanges, no join against a
  * rules relation. The committed snapshot ([[PslTable.fixture]]) is a
  * representative SUBSET in the standard file format; the full
  * published list drops in through the same [[PslTable.fromText]].
  */
final class PslTable private (
    val exact: Set[String], val wildTails: Set[String],
    val exceptions: Set[String]) extends Serializable {

  require(exact.nonEmpty || wildTails.nonEmpty,
    "empty PSL table — no rules parsed")

  /** The rules as relation rows `(kind, rule)` — the snapshot shape
    * the q_domain_cap_psl oracle re-derives the match from (`wild`
    * rules store the TAIL, i.e. `*.ck` → `ck`). */
  def toRows: Seq[(String, String)] =
    exact.toSeq.sorted.map(("exact", _)) ++
      wildTails.toSeq.sorted.map(("wild", _)) ++
      exceptions.toSeq.sorted.map(("exc", _))

  /** Registered domain of one canonical host (see object doc for the
    * full contract). */
  def registeredDomain(host: String): String = {
    if (host == null) return null
    val h = PslTable.PortRe.matcher(host).replaceAll("")
    if (h.isEmpty || PslTable.Ipv4Re.matcher(h).matches()) return h
    val ls = h.split("\\.", -1)
    val n = ls.length
    // suffix of the last k labels, built right-to-left once each
    def suffix(k: Int): String = ls.slice(n - k, n).mkString(".")
    var ps = 1 // the implicit '*' rule: the TLD itself is public
    var k = 1
    var excPs = -1
    while (k <= n) {
      val s = suffix(k)
      if (exceptions.contains(s)) excPs = k - 1
      if (exact.contains(s) && k > ps) ps = k
      if (k < n && wildTails.contains(s) && k + 1 > ps) ps = k + 1
      k += 1
    }
    if (excPs >= 0) ps = excPs
    if (n > ps) suffix(ps + 1) else h
  }
}

object PslTable {

  private[functions] val PortRe =
    java.util.regex.Pattern.compile(":[0-9]+$")
  private[functions] val Ipv4Re =
    java.util.regex.Pattern.compile("[0-9.]+")

  /** Parse the standard PSL file format: `//` comment lines and blank
    * lines ignored; `!rule` = exception, `*.tail` = wildcard, else
    * exact. Rules are lower-cased (hosts arrive canonical-lower from
    * [[graft.operators.UrlCuration]]). Loud on malformed rules —
    * a truncated download must not silently cap on a partial list. */
  def fromText(text: String): PslTable = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        require(!line.exists(c => c.isWhitespace),
          s"malformed PSL rule (embedded whitespace): '$line'")
        val rule = line.toLowerCase(java.util.Locale.ROOT)
        if (rule.startsWith("!")) {
          val r = rule.substring(1)
          require(r.contains("."), s"exception rule must be multi-label: '$line'")
          exc += r
        } else if (rule.startsWith("*.")) {
          val tail = rule.substring(2)
          require(tail.nonEmpty && !tail.contains("*"),
            s"only a leading wildcard label is supported: '$line'")
          wild += tail
        } else {
          require(!rule.contains("*"),
            s"only a leading wildcard label is supported: '$line'")
          exact += rule
        }
      }
    }
    new PslTable(exact.result(), wild.result(), exc.result())
  }

  /** The committed snapshot (resources `graft/psl/public_suffix_list
    * .dat`) — a representative subset in the standard format. */
  lazy val fixture: PslTable = {
    val in = getClass.getResourceAsStream("/graft/psl/public_suffix_list.dat")
    require(in != null, "PSL snapshot resource missing")
    try fromText(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}

/** `registered_domain(host)` — eTLD+1 of a canonical host under a
  * [[PslTable]]. NULL in, NULL out; never NULL otherwise (see
  * [[PslTable]]'s contract). */
case class RegisteredDomain(child: Expression, table: PslTable)
    extends UnaryExpression {

  override def prettyName: String = "registered_domain"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"registered_domain expects a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      table.registeredDomain(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("pslTable", table, classOf[PslTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $t.registeredDomain($c.toString()));""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
