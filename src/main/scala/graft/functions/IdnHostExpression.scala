package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `idn_host(hostport)` — map an internationalized host to its ASCII
  * (punycode A-label) form, per RFC 3490 via the JDK's `java.net.IDN`,
  * so the Unicode and punycode spellings of one registry name share
  * ONE canonical dedup key, domain-cap unit, and robots join key
  * (`bücher.de` ≡ `xn--bcher-kva.de` — the r19 verdict's cutoff #3:
  * without this they split all three).
  *
  * Contract (the gate axes pin it against oracle-side constants
  * generated from the SAME `java.net.IDN.toASCII` call —
  * [[graft.queries.UrlQueries]]):
  *   - input is the canonical `host[:port]` (already lower-cased,
  *     `www.`-stripped, default-port-stripped — step 3 of
  *     [[graft.operators.UrlCuration.canonicalUrl]] runs this LAST in
  *     the host chain); a trailing `:digits` port is preserved
  *     verbatim;
  *   - an all-ASCII host (the overwhelming row at crawl scale —
  *     includes every already-punycoded `xn--` spelling) returns the
  *     INPUT BUFFER untouched: one byte scan, zero allocation;
  *   - a non-ASCII host maps through `IDN.toASCII` label by label;
  *     the ACE output is lower-cased (IDN preserves the case of
  *     labels it passes through, and canonical hosts are lower-case);
  *   - a host IDN rejects (empty labels, length violations) passes
  *     through UNCHANGED — a weird spelling must stay a stable key,
  *     never fail the scan;
  *   - `[`-led hosts (IPv6 literals) pass through untouched;
  *   - NULL in → NULL out.
  *
  * IDNA note: `java.net.IDN` is IDNA2003. The handful of codepoints
  * IDNA2008/UTS-46 map differently (ß, ς, ZWJ/ZWNJ) still land on ONE
  * deterministic key per spelling — the dedup/cap/join guarantee this
  * expression exists for — they just may differ from a UTS-46
  * resolver's choice; documented, same posture as browsers pre-UTS-46.
  *
  * Scale shape: per-row, no shuffle, codegen'd via a static call; the
  * ASCII fast path dominates real crawls (>99% of hosts).
  */
case class IdnHost(child: Expression) extends UnaryExpression {

  override def prettyName: String = "idn_host"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"idn_host expects a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    IdnHost.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IdnHost.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object IdnHost {

  /** Map one `host[:port]` value. Fast path: all bytes ASCII ⇒ return
    * the input buffer untouched (UTF8String bytes are ASCII iff every
    * byte is non-negative). */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    UTF8String.fromString(mapString(s.toString))
  }

  /** The non-ASCII slow path on a JVM String. */
  private[graft] def mapString(hostport: String): String = {
    if (hostport.isEmpty || hostport.charAt(0) == '[') return hostport
    // split a trailing :digits port (canonical hosts carry at most one)
    val colon = hostport.lastIndexOf(':')
    val (host, port) =
      if (colon >= 0 && colon < hostport.length - 1 &&
        hostport.substring(colon + 1).forall(c => c >= '0' && c <= '9'))
        (hostport.substring(0, colon), hostport.substring(colon))
      else (hostport, "")
    val mapped =
      try java.net.IDN.toASCII(host).toLowerCase(java.util.Locale.ROOT)
      catch { case _: IllegalArgumentException => host }
    mapped + port
  }
}
