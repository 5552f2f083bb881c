package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pct_normalize(url)` — RFC 3986 §6.2.2 percent-encoding
  * normalization in ONE left-to-right scan: decode escapes of
  * UNRESERVED characters (§2.3: ALPHA / DIGIT / `-` `.` `_` `~` —
  * `%7E` ≡ `%7e` ≡ `~`), uppercase the hex digits of every other
  * well-formed escape (`%2f` → `%2F` — §6.2.2.1 case normalization;
  * the octet stays encoded because decoding a RESERVED character
  * changes which component delimiters the URL has, §2.2). This is the
  * r18 verdict's gap #2: without it, RFC-equivalent URLs stay distinct
  * dedup keys and re-crawl collapse under-merges on real crawl data.
  *
  * Contract (mirrored literally by the DuckDB oracle — the unreserved
  * set is ONE constant here, and the oracle's hex-pair alternation is
  * GENERATED from it, so the engines cannot drift):
  *   - `%XX` with two hex digits: decoded if XX is an unreserved
  *     codepoint, else re-emitted as `%` + uppercase XX;
  *   - a `%` NOT followed by two hex digits passes through literally
  *     (the input was never validly encoded — inventing structure
  *     would corrupt it);
  *   - applies uniformly to the whole URL string: unreserved decode
  *     can never produce a delimiter, so it is component-safe before
  *     parsing (the reason [[graft.operators.UrlCuration.canonicalUrl]]
  *     runs it as step 2, ahead of host/path/query splitting);
  *   - NULL in → NULL out.
  *
  * Documented cutoff: IDN hosts are NOT mapped (`münchen.example` vs
  * `xn--mnchen-3ya.example` stay distinct keys) — punycode/UTS-46
  * mapping is locale-table territory, out of scope for the string
  * contract; likewise non-ASCII UTF-8 escape SEQUENCES (`%C3%A9`)
  * stay encoded, since each octet alone is outside the unreserved set.
  *
  * Scale shape: per-row, no shuffle, codegen'd via a static call; the
  * dominant no-`%` row is a single byte scan returning the input
  * buffer untouched.
  */
case class PctNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "pct_normalize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pct_normalize expects a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    PctNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PctNormalize.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PctNormalize {

  /** RFC 3986 §2.3 unreserved octet test — THE constant both engines
    * derive from ([[unreservedHexAlternation]] generates the oracle's
    * side). */
  def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  /** The unreserved octets as an UPPERCASE two-hex-digit regex
    * alternation (`2D|2E|30|…|7E`) — the oracle tests the uppercased
    * escape against exactly this set, so the SQL can never disagree
    * with [[isUnreserved]]. */
  def unreservedHexAlternation: String =
    (0 to 0x7F).filter(isUnreserved).map(c => f"$c%02X").mkString("|")

  /** Normalize one value. Fast path: no `%` byte ⇒ return the input
    * buffer untouched. Escapes are pure ASCII, so UTF-16 indexing on
    * the JVM String is safe inside them. */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var pct = false
    while (!pct && i < n) {
      if (s.getByte(i) == '%') pct = true
      i += 1
    }
    if (!pct) return s
    UTF8String.fromString(normalizeString(s.toString))
  }

  private def normalizeString(str: String): String = {
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c != '%') { out.append(c); i += 1 }
      else {
        val h1 = if (i + 1 < n) hexVal(str.charAt(i + 1)) else -1
        val h2 = if (i + 2 < n) hexVal(str.charAt(i + 2)) else -1
        if (h1 < 0 || h2 < 0) { out.append('%'); i += 1 } // malformed: literal
        else {
          val code = h1 * 16 + h2
          if (isUnreserved(code)) out.append(code.toChar)
          else {
            out.append('%')
            out.append(Character.toUpperCase(str.charAt(i + 1)))
            out.append(Character.toUpperCase(str.charAt(i + 2)))
          }
          i += 3
        }
      }
    }
    out.toString
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1
}
