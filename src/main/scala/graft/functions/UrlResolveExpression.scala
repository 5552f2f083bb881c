package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `url_resolve(base, ref)` — RFC 3986 §5 reference resolution: turn a
  * page's raw outlink (`/about`, `../x`, `x.html`, `?page=2`,
  * `//cdn.example.com/a`, `#sec`, or an absolute URL) into the target
  * URL it denotes against the page's own address. This is the r18
  * verdict's #1 real-data gap: most outlinks on real pages are
  * RELATIVE, so a frontier that keeps only absolute `scheme://` links
  * misses the majority of the link graph
  * ([[graft.operators.UrlCuration.crawlFrontier]] now resolves first).
  *
  * Resolution contract (RFC 3986 §5.2.2, strict mode — a ref carrying
  * its own scheme is taken whole; mirrored by the DuckDB oracle's
  * resolution CTEs in `graft.queries.UrlQueries`):
  *   - ref has a scheme (`x:`…) → the ref itself (its path
  *     dot-normalized);
  *   - `//host/p` → base's scheme + the ref (protocol-relative);
  *   - `/p` → base's scheme+authority + the ref's path (dot-normalized)
  *     and query;
  *   - `?q` → base's scheme+authority+path + the ref's query;
  *   - `#f` or empty → the base itself (query kept, base fragment
  *     dropped) + the ref's fragment — the same-document case; the
  *     frontier's seen-screen then removes it;
  *   - anything else → merged per §5.2.3 (base path up to its last
  *     `/`, or `/` when the base path is empty) + dot-segment removal
  *     (§5.2.4, the real stack algorithm).
  *
  * Both inputs are trimmed first (HTML href values legally carry
  * surrounding ASCII whitespace). NULL in → NULL out; a RELATIVE ref
  * against a base that is not a `scheme://` URL resolves to NULL
  * (there is no directory to resolve against — the caller's screen
  * drops it), never an invented URL.
  *
  * Scale shape: per-row, no shuffle, codegen'd via a static call —
  * resolution is a pure projection between link extraction and
  * canonicalization, so the frontier stays map-only.
  */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "url_resolve"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"url_resolve expects (string, string) columns, got $other")
    }

  override def nullSafeEval(b: Any, r: Any): Any =
    UrlResolve.compute(b.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) => s"""
      ${ev.value} = graft.functions.UrlResolve.compute($b, $r);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object UrlResolve {

  private val SchemePat =
    java.util.regex.Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*:")
  private val BasePat =
    java.util.regex.Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)")

  def compute(base: UTF8String, ref: UTF8String): UTF8String = {
    val out = resolve(base.toString, ref.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  private[graft] def resolve(base0: String, ref0: String): String = {
    val base = base0.trim
    val ref = ref0.trim
    // ref with its own scheme is the target outright (strict mode);
    // its path still gets dot-normalized per §5.2.2
    if (SchemePat.matcher(ref).find()) return normalizePathOf(ref)
    val m = BasePat.matcher(base)
    if (!m.find()) return null // relative ref, no base directory
    val scheme = m.group(1)
    val auth = m.group(2)
    // base path and query, fragment dropped (a target never carries
    // the BASE's fragment)
    val rest = base.substring(m.end())
    val hashAt = rest.indexOf('#')
    val pq = if (hashAt < 0) rest else rest.substring(0, hashAt)
    val qAt = pq.indexOf('?')
    val bPath = if (qAt < 0) pq else pq.substring(0, qAt)
    val bQuery = if (qAt < 0) "" else pq.substring(qAt)
    if (ref.isEmpty) return s"$scheme://$auth$bPath$bQuery"
    if (ref.startsWith("//")) return normalizePathOf(s"$scheme:$ref")
    if (ref.startsWith("#")) return s"$scheme://$auth$bPath$bQuery$ref"
    if (ref.startsWith("?")) return s"$scheme://$auth$bPath$ref"
    // path reference: split the ref's own path from its ?query#frag tail
    val cut = ref.indexWhere(c => c == '?' || c == '#')
    val rPath = if (cut < 0) ref else ref.substring(0, cut)
    val rTail = if (cut < 0) "" else ref.substring(cut)
    val merged =
      if (ref.startsWith("/")) rPath
      else if (bPath.isEmpty) "/" + rPath // §5.2.3: defined base authority
      else bPath.substring(0, bPath.lastIndexOf('/') + 1) + rPath
    s"$scheme://$auth${removeDotSegments(merged)}$rTail"
  }

  /** Dot-normalize the PATH component of an already-absolute URI
    * (authority form or opaque `scheme:path` form), leaving every
    * other component untouched. */
  private def normalizePathOf(uri: String): String = {
    val m = BasePat.matcher(uri)
    val pathStart =
      if (m.find()) m.end()
      else uri.indexOf(':') + 1 // opaque: path directly after the scheme
    val cut = {
      val i = uri.indexWhere(c => c == '?' || c == '#', pathStart)
      if (i < 0) uri.length else i
    }
    uri.substring(0, pathStart) +
      removeDotSegments(uri.substring(pathStart, cut)) +
      uri.substring(cut)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments — the literal stack
    * algorithm (`..` pops the last emitted segment; extra `..` at the
    * root drop; a trailing `.`/`..` leaves the trailing slash). */
  private[functions] def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder(path.length)
    var in = path
    def popSegment(): Unit = {
      val at = out.lastIndexOf("/")
      out.setLength(if (at < 0) 0 else at)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { popSegment(); in = "/" + in.substring(4) }
      else if (in == "/..") { popSegment(); in = "/" }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        val slash = in.indexOf('/', start)
        if (slash < 0) { out.append(in); in = "" }
        else { out.append(in, 0, slash); in = in.substring(slash) }
      }
    }
    out.toString
  }
}
