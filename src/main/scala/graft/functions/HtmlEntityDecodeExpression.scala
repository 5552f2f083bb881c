package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `html_entity_decode(text)` — HTML character-reference decoding in
  * ONE left-to-right scan: the five ubiquitous named entities
  * (`&lt; &gt; &quot; &nbsp; &amp;`) plus decimal (`&#233;`) and hex
  * (`&#xE9;`, `&#x1F600;`) numeric references, which real crawl HTML
  * carries constantly (r17 verdict gap #3) — undecoded they pollute
  * every downstream text operator (Gopher symbol bands, BPE counts,
  * dedup keys).
  *
  * Single-pass semantics is the CORRECT semantics, not a convenience:
  * a chain of replaces cannot order numeric and named decoding — with
  * numeric first, `&#38;lt;` double-decodes to `<`; with numeric
  * last, `&amp;#65;` double-decodes to `A`. A left-to-right scan
  * single-decodes both (`&lt;` / `&#65;`), matching how an HTML
  * tokenizer consumes references. The DuckDB oracle mirrors the scan
  * exactly with split/interleave over the same reference pattern —
  * both engines find non-overlapping matches over the ORIGINAL string
  * (`graft.queries.HtmlQueries.decodeSql`).
  *
  * Decode contract (mirrored literally by the oracle):
  *   - named: the [[HtmlEntityDecode.Named]] table — the five
  *     ubiquitous entities plus the common Latin-1 letter /
  *     punctuation / symbol set real pages carry constantly (`&#39;`
  *     arrives via the numeric path); anything else named passes
  *     through literally — documented cutoff, the full HTML5 table is
  *     ~2k entries and drops into the same table;
  *   - numeric: decoded iff the codepoint is tab/LF/CR or ≥ U+0020,
  *     ≤ U+10FFFF and not a surrogate — otherwise the reference stays
  *     LITERAL (C0 controls would collide with the extractor's U+0001
  *     paragraph sentinel and DuckDB's `chr` rejects them);
  *   - hex references longer than 7 digits and decimal references
  *     that overflow stay literal (both out of Unicode range anyway);
  *   - unterminated references (`&amp` without `;`) stay literal.
  *
  * Scale shape: per-row, no shuffle, codegen'd via a static call; the
  * common no-`&` row is a single byte scan returning the input
  * buffer untouched.
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def prettyName: String = "html_entity_decode"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_entity_decode expects a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    HtmlEntityDecode.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlEntityDecode.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HtmlEntityDecode {

  /** Decode one value. Fast path: no `&` byte ⇒ return the input
    * buffer untouched (the dominant case on extracted fragments). The
    * scan works on the JVM String (entities are pure ASCII, so
    * UTF-16 indexing is safe — multi-byte codepoints never appear
    * inside a reference). */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var amp = false
    while (!amp && i < n) {
      if (s.getByte(i) == '&') amp = true
      i += 1
    }
    if (!amp) return s
    UTF8String.fromString(decodeString(s.toString))
  }

  private def decodeString(str: String): String = {
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val end = tryReference(str, i, out)
        if (end > i) i = end
        else { out.append('&'); i += 1 }
      }
    }
    out.toString
  }

  /** Try to consume a reference starting at `str(at) == '&'`. On
    * success appends the decoded text and returns the index past the
    * `;`; on failure appends nothing and returns `at`. A matched but
    * OUT-OF-RANGE numeric reference appends itself literally (it was
    * a well-formed reference — the oracle's regex matches it too, so
    * both sides must treat it the same way). */
  private def tryReference(str: String, at: Int, out: java.lang.StringBuilder): Int = {
    val n = str.length
    if (at + 1 >= n) return at
    if (str.charAt(at + 1) != '#') {
      // named: read the maximal alphanumeric run, require ';', look
      // up the table — equivalent to the oracle's longest-first
      // alternation (a known name followed by anything but ';' fails
      // both ways)
      var j = at + 1
      while (j < n && j - at <= MaxNameLen &&
        Character.isLetterOrDigit(str.charAt(j))) j += 1
      if (j > at + 1 && j < n && str.charAt(j) == ';') {
        val cp = NamedMap.get(str.substring(at + 1, j))
        if (cp != null) {
          out.appendCodePoint(cp.intValue())
          return j + 1
        }
      }
      return at
    }
    var j = at + 2
    val hex = j < n && (str.charAt(j) == 'x' || str.charAt(j) == 'X')
    if (hex) j += 1
    val digits0 = j
    var cp = 0L
    var overflow = false
    if (hex) {
      while (j < n && hexVal(str.charAt(j)) >= 0) {
        // >7 hex digits: out of Unicode range by construction — the
        // oracle's {1,7} pattern stops matching, so must we
        if (j - digits0 >= 7) overflow = true
        else cp = cp * 16 + hexVal(str.charAt(j))
        j += 1
      }
    } else {
      while (j < n && str.charAt(j) >= '0' && str.charAt(j) <= '9') {
        cp = cp * 10 + (str.charAt(j) - '0')
        if (cp > 0x10FFFFL) { cp = 0x110000L } // clamp, stays out-of-range
        j += 1
      }
    }
    if (j == digits0 || j >= n || str.charAt(j) != ';') return at
    if (overflow) return at // no regex match oracle-side → fully literal
    val ok = cp == 9 || cp == 10 || cp == 13 ||
      (cp >= 0x20 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
    if (ok) out.appendCodePoint(cp.toInt)
    else out.append(str, at, j + 1) // well-formed but disallowed: literal
    j + 1
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** The named-entity table (name → codepoint): the five ubiquitous
    * entities plus the common Latin-1 letters, typographic
    * punctuation and symbols crawled pages carry constantly. ONE
    * constant — the scanner's lookup map and the oracle's regex
    * alternation + decode arms are both generated from it, so the two
    * engines cannot drift. Case-sensitive, per the HTML named table. */
  val Named: IndexedSeq[(String, Int)] = Vector(
    // the ubiquitous five
    "lt" -> '<'.toInt, "gt" -> '>'.toInt, "quot" -> '"'.toInt,
    "nbsp" -> 0x00A0, "amp" -> '&'.toInt,
    // XML apostrophe
    "apos" -> '\''.toInt,
    // Latin-1 letters (the accents European-language pages use most)
    "aacute" -> 0x00E1, "agrave" -> 0x00E0, "acirc" -> 0x00E2,
    "auml" -> 0x00E4, "ccedil" -> 0x00E7, "eacute" -> 0x00E9,
    "egrave" -> 0x00E8, "ecirc" -> 0x00EA, "iacute" -> 0x00ED,
    "ntilde" -> 0x00F1, "oacute" -> 0x00F3, "ocirc" -> 0x00F4,
    "ouml" -> 0x00F6, "szlig" -> 0x00DF, "uacute" -> 0x00FA,
    "uuml" -> 0x00FC,
    "Aacute" -> 0x00C1, "Eacute" -> 0x00C9, "Ouml" -> 0x00D6,
    "Uuml" -> 0x00DC,
    // typographic punctuation
    "hellip" -> 0x2026, "mdash" -> 0x2014, "ndash" -> 0x2013,
    "lsquo" -> 0x2018, "rsquo" -> 0x2019, "ldquo" -> 0x201C,
    "rdquo" -> 0x201D, "laquo" -> 0x00AB, "raquo" -> 0x00BB,
    "middot" -> 0x00B7, "bull" -> 0x2022,
    // symbols
    "copy" -> 0x00A9, "reg" -> 0x00AE, "trade" -> 0x2122,
    "deg" -> 0x00B0, "sect" -> 0x00A7, "para" -> 0x00B6,
    "euro" -> 0x20AC, "pound" -> 0x00A3, "yen" -> 0x00A5,
    "cent" -> 0x00A2, "times" -> 0x00D7, "divide" -> 0x00F7,
    "plusmn" -> 0x00B1, "frac12" -> 0x00BD, "frac14" -> 0x00BC)

  private val MaxNameLen: Int =
    Named.map(_._1.length).max + 1 // +1: the loop bound is inclusive

  private val NamedMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    Named.foreach { case (n, cp) => m.put(n, Integer.valueOf(cp)) }
    m
  }

  /** The names as a regex alternation, LONGEST FIRST — under
    * leftmost-first alternation semantics a shorter name that
    * prefixes a longer one can never steal its match. */
  def namedAlternation: String =
    Named.map(_._1).sortBy(n => (-n.length, n)).mkString("|")
}
