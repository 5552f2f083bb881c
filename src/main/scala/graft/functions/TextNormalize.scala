package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ftfy-style Unicode text cleanup — the normalization pass a crawl
  * corpus needs BEFORE any exact-match operator (dedup keys, blocklist
  * token equality, paragraph/substring hashes, BPE segmentation) can
  * be trusted: the same visible text otherwise arrives as different
  * byte sequences (combining marks vs precomposed, NBSP vs space,
  * CRLF vs LF, zero-width joiners from copy-paste).
  *
  * Contract — five steps, each mirrored literally by the DuckDB
  * oracle (`graft.queries.TextQueries`):
  *   1. Unicode NFC (canonical composition — [[NfcNormalize]], the
  *      native expression; DuckDB's `nfc_normalize`);
  *   2. line endings: `\r\n` then lone `\r` → `\n`;
  *   3. zero-width characters removed (ZWSP/ZWNJ/ZWJ/BOM);
  *   4. Unicode space separators → ASCII space (NBSP, en/em/thin
  *      spaces U+2000–200A, narrow NBSP, math space, ideographic
  *      space);
  *   5. remaining C0 controls (except tab/newline) and DEL removed.
  *
  * Deliberately NOT here: whitespace-run collapsing and case folding
  * — layout-destroying choices the caller owns (see
  * [[graft.operators.HtmlExtract]] for the collapse spelling), and
  * NFKC's lossy compatibility folding (ligatures, ², ﬁ) which changes
  * text CONTENT, not just encoding.
  *
  * Scale shape: one native NFC call + five codegen regex/replace
  * passes per row — map-only, zero exchanges; the ASCII fast path in
  * [[NfcNormalize.compute]] makes step 1 a byte scan on the dominant
  * case. A 100 TB normalization sweep is a single scan.
  */
object TextNormalize {

  /** ZWSP, ZWNJ, ZWJ, BOM/ZWNBSP — removed outright (step 3). Escapes
    * at the REGEX level (`\x{…}` — identical in Java and RE2), never
    * the host-string level, so the oracle shares the pattern text. */
  val ZeroWidthRe = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"

  /** Unicode space separators folded to ASCII space (step 4): NBSP,
    * the U+2000–200A series, narrow NBSP, medium math space,
    * ideographic space. */
  val UniSpaceRe = "[\\x{00A0}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]"

  /** C0 controls minus tab (09) / newline (0A) / CR (0D — already
    * folded by step 2), plus DEL (step 5). */
  val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** The five-step cleanup. NULL in, NULL out; pure projection —
    * compose freely. */
  def cleanText(text: Column): Column = {
    val nfc = GraftFunctions.nfc_normalize(text)
    val lines = replace(replace(nfc, lit("\r\n"), lit("\n")),
      lit("\r"), lit("\n"))
    val noZw = regexp_replace(lines, ZeroWidthRe, "")
    val spaces = regexp_replace(noZw, UniSpaceRe, " ")
    regexp_replace(spaces, ControlRe, "")
  }
}
