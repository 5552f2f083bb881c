package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.WsRun

/** C4's LINE-level cleanup rules (Raffel et al. 2020 §2.2) — the
  * complement to the DOCUMENT-level Gopher shape bands
  * ([[graft.functions.TextAnalysis.gopherShapeOk]]): Gopher decides
  * whether a whole page is prose-shaped; these rules cut the
  * non-prose LINES out of pages that are otherwise worth keeping
  * (menus that survived extraction, "enable javascript" banners,
  * half-rendered template lines), then drop pages left without
  * enough sentences. The published rule set:
  *
  *   - keep only lines ending in a TERMINAL punctuation mark
  *     ([[TerminalPunct]]: `.`, `!`, `?`, a closing double quote);
  *   - keep only lines with ≥ `minWordsPerLine` words (default 5);
  *   - drop any line containing the word "javascript"
  *     (case-insensitive, TOKEN equality on the portable whitespace
  *     split — the [[Blocklist]] word-boundary convention, so
  *     "javascripted" prose never trips it);
  *   - drop the whole page if fewer than `minLines` lines survive
  *     (C4's "fewer than 3 sentences" rule, line-approximated as the
  *     paper implements it);
  *   - drop the whole page if it contains `{` (code) or the phrase
  *     "lorem ipsum" (template filler), case-insensitive.
  *
  * Scale shape: entirely IN-ROW — one `split` + higher-order
  * `filter`/`transform` per document plus two literal containment
  * checks, zero exchanges; a 100 TB line-cleanup is a single scan
  * (same posture as [[graft.operators.HtmlExtract]]'s paragraph
  * classifier). Each rule is deliberately SQL-expressible so the
  * DuckDB oracle re-derives the whole pass (`q_c4_line_filter`).
  */
object LineFilters {

  /** C4's terminal punctuation: sentence-enders plus the closing
    * double quotes (straight and typographic) a quoted sentence ends
    * with. */
  val TerminalPunct: Seq[String] = Seq(".", "!", "?", "\"", "”")

  /** True iff `line` survives the three LINE rules. */
  def lineOk(line: Column, minWordsPerLine: Int): Column = {
    val terminal = TerminalPunct
      .map(p => line.endsWith(p)).reduce[Column](_ || _)
    val words = size(filter(split(line, WsRun), t => t =!= ""))
    val hasJs = array_contains(
      split(lower(line), WsRun), "javascript")
    terminal && words >= minWordsPerLine && !hasJs
  }

  /** True iff the PAGE survives the two page rules (brace / lorem
    * ipsum); the minLines rule needs the kept count and lives in
    * [[c4Clean]]. NULL text is not ok (nothing to keep). */
  def pageOk(text: Column): Column =
    !contains(text, lit("{")) &&
      !contains(lower(text), lit("lorem ipsum"))

  /** Apply the full C4 line+page cleanup to a `(idCol, textCol)`
    * relation. Output: `idCol`, `text` (kept lines joined with `\n`,
    * in document order), `n_lines_kept`, `n_lines_dropped`; pages
    * failing the page rules or left with < `minLines` kept lines are
    * dropped (the same whole-row drop posture as
    * [[HtmlExtract.extractMainContent]]). */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 5, minLines: Int = 3): DataFrame = {
    require(minWordsPerLine >= 1, s"minWordsPerLine=$minWordsPerLine must be >= 1")
    require(minLines >= 1, s"minLines=$minLines must be >= 1")
    require(docs.columns.contains(idCol) && docs.columns.contains(textCol),
      s"need $idCol and $textCol in ${docs.columns.mkString(",")}")
    Seq("text", "n_lines_kept", "n_lines_dropped", "__lines", "__kept")
      .foreach(c =>
        require(idCol != c, s"idCol=$idCol collides with output column $c"))
    // materialize the split and the HOF filter ONCE in their own
    // projection: higher-order functions are CodegenFallback, so
    // subexpression reuse across the three downstream references
    // (join, kept count, dropped count) is not guaranteed when they
    // sit in one select (r18 verdict nit — free insurance)
    docs
      .filter(pageOk(col(textCol)))
      .select(col(idCol), split(col(textCol), "\n").as("__lines"))
      .withColumn("__kept",
        filter(col("__lines"), l => lineOk(l, minWordsPerLine)))
      .select(
        col(idCol),
        array_join(col("__kept"), "\n").as("text"),
        size(col("__kept")).cast("long").as("n_lines_kept"),
        (size(col("__lines")) - size(col("__kept"))).cast("long")
          .as("n_lines_dropped"))
      .filter(col("n_lines_kept") >= minLines)
  }
}
