package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{WsClass, WsRun}

/** HTML → text extraction — the step every real crawl pipeline pays
  * FIRST, before any of the text-level curation in this repo
  * ([[Curation]], [[ParagraphDedup]], [[QualityClassifier]], …) can
  * run: strip markup down to readable text, and classify away
  * boilerplate blocks (navigation, link farms, footers) the way
  * jusText / trafilatura do, using per-paragraph link density and
  * length (Pomikálek 2011 "Removing boilerplate and duplicate content
  * from web corpora" §4; Raffel et al. 2020 §2.2 start C4 from
  * already-extracted text — this operator is what produces it).
  *
  * Reference scope note: the reference pipeline (SURVEY.md §2) ingests
  * structured CRM rows and has no markup step; this file is extension
  * surface for the crawl-to-corpus story (VERDICT r16 gap #5).
  *
  * Extraction contract (each step mirrored literally by the DuckDB
  * oracle in `graft.queries.HtmlQueries`):
  *   1. comments, `<script>…</script>` and `<style>…</style>` blocks
  *      removed (case-insensitive, dot-matches-newline, non-greedy);
  *   2. block-level tags ([[BlockTags]]) → paragraph boundary; all
  *      remaining tags → `''`;
  *   3. character references decoded in ONE left-to-right scan
  *      ([[graft.functions.HtmlEntityDecode]]): the shared named
  *      table (the ubiquitous five plus the common Latin-1 letter /
  *      typographic-punctuation / symbol set —
  *      [[graft.functions.HtmlEntityDecode.Named]]) plus decimal and
  *      hex numeric references (`&#39; &#233; &#xE9; &#x1F600;`);
  *      single-pass semantics single-decodes double-encoded text from
  *      EITHER side (`&amp;lt;` → `&lt;`, `&#38;lt;` → `&lt;`,
  *      `&amp;#65;` → `&#65;`) — a replace chain cannot order numeric
  *      and named decoding correctly (see the expression's scaladoc);
  *      names outside the table and disallowed codepoints (C0
  *      controls, surrogates, > U+10FFFF) stay literal;
  *   4. whitespace normalized (horizontal runs → one space, runs
  *      containing a newline → one `\n`, outer whitespace stripped).
  *
  * Boilerplate classification ([[extractMainContent]]), per paragraph:
  *   - link density = cleaned `<a>…</a>` chars ÷ cleaned chars;
  *   - a paragraph is KEPT iff it has ≥ `minWords` words AND link
  *     density ≤ `maxLinkDensity` (jusText's "short" and "link-heavy"
  *     rules; the stopword-density rule is deliberately omitted — the
  *     corpus is multilingual and [[graft.functions.TextAnalysis]]
  *     carries only 4 marker lists).
  *
  * Scale shape: BOTH operators are pure per-row projections — the
  * paragraph pass runs IN-ROW over the split array with higher-order
  * functions (`transform`/`filter`/`aggregate`), so the whole
  * markup-to-corpus sweep is map-only with ZERO exchanges (the
  * explode→regroup spelling would pay a full corpus shuffle to
  * reassemble documents; a doc's paragraphs already live in one row).
  * Per-task memory is bounded by one document, the same bound as
  * [[Chunking]]. A 100 TB crawl extract is a single scan.
  */
object HtmlExtract {

  /** Tags that delimit text blocks (HTML5 flow content that renders as
    * a line/paragraph break). Matched with any attributes, open or
    * close, case-insensitive. */
  val BlockTags: String =
    "p|div|br|hr|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|tbody|" +
      "blockquote|pre|section|article|aside|header|footer|nav|form|figure|figcaption"

  val CommentRe = "(?s)<!--.*?-->"
  val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  val StyleRe = "(?is)<style[^>]*>.*?</style>"
  val BlockTagRe: String = s"(?i)</?($BlockTags)[^>]*>"
  val AnyTagRe = "<[^>]*>"
  val LinkRe = "(?is)<a[^>]*>(.*?)</a>"

  /** Paragraph-boundary sentinel: U+0001 cannot appear in text that
    * survived HTML serialization (control chars are invalid in HTML). */
  val Boundary = "\u0001"

  /** Step 1 + block-tag boundaries → `sep`, INLINE TAGS PRESERVED
    * (the paragraph pass still needs `<a>…</a>` spans for link
    * density). */
  private def blocked(html: Column, sep: String): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, CommentRe, ""),
          ScriptRe, ""),
        StyleRe, ""),
      BlockTagRe, sep)

  /** Steps 1+2 with block tags → `sep` (callers pick the sentinel or a
    * newline), inline tags stripped. */
  private def deTag(html: Column, sep: String): Column =
    regexp_replace(blocked(html, sep), AnyTagRe, "")

  /** Step 3: character-reference decode — named + numeric in one
    * native scan ([[graft.functions.HtmlEntityDecode]]; the DuckDB
    * oracle mirrors the scan with split/interleave over the same
    * reference pattern). */
  def decodeEntities(text: Column): Column =
    graft.functions.GraftFunctions.html_entity_decode(text)

  /** Leading/trailing ASCII-space strip, as an explicit regex rather
    * than `trim` — engine `trim`s disagree on UNICODE spaces (DuckDB
    * strips NBSP, Spark does not), and a paragraph edge can carry one;
    * non-ASCII spaces are deliberately preserved here (folding them is
    * [[graft.functions.TextNormalize]]'s job, downstream). */
  val OuterSpaceRe: String = "^ +| +$"

  /** Collapse ALL whitespace runs to one space and strip the ends —
    * the in-paragraph normal form (paragraphs carry no line
    * structure). */
  private def collapseFlat(text: Column): Column =
    regexp_replace(regexp_replace(text, WsRun, " "), OuterSpaceRe, "")

  /** [[stripHtml]]'s step 4 patterns, shared verbatim with the DuckDB
    * oracle (every escape at the REGEX level, never the host-string
    * level — the [[WsClass]] convention). */
  val NlRunRe: String = s"[$WsClass]*\\n[$WsClass]*"
  val HorizRunRe: String = "[ \\t\\f\\r]+"
  val OuterWsRe: String = "^[\\n ]+|[\\n ]+$"

  /** Step 4: horizontal runs → `' '`, newline-bearing runs → `'\n'`,
    * outer whitespace stripped. */
  private def collapseKeepingBreaks(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, NlRunRe, "\n"),
        HorizRunRe, " "),
      OuterWsRe, "")

  /** Markup → readable text per the 4-step contract: block structure
    * becomes single newlines, everything else inline. NULL in, NULL
    * out. Pure codegen projection — compose freely. */
  def stripHtml(html: Column): Column =
    collapseKeepingBreaks(decodeEntities(deTag(html, "\n")))

  /** Adds `outCol` = [[stripHtml]]; occupied output columns rejected
    * loudly (house posture — see [[Blocklist]]). */
  def withStrippedHtml(docs: DataFrame, htmlCol: String,
      outCol: String = "text"): DataFrame = {
    require(docs.columns.contains(htmlCol), s"column $htmlCol absent")
    require(!docs.columns.contains(outCol),
      s"output column $outCol already present in ${docs.columns.mkString(",")}")
    docs.withColumn(outCol, stripHtml(col(htmlCol)))
  }

  /** Per-paragraph struct array: `(text, link_chars)` for every
    * non-blank block of `html`, cleaned per the contract. In-row —
    * no explode. */
  private def paragraphs(html: Column): Column = {
    val cleaned = (f: Column) => collapseFlat(decodeEntities(regexp_replace(f, AnyTagRe, "")))
    val linkChars = (f: Column) =>
      aggregate(
        regexp_extract_all(f, lit(LinkRe), lit(1)),
        lit(0L),
        (acc, x) => acc + length(cleaned(x)).cast("long"))
    val frags = split(blocked(html, Boundary), Boundary)
    filter(
      transform(frags, f =>
        struct(cleaned(f).as("text"), linkChars(f).as("link_chars"))),
      p => p("text") =!= "")
  }

  /** `href` patterns for [[extractLinks]] — double- and single-quoted
    * attribute values, any attribute position, case-insensitive;
    * whitespace as the explicit portable class (the [[WsClass]]
    * convention). Two boundaries are REQUIRED (the r18 ADVICE
    * over-match fix): whitespace right after the tag name (so
    * `<area`/`<abbr`/`<audio` never match as `<a`) and whitespace
    * right before the attribute name (so `data-href=` never matches
    * as `href=`) — the optional `(?:[^>]*[ws])?` middle absorbs any
    * attributes in between while keeping both boundaries hard. */
  val HrefDqRe: String =
    s"""(?i)<a[$WsClass](?:[^>]*[$WsClass])?href[$WsClass]*=[$WsClass]*"([^"]*)""""
  val HrefSqRe: String =
    s"(?i)<a[$WsClass](?:[^>]*[$WsClass])?href[$WsClass]*=[$WsClass]*'([^']*)'"

  /** All `<a href>` targets of a page (double-quoted matches first,
    * then single-quoted — consumers treat the result as a SET), raw
    * and unresolved: the crawl-frontier input
    * ([[UrlCuration.crawlFrontier]] canonicalizes and screens them).
    * Pure codegen projection; NULL in, NULL out. */
  def extractLinks(html: Column): Column =
    concat(
      regexp_extract_all(html, lit(HrefDqRe), lit(1)),
      regexp_extract_all(html, lit(HrefSqRe), lit(1)))

  /** jusText-lite main-content extraction. Output: `idCol`,
    * `text` (kept paragraphs joined with `\n`, in document order),
    * `n_paras_kept`, `n_paras_dropped`; documents whose every
    * paragraph is boilerplate are dropped (same posture as
    * [[ParagraphDedup.dedupParagraphs]]). Entirely in-row: zero
    * exchanges at any corpus size. */
  def extractMainContent(docs: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 5, maxLinkDensity: Double = 0.3): DataFrame = {
    require(minWords >= 1, s"minWords=$minWords must be >= 1")
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      s"maxLinkDensity=$maxLinkDensity must be in [0,1]")
    require(docs.columns.contains(idCol) && docs.columns.contains(htmlCol),
      s"need $idCol and $htmlCol in ${docs.columns.mkString(",")}")
    // output is a fresh select — only the id name can collide
    Seq("text", "n_paras_kept", "n_paras_dropped").foreach(c =>
      require(idCol != c, s"idCol=$idCol collides with output column $c"))
    val good = (p: Column) => {
      val words = size(split(p("text"), " "))
      words >= minWords &&
        p("link_chars").cast("double") /
          greatest(length(p("text")), lit(1)).cast("double") <= maxLinkDensity
    }
    val ps = paragraphs(col(htmlCol))
    val kept = filter(ps, good)
    docs.select(
        col(idCol),
        array_join(transform(kept, p => p("text")), "\n").as("text"),
        size(kept).cast("long").as("n_paras_kept"),
        (size(ps) - size(kept)).cast("long").as("n_paras_dropped"))
      .filter(col("n_paras_kept") > 0)
  }
}
