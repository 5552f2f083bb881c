package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data curation (extension
  * surface): token counting, quality scoring, n-gram-heuristic language
  * ID, and content fingerprinting. All built-in expression compositions —
  * each metric is one projection inside whole-stage codegen, so a 100 TB
  * text sweep is a single scan.
  *
  * Every function here is deliberately SQL-expressible (length/replace
  * arithmetic, LIKE-style containment, regexp_count with an RE2-safe
  * pattern) so the DuckDB oracle can check it; see
  * `graft.queries.TextQueries`.
  */
object TextAnalysis {

  /** Whitespace token count: `len - len(without ' ') + 1` — identical
    * arithmetic on any SQL engine (no regex dialect drift). */
  def wsTokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  /** Word-ish token count via a BPE-ish regex: alnum runs or single
    * non-space symbols (≈ GPT-2 pre-tokenizer classes, RE2-compatible —
    * whitespace as the explicit portable class, never `\s`; see
    * [[GraftFunctions.WsClass]]). */
  def regexTokenCount(text: Column): Column =
    regexp_count(text,
      lit(s"[A-Za-z0-9]+|[^A-Za-z0-9${GraftFunctions.WsClass}]")).cast("long")

  /** Byte-pair-encoding token estimate: the classic chars/4 heuristic. */
  def approxBpeTokenCount(text: Column): Column =
    ceil(length(text) / 4.0).cast("long")

  /** Ratio of distinct whitespace tokens to total (repetition detector —
    * low values flag boilerplate/spam). */
  def distinctTokenRatio(text: Column): Column = {
    val toks = split(text, " ")
    GraftFunctions.roundPortable(size(array_distinct(toks)).cast("double") / size(toks), 4)
  }

  /** Duplicate word-n-gram fraction — the phrase-loop detector the
    * token-level [[distinctTokenRatio]] misses (a doc cycling "foo bar
    * baz" has high distinct-TOKEN ratio but ~1.0 duplicate 2-grams);
    * the standard repeated-n-gram quality filter of large corpus
    * pipelines (Rae et al., "Scaling Language Models: ... Gopher",
    * 2021, appendix A1.1). 0.0 for docs shorter than n tokens. Distinct
    * counting rides the native [[WordShingles]] kernel. */
  def repetitionRatio(text: Column, n: Int = 2): Column = {
    val total = greatest(size(split(text, " ")) - (n - 1), lit(0))
    val distinct = size(GraftFunctions.word_shingles(text, n))
    when(total > 0,
      lit(1.0) - distinct.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Language stopword marker lists (public high-frequency function
    * words). Containment is checked with space padding — pure substring
    * semantics, no tokenizer needed. */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  private def padded(text: Column): Column = concat(lit(" "), text, lit(" "))

  /** Number of the language's stopwords present in the text (0..5). */
  def stopwordHits(text: Column, lang: String): Column = {
    val words = StopwordLists.toMap.apply(lang)
    words.map(w => when(instr(padded(text), s" $w ") > 0, 1).otherwise(0))
      .reduce[Column](_ + _)
  }

  /** N-gram-heuristic language ID: argmax of stopword hits with a fixed
    * tie-break order (list order), `und` when nothing matches. */
  def langId(text: Column): Column = {
    val scores = StopwordLists.map { case (lang, _) => lang -> stopwordHits(text, lang) }
    val best = scores.tail.foldLeft[Column](scores.head._2)((m, s) => greatest(m, s._2))
    scores.foldRight[Column](lit("und")) { case ((lang, s), els) =>
      when(s > 0 && s === best, lit(lang)).otherwise(els)
    }
  }

  /** Composite quality score in [0,1]: length saturation (50%), lexical
    * diversity (30%), stopword presence (20%). Deterministic, rounded. */
  def qualityScore(text: Column): Column = {
    val lengthTerm = least(wsTokenCount(text).cast("double") / 100.0, lit(1.0))
    val diversity = size(array_distinct(split(text, " "))).cast("double") /
      greatest(wsTokenCount(text).cast("double"), lit(1.0))
    val stopTerm = stopwordHits(text, "en").cast("double") / 5.0
    GraftFunctions.roundPortable(lengthTerm * 0.5 + diversity * 0.3 + stopTerm * 0.2, 4)
  }

  /** Portable-whitespace word count for the Gopher band metrics:
    * maximal non-whitespace runs (the A1.1 whitespace-split word
    * definition). Unlike [[wsTokenCount]]'s single-space arithmetic,
    * newline-joined multi-paragraph text (exactly what the crawl
    * extractor emits) does not merge two words across a newline into
    * one token. One codegen `regexp_count`, RE2-safe class. */
  def portableWordCount(text: Column): Column =
    regexp_count(text,
      lit(s"[^${GraftFunctions.WsClass}]+")).cast("long")

  /** Non-whitespace character count — [[meanWordLength]]'s numerator
    * under the same portable whitespace class. */
  private def nonWsCharCount(text: Column): Column =
    length(regexp_replace(text, s"[${GraftFunctions.WsClass}]", ""))

  /** Mean word length in characters (non-whitespace chars ÷ ws-split
    * words) — the Gopher document-shape signal (Rae et al. 2021 A1.1:
    * keep 3 ≤ mean ≤ 10; far outside that band means boilerplate
    * tables, minified blobs, or character soup). Rounded portably. */
  def meanWordLength(text: Column): Column =
    GraftFunctions.roundPortable(
      nonWsCharCount(text).cast("double") /
        greatest(portableWordCount(text), lit(1L)).cast("double"), 4)

  /** Gopher symbol screen: `#` and ellipsis occurrences (both the
    * three-dot spelling and U+2026) per ws token — high values flag
    * markup remnants and truncated-snippet farms. */
  def symbolWordRatio(text: Column): Column = {
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    val dots3 = (length(text) -
      length(replace(text, lit("..."), lit("")))) / 3
    val uni = length(text) - length(replace(text, lit("\u2026"), lit("")))
    GraftFunctions.roundPortable(
      (hashes + dots3 + uni).cast("double") /
        greatest(portableWordCount(text), lit(1L)).cast("double"), 4)
  }

  /** Fraction of LINES starting with a bullet marker (`- `, `* `,
    * `•`) — Gopher drops documents that are ≥ 90% bullets. 0.0
    * for single-line docs without markers; NULL text is NULL. */
  def bulletLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    val bullets = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("\u2022")))
    GraftFunctions.roundPortable(
      bullets.cast("double") / greatest(size(lines), lit(1)).cast("double"), 4)
  }

  /** Fraction of lines ending in an ellipsis (`...` or U+2026) —
    * Gopher drops documents ≥ 30% ellipsis-terminated (snippet
    * listings). */
  def ellipsisLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    val trailing = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("\u2026")))
    GraftFunctions.roundPortable(
      trailing.cast("double") / greatest(size(lines), lit(1)).cast("double"), 4)
  }

  /** Fraction of ws-split words containing at least one alphabetic
    * char — Gopher requires ≥ 80% (numeric/symbol soup screens out).
    * The numerator counts non-whitespace runs carrying a letter with
    * ONE codegen `regexp_count` (each maximal run yields exactly one
    * match iff it contains a letter) — no array materialization. */
  def alphaWordFraction(text: Column): Column = {
    val nw = s"[^${GraftFunctions.WsClass}]"
    val alpha = regexp_count(text, lit(s"$nw*[A-Za-z]$nw*"))
    GraftFunctions.roundPortable(
      alpha.cast("double") /
        greatest(portableWordCount(text), lit(1L)).cast("double"), 4)
  }

  /** The composed Gopher document-shape rule (the A1.1 bands above,
    * all of which must hold): the repetition rules
    * ([[repetitionRatio]], [[distinctTokenRatio]]) and length/stopword
    * screens live separately — this is the SHAPE half of the filter. */
  def gopherShapeOk(text: Column): Column =
    meanWordLength(text).between(3.0, 10.0) &&
      symbolWordRatio(text) < 0.1 &&
      bulletLineFraction(text) < 0.9 &&
      ellipsisLineFraction(text) < 0.3 &&
      alphaWordFraction(text) > 0.8

  /** 128-bit content fingerprint (md5 hex) — exact-dup key. */
  def md5Fingerprint(text: Column): Column = md5(text)

  /** Polynomial rolling hash over the codepoints, mod 2^31-1 — an
    * order-sensitive fingerprint cheap enough to recompute per chunk.
    * Expressed as a SQL `aggregate` so it stays engine-portable:
    * `h := (h*31 + codepoint) mod 2147483647`. */
  def rollingHash(textColName: String): Column =
    expr(
      s"""aggregate(
         |  sequence(1, length($textColName)),
         |  CAST(0 AS BIGINT),
         |  (acc, i) -> (acc * 31 + ascii(substring($textColName, i, 1))) % 2147483647
         |)""".stripMargin)
}
