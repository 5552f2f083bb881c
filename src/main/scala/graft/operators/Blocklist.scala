package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Blocklist filtering — the C4 step (Raffel et al. 2020 dropped any
  * page containing a word from the public "List of Dirty, Naughty,
  * Obscene..." list): match documents against a term list at WORD
  * boundaries and either drop or annotate. Token-equality matching (on
  * the repo's portable whitespace split, lower-cased) rather than
  * substring matching — "assassin" must not trip "ass", the classic
  * Scunthorpe failure of the regex spelling.
  *
  * Scale posture: the term list rides the plan as a LITERAL array
  * (broadcast-by-construction — real lists are hundreds to thousands of
  * terms), matching is one codegen'd `array_intersect` per document —
  * map-only, zero exchanges, scan-bound at any corpus size. No regex
  * compilation, no UDF, no join.
  *
  * Determinism: `blocked_terms` is the SORTED distinct intersection
  * (which input token matched first is partitioning-dependent; the
  * set is not). NULL text yields zero hits and `blocked = false` —
  * a null document cannot match a term; hygiene counters live in
  * [[CorpusStats]]. */
object Blocklist {

  /** Annotate: adds `blocked` (any term present), `n_blocked_terms`
    * (DISTINCT matched terms — C4's rule is any-hit, the count is the
    * audit signal) and `blocked_terms` (sorted matches). Terms are
    * matched case-insensitively; multi-word terms are rejected loudly
    * (token-boundary matching cannot see across spaces — phrase
    * blocking is [[Decontaminate]]'s shingle machinery). */
  /** The three columns annotation adds; pre-existing columns with
    * these names are rejected loudly (the [[Ranking.withGlobalRank]]
    * posture) — `withColumn` would silently overwrite caller data and
    * [[filterBlocked]] would then drop it. */
  val OutputCols: Seq[String] = Seq("blocked", "n_blocked_terms",
    "blocked_terms")

  def annotateBlocked(docs: DataFrame, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(docs.columns.contains(textCol), s"column $textCol absent")
    OutputCols.foreach(c => require(!docs.columns.contains(c),
      s"output column $c already present in ${docs.columns.mkString(",")}"))
    require(terms.nonEmpty, "empty blocklist")
    terms.foreach(t => require(t.nonEmpty && !t.exists(_.isWhitespace),
      s"blocklist term '$t' is empty or multi-word — token-boundary " +
        "matching cannot see phrases; use Decontaminate's shingles"))
    val termsLit = lit(terms.map(_.toLowerCase).distinct.sorted.toArray)
    val toks = filter(split(lower(col(textCol)), GraftFunctions.WsRun),
      t => t =!= "")
    val hits = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(array_sort(array_intersect(array_distinct(toks), termsLit)))
    docs
      .withColumn("blocked_terms", hits)
      .withColumn("n_blocked_terms",
        size(col("blocked_terms")).cast("long"))
      .withColumn("blocked", col("n_blocked_terms") > 0)
  }

  /** The C4 drop rule: survivors only (any blocklist hit drops the
    * document). */
  def filterBlocked(docs: DataFrame, textCol: String,
      terms: Seq[String]): DataFrame =
    annotateBlocked(docs, textCol, terms)
      .filter(!col("blocked"))
      .drop("blocked", "n_blocked_terms", "blocked_terms")
}
