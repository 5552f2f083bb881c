package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.roundPortable

/** TF-IDF term weighting over a document corpus (extension surface; no
  * reference counterpart) — the classic lexical relevance/keyword
  * signal a curation pipeline uses for topic filtering and near-class
  * balancing.
  *
  * Definitions (the smooth-idf spelling, portable to the oracle):
  *   tf(d, t)  = count of t in d / tokens in d
  *   idf(t)    = ln((N + 1) / (df(t) + 1)) + 1
  *   tfidf     = tf · idf
  *
  * Scale shape: explode → two hash aggregates — (doc, token) term
  * counts, then token document frequencies. The DF relation is
  * VOCABULARY-sized (Heaps-law bounded, like [[NgramLm]]'s count
  * relations), so the final join carries vocab rows on one side and
  * (doc, token) rows on the other — corpus-linear, no corpus×corpus
  * anything. `minDf` prunes hapax noise at the DF aggregate, shrinking
  * the join's vocabulary side before it ships.
  */
object TfIdf {

  /** (doc, token, tf, df, tfidf) rows for every surviving (doc, token)
    * pair. Tokens are whitespace words, exactly the corpus tokenizer
    * used by [[NgramLm]] / TextAnalysis — one tokenization story across
    * the quality stack.
    *
    * N (the idf numerator) is the number of documents with ≥1 token —
    * derived LAZILY from the already-reduced doc-length relation via a
    * broadcast 1-row cross join (the oracle's `nd` CTE spelling), never
    * an eager `.count()` at construction: the r11 spelling ran a second
    * full corpus scan (plus a distinct exchange) as a Spark ACTION
    * before the plan was even materialized — at 100 TB, a whole extra
    * pass to fetch one scalar. The doc-length branch re-uses the term-
    * count shuffle (ReuseExchange dedupes identical Exchange subtrees),
    * so the corpus is scanned and exploded exactly once; token-less
    * documents contribute no rows and no longer count toward N (idf's N
    * conventionally counts indexed documents, all of which have terms).
    * Callers that already know N can pass `nDocs` and skip even the
    * 1-row aggregate branch. */
  def tfidfVectors(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L, roundDecimals: Int = 4,
      nDocs: Option[Long] = None): DataFrame = {
    require(minDf >= 1, s"minDf=$minDf must be >= 1")
    val toks = docs.select(col(idCol),
      explode(filter(split(col(textCol), graft.functions.GraftFunctions.WsRun),
        t => t =!= "")).as("token"))
    // (doc, token) counts and per-doc lengths in ONE aggregate pass
    // each; docLen re-derives from the term counts (sum of counts), so
    // the corpus is exploded exactly once
    val termCounts = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("n_term"))
    val docLens = termCounts.groupBy(col(idCol))
      .agg(sum(col("n_term")).as("n_doc_tokens"))
    // The n_term > 0 predicate is a semantic no-op (counts are ≥ 1) that
    // matters to the PLAN: without a reference to n_term, column pruning
    // specializes this branch's partial aggregate to a count-less
    // distinct, its exchange subtree stops being canonically identical
    // to termCounts', and ReuseExchange forks a SECOND corpus
    // scan+explode. With it, all branches dedupe to one scan
    // (plan-asserted in TfIdfSpec).
    val df = termCounts.filter(col("n_term") > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    // Same no-op-reference trick for the N branch (pruning would
    // otherwise reduce it to distinct-doc_id over its own third scan).
    val nd = nDocs
      .map(n => docs.sparkSession.range(1).select(lit(n.toDouble).as("__n_docs")))
      .getOrElse(docLens.filter(col("n_doc_tokens") > 0)
        .agg(count(lit(1)).cast("double").as("__n_docs")))
    termCounts
      .join(df, "token")
      .join(docLens, idCol)
      .crossJoin(broadcast(nd))
      .select(
        col(idCol), col("token"), col("n_term"), col("df"),
        roundPortable(
          (col("n_term").cast("double") / col("n_doc_tokens")) *
            (log((col("__n_docs") + 1.0) / (col("df").cast("double") + 1.0))
              + 1.0),
          roundDecimals).as("tfidf"))
  }

  /** Top-k terms per document by (tfidf desc, token) — the keyword
    * extraction spelling. Rank via row_number window over the
    * vocabulary-joined vectors: the window partitions by document, so
    * state is per-doc term counts, never corpus-wide. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
      minDf: Long = 1L): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("token"))
    tfidfVectors(docs, idCol, textCol, minDf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
