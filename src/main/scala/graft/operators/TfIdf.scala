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
    * the quality stack. */
  def tfidfVectors(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L, roundDecimals: Int = 4): DataFrame = {
    require(minDf >= 1, s"minDf=$minDf must be >= 1")
    val toks = docs.select(col(idCol),
      explode(filter(split(col(textCol), "\\s+"), t => t =!= "")).as("token"))
    // (doc, token) counts and per-doc lengths in ONE aggregate pass
    // each; docLen re-derives from the term counts (sum of counts), so
    // the corpus is exploded exactly once
    val termCounts = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("n_term"))
    val docLens = termCounts.groupBy(col(idCol))
      .agg(sum(col("n_term")).as("n_doc_tokens"))
    val df = termCounts.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val nDocs = docs.select(col(idCol)).distinct().count()
    termCounts
      .join(df, "token")
      .join(docLens, idCol)
      .select(
        col(idCol), col("token"), col("n_term"), col("df"),
        roundPortable(
          (col("n_term").cast("double") / col("n_doc_tokens")) *
            (log((lit(nDocs.toDouble) + 1.0) / (col("df").cast("double") + 1.0))
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
