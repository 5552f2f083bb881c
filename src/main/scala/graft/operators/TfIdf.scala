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
    * extraction spelling. Rank via the bounded
    * [[graft.functions.TopKByScore]] aggregate (the [[Similarity]] /
    * [[bm25TopK]] ranking spelling): a k-entry heap per document per
    * input partition with map-side partial merge, so only k rows per
    * doc cross the one exchange — the `row_number` window this
    * replaces shuffled EVERY (doc, term) vector row into the rank
    * exchange. The heap id is `struct(token, n_term, df)` so the
    * payload columns ride the heap entry (no join-back); struct
    * ordering compares token first and (doc, token) is unique, so the
    * tie-break is exactly the window's `(tfidf desc, token asc)`. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
      minDf: Long = 1L): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    tfidfVectors(docs, idCol, textCol, minDf)
      .groupBy(col(idCol))
      .agg(graft.functions.GraftFunctions.top_k_by_score(
        struct(col("token"), col("n_term"), col("df")),
        col("tfidf"), k).as("__topk"))
      .select(col(idCol), posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col(idCol), col("__e.id.token").as("token"),
        col("__e.id.n_term").as("n_term"), col("__e.id.df").as("df"),
        col("__e.score").as("tfidf"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Okapi BM25 top-k retrieval — the classic lexical ranking function
    * (Robertson & Walker, SIGIR 1994; the Lucene "plus-one" idf
    * spelling, which keeps every term's contribution positive):
    *
    *   idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    *   score(q, d) = Σ_{t ∈ distinct(q)} idf(t) ·
    *                   tf(t,d)·(k1 + 1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    *
    * Query terms contribute ONCE each (distinct-term convention,
    * mirrored by the oracle); a document scores iff it shares ≥1 term
    * with the query. Output: (qIdCol, idCol, score, rank), rank 1..k
    * per query by (score desc, doc id).
    *
    * Scale shape: the corpus pays the SAME two hash aggregates as
    * [[tfidfVectors]] — (doc, token) term counts and vocabulary DF —
    * then the query terms (query-batch-sized) join the vocabulary and
    * flow into the POSTING-LIST join: an equi-join on token whose left
    * side is (doc, token) rows and whose right side is (query, token)
    * rows, so the shuffle carries corpus tokens + matches, never a
    * corpus×queries product. The final per-(query, doc) sum and the
    * top-k use the bounded [[graft.functions.TopKByScore]] aggregate —
    * k rows per query per partition cross the last exchange, the
    * [[Similarity]] ranking spelling, never a corpus-wide window. N
    * and avgdl ride a broadcast 1-row aggregate (no eager action). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75, minDf: Long = 1L,
      roundDecimals: Int = 4): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(k1 >= 0 && b >= 0 && b <= 1, s"k1=$k1 must be >= 0, b=$b in [0,1]")
    val toks = docs.select(col(idCol),
      explode(filter(split(col(textCol), graft.functions.GraftFunctions.WsRun),
        t => t =!= "")).as("token"))
    val termCounts = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("n_term"))
    val docLens = termCounts.groupBy(col(idCol))
      .agg(sum(col("n_term")).as("n_doc_tokens"))
    // the same no-op n_term reference as tfidfVectors: keeps this
    // branch's exchange canonically identical to termCounts' so
    // ReuseExchange dedupes to ONE corpus scan+explode
    val dfRel = termCounts.filter(col("n_term") > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    // N and avgdl from one 1-row aggregate over the reduced lengths
    val stats = docLens.filter(col("n_doc_tokens") > 0)
      .agg(count(lit(1)).cast("double").as("__n_docs"),
        avg(col("n_doc_tokens")).as("__avgdl"))
    val qTerms = queries
      .select(col(qIdCol), explode(filter(
        split(col(qTextCol), graft.functions.GraftFunctions.WsRun),
        t => t =!= "")).as("token"))
      .distinct()
    val idf = qTerms.join(dfRel, "token")
      .crossJoin(broadcast(stats))
      .select(col(qIdCol), col("token"),
        log(lit(1.0) + (col("__n_docs") - col("df") + 0.5) /
          (col("df") + 0.5)).as("__idf"),
        col("__avgdl"))
    val scored = termCounts
      .join(idf, "token")
      .join(docLens, idCol)
      .select(col(qIdCol), col(idCol),
        (col("__idf") *
          (col("n_term").cast("double") * (k1 + 1.0)) /
          (col("n_term").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("n_doc_tokens").cast("double") /
              col("__avgdl")))).as("__term_score"))
      .groupBy(col(qIdCol), col(idCol))
      .agg(roundPortable(sum(col("__term_score")), roundDecimals)
        .as("score"))
    scored
      .groupBy(col(qIdCol))
      .agg(graft.functions.GraftFunctions.top_k_by_score(
        col(idCol), col("score"), k).as("__topk"))
      .select(col(qIdCol), posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col(qIdCol), col("__e.id").as(idCol),
        col("__e.score").as("score"),
        (col("__pos") + 1).cast("int").as("rank"))
  }
}
