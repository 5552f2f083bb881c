package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{roundPortable, top_k_by_score}

/** Hybrid-retrieval rank fusion — Reciprocal Rank Fusion (Cormack,
  * Clarke & Buettcher, SIGIR 2009): given per-query ranked lists from
  * heterogeneous retrievers (lexical BM25, dense ANN, …), score each
  * (query, doc) as `Σ_lists weight / (k0 + rank)` and re-rank. RRF is
  * the standard fusion baseline precisely because it needs NO score
  * calibration — BM25 scores and cosines live on incomparable scales,
  * but ranks are ranks.
  *
  * Scale posture: the inputs are ALREADY top-k lists — `queries × k ×
  * lists` rows, never corpus-sized — so fusion costs one union, one
  * hash aggregate on (query, doc), and the bounded [[graft.functions
  * .TopKByScore]] re-rank. The corpus is never touched: a 100 TB hybrid
  * stack pays its retrievers (each independently scale-shaped:
  * posting-list BM25, IVF/LSH probes) and fuses for free.
  *
  * Determinism: contributions are summed in the portable rounded domain
  * (`roundPortable(·, 6)` per list entry, so ties are engine-stable) and
  * re-ranked by (fused score desc, id asc) — the same total order every
  * other ranking op here uses. A document absent from one list simply
  * contributes nothing for it (the SQL-outer-join semantics of RRF). */
object Fusion {

  /** Fuse ranked lists. Each input must carry (qCol, idCol, rankCol)
    * with rank 1-based best-first (the shape [[TfIdf.bm25TopK]] and the
    * [[Similarity]] top-k family emit).
    *
    * @param lists   (ranked list, weight) pairs; weights let a caller
    *                bias toward one retriever (default spelling: 1.0)
    * @param k       fused list length per query
    * @param rrfK    the RRF smoothing constant k0 (60 in the paper)
    * @return (qCol, idCol, score, rank) — fused top-k, best-first
    */
  def rrfFuse(
      lists: Seq[(DataFrame, Double)],
      qCol: String, idCol: String, rankCol: String,
      k: Int, rrfK: Double = 60.0): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0, s"k=$k must be positive")
    require(rrfK >= 0, s"rrfK=$rrfK must be non-negative")
    lists.foreach { case (df, w) =>
      require(w > 0, s"list weight $w must be positive")
      Seq(qCol, idCol, rankCol).foreach(c =>
        require(df.columns.contains(c),
          s"column $c absent from ${df.columns.mkString(",")}"))
    }
    val contribs = lists.map { case (df, w) =>
      df.select(col(qCol), col(idCol),
        roundPortable(lit(w) / (lit(rrfK) + col(rankCol).cast("double")), 6)
          .as("__contrib"))
    }.reduce(_ unionByName _)
    contribs
      .groupBy(col(qCol), col(idCol))
      .agg(roundPortable(sum(col("__contrib")), 6).as("score"))
      .groupBy(col(qCol))
      .agg(top_k_by_score(col(idCol), col("score"), k).as("__topk"))
      .select(col(qCol), posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col(qCol), col("__e.id").as(idCol),
        col("__e.score").as("score"),
        (col("__pos") + 1).cast("int").as("rank"))
  }
}
