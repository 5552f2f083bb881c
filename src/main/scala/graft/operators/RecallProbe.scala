package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Realized-recall probe for the persisted ANN index families — the
  * "when to refit" signal. Both index lifecycles can absorb appends
  * under a FROZEN family (IVF centroids / SRP planes) and both have a
  * refit that resets the resulting drift — but the drift itself was
  * previously unmeasurable in-repo: a user operating the crawl loop had
  * to guess the refit cadence. This operator applies the reference's
  * drift-check pattern (measure, compare to a threshold, alert —
  * reference `tasks/quality_parallel.py:159-189`) to the index: sample
  * query vectors, compute the ground truth EXACTLY on a bounded
  * evaluation slice of the index, ask the index the same question, and
  * report realized recall per query. Refit when the sampled recall sags
  * below the target the family was sized for.
  *
  * 100 TB posture: everything expensive is SAMPLE-bounded. The exact
  * side is |eval| × |queries| broadcast work (both bounded by the
  * caller); the index side probes bounded cells/buckets; the only
  * index-sized work is one column-pruned scan to draw the samples —
  * there is deliberately NO full-index brute force anywhere. Sampling
  * is deterministic (portable md5 order — [[sampleByMd5]]), so two
  * probes of the same index state see the same slice and a recall MOVE
  * is evidence of drift, not sampling noise.
  */
object RecallProbe {

  /** Deterministic bounded sample: the `n` rows whose salted portable
    * md5 sorts lowest — a seeded shuffle both Spark and an external
    * oracle can reproduce exactly (`ORDER BY md5(key || '/' || salt)`).
    * Plans as TakeOrderedAndProject: one scan, a bounded heap per
    * partition, never a full sort. Ties (astronomically unlikely)
    * break on the key itself, so the order is total. */
  def sampleByMd5(df: DataFrame, keyCol: String, n: Int,
      salt: String): DataFrame = {
    require(n > 0, s"sample size n=$n must be positive")
    df.orderBy(
      md5(concat(col(keyCol).cast("string"), lit("/" + salt))), col(keyCol))
      .limit(n)
  }

  /** Join exact and index answer sets into per-query recall rows —
    * THE single spelling of the metric, shared by both index families.
    * Inputs carry (queryIdCol, idCol) pairs; output is one row per
    * query with ground truth: (query_id, n_true, n_found, recall),
    * recall rounded portably to 4. Queries with NO ground-truth rows
    * are dropped (their recall is undefined — 0/0), matching how a
    * drift monitor would treat them. Aggregate-sized output. */
  private def recallRows(exact: DataFrame, found: DataFrame,
      queryIdCol: String, idCol: String): DataFrame = {
    val matched = exact.select(col(queryIdCol), col(idCol))
      .join(found.select(col(queryIdCol), col(idCol)),
        Seq(queryIdCol, idCol), "left_semi")
    exact.groupBy(col(queryIdCol))
      .agg(count(lit(1)).cast("int").as("n_true"))
      .join(matched.groupBy(col(queryIdCol))
        .agg(count(lit(1)).cast("int").as("n_found")), Seq(queryIdCol), "left")
      .na.fill(0, Seq("n_found"))
      .select(col(queryIdCol).as("query_id"),
        col("n_true"), col("n_found"),
        roundPortable(col("n_found").cast("double") / col("n_true"), 4)
          .as("recall"))
  }

  /** Realized recall@k of an [[Similarity.IvfIndex]] against exact
    * brute force, both sides restricted to the SAME bounded evaluation
    * slice `eval` (`(id, vec)` rows drawn from the index — the caller
    * bounds it; [[ivfIndexRecall]] draws it deterministically). The
    * restriction is what keeps the probe sample-bounded AND fair: a
    * true neighbor inside the slice whose cell the query does not
    * probe is a MISS (the drift signal), while vectors outside the
    * slice can't be scored by one side only. Output: one row per
    * query — (query_id, n_true, n_found, recall). */
  def ivfRecallAtK(index: Similarity.IvfIndex, eval: DataFrame,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nProbe: Int): DataFrame = {
    val evalIds = eval.select(col("id"))
    val restricted = Similarity.IvfIndex(index.centroids,
      index.cells.join(broadcast(evalIds), Seq("id"), "left_semi"))
    val exact = Similarity.topKForQueries(eval, "id", "vec",
      queries, queryId, queryVec, k)
    val found = Similarity.ivfTopKFromIndex(restricted, queries,
      queryId, queryVec, k, nProbe)
    recallRows(exact, found, queryId, "id")
  }

  /** [[ivfRecallAtK]] on a persisted index with deterministic sampling:
    * `nQueries` query vectors and up to `maxEval` evaluation vectors
    * drawn from the index by portable md5 order (disjoint salts, so the
    * two samples are independent; queries are index members and find
    * themselves at rank 1 when they fall inside the eval slice — the
    * standard self-probe). One column-pruned index scan per sample,
    * bounded work everywhere after. */
  def ivfIndexRecall(spark: SparkSession, path: String,
      k: Int, nProbe: Int, nQueries: Int = 20,
      maxEval: Int = 100000, salt: String = "recall"): DataFrame = {
    val index = Similarity.loadIvfIndex(spark, path)
    val vectors = index.cells.select(col("id"), col("vec"))
    val queries = sampleByMd5(vectors, "id", nQueries, salt + "-q")
      .select(col("id").as("probe_query_id"), col("vec").as("__qvec"))
    ivfRecallAtK(index, sampleByMd5(vectors, "id", maxEval, salt + "-eval"),
      queries, "probe_query_id", "__qvec", k, nProbe)
  }

  /** Realized pair-recall of an [[TextDedup.EmbeddingIndex]] against
    * exact cosine, both sides restricted to the bounded evaluation
    * slice: ground truth = every (query, eval vector) pair at cosine ≥
    * `threshold` (one broadcast pass — |queries| × |eval| bounded);
    * found = [[TextDedup.embeddingNearDupAgainstIndex]] over the
    * slice-restricted index. The family's per-pair recall target is
    * 1 − (1 − pᵇ)ᵗ at build time; THIS is the realized number after
    * appends. Output rows like the IVF probe. */
  def embeddingRecall(index: TextDedup.EmbeddingIndex, eval: DataFrame,
      queries: DataFrame, queryId: String, queryVec: String,
      threshold: Double): DataFrame = {
    val evalIds = eval.select(col("id"))
    val restricted = TextDedup.EmbeddingIndex(
      index.buckets.join(broadcast(evalIds), Seq("id"), "left_semi"),
      index.vectors.join(broadcast(evalIds), Seq("id"), "left_semi"),
      index.bits, index.tables, index.seed, index.dim)
    // same id contract as the operator under probe: equal ids across
    // batch and index are the same document — never a pair
    val exact = eval.crossJoin(broadcast(
        queries.select(col(queryId).as("__probe_qid"),
          col(queryVec).as("__probe_qvec"))))
      .filter(col("id") =!= col("__probe_qid"))
      .filter(
        roundPortable(cosine_similarity(col("vec"), col("__probe_qvec")), 6)
          >= threshold)
      .select(col("__probe_qid"), col("id"))
    val found = TextDedup.embeddingNearDupAgainstIndex(
        queries, queryId, queryVec, restricted, threshold)
      .select(col("new_id").as("__probe_qid"), col("index_id").as("id"))
    recallRows(exact, found, "__probe_qid", "id")
  }

  /** [[embeddingRecall]] on a persisted index: eval slice drawn
    * deterministically from the index ([[sampleByMd5]]); queries
    * supplied by the caller (a held-out batch, or a sample of the
    * index itself). `threshold` -1 defaults to the target persisted in
    * the index meta at save time — probing at the very threshold the
    * family was sized for is the drift check. */
  def embeddingIndexRecall(spark: SparkSession, path: String,
      queries: DataFrame, queryId: String, queryVec: String,
      threshold: Double = -1.0,
      maxEval: Int = 100000, salt: String = "recall"): DataFrame = {
    val index = TextDedup.loadEmbeddingIndex(spark, path)
    val useThreshold =
      if (threshold != -1.0) threshold
      else {
        val meta = spark.read.parquet(s"$path/meta").head()
        require(meta.schema.fieldNames.contains("threshold"),
          "embeddingIndexRecall: this index predates the persisted " +
            "threshold — pass threshold explicitly")
        meta.getAs[Double]("threshold")
      }
    embeddingRecall(index,
      sampleByMd5(index.vectors, "id", maxEval, salt + "-eval"),
      queries, queryId, queryVec, useThreshold)
  }
}
