package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{cosine_similarity, nearest_centroids, roundPortable}

/** SemDeDup — semantic deduplication by CLUSTER-SCOPED embedding
  * similarity (Abbas et al., "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", arXiv 2303.09540):
  * k-means partition the embedding space, then compare ONLY within a
  * cluster and drop every document with a kept smaller-id neighbor at
  * cosine ≥ tau. The third dedup regime next to [[TextDedup]]'s exact
  * hashes (byte-identical) and SRP-LSH near-dup (lexically close):
  * SemDeDup removes SEMANTIC duplicates — re-phrasings, translations,
  * templated rewrites — that share no shingles at all.
  *
  * Drop rule: one-pass witness semantics — document d is dropped iff
  * SOME same-cluster document e with e.id < d.id has
  * `round6(cos(d, e)) ≥ tau`, whether or not e itself survives (the
  * SQL `EXISTS` spelling, deterministic and engine-portable). For the
  * transitive-closure variant (keep one per CONNECTED near-dup group)
  * feed [[TextDedup.connectedComponents]] with the within-cluster
  * pairs instead; the paper's own keep-one-per-pair choice is as
  * arbitrary as this one, and the one-pass rule needs no iteration.
  *
  * Scale shape: the paper's design point is that cluster count GROWS
  * with the corpus (`clustersFor` — fixed target cluster size), so
  * the within-cluster pair join is Σ c_i² ≈ n · targetSize — linear
  * in n at a fixed target size, never the n² product. Assignment is
  * the zero-shuffle [[graft.functions.NearestCentroids]] codegen
  * projection under a bounded-sample k-means fit; the witness check
  * is ONE self-join on cluster_id (hash exchange on a near-uniform
  * key) spelled as `left_anti`, so dropped rows never leave their
  * task and there is no second pass.
  */
object SemDedup {

  /** Cluster count for a fixed target cluster size — the knob that
    * keeps the within-cluster quadratic LINEAR in corpus size. */
  def clustersFor(n: Long, targetSize: Long = 1024L): Int = {
    require(targetSize >= 1, s"targetSize=$targetSize must be >= 1")
    math.max(1L, math.min(Int.MaxValue.toLong, (n + targetSize - 1) / targetSize)).toInt
  }

  /** Adds `cluster_id` by nearest-centroid assignment. Centroids come
    * from `centroids` when given (the fit-once seam — e.g. a persisted
    * [[Similarity.saveIndex]] relation), else a fresh bounded-sample
    * k-means fit ([[Similarity.kmeansCentroids]], seeded). */
  def withClusters(corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, seed: Long = 42L, maxIter: Int = 20,
      centroids: Option[DataFrame] = None): DataFrame = {
    require(nClusters >= 1, s"nClusters=$nClusters must be >= 1")
    // spark.ml KMeans requires k >= 2; one cluster (clustersFor of a
    // small corpus) is just "no partitioning" — assign directly
    if (nClusters == 1 && centroids.isEmpty)
      return corpus.withColumn("cluster_id", lit(0L))
    val centRel = centroids.getOrElse(
      Similarity.kmeansCentroids(corpus, vecCol, nClusters, seed, maxIter))
    val (ids, vecs) = Similarity.centroidKernel(centRel)
    require(ids.nonEmpty, "withClusters: no centroids (empty corpus?)")
    corpus.withColumn("cluster_id",
      element_at(nearest_centroids(col(vecCol), ids, vecs, 1), 1)
        .cast("long"))
  }

  /** Hot-cluster guard — the [[TextDedup.capBuckets]] /
    * IVF-refit posture for the one remaining unbounded quadratic in
    * the dedup family: k-means under a skewed embedding distribution
    * can hand one GIANT cluster to the witness self-join and
    * re-introduce the all-pairs product [[clustersFor]] exists to
    * prevent. Clusters above `maxClusterSize` are re-split into
    * `ceil(size / cap)` sub-cells by a deterministic id hash, and the
    * witness join keys on (cluster, sub-cell) — every cell's pair
    * count is bounded by ~cap²/2 regardless of skew, so total work is
    * ≤ n·cap. The trade, same as the LSH bucket cap: witnesses in a
    * SIBLING sub-cell of the same hot cluster are not seen (fewer
    * drops — the capped kept set is a superset of the uncapped one).
    * No silent default: `Long.MaxValue` keeps exact behavior unless
    * the caller opts in. Cost when opted in: one O(n) map-side count
    * per cluster + an O(clusters) broadcast join. */
  private def withSubCells(assigned: DataFrame, idCol: String,
      maxClusterSize: Long): DataFrame = {
    require(maxClusterSize >= 1,
      s"maxClusterSize=$maxClusterSize must be >= 1")
    if (maxClusterSize == Long.MaxValue) assigned
    else {
      val nSub = assigned.groupBy(col("cluster_id"))
        .agg(greatest(lit(1L),
          ceil(count(lit(1)) / lit(maxClusterSize.toDouble)).cast("long"))
          .as("__n_sub"))
      assigned.join(broadcast(nSub), "cluster_id")
        .withColumn("__sub", pmod(xxhash64(col(idCol)), col("__n_sub")))
        // the USING join fronts cluster_id — restore the caller's
        // column order so capped and exact outputs share a schema
        .select(assigned.columns.map(col).toSeq :+ col("__sub"): _*)
    }
  }

  /** The kept rows (all input columns + `cluster_id`) after the
    * cluster-scoped drop rule. Pass `assignments` (an
    * `(idCol, cluster_id)` relation, e.g. a persisted snapshot of a
    * prior [[withClusters]]) to pin the clustering externally — the
    * seam the oracle uses, and the production fit-once path.
    * `maxClusterSize` opts into the hot-cluster guard
    * ([[withSubCells]] — bounded pair count under cluster skew, at a
    * documented recall trade). */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      tau: Double, nClusters: Int = 16, seed: Long = 42L,
      maxIter: Int = 20, centroids: Option[DataFrame] = None,
      assignments: Option[DataFrame] = None,
      maxClusterSize: Long = Long.MaxValue): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau=$tau must be in (0, 1]")
    val capped = maxClusterSize != Long.MaxValue
    val assigned = withSubCells(assignments match {
      case Some(a) => corpus.join(
        a.select(col(idCol), col("cluster_id")), idCol)
      case None =>
        withClusters(corpus, idCol, vecCol, nClusters, seed, maxIter,
          centroids)
    }, idCol, maxClusterSize)
    // every witness-side column RENAMED before the self-join: reusing
    // the parent's attribute names would make both join sides resolve
    // to the same lineage (the classic Spark self-join ambiguity)
    val witness = assigned.select(
      (Seq(col("cluster_id").as("__w_cluster"),
        col(idCol).as("__w_id"),
        col(vecCol).as("__w_vec")) ++
        (if (capped) Seq(col("__sub").as("__w_sub")) else Nil)): _*)
    val cond = col("cluster_id") === col("__w_cluster") &&
      (if (capped) col("__sub") === col("__w_sub") else lit(true)) &&
      col("__w_id") < col(idCol) &&
      roundPortable(
        cosine_similarity(col(vecCol), col("__w_vec")), 6) >= tau
    val kept = assigned.join(witness, cond, "left_anti")
    if (capped) kept.drop("__sub") else kept
  }

  /** The dropped relation with one witness each — `(idCol, cluster_id,
    * witness_id, cosine)`, witness = the SMALLEST qualifying
    * smaller-id neighbor (deterministic; useful for audit trails and
    * for feeding the pair set to [[TextDedup.connectedComponents]]).
    * Same join shape as [[semDedup]] plus a bounded min-aggregate. */
  def droppedWithWitness(corpus: DataFrame, idCol: String, vecCol: String,
      tau: Double, nClusters: Int = 16, seed: Long = 42L,
      maxIter: Int = 20, centroids: Option[DataFrame] = None,
      assignments: Option[DataFrame] = None,
      maxClusterSize: Long = Long.MaxValue): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau=$tau must be in (0, 1]")
    val capped = maxClusterSize != Long.MaxValue
    val assigned = withSubCells(assignments match {
      case Some(a) => corpus.join(
        a.select(col(idCol), col("cluster_id")), idCol)
      case None =>
        withClusters(corpus, idCol, vecCol, nClusters, seed, maxIter,
          centroids)
    }, idCol, maxClusterSize)
    val witness = assigned.select(
      (Seq(col("cluster_id").as("__w_cluster"),
        col(idCol).as("__w_id"),
        col(vecCol).as("__w_vec")) ++
        (if (capped) Seq(col("__sub").as("__w_sub")) else Nil)): _*)
    assigned.join(witness,
      col("cluster_id") === col("__w_cluster") &&
        (if (capped) col("__sub") === col("__w_sub") else lit(true)) &&
        col("__w_id") < col(idCol) &&
        roundPortable(
          cosine_similarity(col(vecCol), col("__w_vec")), 6) >= tau)
      .select(col(idCol), col("cluster_id"), col("__w_id"),
        roundPortable(
          cosine_similarity(col(vecCol), col("__w_vec")), 6)
          .as("__cos"))
      .groupBy(col(idCol), col("cluster_id"))
      .agg(min(struct(col("__w_id"), col("__cos"))).as("__w"))
      .select(col(idCol), col("cluster_id"),
        col("__w.__w_id").as("witness_id"),
        col("__w.__cos").as("cosine"))
  }
}
