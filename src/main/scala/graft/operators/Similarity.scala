package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (extension surface; testdata `embeddings.embedding: array<float>`).
  *
  * Two tiers:
  *  - [[topKForVector]] / [[topKForQueries]] — exact brute force: one
  *    codegen'd scan computing cosine per row, `TakeOrderedAndProject`
  *    for the top-k (no full sort, no shuffle of the corpus).
  *  - [[hyperplaneLsh]] bucketing — the scale path: sign-random-projection
  *    buckets computed in one projection; queries probe only their own
  *    (and optionally 1-bit-flipped) buckets, turning a 100 TB scan into
  *    a bucket-local lookup. Hyperplanes are generated from a fixed seed
  *    on the driver and shipped as literals — deterministic across runs
  *    and executors.
  */
object Similarity {

  /** Exact top-k for one query vector (driver-side literal). */
  def topKForVector(
      vecs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val queryCol = array(query.map(v => lit(v)): _*)
    vecs.select(col(idCol),
        roundPortable(cosine_similarity(col(vecCol), queryCol), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Exact top-k for a (small) set of query rows: broadcast the queries,
    * one pass over the corpus, per-query window top-k. */
  def topKForQueries(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", roundPortable(cosine_similarity(col(corpusVec), col(queryVec)), 6))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId))
    joined.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("__rk").as("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Adds an LSH bucket id: bit b = sign(v · hyperplane_b). Cosine-similar
    * vectors collide with probability 1 - θ/π per bit. */
  def withHyperplaneBucket(
      vecs: DataFrame, vecCol: String,
      planes: Seq[Seq[Double]]): DataFrame = {
    val bucket = planes.zipWithIndex.map { case (p, b) =>
      val planeCol = array(p.map(lit): _*)
      when(dot_product(col(vecCol), planeCol) >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    vecs.withColumn("bucket", bucket)
  }

  /** K-means centroids for the IVF index (`spark.ml` KMeans over the
    * corpus vectors, fixed seed). Returns (centroid_id, cvec) rows —
    * nCentroids of them, aggregate-sized, built for broadcasting. At
    * 100 TB fit on a sample; the centroid count stays driver-sized
    * either way. */
  def kmeansCentroids(
      corpus: DataFrame, vecCol: String, nCentroids: Int,
      seed: Long = 42L, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.select(array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nCentroids).setSeed(seed)
      .setMaxIter(maxIter).setFeaturesCol("features").fit(feats)
    val centers = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.toArray.map(_.toFloat))
    }.toSeq
    corpus.sparkSession.createDataFrame(centers).toDF("centroid_id", "cvec")
  }

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their
    * nearest of `nCentroids` centroids — k-means by default
    * ([[kmeansCentroids]]); `useKMeans = false` falls back to the
    * lowest-id corpus vectors (deterministic regardless of partition
    * layout, at lower recall). A query probes its `nProbe` nearest
    * centroids and ranks exactly within those cells only — the classic
    * cell-probe trade: recall grows with nProbe, cost stays
    * |corpus|·nProbe/nCentroids per query.
    *
    * Physical shape: one broadcast cross-score against centroids (cheap:
    * nCentroids is small) + window rank to assign; the probe join is a
    * hash join on cluster_id.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 3,
      useKMeans: Boolean = true,
      /** Precomputed (centroid_id, cvec) rows — the index-reuse path:
        * fit [[kmeansCentroids]] once (on a sample at 100 TB), pass it to
        * every query batch. Without it, useKMeans = true re-fits on each
        * call — fine for one-shot jobs, wasteful for repeated ones. */
      centroids: Option[DataFrame] = None): DataFrame = {
    val centroidRel = broadcast(centroids.getOrElse(
      if (useKMeans) kmeansCentroids(corpus, corpusVec, nCentroids)
      else corpus.orderBy(col(corpusId)).limit(nCentroids)
        .select(col(corpusId).as("centroid_id"), col(corpusVec).as("cvec"))))

    def assign(df: DataFrame, id: String, vec: String, probes: Int, outCol: String) = {
      val scored = df.crossJoin(centroidRel)
        .withColumn("__sim", cosine_similarity(col(vec), col("cvec")))
      val w = Window.partitionBy(col(id)).orderBy(col("__sim").desc, col("centroid_id"))
      scored.withColumn("__cr", row_number().over(w))
        .filter(col("__cr") <= probes)
        .drop("cvec", "__sim", "__cr")
        .withColumnRenamed("centroid_id", outCol)
    }

    val assignedCorpus = assign(corpus, corpusId, corpusVec, 1, "cluster_id")
    val probedQueries = assign(queries, queryId, queryVec, nProbe, "cluster_id")

    val cand = assignedCorpus.join(probedQueries, Seq("cluster_id"))
      .withColumn("cosine", roundPortable(cosine_similarity(col(corpusVec), col(queryVec)), 6))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId))
    cand.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("__rk").as("rank"))
  }

  /** ANN top-k via hyperplane LSH: corpus and queries bucketed with the
    * same planes; candidates = same-bucket ∪ hamming-1 buckets
    * (multi-probe); exact cosine rank within candidates. */
  def annTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, bits: Int = 12, seed: Long = 42L, multiProbe: Boolean = true,
      dim: Int = -1): DataFrame = {
    // dim < 0 → infer from the first non-null corpus vector; a wrong dim
    // would silently bucket on a prefix and collapse recall. Empty (or
    // all-null-vector) corpus → empty result, not a crash.
    val planeDim =
      if (dim > 0) dim
      else corpus.select(size(col(corpusVec)).as("__d"))
        .filter(col("__d") > 0).take(1) match {
        case Array(r) => r.getInt(0)
        case _ =>
          return queries.limit(0).crossJoin(corpus.limit(0))
            .select(col(queryId), col(corpusId),
              lit(0.0).as("cosine"), lit(1).as("rank"))
      }
    val planes = hyperplanes(planeDim, bits, seed)
    val bc = withHyperplaneBucket(corpus, corpusVec, planes)
    val bq0 = withHyperplaneBucket(queries, queryVec, planes)
    // multi-probe: query also probes every bucket at hamming distance 1
    val probes =
      if (!multiProbe) bq0.withColumn("probe", col("bucket"))
      else bq0.withColumn("probe",
        explode(concat(array(col("bucket")),
          transform(sequence(lit(0), lit(bits - 1)),
            b => col("bucket").bitwiseXOR(shiftL(lit(1L), b))))))
    val cand = bc.withColumnRenamed("bucket", "probe")
      .join(probes, Seq("probe"))
      .withColumn("cosine", roundPortable(cosine_similarity(col(corpusVec), col(queryVec)), 6))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId))
    cand.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("__rk").as("rank"))
  }
}
