package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Per-query top-k ranking of a scored candidate relation via the
    * bounded [[graft.functions.TopKByScore]] aggregate: map-side partial
    * heaps, only k entries per query per partition cross the exchange.
    * The window spelling (`row_number().over(partitionBy(queryId))`)
    * would shuffle EVERY scored row into one partition per query — with
    * few queries the whole scored corpus lands on that many tasks.
    * Ordering (cosine desc, id asc) is total, so the result is identical
    * to the window's and independent of partitioning. */
  private def rankTopK(
      cand: DataFrame, queryId: String, corpusId: String, k: Int): DataFrame =
    cand.groupBy(col(queryId))
      .agg(top_k_by_score(col(corpusId), col("cosine"), k).as("__topk"))
      .select(col(queryId), posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col(queryId), col("__e.id").as(corpusId),
        col("__e.score").as("cosine"),
        (col("__pos") + 1).cast("int").as("rank"))

  /** Exact top-k for a (small) set of query rows: broadcast the queries,
    * one pass over the corpus, bounded per-query top-k aggregate. */
  def topKForQueries(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", roundPortable(cosine_similarity(col(corpusVec), col(queryVec)), 6))
    rankTopK(joined, queryId, corpusId, k)
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

  /** The k-means fit input, bounded: at 100 TB an unbounded fit would
    * pass the FULL corpus `maxIter` times; the cap keeps the fit to one
    * bounded read (limit short-circuits the scan). Centroid choice only
    * shapes cell balance — IVF exactness comes from the probe/rank
    * stages — so a bounded fit never changes result correctness, and an
    * uneven sample costs at most some recall at small nProbe.
    * `Int.MaxValue` opts into the full-corpus fit. */
  private[operators] def fitInput(
      corpus: DataFrame, vecCol: String, sampleRows: Int): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.select(array_to_vector(col(vecCol)).as("features"))
    if (sampleRows == Int.MaxValue) feats
    else {
      // re-spread after the limit: GlobalLimit funnels the sample into
      // ONE partition, which would single-thread every k-means iteration
      // (measured: 100× ivfTopK 3.9 s → 22.7 s). A MODEST spread — the
      // sample is ≤ sampleRows rows, and full-core fan-out costs more in
      // per-iteration task waves than it buys on a bounded fit
      // (measured: spread 32 doubled the 1× time)
      val cores = corpus.sparkSession.sparkContext.defaultParallelism
      feats.limit(sampleRows).repartition(math.min(math.max(1, cores), 8))
    }
  }

  /** K-means centroids for the IVF index (`spark.ml` KMeans over the
    * corpus vectors, fixed seed). Returns (centroid_id, cvec) rows —
    * nCentroids of them, aggregate-sized, built for broadcasting. The
    * fit reads at most `sampleRows` vectors ([[fitInput]]) so the
    * DEFAULT path does one bounded pass at any corpus scale; the
    * centroid count stays driver-sized either way. */
  def kmeansCentroids(
      corpus: DataFrame, vecCol: String, nCentroids: Int,
      seed: Long = 42L, maxIter: Int = 20,
      sampleRows: Int = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val feats = fitInput(corpus, vecCol, sampleRows)
    val model = new KMeans().setK(nCentroids).setSeed(seed)
      .setMaxIter(maxIter).setFeaturesCol("features").fit(feats)
    val centers = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.toArray.map(_.toFloat))
    }.toSeq
    corpus.sparkSession.createDataFrame(centers).toDF("centroid_id", "cvec")
  }

  /** Persist an IVF index — the (centroid_id, cvec) relation from
    * [[kmeansCentroids]] — as parquet. This closes the 100 TB loop "fit
    * once, probe many": the fit (a bounded-sample k-means) runs once,
    * the saved index is nCentroids rows (aggregate-sized at any corpus
    * scale — one part-file on purpose), and every later query batch
    * [[loadIndex]]es it into [[ivfTopK]]'s `centroids` injection seam
    * instead of re-fitting. Schema is normalized on write (long id,
    * float vector) so a reloaded index is bit-identical input to the
    * assignment kernel regardless of what built it. */
  def saveIndex(centroids: DataFrame, path: String): Unit =
    centroids
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("cvec").cast("array<float>").as("cvec"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Reload a [[saveIndex]]-written IVF index for [[ivfTopK]]'s
    * `centroids` parameter. */
  def loadIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their
    * nearest of `nCentroids` centroids — k-means by default
    * ([[kmeansCentroids]]); `useKMeans = false` falls back to the
    * lowest-id corpus vectors (deterministic regardless of partition
    * layout, at lower recall). A query probes its `nProbe` nearest
    * centroids and ranks exactly within those cells only — the classic
    * cell-probe trade: recall grows with nProbe, cost stays
    * |corpus|·nProbe/nCentroids per query.
    *
    * Physical shape: assignment is a PURE PROJECTION — the centroid
    * matrix (aggregate-sized, driver-known) ships inside a codegen'd
    * [[graft.functions.NearestCentroids]] expression, so no shuffle, no
    * join, no corpus amplification; the probe join broadcasts the
    * (tiny) probed-query side so the corpus never moves; the final
    * ranking is the bounded top-k aggregate.
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
    val centroidRel = centroids.getOrElse(
      if (useKMeans) kmeansCentroids(corpus, corpusVec, nCentroids)
      else corpus.orderBy(col(corpusId)).limit(nCentroids)
        .select(col(corpusId).as("centroid_id"), col(corpusVec).as("cvec")))
    // collect the index to the driver: nCentroids rows by contract
    // (aggregate-sized at any corpus scale — that is what makes IVF an
    // index). Sorted by id for a deterministic kernel layout.
    val centroidRows = centroidRel
      .select(col("centroid_id").cast("long"), col("cvec"))
      .filter(col("cvec").isNotNull).collect()
      .sortBy { r =>
        require(!r.isNullAt(0),
          "ivfTopK: centroid_id must be non-null and long-castable " +
            "(string ids need a numeric surrogate)")
        r.getLong(0)
      }
    if (centroidRows.isEmpty) // empty corpus / all-null index → empty result
      return queries.limit(0).crossJoin(corpus.limit(0))
        .select(col(queryId), col(corpusId),
          lit(0.0).as("cosine"), lit(1).as("rank"))
    val ids = centroidRows.map(_.getLong(0)).toSeq
    // float→double is exact, so the kernel's cosine is bit-identical to
    // cosine_similarity against the original float centroid vectors.
    // Null ELEMENTS inside a centroid become 0.0 (contributing nothing
    // to dot/nb; cosine_similarity would also skip the position's na —
    // a documented, vanishingly-rare divergence only for null-holed
    // centroid vectors; k-means centroids are always dense)
    val vecs = centroidRows.map(_.getSeq[Any](1).map {
      case null => 0.0
      case f: Float => f.toDouble
      case d: Double => d
    }.toSeq).toSeq

    val assignedCorpus = corpus.withColumn("cluster_id",
      element_at(nearest_centroids(col(corpusVec), ids, vecs, 1), 1))
    val probedQueries = queries.withColumn("cluster_id",
      explode(nearest_centroids(col(queryVec), ids, vecs, nProbe)))

    val cand = assignedCorpus.join(broadcast(probedQueries), Seq("cluster_id"))
      .withColumn("cosine", roundPortable(cosine_similarity(col(corpusVec), col(queryVec)), 6))
    rankTopK(cand, queryId, corpusId, k)
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
    // broadcast the probe side (|queries|·(bits+1) rows): the bucketed
    // corpus stays in place — no corpus shuffle for candidate generation
    val cand = bc.withColumnRenamed("bucket", "probe")
      .join(broadcast(probes), Seq("probe"))
      .withColumn("cosine", roundPortable(cosine_similarity(col(corpusVec), col(queryVec)), 6))
    rankTopK(cand, queryId, corpusId, k)
  }
}
