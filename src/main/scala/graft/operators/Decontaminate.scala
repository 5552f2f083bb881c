package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.Pinnable
import graft.functions.BloomHitCount
import graft.functions.GraftFunctions._

/** Bloom-prefiltered benchmark decontamination — the 100 TB spelling of
  * [[TextDedup.crossContainmentPairs]].
  *
  * The exact operator broadcasts the full eval SHINGLE INDEX (strings)
  * and hash-joins every corpus shingle against it: correct, and already
  * corpus-shuffle-free, but the broadcast carries every eval shingle
  * byte to every task and every corpus shingle pays a string-equality
  * hash-join probe. This operator compresses eval shingle MEMBERSHIP
  * into a Bloom filter (~12 bits/shingle at fpp 0.01 — ~20× smaller
  * than the string index) that ships as a task-binary constant inside a
  * codegen'd projection ([[graft.functions.BloomHitCount]]), so phase 1
  * is a pure map over the corpus: count per-doc filter hits, keep docs
  * that could possibly reach the containment threshold. Only those
  * CANDIDATES enter phase 2, the exact verify — the same
  * [[TextDedup.containmentFromShingles]] join the exact operator runs,
  * now sized by true contamination + Bloom false positives instead of
  * by the corpus.
  *
  * EXACTNESS (why this can share the exact operator's oracle): a Bloom
  * filter has no false negatives, so per doc
  * `hits >= |shingles(doc) ∩ shingles(eval)|`; a doc contaminated
  * against some eval doc e has intersection ≥ ⌈threshold·|shingles(e)|⌉
  * ≥ ⌈threshold·minEvalShingles⌉ = the prefilter's cut — so phase 1
  * can only over-admit, and phase 2 removes exactly the over-admissions.
  * Result ≡ [[TextDedup.crossContainmentPairs]], row for row.
  *
  * This is the reference's pre-training leak check
  * (`tasks/quality_parallel.py` drift/threshold pattern) at the scale
  * where the eval suite itself is large: a 10M-shingle eval battery is
  * a ~15 MB filter instead of a ~400 MB string broadcast.
  */
object Decontaminate {

  /** Eval-side build product: the filter kernel + the numbers the
    * prefilter cut derives from. Aggregate-sized by contract (eval
    * sets are), like [[Similarity.IvfIndex]] centroids. `nShingles` is
    * the capacity the filter was SIZED for (HLL estimate + 10% pad,
    * floored at 64) — an upper bound on the distinct shingles, so the
    * requested fpp is an upper bound on the realized one. */
  final case class EvalBloom(
      kernel: BloomHitCount.Kernel,
      nShingles: Long,
      minEvalShingles: Long,
      n: Int,
      fpp: Double)

  /** Smallest number of Bloom hits a doc needs before it could possibly
    * reach `threshold` containment against ANY eval doc — the phase-1
    * cut. Monotone in the WEAKEST eval doc (smallest shingle set), so
    * it is a lower bound for every eval doc simultaneously.
    *
    * Derived with the SAME double division the verify join runs, not
    * `ceil(threshold * n)`: the float product can round up past the
    * true bound (0.07 × 100 = 7.000000000000001 → ceil 8, yet 7/100 ≥
    * 0.07 passes the verify), and an off-by-one here silently drops a
    * genuinely contaminated doc — the one error class this operator's
    * exactness contract forbids. Double division is monotone in the
    * denominator, so the bound for the smallest eval doc transfers to
    * every larger one. */
  def neededHits(threshold: Double, minEvalShingles: Long): Long = {
    var h = math.max(1L, math.ceil(threshold * minEvalShingles.toDouble).toLong)
    while (h > 1 &&
        (h - 1).toDouble / minEvalShingles.toDouble >= threshold) {
      h -= 1
    }
    h
  }

  /** Builds the eval-side Bloom filter over the eval set's shingles.
    * Three eval-sized SHUFFLE-FREE actions: a min-size/HLL-cardinality
    * aggregate pair and the filter aggregate itself — Bloom insertion is
    * idempotent, so the exploded shingles feed the filter WITHOUT a
    * `distinct()` (measured: the distinct's exchange over a 4.8M-shingle
    * eval was the build's dominant cost — 2× the whole exact-path run),
    * and sizing uses `approx_count_distinct` (HLL, one map-side pass)
    * padded 10%. Over-sizing only LOWERS the realized fpp; the spec
    * asserts the realized rate against the requested one. Docs with no
    * shingles (< n tokens) are dropped, matching the exact operator
    * (they can't be contaminated against). */
  def buildEvalBloom(eval: DataFrame, evalId: String, evalText: String,
      n: Int = 3, fpp: Double = 0.01): EvalBloom =
    buildEvalBloomFrom(
      TextDedup.withShingles(eval, evalId, evalText, n)
        .filter(size(col("shingles")) > 0)
        .pinScratch(), // feeds the stats aggregate AND the filter aggregate
      n, fpp)

  /** [[buildEvalBloom]] over an ALREADY shingled-and-pinned eval frame —
    * the seam [[saveDecontaminationIndex]] uses so the save path
    * shingles the eval set once, not twice. */
  private def buildEvalBloomFrom(shingled: DataFrame, n: Int,
      fpp: Double): EvalBloom = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp=$fpp out of (0, 1)")
    val exploded = shingled.select(explode(col("shingles")).as("s"))
    val statsRow = exploded.agg(
        approx_count_distinct(col("s"), 0.02).as("est")).head()
    val sizeRow = shingled.agg(min(size(col("shingles"))).as("min_sz")).head()
    val estShingles = math.max(64L, statsRow.getLong(0) * 11L / 10L)
    require(!sizeRow.isNullAt(0),
      s"buildEvalBloom: eval set has no docs with >= $n tokens — " +
        "nothing to decontaminate against")
    val minEval = sizeRow.getInt(0)
    val filter = exploded.stat.bloomFilter("s", estShingles, fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    filter.writeTo(bytes)
    EvalBloom(new BloomHitCount.Kernel(bytes.toByteArray),
      estShingles, minEval.toLong, n, fpp)
  }

  /** Phase 1: the zero-shuffle, zero-join corpus prefilter. Keeps every
    * corpus row whose shingle set has at least
    * [[neededHits]](threshold, minEvalShingles) Bloom hits — a superset
    * of the truly contaminated docs (no false negatives, see the object
    * doc). All input columns pass through untouched. */
  def bloomPrefilter(corpus: DataFrame, corpusText: String,
      bloom: EvalBloom, threshold: Double): DataFrame =
    corpus.filter(
      bloom_hit_count(word_shingles(col(corpusText), bloom.n), bloom.kernel)
        >= lit(neededHits(threshold, bloom.minEvalShingles)))

  /** Bloom-prefiltered decontamination end-to-end: phase-1 map-only
    * prefilter, phase-2 exact verify on the candidates. Same output
    * contract as [[TextDedup.crossContainmentPairs]] —
    * `(corpus_id, eval_id, containment)`, containment ≥ threshold,
    * rounded portably to 4 — and provably the same rows. */
  def bloomDecontaminate(
      corpus: DataFrame, corpusId: String, corpusText: String,
      eval: DataFrame, evalId: String, evalText: String,
      n: Int = 3, threshold: Double = 0.5, fpp: Double = 0.01): DataFrame = {
    val bloom = buildEvalBloom(eval, evalId, evalText, n, fpp)
    TextDedup.crossContainmentPairs(
      bloomPrefilter(corpus, corpusText, bloom, threshold),
      corpusId, corpusText, eval, evalId, evalText, n, threshold)
  }

  /** Loaded persisted artifact: the filter + the exact-verify relations.
    * `evalShingles`/`evalSizes` are lazy parquet scans — nothing is
    * materialized until a corpus is decontaminated against them. */
  final case class DecontaminationIndex(
      bloom: EvalBloom,
      threshold: Double,
      evalShingles: DataFrame,
      evalSizes: DataFrame)

  /** Persists the full decontamination artifact: the Bloom filter (in
    * the meta row, as its wire bytes) plus the eval shingle index and
    * sizes the exact verify needs — so the crawl loop decontaminates
    * every incoming batch WITHOUT re-shingling the eval suite each
    * time.
    *
    * Deliberately NOT the staged-commit lifecycle of the minhash /
    * embedding / IVF indexes: an eval suite is a static, versioned input
    * (changing it means re-running decontamination anyway) and a rebuild
    * costs eval-sized work, so the artifact is overwrite-on-save with no
    * append path — document-the-contract over machinery. Single writer;
    * readers of a half-written save fail loudly on the missing meta. */
  def saveDecontaminationIndex(eval: DataFrame, evalId: String,
      evalText: String, path: String, n: Int = 3, threshold: Double = 0.5,
      fpp: Double = 0.01): Unit = {
    val spark = eval.sparkSession
    // shingle ONCE: the pinned frame feeds the bloom build, the shingle
    // relation write, and the sizes write
    val shingled = TextDedup.withShingles(eval, evalId, evalText, n)
      .filter(size(col("shingles")) > 0)
      .pinScratch()
    val bloom = buildEvalBloomFrom(shingled, n, fpp)
    shingled.select(col(evalId).as("eval_id"), explode(col("shingles")).as("s"))
      .write.mode("overwrite").parquet(s"$path/eval_shingles")
    shingled.select(col(evalId).as("eval_id"), size(col("shingles")).as("n_eval"))
      .write.mode("overwrite").parquet(s"$path/eval_sizes")
    // meta LAST: its presence is the artifact's "save completed" marker
    spark.range(1)
      .select(lit(bloom.kernel.filterBytes).as("bloom_bytes"),
        lit(bloom.nShingles).as("n_shingles"),
        lit(bloom.minEvalShingles).as("min_eval_shingles"),
        lit(bloom.n).as("n"), lit(bloom.fpp).as("fpp"),
        lit(threshold).as("threshold"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadDecontaminationIndex(spark: SparkSession,
      path: String): DecontaminationIndex = {
    val meta = spark.read.parquet(s"$path/meta").head()
    DecontaminationIndex(
      EvalBloom(new BloomHitCount.Kernel(meta.getAs[Array[Byte]]("bloom_bytes")),
        meta.getAs[Long]("n_shingles"),
        meta.getAs[Long]("min_eval_shingles"),
        meta.getAs[Int]("n"), meta.getAs[Double]("fpp")),
      meta.getAs[Double]("threshold"),
      spark.read.parquet(s"$path/eval_shingles"),
      spark.read.parquet(s"$path/eval_sizes"))
  }

  /** Decontaminates a corpus (or an incoming crawl batch) against a
    * loaded artifact: Bloom prefilter at the artifact's persisted
    * threshold, then the exact verify against the PERSISTED eval
    * shingles — the same [[TextDedup.containmentFromShingles]] join as
    * the in-flight path, so a drifted re-shingling can never disagree
    * with the filter that admitted the candidates. */
  def decontaminateAgainstIndex(corpus: DataFrame, corpusId: String,
      corpusText: String, index: DecontaminationIndex): DataFrame = {
    val candidates =
      bloomPrefilter(corpus, corpusText, index.bloom, index.threshold)
    val cSh = TextDedup.withShingles(candidates, corpusId, corpusText,
        index.bloom.n)
      .select(col(corpusId).as("corpus_id"), explode(col("shingles")).as("s"))
    TextDedup.containmentFromShingles(cSh,
      index.evalShingles, index.evalSizes, index.threshold)
  }
}
