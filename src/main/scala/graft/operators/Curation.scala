package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftSession.Pinnable
import graft.functions.TextAnalysis._

/** The composed training-data curation pipeline — the end-to-end shape a
  * 100 TB corpus sweep actually runs, chaining the engine's text ops:
  *
  *   1. language filter     (langId ∈ keep set)
  *   2. quality filter      (qualityScore ≥ threshold, token count ≥ min)
  *   3. exact dedup         (md5 content hash, keep lowest id)
  *   4. near-dup removal    (MinHash LSH pairs → drop the higher id of
  *                           each pair — the transitive-lite policy used
  *                           by large corpus pipelines)
  *
  * Stages 1-3 are pure projections + one hash aggregate (single
  * effective scan); stage 4 adds the LSH candidate join. Everything
  * stays distributed — no driver-side data path.
  */
object Curation {

  final case class Config(
      keepLangs: Set[String] = Set("en"),
      minQuality: Double = 0.3,
      minTokens: Long = 5L,
      nearDupThreshold: Double = 0.7,
      shingleSize: Int = 3,
      // LSH hot-bucket cap: a (band,hash) bucket of B docs emits B²/2
      // candidates, so one templated-text bucket can dominate the whole
      // sweep. 100 ⇒ ≤ 4950 candidate pairs per bucket — bounded work per
      // bucket at any corpus size. THE TRADE: a near-dup cluster larger
      // than the cap (non-identical copies, so exact dedup keeps them)
      // has its buckets skipped and is RETAINED whole — CurationSpec pins
      // this. Pass Int.MaxValue for exact behavior when the corpus is
      // known not to be templated-degenerate.
      maxBucketSize: Int = 100,
      /** Rounds budget for [[curateClusters]]' component clustering:
        * must exceed the deepest duplicate chain's diameter + 1. */
      componentsMaxIter: Int = 20,
      /** LSH shuffle width; None = sized to the surviving corpus
        * ([[graft.GraftSession.partitionsFor]] via [[TextDedup.minhashLsh]]). */
      numPartitions: Option[Int] = None)

  /** Stages 1-3 (deterministic, SQL-expressible — oracle-checked as
    * `q_curation_filter`). Returns the surviving docs with their
    * curation features attached. */
  def filterAndExactDedup(
      docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame =
    filterAndDedupCore(docs, idCol, textCol, langId(col(textCol)), cfg)

  /** [[filterAndExactDedup]] with the language stage SUPPLIED by the
    * caller — e.g. the trainable [[LangIdNb]] instead of the 4-list
    * marker heuristic. `langCol` must already be on `docs` (the crawl
    * capstones attach an NB prediction); everything else (quality and
    * token screens, exact keep-smallest-id dedup) is identical. */
  def filterAndExactDedupWithLang(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      cfg: Config = Config()): DataFrame = {
    require(docs.columns.contains(langCol), s"column $langCol absent")
    filterAndDedupCore(docs, idCol, textCol, col(langCol), cfg)
  }

  private def filterAndDedupCore(
      docs: DataFrame, idCol: String, textCol: String, lang: Column,
      cfg: Config): DataFrame = {
    val featured = docs.select(
      col(idCol), col(textCol),
      lang.as("pred_lang"),
      qualityScore(col(textCol)).as("quality"),
      wsTokenCount(col(textCol)).as("n_tokens"),
      md5(col(textCol)).as("content_hash"))
    val kept = featured
      .filter(col("pred_lang").isin(cfg.keepLangs.toSeq: _*))
      .filter(col("quality") >= cfg.minQuality && col("n_tokens") >= cfg.minTokens)
    // exact dedup: keep the lowest id per content hash
    val canonical = kept.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol))
    kept.join(canonical, Seq("content_hash", idCol))
  }

  /** The stages both drop policies share: survivors of stages 1-3
    * (materialized once — they feed the LSH stage AND the final
    * anti-join; the checkpoint-multiply-consumed pattern used throughout
    * TextDedup, a parquet stage on a cluster) plus their LSH near-dup
    * pairs. */
  private def survivorsAndPairs(
      docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): (DataFrame, DataFrame) = {
    // spread-small seam (guide §2.5), BEFORE the pin: the pin freezes
    // the layout, and over a one-split corpus the feature projection
    // (langId/quality/md5) AND the downstream minhash signing — which
    // reads the pinned blocks — each ran as one 1-1.6 s task
    // (JobProbe r22, q_curation_clusters). No-op at scale.
    val surviving = filterAndExactDedup(
        graft.GraftSession.spreadSmallInput(docs), idCol, textCol, cfg)
      .pinScratch()
    val nearDups = TextDedup.minhashLsh(
      surviving, idCol, textCol, n = cfg.shingleSize,
      threshold = cfg.nearDupThreshold, maxBucketSize = cfg.maxBucketSize,
      numPartitions = cfg.numPartitions)
    (surviving, nearDups)
  }

  /** Full pipeline with CLUSTER-level near-dup removal: LSH pairs →
    * connected components → keep each cluster's minimum id. Differs from
    * [[curate]]'s pairwise policy exactly when the pair list is not
    * transitive (A~C and B~C but not A~B: pairwise keeps A and B,
    * components keep only A) — the semantics large corpus pipelines
    * usually want, since a cluster is one document family. */
  def curateClusters(
      docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val (surviving, nearDups) = survivorsAndPairs(docs, idCol, textCol, cfg)
    val comps = TextDedup.connectedComponents(nearDups,
      maxIter = cfg.componentsMaxIter)
    val toDrop = comps.filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    surviving.join(toDrop, Seq(idCol), "left_anti")
  }

  /** Full pipeline incl. near-dup removal (pairwise keep-first policy). */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val (surviving, nearDups) = survivorsAndPairs(docs, idCol, textCol, cfg)
    // drop the HIGHER id of every near-dup pair (keep-first policy)
    val toDrop = nearDups.select(col("d2").as(idCol)).distinct()
    surviving.join(toDrop, Seq(idCol), "left_anti")
  }
}
