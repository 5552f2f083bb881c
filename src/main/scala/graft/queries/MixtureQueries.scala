package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Packing, Sampling}
import graft.sources.Scan

/** Training-data mixture queries over `documents`: deterministic
  * hash sampling / stratified mixtures / train-val-test splits
  * ([[Sampling]]) and sequence-packing bins ([[Packing]]). Every entry
  * is oracled bit-for-bit: the portable md5 hash and the integer
  * cumulative sums have exact DuckDB twins.
  */
object MixtureQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Mixture weights for the stratified entry (by language). */
  private val mixture = Map("en" -> 1.0, "de" -> 0.5, "zh" -> 0.2)
  private val mixtureDefault = 0.1

  val sampleByHash: Q = (s, dir) =>
    Sampling.sampleByHash(Scan.table(s, dir, "documents"), "doc_id", 0.1)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  val stratifiedSample: Q = (s, dir) =>
    Sampling.stratifiedSampleByHash(Scan.table(s, dir, "documents"),
        "doc_id", "lang", mixture, mixtureDefault)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Split assignment, aggregated: per-split row count plus an
    * assignment-sensitive checksum (sum of doc ids) — one reassigned
    * document anywhere fails the hash gate. */
  val splitCounts: Q = (s, dir) =>
    Sampling.withSplit(Scan.table(s, dir, "documents"), "doc_id")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("records"), sum(col("doc_id")).as("sum_doc_ids"))
      .orderBy(col("split"))

  /** Quality-weighted deterministic sample: the 200 documents with the
    * smallest hash/weight priority, weighted by `n_chars` — a longer
    * document is proportionally likelier to make the sample. The
    * oracle recomputes the identical priority (one BIGINT→DOUBLE cast
    * + one division, IEEE-identical on both engines), so one
    * mis-ranked document anywhere fails the hash gate. */
  val weightedSample: Q = (s, dir) =>
    Sampling.weightedSampleByHash(Scan.table(s, dir, "documents"),
        "doc_id", "n_chars", k = 200)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Token budgets for the mixture entry (by language, whitespace
    * tokens): sized to BITE at sf0.01 (en carries ~12k tokens, the
    * others ~4k each), so every budget truncates its group. */
  private val tokenBudgets = Map("en" -> 6000L, "de" -> 2000L)
  private val tokenBudgetDefault = 1500L

  /** Token-budget mixture take: per-language documents in hash order
    * until the language's token budget fills. Exact integer cumsum —
    * the oracle's per-group window must match `group_start` on every
    * kept row, so any reordered, dropped, or extra document (or a
    * wrong running offset at any partition boundary) fails the hash
    * gate. */
  val tokenBudgetMixture: Q = (s, dir) => {
    val docs = Scan.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
    Sampling.takeTokenBudget(docs, "doc_id", "lang", "n_tokens",
        tokenBudgets, tokenBudgetDefault)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("group_start"))
      .orderBy(col("doc_id"))
  }

  /** Budgets for the EXACT-BPE mixture entry — the same take, spent in
    * model-tokenizer tokens ([[graft.functions.BpeTokenCount]]) instead
    * of the whitespace heuristic; sized under every language's BPE mass
    * at both sf0.001 and sf0.01 so each budget truncates. */
  private val bpeBudgets = Map("en" -> 20000L, "de" -> 6000L)
  private val bpeBudgetDefault = 5000L

  /** Token-budget mixture in EXACT BPE tokens: the identical per-group
    * distributed prefix-sum take, with the token column swapped to the
    * fixture-table BPE count — budgets and offsets are now in the
    * model's own currency. The oracle re-derives every BPE count via
    * the recursive-CTE twin AND re-runs the window cumsum, so both the
    * tokenizer and the take machinery sit under one hash gate. */
  val tokenBudgetBpe: Q = (s, dir) => {
    val docs = Scan.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.GraftFunctions.bpe_token_count(col("text"))
          .as("n_tokens"))
    Sampling.takeTokenBudget(docs, "doc_id", "lang", "n_tokens",
        bpeBudgets, bpeBudgetDefault)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("group_start"))
      .orderBy(col("doc_id"))
  }

  /** Upsampling budgets: de is pushed ABOVE its token mass (~3 epochs
    * at both sf0.001 and sf0.01), en and the default stay partial —
    * one query exercises repeat-fill and straddle-fill together. */
  private val upsampleBudgets = Map("en" -> 6000L, "de" -> 9000L)
  private val upsampleDefault = 1500L

  /** Multi-epoch mixture take: an over-mass budget repeats the group's
    * documents in hash order with an `epoch` counter until the budget
    * fills ([[Sampling.takeTokenBudget]] `upsample = true`). The
    * oracle regenerates the epochs with a series cross-join over the
    * same window cumsum — every duplicate row, its epoch label, and
    * its global offset must match exactly, so one extra/missing
    * repetition or a wrong epoch boundary anywhere fails the gate. */
  val tokenBudgetUpsampled: Q = (s, dir) => {
    val docs = Scan.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
    Sampling.takeTokenBudget(docs, "doc_id", "lang", "n_tokens",
        upsampleBudgets, upsampleDefault, upsample = true)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("epoch"),
        col("group_start"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** Total budget for the temperature-mixture entry: allocated with
    * `alpha = 0.5` (the exactness point — IEEE sqrt is correctly
    * rounded, so both engines compute identical budget bits) and sized
    * so every language's allocation truncates its group at sf0.001 AND
    * sf0.01 (en mass ~10–12k, the others ~4k; √-shares put every
    * budget under its mass). */
  private val temperatureTotal = 15000L

  /** Temperature-scaled mixture: budgets ∝ √mass ([[Sampling
    * .temperatureBudgets]] — the mT5 practice, flattening the language
    * head), then the exact per-group prefix-sum take. The oracle
    * recomputes the ALLOCATION (masses → quantized √-shares → BigInt
    * floor-division budgets) and the take window from scratch — a
    * drifted share, budget, hash order, or offset anywhere fails the
    * gate. */
  val temperatureMixture: Q = (s, dir) => {
    val docs = Scan.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
    val budgets = Sampling.temperatureBudgets(docs, "lang", "n_tokens",
      totalBudget = temperatureTotal, alpha = 0.5)
    Sampling.takeTokenBudget(docs, "doc_id", "lang", "n_tokens",
        budgets, defaultBudget = 0L)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("group_start"))
      .orderBy(col("doc_id"))
  }

  /** Packing stream for a 2048-token context: per-document bin and
    * offsets from the distributed prefix sum (exact integer arithmetic —
    * the oracle's global window cumsum must match every row). */
  val packingBins: Q = (s, dir) => {
    val docs = Scan.table(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
    Packing.withPackingBins(docs, "doc_id", "n_tokens", budget = 2048)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        col("bin"), col("bin_offset"))
      .orderBy(col("doc_id"))
  }

  /** Shard assignment rollup: 16 shards, per-shard row count + an
    * assignment-sensitive checksum (sum of doc ids) + char mass — one
    * document on the wrong shard anywhere fails the hash gate, and the
    * near-uniform counts document the balance property. */
  val shardCounts: Q = (s, dir) =>
    graft.operators.Sharding.withShard(
        Scan.table(s, dir, "documents"), "doc_id", nShards = 16)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("records"), sum(col("doc_id")).as("sum_doc_ids"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("shard"))

  /** The deterministic global shuffle, pinned row-by-row: the first 200
    * documents in (hash, key) order WITH their order hash — the oracle
    * recomputes the same 60-bit hash, so a single transposition (or an
    * engine hash divergence) changes the selected set or a hash value
    * and fails the gate. */
  val shuffleOrder: Q = (s, dir) =>
    graft.operators.Sharding.shuffled(
        Scan.table(s, dir, "documents"), "doc_id")
      .select(col("doc_id"),
        graft.operators.Sharding.orderHash(col("doc_id"), "shard")
          .as("shuffle_order"))
      .limit(200)

  /** DSIR importance weights under the hash gate: target LM = the
    * English slice, raw LM = the whole corpus, 1024 hashed buckets —
    * every bucket hash, smoothed count and mean log-ratio must match
    * DuckDB's from-scratch recomputation per document. */
  val dsirWeights: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    // raw = docs, target = the en slice of it: the self-corpus shape —
    // ONE tokenize+hash pass fits both LMs AND the doc features
    // (bit-identical counts; see Dsir.importanceLogRatioSelf)
    graft.operators.Dsir.importanceLogRatioSelf(
        d, "doc_id", "text", col("lang") === "en", buckets = 1024)
      .orderBy(col("doc_id"))
  }

  /** The resampling half: A-ES weighted sampling with weight
    * `exp(log_ratio)` — the oracle replays the identical priority from
    * its own recomputed ratios, so one mis-weighted document anywhere
    * changes the kept set and fails the gate. */
  val dsirResample: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    graft.operators.Dsir.resampleByImportanceSelf(
        d.select(col("doc_id"), col("lang"), col("text")), "doc_id", "text",
        col("lang") === "en", k = 200, buckets = 1024)
      .select(col("doc_id"), col("lang"), col("log_ratio"))
      .orderBy(col("doc_id"))
  }

  val queries: ListMap[String, Q] = ListMap(
    "q_sample_by_hash" -> sampleByHash,
    "q_stratified_sample" -> stratifiedSample,
    "q_weighted_sample" -> weightedSample,
    "q_token_budget_mixture" -> tokenBudgetMixture,
    "q_token_budget_bpe" -> tokenBudgetBpe,
    "q_token_budget_upsampled" -> tokenBudgetUpsampled,
    "q_temperature_mixture" -> temperatureMixture,
    "q_split_counts" -> splitCounts,
    "q_shard_counts" -> shardCounts,
    "q_shuffle_order" -> shuffleOrder,
    "q_packing_bins" -> packingBins,
    "q_dsir_weights" -> dsirWeights,
    "q_dsir_resample" -> dsirResample)

  /** DuckDB twin of [[Sampling.hashBucket]] (plain % — the 60-bit hash
    * value is non-negative, so % ≡ pmod on both engines). Shared with
    * [[TrainingDataQueries]] (the capstone splits its accepted docs
    * with the same spelling). */
  private[queries] def bucketSql(salt: String): String =
    s"((('0x' || substr(md5(doc_id::VARCHAR || '/$salt'), 1, 15))::BIGINT) % 1000000)"

  /** DuckDB twin of [[graft.operators.Sharding.orderHash]] (salt
    * "shard"): the raw 60-bit hash, before any bucket/modulo fold. */
  private val hashSql =
    "(('0x' || substr(md5(doc_id::VARCHAR || '/shard'), 1, 15))::BIGINT)"

  /** The same raw hash under the weighted-sample / token-budget salts. */
  private val weightedHashSql =
    "(('0x' || substr(md5(doc_id::VARCHAR || '/weighted'), 1, 15))::BIGINT)"
  private val budgetHashSql =
    "(('0x' || substr(md5(doc_id::VARCHAR || '/budget'), 1, 15))::BIGINT)"

  private val tokenBudgetThresholdSql =
    tokenBudgets.foldLeft(tokenBudgetDefault.toString) {
      case (acc, (g, b)) => s"CASE WHEN lang = '$g' THEN $b ELSE $acc END"
    }
  private val bpeBudgetThresholdSql =
    bpeBudgets.foldLeft(bpeBudgetDefault.toString) {
      case (acc, (g, b)) => s"CASE WHEN lang = '$g' THEN $b ELSE $acc END"
    }
  private val upsampleThresholdSql =
    upsampleBudgets.foldLeft(upsampleDefault.toString) {
      case (acc, (g, b)) => s"CASE WHEN lang = '$g' THEN $b ELSE $acc END"
    }

  private[queries] def ppm(f: Double): Long = (f * Sampling.Buckets).toLong

  private val mixtureThresholdSql =
    mixture.foldLeft(ppm(mixtureDefault).toString) {
      case (acc, (stratum, f)) =>
        s"CASE WHEN lang = '$stratum' THEN ${ppm(f)} ELSE $acc END"
    }

  val oracles: ListMap[String, String] = ListMap(
    "q_sample_by_hash" ->
      s"""SELECT doc_id, lang, source FROM documents
          WHERE ${bucketSql("sample")} < ${ppm(0.1)}
          ORDER BY doc_id""",
    "q_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
          WHERE ${bucketSql("strata")} < ($mixtureThresholdSql)
          ORDER BY doc_id""",
    // the weighted top-k, re-ranked by the identical hash/weight
    // priority (BIGINT→DOUBLE cast + division — IEEE-identical on both
    // engines), then re-sorted for the row-order-insensitive compare
    "q_weighted_sample" ->
      s"""SELECT * FROM (
            SELECT doc_id, lang, n_chars FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0
            ORDER BY CAST($weightedHashSql AS DOUBLE) / n_chars, doc_id
            LIMIT 200)
          ORDER BY doc_id""",
    // per-group window cumsum in DuckDB ≡ the engine's per-group
    // two-pass distributed prefix sum — exact integer arithmetic
    "q_token_budget_mixture" ->
      s"""WITH t AS (
            SELECT doc_id, lang,
                   CAST(${TextQueries.wsToks} AS BIGINT) AS n_tokens,
                   $budgetHashSql AS h
            FROM documents),
          c AS (
            -- COALESCE on both terms: the engine keeps a NULL-token row
            -- (consumes 0 budget); an uncoalesced window term would go
            -- NULL and WHERE NULL < budget would drop the row
            SELECT doc_id, lang, n_tokens,
                   CAST(SUM(COALESCE(n_tokens, 0)) OVER (PARTITION BY lang
                     ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) - COALESCE(n_tokens, 0) AS group_start
            FROM t)
          SELECT doc_id, lang, n_tokens, group_start FROM c
          WHERE group_start < ($tokenBudgetThresholdSql)
          ORDER BY doc_id""",
    // the same take in EXACT BPE tokens: counts re-derived by the
    // recursive-CTE tokenizer twin (TextQueries.bpeCtes), then the
    // identical per-group window cumsum
    "q_token_budget_bpe" ->
      s"""WITH RECURSIVE ${TextQueries.bpeCtes("documents")},
          t AS (
            SELECT doc_id, lang, bpe_tokens AS n_tokens,
                   $budgetHashSql AS h
            FROM documents JOIN bpe_counts USING (doc_id)),
          c AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(SUM(COALESCE(n_tokens, 0)) OVER (PARTITION BY lang
                     ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) - COALESCE(n_tokens, 0) AS group_start
            FROM t)
          SELECT doc_id, lang, n_tokens, group_start FROM c
          WHERE group_start < ($bpeBudgetThresholdSql)
          ORDER BY doc_id""",
    // multi-epoch regeneration: a series cross-join replays each row
    // at epochs k while k*mass + w stays under the group budget — the
    // exact contract of the engine's in-task epoch fan-out
    "q_token_budget_upsampled" ->
      s"""WITH t AS (
            SELECT doc_id, lang,
                   CAST(${TextQueries.wsToks} AS BIGINT) AS n_tokens,
                   $budgetHashSql AS h
            FROM documents),
          c AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(SUM(COALESCE(n_tokens, 0)) OVER (PARTITION BY lang
                     ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) - COALESCE(n_tokens, 0) AS w
            FROM t),
          m AS (
            SELECT lang, CAST(SUM(COALESCE(n_tokens, 0)) AS BIGINT) AS mass
            FROM t GROUP BY lang),
          x AS (
            SELECT c.*, m.mass, ($upsampleThresholdSql) AS b
            FROM c JOIN m USING (lang))
          SELECT doc_id, lang, n_tokens,
                 CAST(e.k AS BIGINT) AS epoch,
                 CAST(e.k * mass + w AS BIGINT) AS group_start
          FROM x CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k) e
          WHERE (mass > 0 OR e.k = 0) AND e.k * mass + w < b
          ORDER BY doc_id, epoch""",
    // temperature allocation re-derived end-to-end: per-language token
    // masses → quantized √-shares (floor(sqrt·10⁶ + 0.5) — IEEE sqrt is
    // correctly rounded, so the share bits match the engine's) → exact
    // integer floor-division budgets (HUGEINT ≡ the engine's BigInt) →
    // the same per-group window cumsum take
    "q_temperature_mixture" ->
      s"""WITH t AS (
            SELECT doc_id, lang,
                   CAST(${TextQueries.wsToks} AS BIGINT) AS n_tokens,
                   $budgetHashSql AS h
            FROM documents),
          m AS (
            SELECT lang, CAST(SUM(COALESCE(n_tokens, 0)) AS BIGINT) AS mass
            FROM t WHERE lang IS NOT NULL GROUP BY lang),
          sh AS (
            SELECT lang,
              CASE WHEN mass <= 0 THEN 0
                   ELSE CAST(FLOOR(SQRT(mass::DOUBLE) * 1000000.0 + 0.5)
                     AS BIGINT) END AS sg
            FROM m),
          tot AS (SELECT SUM(sg::HUGEINT) AS st FROM sh),
          bud AS (
            SELECT lang,
              CASE WHEN st = 0 THEN 0
                   ELSE CAST(($temperatureTotal::HUGEINT * sg) // st
                     AS BIGINT) END AS b
            FROM sh CROSS JOIN tot),
          c AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(SUM(COALESCE(n_tokens, 0)) OVER (PARTITION BY lang
                     ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) - COALESCE(n_tokens, 0) AS group_start
            FROM t)
          SELECT doc_id, lang, n_tokens, group_start
          FROM c JOIN bud USING (lang)
          WHERE group_start < b
          ORDER BY doc_id""",
    "q_split_counts" ->
      s"""SELECT CASE WHEN ${bucketSql("split")} < ${ppm(0.05)} THEN 'val'
                 WHEN ${bucketSql("split")} < ${2 * ppm(0.05)} THEN 'test'
                 ELSE 'train' END AS split,
          COUNT(*) AS records,
          CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
          FROM documents GROUP BY 1 ORDER BY split""",
    "q_shard_counts" ->
      s"""SELECT ($hashSql % 16) AS shard,
          COUNT(*) AS records,
          CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM documents GROUP BY 1 ORDER BY shard""",
    "q_shuffle_order" ->
      s"""SELECT doc_id, $hashSql AS shuffle_order
          FROM documents ORDER BY $hashSql, doc_id LIMIT 200""",
    // global-window cumsum in DuckDB ≡ the engine's two-pass distributed
    // prefix sum — exact integer arithmetic, so every row hash-matches
    "q_packing_bins" ->
      s"""WITH t AS (
            SELECT doc_id, CAST(${TextQueries.wsToks} AS BIGINT) AS n_tokens
            FROM documents),
          c AS (
            SELECT doc_id, n_tokens,
                   CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) - n_tokens AS start_offset
            FROM t)
          SELECT doc_id, n_tokens, start_offset,
                 start_offset // 2048 AS bin,
                 start_offset % 2048 AS bin_offset
          FROM c ORDER BY doc_id""",
    "q_dsir_weights" ->
      s"""$dsirScoreCtes
          SELECT doc_id, n_features, log_ratio FROM sc ORDER BY doc_id""",
    // the A-ES priority replayed from the oracle's own recomputed
    // ratios: hash / exp(log_ratio) — EXP of the identical ROUNDED
    // double, so both engines rank on the same bits
    "q_dsir_resample" ->
      s"""$dsirScoreCtes
          SELECT * FROM (
            SELECT d.doc_id, d.lang, sc.log_ratio
            FROM documents d JOIN sc USING (doc_id)
            ORDER BY CAST($weightedHashSql AS DOUBLE) / EXP(sc.log_ratio),
              d.doc_id
            LIMIT 200)
          ORDER BY doc_id""")

  /** DuckDB twin of [[graft.operators.Dsir.importanceLogRatio]] over
    * `documents` (target = the `lang='en'` slice, raw = everything,
    * 1024 buckets, alpha = 1): unigram+bigram features WITH
    * multiplicity, the portable 60-bit md5 bucket hash under the
    * "dsir" salt, Laplace-smoothed bucket models, per-doc MEAN
    * log-ratio rounded to 4. */
  private lazy val dsirScoreCtes: String = {
    val bucketSql =
      "(('0x' || substr(md5(f || '/dsir'), 1, 15))::BIGINT % 1024)"
    s"""WITH tk AS (
          SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS w FROM documents),
        feats AS (
          SELECT doc_id, lang, UNNEST(w) AS f FROM tk
          UNION ALL
          SELECT doc_id, lang,
            UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 1),
              i -> w[i] || ' ' || w[i + 1])) AS f
          FROM tk WHERE LEN(w) >= 2),
        fb AS (SELECT doc_id, lang, $bucketSql AS bucket FROM feats),
        tc AS (SELECT bucket, COUNT(*) AS n FROM fb
               WHERE lang = 'en' GROUP BY 1),
        rc AS (SELECT bucket, COUNT(*) AS n FROM fb GROUP BY 1),
        tt AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM tc),
        rt AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM rc),
        dc AS (SELECT doc_id, bucket, COUNT(*) AS c FROM fb GROUP BY 1, 2),
        sc AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_features,
            ${graft.functions.GraftFunctions.roundPortableSql(
              "SUM(c * (LN((COALESCE(tc.n, 0) + 1.0) / (tt.t + 1024.0)) - " +
                "LN((COALESCE(rc.n, 0) + 1.0) / (rt.t + 1024.0)))) / " +
                "CAST(SUM(c) AS DOUBLE)", 4)} AS log_ratio
          FROM dc LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
          CROSS JOIN tt CROSS JOIN rt
          GROUP BY doc_id)"""
  }
}
