package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._
import graft.sources.Scan

/** Text-analysis extension queries over `documents`, all DuckDB-oracled:
  * token counting, quality scoring, language ID, fingerprinting. Each is
  * a single projection (+ optional rollup) over one scan.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  val tokenCounts: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    d.select(
      col("doc_id"),
      wsTokenCount(col("text")).as("ws_tokens"),
      regexTokenCount(col("text")).as("regex_tokens"),
      approxBpeTokenCount(col("text")).as("approx_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  val qualityProfile: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    d.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_measured"),
      distinctTokenRatio(col("text")).as("distinct_ratio"),
      stopwordHits(col("text"), "en").cast("long").as("en_stopword_hits"),
      qualityScore(col("text")).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val langIdRollup: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    d.select(langId(col("text")).as("predicted_lang"))
      .groupBy(col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("predicted_lang"))
  }

  /** Phrase-loop repetition profile (Gopher-style duplicate-n-gram
    * fractions at n = 2 and 3) — the quality signal token-level
    * distinct ratios miss. */
  val repetition: Q = (s, dir) => {
    import graft.functions.GraftFunctions.roundPortable
    val d = Scan.table(s, dir, "documents")
    d.select(
      col("doc_id"),
      roundPortable(repetitionRatio(col("text"), 2), 4).as("repetition_2g"),
      roundPortable(repetitionRatio(col("text"), 3), 4).as("repetition_3g"))
      .orderBy(col("doc_id"))
  }

  /** LM-based quality scoring (CCNet-style): fit the stupid-backoff
    * bigram model on the even-id half of `documents` (the reference
    * corpus), score the odd-id half by average per-token log-prob — the
    * fit-once/score-many curation regime under the hash gate. The
    * oracle re-derives BOTH the counts and the scores in SQL from the
    * same split spelling, so a lost count, a backoff-formula drift, or
    * a tokenization mismatch all fail the gate. */
  val perplexity: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    val lm = graft.operators.NgramLm.fit(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    graft.operators.NgramLm.scoreAvgLogProb(
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text", lm)
      .orderBy(col("doc_id"))
  }

  val fingerprints: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    d.select(
      col("doc_id"),
      md5Fingerprint(col("text")).as("md5_fp"),
      rollingHash("text").as("rolling_fp"))
      .orderBy(col("doc_id"))
  }

  /** PII scrub under the hash gate. The corpus text is synthetic (no
    * organic PII), so every row gets a deterministic PII-bearing suffix
    * built FROM ITS OWN doc_id — all four redaction passes fire on
    * every row, and the oracle rebuilds the same suffix and re-runs the
    * same RE2-compatible patterns, so a pattern-semantics divergence
    * between engines, a pass-order change, or a missed match anywhere
    * in 60k rows fails the gate. */
  val piiRedaction: Q = (s, dir) => {
    import graft.functions.TextRedact
    val d = Scan.table(s, dir, "documents")
    def str(c: org.apache.spark.sql.Column) = c.cast("string")
    val withPii = concat(
      col("text"),
      lit(" contact user"), str(col("doc_id")), lit("@example.com via "),
      lit("https://ex.org/u/"), str(col("doc_id")), lit("?ref=1 ip 10."),
      str(pmod(col("doc_id"), lit(200L))), lit(".3."),
      str(pmod(col("doc_id"), lit(250L))),
      lit(" tel +1 (555) 010-"), str(pmod(col("doc_id"), lit(9000L))))
    d.select(
      col("doc_id"),
      TextRedact.redactPii(withPii).as("redacted"),
      TextRedact.matchCount(withPii, TextRedact.EmailPattern).as("n_emails"),
      TextRedact.matchCount(withPii, TextRedact.UrlPattern).as("n_urls"),
      TextRedact.matchCount(withPii, TextRedact.Ipv4Pattern).as("n_ips"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF keyword extraction under the hash gate: document
    * frequencies over the FULL corpus, smooth-idf weights, top-3 terms
    * per doc ranked on the portably-rounded weight — the oracle
    * re-derives counts, lengths, DF, the identically-parenthesized
    * weight arithmetic and the rank, so a tokenization drift, a lost
    * count, or an idf-formula change fails row-for-row. Output bounded
    * to every 20th document (rank runs BEFORE the bound on both sides —
    * DF stays full-corpus). */
  val tfidfTopTerms: Q = (s, dir) =>
    graft.operators.TfIdf.topTerms(
        Scan.table(s, dir, "documents"), "doc_id", "text", k = 3)
      .filter(col("doc_id") % 20 === 0)
      .orderBy(col("doc_id"), col("rank"))

  /** The BM25 query battery for the retrieval gate: fixed literal
    * strings over the corpus vocabulary (multi-term, one with a
    * repeated term — the distinct-term convention must collapse it,
    * and one with an out-of-vocabulary term that must contribute
    * nothing). The SAME strings are spelled in the oracle's VALUES. */
  private[queries] val bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "spark hash join",
    2L -> "fast scan filter scan",
    3L -> "customer query zzznotaword")

  /** Okapi BM25 top-k retrieval under the hash gate: every idf, length
    * normalization and tie-break must match DuckDB's recomputation of
    * the same formula from the same corpus statistics. */
  val bm25TopDocs: Q = (s, dir) => {
    import s.implicits._
    graft.operators.TfIdf.bm25TopK(
        Scan.table(s, dir, "documents"), "doc_id", "text",
        bm25Queries.toDF("query_id", "qtext"), "query_id", "qtext", k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Fixed-window chunking under the hash gate: 64-token windows at
    * stride 48 (25% overlap) — every chunk boundary, overlap region and
    * short tail must match the oracle's list-slicing recomputation
    * row-for-row. */
  val chunking: Q = (s, dir) =>
    graft.operators.Chunking.chunkByTokens(
        Scan.table(s, dir, "documents"), "doc_id", "text",
        maxTokens = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** The curation pipeline's deterministic core (lang filter → quality
    * filter → exact dedup), oracle-checked end-to-end. */
  val curationFilter: Q = (s, dir) =>
    graft.operators.Curation.filterAndExactDedup(
        Scan.table(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("pred_lang"), col("quality"), col("n_tokens"))
      .orderBy(col("doc_id"))

  /** The FULL curation pipeline — stages 1-3 plus MinHash-LSH near-dup
    * removal (keep-first). Oracle: the deterministic stage-1-3 SQL with
    * an exact-Jaccard anti-join for stage 4 — equal to the LSH output
    * while LSH recall is 100% (testdata-measured), so near-dup-removal
    * recall regressions fail the hard gate too. */
  val curationFull: Q = (s, dir) =>
    graft.operators.Curation.curate(
        Scan.table(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("pred_lang"), col("quality"), col("n_tokens"))
      .orderBy(col("doc_id"))

  /** Cluster-level variant: LSH pairs → connected components → keep the
    * cluster minimum. Oracle walks the same edges with a recursive CTE.
    * Valid while LSH recall is 100% (the shared regime of every LSH
    * oracle in this repo). */
  val curationClusters: Q = (s, dir) =>
    graft.operators.Curation.curateClusters(
        Scan.table(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("pred_lang"), col("quality"), col("n_tokens"))
      .orderBy(col("doc_id"))

  /** EXACT BPE token counts under the fixture merge table, next to the
    * whitespace count they upgrade — one mis-ranked merge, wrong
    * leftmost-fuse, or cache corruption anywhere changes a count and
    * fails the hash gate (the oracle re-derives every count from the
    * SAME ranks by recursive CTE, a genuinely independent second
    * implementation of the apply loop). */
  val bpeTokens: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    // the gate counts under the LOADED table — the committed
    // real-format merges.txt/vocab.json fixture takes the full
    // BpeTable parse+validate path and must still hash-match the
    // oracle's recursive CTE over BpeTokenCount.merges (the loader
    // round-trip IS part of what this gate now proves)
    val loaded = graft.functions.BpeTable.fromResources()
    d.select(
      col("doc_id"),
      graft.functions.GraftFunctions.bpe_token_count(col("text"), loaded)
        .as("bpe_tokens"),
      wsTokenCount(col("text")).as("ws_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Paragraph-level first-occurrence dedup under the hash gate. The
    * synthetic corpus is a single-line word stream, so the "paragraph"
    * separator is the literal ` table ` token — which segments every
    * document into short word runs drawn from a tiny vocabulary, i.e.
    * maximal cross-document repetition, exactly the boilerplate regime
    * the operator exists for. The oracle re-derives the split, the
    * normalized md5 keys, the corpus-order first-occurrence rule and
    * the reassembly — one drifted position, winner or joiner fails the
    * hash row-for-row. */
  val paragraphDedup: Q = (s, dir) =>
    graft.operators.ParagraphDedup.dedupParagraphs(
        Scan.table(s, dir, "documents"), "doc_id", "text",
        sepRegex = " table ", joiner = " | ")
      .orderBy(col("doc_id"))

  /** Reciprocal-rank fusion of the BM25 lexical list with a dense
    * cosine list over the embedded slice (vec_id < 500 ≡ the doc-id
    * space), query ids 1-3 shared. The oracle recomputes BOTH
    * retrievers from corpus statistics (the bm25 CTE stack verbatim +
    * the exact-cosine rank) and then the rounded-domain RRF sum and
    * re-rank — so the gate covers the retrievers AND the fusion
    * arithmetic end-to-end. */
  val rrfFusion: Q = (s, dir) => {
    import s.implicits._
    val docs = Scan.table(s, dir, "documents")
    val lexical = graft.operators.TfIdf.bm25TopK(
        docs, "doc_id", "text",
        bm25Queries.toDF("query_id", "qtext"), "query_id", "qtext", k = 5)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val emb = Scan.table(s, dir, "embeddings")
    val dense = graft.operators.Similarity.topKForQueries(
        emb.filter(col("vec_id") < 500), "vec_id", "embedding",
        emb.filter(col("vec_id").isin(1L, 2L, 3L))
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        "query_id", "qvec", k = 5)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    graft.operators.Fusion.rrfFuse(
        Seq(lexical -> 1.0, dense -> 1.0),
        "query_id", "doc_id", "rank", k = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Learned quality classifier under the hash gate — the IVF/SemDeDup
    * snapshot pattern: the fit (spark.ml L-BFGS, non-portable
    * arithmetic) runs engine-side on a bounded labeled slice (doc_id <
    * 300, labels from the rule-based en-stopword signal), the model is
    * snapshotted at full double precision, and the oracle re-derives
    * the ENTIRE corpus scoring pass — tokenization, md5 bucket hashing,
    * the L1-normalized dot product and the sigmoid — from that
    * snapshot. A drifted bucket, weight lookup, divisor, or sigmoid
    * fails row-for-row across all 500 docs. */
  val qualityClassifier: Q = (s, dir) => {
    import graft.functions.GraftFunctions.roundPortable
    val docs = Scan.table(s, dir, "documents")
    val labeled = docs.filter(col("doc_id") < 300)
      .withColumn("y", (stopwordHits(col("text"), "en") >= 2).cast("double"))
    val model = graft.operators.QualityClassifier.fit(
      labeled, "text", "y", buckets = 128)
    graft.operators.QualityClassifier.modelRelation(s, model)
      .coalesce(1).write.mode("overwrite")
      .parquet(SnapshotPaths.dirFor("qc_model", dir, s))
    graft.operators.QualityClassifier.score(docs, "text", model)
      .select(col("doc_id"), roundPortable(col("p_good"), 6).as("p_good"))
      .orderBy(col("doc_id"))
  }

  /** The corpus datasheet under the hash gate: every volume counter,
    * the exact vocabulary size, the rounded ratios and the per-language
    * composition re-derived by DuckDB from scratch — one drifted count
    * or ratio anywhere fails the (stat, value) hash. */
  val corpusStats: Q = (s, dir) =>
    graft.operators.CorpusStats.statsCard(
      Scan.table(s, dir, "documents"), "text", Some("lang"))

  /** Blocklist annotation under the hash gate: three terms drawn from
    * the corpus vocabulary so the rule bites in both directions, the
    * matched-term SET emitted as a joined string (sorted — the
    * deterministic spelling). The oracle re-derives the lower-cased
    * split, the IN-list token filter, distinct, sort and join. */
  val blocklistAnnotate: Q = (s, dir) =>
    graft.operators.Blocklist.annotateBlocked(
        Scan.table(s, dir, "documents"), "text",
        Seq("merge", "window", "dup"))
      .select(col("doc_id"), col("blocked"), col("n_blocked_terms"),
        array_join(col("blocked_terms"), ",").as("blocked_terms"))
      .orderBy(col("doc_id"))

  /** Datasheet diff across SNAPSHOT VERSIONS — the q_merge_time_travel
    * fixture (create evens at v1, upsert a suffixed %3 batch → v2)
    * with a full card computed over `readShardedVersion(1)` and the
    * live read, then [[graft.operators.CorpusStats.statsDiff]]. Gates
    * the card arithmetic on BOTH version reads AND the diff join —
    * rerun-safe (tagged upsert replays as a no-op, versions stable). */
  val corpusStatsDiff: Q = (s, dir) => {
    import graft.operators.{CorpusStats, SnapshotMerge}
    val docs = Scan.table(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val path = SnapshotPaths.dirFor("stats_diff", dir, s)
    if (!SnapshotMerge.existsSharded(s, path)) {
      SnapshotMerge.createSharded(
        docs.filter(col("doc_id") % 2 === 0), Seq("doc_id"),
        nShards = 8, path)
    }
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("text", concat(col("text"), lit(" extra extra")))
    SnapshotMerge.upsertSharded(batch, Seq("doc_id"), path,
      commitTag = Some("sd_batch_1"))
    CorpusStats.statsDiff(
        CorpusStats.statsCard(
          SnapshotMerge.readShardedVersion(s, path, 1L), "text",
          Some("lang")),
        CorpusStats.statsCard(
          SnapshotMerge.readSharded(s, path), "text", Some("lang")))
      .orderBy(col("stat"))
  }

  /** Curriculum ordering under the hash gate: every document's exact
    * global rank in (rounded quality desc, doc_id) order — the oracle's
    * global `ROW_NUMBER()` must match the distributed two-pass rank on
    * EVERY row, so a drifted quality, a misplaced range boundary, or a
    * wrong partition prefix anywhere fails the gate. */
  val curriculumRank: Q = (s, dir) => {
    import graft.functions.GraftFunctions.roundPortable
    val docs = Scan.table(s, dir, "documents")
      .select(col("doc_id"),
        roundPortable(qualityScore(col("text")), 4).as("quality"))
    graft.operators.Ranking.withGlobalRank(docs,
        Seq(col("quality").desc, col("doc_id")), "rank")
      .orderBy(col("doc_id"))
  }

  /** ftfy-style Unicode cleanup under the hash gate: both engines
    * synthesize the SAME messy unicode around the corpus text —
    * combining marks (e+U+0301, i+U+0308), singleton compatibility
    * points (ANGSTROM U+212B, OHM U+2126), NBSP/em-space/ZWSP, CRLF
    * and lone CR, C0 controls and DEL — and the oracle re-runs the
    * five-step [[graft.functions.TextNormalize.cleanText]] contract
    * on DuckDB's own `nfc_normalize` (utf8proc vs the JDK — two
    * INDEPENDENT UAX #15 implementations must agree byte-for-byte). */
  val textNormalize: Q = (s, dir) => {
    val id = col("doc_id")
    // every non-ASCII char as an explicit escape: DECOMPOSED
    // Cafe+U+0301 / nai+U+0308+ve (NFC must compose them), the
    // ANGSTROM/OHM singletons, NBSP/ZWSP/em-space, CR(LF), BEL, DEL
    val messy = concat(
      lit("Cafe\u0301 nai\u0308ve "),
      when(id % 2 === 0, lit("\u212B unit ")).otherwise(lit("\u2126 ohm ")),
      substring(col("text"), 1, 60),
      lit("\u00A0tail\u200Bzw\u2003em"),
      when(id % 3 === 0, lit("\r\nline2\rline3")).otherwise(lit("")),
      when(id % 5 === 0, lit("\u0007bell\u007F")).otherwise(lit("")))
    Scan.table(s, dir, "documents")
      .select(id, messy.as("messy"))
      .select(id,
        graft.functions.TextNormalize.cleanText(col("messy")).as("clean"),
        length(col("messy")).as("n_chars_in"))
      .withColumn("n_chars_out", length(col("clean")))
      .orderBy("doc_id")
  }

  /** BPE tokenizer TRAINING under the hash gate: learn 8 merges from
    * the corpus ([[graft.operators.BpeTrain]]), snapshot the learned
    * `(rank, l, r, weight)` relation, and let the oracle re-derive the
    * ENTIRE training trajectory — for every learned rank k it re-runs
    * the first k snapshotted merges over the corpus vocabulary with
    * the recursive wrap-and-replace machinery, recounts every
    * adjacent-pair weight and recomputes the (weight DESC, l, r)
    * argmax, which must equal the snapshotted merge k exactly. By
    * induction that validates every iteration of the fit: word
    * counts, adjacency counting (overlaps included), the leftmost-
    * first fuse, the tie-break and the weights. */
  val bpeTrain: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    val res = graft.operators.BpeTrain.fit(d, "text", nMerges = 8)
    val path = SnapshotPaths.dirFor("bpe_train", dir, s)
    res.toDF(s).coalesce(1).write.mode("overwrite").parquet(path)
    s.read.parquet(path).orderBy("rank")
  }

  /** Train-then-tokenize: token counts of every 10th document under
    * the CORPUS-LEARNED table (the [[graft.functions.BpeTable]] swap
    * path carrying a learned tokenizer instead of a loaded one); the
    * oracle re-applies the snapshotted merges through the same
    * recursive CTE machinery as the fixture-table gate. */
  val bpeTrainApply: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    val res = graft.operators.BpeTrain.fit(d, "text", nMerges = 8)
    val path = SnapshotPaths.dirFor("bpe_train_apply", dir, s)
    res.toDF(s).coalesce(1).write.mode("overwrite").parquet(path)
    d.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.bpe_token_count(col("text"), res.table)
          .as("bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Gopher document-SHAPE rules under the hash gate (Rae et al. 2021
    * A1.1): both engines synthesize the same multi-line messy text —
    * bullet lists, ellipsis-terminated snippet lines, `##` symbol runs,
    * numeric soup — keyed on doc_id, and the oracle re-derives every
    * band metric (mean word length, symbol ratio, bullet/ellipsis line
    * fractions, alpha-word fraction) and the composed keep rule from
    * its own string/list ops. */
  val gopherQuality: Q = (s, dir) => {
    val id = col("doc_id")
    val messy = concat(
      substring(col("text"), 1, 80), lit("\n"),
      when(id % 2 === 0, lit("- bullet item one\n- bullet item two\n"))
        .otherwise(lit("")),
      when(id % 3 === 0, lit("read more...\nsnippet\u2026\n")).otherwise(lit("")),
      when(id % 5 === 0, lit("## section ## 123 456 789\n")).otherwise(lit("")),
      lit("* final "), substring(col("text"), 81, 40))
    Scan.table(s, dir, "documents")
      .select(id, messy.as("m"))
      .select(id,
        meanWordLength(col("m")).as("mean_word_len"),
        symbolWordRatio(col("m")).as("symbol_ratio"),
        bulletLineFraction(col("m")).as("bullet_frac"),
        ellipsisLineFraction(col("m")).as("ellipsis_frac"),
        alphaWordFraction(col("m")).as("alpha_frac"),
        gopherShapeOk(col("m")).as("shape_ok"))
      .orderBy("doc_id")
  }

  /** C4 LINE-level cleanup under the hash gate (Raffel et al. 2020
    * §2.2 — the complement to the document-level Gopher bands): both
    * engines synthesize the same line-structured messy page — a
    * terminal-punctuated prose line, a 2-word stub ("Click here"), an
    * enable-javascript banner, a line whose terminal punctuation
    * exists only on even ids (so the minLines=3 page rule FIRES on
    * odd ids), plus lorem-ipsum (`%7`) and code-brace (`%11`) page
    * poisons — and the oracle re-derives every line rule (terminal
    * punctuation incl. the typographic close-quote, portable-ws word
    * count, token-equality javascript screen) and both page rules. */
  val c4LineFilter: Q = (s, dir) => {
    val id = col("doc_id")
    val messy = concat_ws("\n",
      concat(substring(col("text"), 1, 60), lit(" ends here.")),
      lit("Click here"),
      lit("Please enable JavaScript to view the comments powered here."),
      concat(substring(col("text"), 61, 40),
        when(id % 2 === 0, lit(" and so it ends?")).otherwise(lit(" unterminated line"))),
      when(id % 7 === 0, lit("Lorem Ipsum dolor sit amet consectetur."))
        .otherwise(lit("")),
      when(id % 11 === 0, lit("function f() { return 1; }"))
        .otherwise(lit("")),
      concat(lit("Closing words for doc "), id, lit(" arrive at the very end!")))
    graft.operators.LineFilters.c4Clean(
        Scan.table(s, dir, "documents").select(id, messy.as("text")),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Trainable NB language ID under the hash gate: fit on the even-id
    * half's `(lang, text)` labels, score the odd half — and the oracle
    * re-derives the ENTIRE fit from the corpus (bigram bucket counts,
    * smoothing, priors) plus the scoring sums and the argmax, with no
    * model snapshot at all (NB fit is pure counting — the strongest
    * oracle shape available; see [[graft.operators.LangIdNb]]). */
  val langIdNb: Q = (s, dir) => {
    val d = Scan.table(s, dir, "documents")
    val model = graft.operators.LangIdNb.fit(
      d.filter(col("doc_id") % 2 === 0), "lang", "text", buckets = 1024)
    graft.operators.LangIdNb.predict(
        d.filter(col("doc_id") % 2 === 1).select("doc_id", "text"),
        "text", model)
      .drop("text")
      .orderBy("doc_id")
  }

  /** Tokenizer FERTILITY datasheet under the hash gate: tokens-per-
    * word and chars-per-token per language under the corpus-LEARNED
    * BPE table — the tokenizer-fairness numbers (a tokenizer trained
    * on skewed data segments under-represented languages into more,
    * shorter tokens; Rust et al. 2021) a mixture owner reads before
    * spending per-language token budgets. Composes [[graft.operators
    * .BpeTrain]] + the native count expression + one O(langs)
    * aggregate; the oracle re-applies the snapshotted merges and
    * re-derives every ratio. */
  val tokenizerFertility: Q = (s, dir) => {
    import graft.functions.GraftFunctions.roundPortable
    val d = Scan.table(s, dir, "documents")
    val res = graft.operators.BpeTrain.fit(d, "text", nMerges = 8)
    val path = SnapshotPaths.dirFor("bpe_fertility", dir, s)
    res.toDF(s).coalesce(1).write.mode("overwrite").parquet(path)
    d.select(col("lang"),
        graft.functions.GraftFunctions.bpe_token_count(col("text"), res.table)
          .as("toks"),
        wsTokenCount(col("text")).as("words"),
        length(col("text")).cast("long").as("chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("toks").as("bpe_tokens"),
        sum("words").as("ws_tokens"),
        sum("chars").as("n_chars"))
      .select(col("lang"), col("n_docs"), col("bpe_tokens"),
        roundPortable(col("bpe_tokens").cast("double") /
          greatest(col("ws_tokens"), lit(1L)).cast("double"), 4)
          .as("fertility"),
        roundPortable(col("n_chars").cast("double") /
          greatest(col("bpe_tokens"), lit(1L)).cast("double"), 4)
          .as("chars_per_token"))
      .orderBy("lang")
  }

  val queries: ListMap[String, Q] = ListMap(
    "q_text_normalize" -> textNormalize,
    "q_c4_line_filter" -> c4LineFilter,
    "q_langid_nb" -> langIdNb,
    "q_tokenizer_fertility" -> tokenizerFertility,
    "q_gopher_quality" -> gopherQuality,
    "q_bpe_train" -> bpeTrain,
    "q_bpe_train_apply" -> bpeTrainApply,
    "q_curation_filter" -> curationFilter,
    "q_curation_full" -> curationFull,
    "q_curation_clusters" -> curationClusters,
    "q_text_token_counts" -> tokenCounts,
    "q_text_bpe_tokens" -> bpeTokens,
    "q_text_quality" -> qualityProfile,
    "q_text_repetition" -> repetition,
    "q_text_langid" -> langIdRollup,
    "q_text_perplexity" -> perplexity,
    "q_text_fingerprints" -> fingerprints,
    "q_pii_redaction" -> piiRedaction,
    "q_text_chunking" -> chunking,
    "q_tfidf_top_terms" -> tfidfTopTerms,
    "q_bm25_topk" -> bm25TopDocs,
    "q_paragraph_dedup" -> paragraphDedup,
    "q_rrf_fusion" -> rrfFusion,
    "q_quality_classifier" -> qualityClassifier,
    "q_corpus_stats" -> corpusStats,
    "q_corpus_stats_diff" -> corpusStatsDiff,
    "q_blocklist" -> blocklistAnnotate,
    "q_curriculum_rank" -> curriculumRank)

  // DuckDB-side building blocks mirroring TextAnalysis exactly.
  private[queries] val wsToks = "(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)"

  /** THE single SQL spelling of [[graft.functions.TextNormalize
    * .cleanText]] over an arbitrary expression — shared by the
    * q_text_normalize oracle and the crawl-to-corpus capstone
    * (HtmlQueries), so the five-step cleanup can never fork from
    * itself. Pattern text comes from the TextNormalize constants. */
  private[queries] def cleanTextSql(x: String): String =
    s"""regexp_replace(
          regexp_replace(
            regexp_replace(
              replace(replace(nfc_normalize($x),
                chr(13) || chr(10), chr(10)), chr(13), chr(10)),
              '${graft.functions.TextNormalize.ZeroWidthRe}', '', 'g'),
            '${graft.functions.TextNormalize.UniSpaceRe}', ' ', 'g'),
          '${graft.functions.TextNormalize.ControlRe}', '', 'g')"""

  /** Gopher band CTE over a `(doc_id, text)` source (plus pass-through
    * of `text`): emits `gop` with the raw feature columns and
    * `shaped` with only the documents passing the composed A1.1 rule —
    * THE single SQL spelling of [[graft.functions.TextAnalysis
    * .gopherShapeOk]]'s bands, shared by the q_gopher_quality oracle
    * and the crawl-to-corpus capstone. */
  private[queries] def gopherFeatureSql: Map[String, String] = {
    import graft.functions.GraftFunctions.roundPortableSql
    Map(
      "mean" -> roundPortableSql("nw / GREATEST(wt, 1)", 4),
      "sym" -> roundPortableSql("symn / GREATEST(wt, 1)", 4),
      "bullet" -> roundPortableSql(
        """LEN(LIST_FILTER(lines, l -> left(l, 2) = '- '
             OR left(l, 2) = '* ' OR left(l, 1) = chr(8226)))::DOUBLE
           / GREATEST(LEN(lines), 1)""", 4),
      "ellip" -> roundPortableSql(
        """LEN(LIST_FILTER(lines, l -> right(l, 3) = '...'
             OR right(l, 1) = chr(8230)))::DOUBLE
           / GREATEST(LEN(lines), 1)""", 4),
      "alpha" -> roundPortableSql(
        """LEN(LIST_FILTER(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
           / GREATEST(LEN(toks), 1)""", 4))
  }

  /** The raw-feature CTE body (`wt/nw/n/lines/toks/symn`) over `$src`'s
    * `(doc_id, text)` — pairs with [[gopherFeatureSql]]. Words are
    * PORTABLE-WHITESPACE splits (maximal non-ws runs, the A1.1 word
    * definition TextAnalysis.portableWordCount uses), not single-space
    * splits — newline-joined paragraphs must not merge words. */
  private[queries] def gopherRawCte(src: String): String = {
    val ws = graft.functions.GraftFunctions.WsClass
    s"""SELECT doc_id, text,
          CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^$ws]+')) AS BIGINT) AS wt,
          LENGTH(REGEXP_REPLACE(text, '[$ws]', '', 'g')) AS nw,
          LENGTH(text) AS n,
          string_split(text, chr(10)) AS lines,
          LIST_FILTER(STRING_SPLIT_REGEX(text,
            '${graft.functions.GraftFunctions.WsRun}'),
            x -> x <> '') AS toks,
          ((LENGTH(text) - LENGTH(REPLACE(text, '#', '')))
           + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) / 3
           + (LENGTH(text) - LENGTH(REPLACE(text, chr(8230), '')))) AS symn
        FROM $src"""
  }

  /** The composed A1.1 keep rule over [[gopherFeatureSql]] columns. */
  private[queries] def gopherOkSql: String = {
    val f = gopherFeatureSql
    s"""(${f("mean")} BETWEEN 3.0 AND 10.0 AND ${f("sym")} < 0.1
        AND ${f("bullet")} < 0.9 AND ${f("ellip")} < 0.3
        AND ${f("alpha")} > 0.8)"""
  }
  private def hits(words: Seq[String]): String =
    words.map(w => s"(CASE WHEN POSITION(' $w ' IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
  private val hitsEn = hits(Seq("the", "and", "of", "to", "a"))
  private val hitsEs = hits(Seq("el", "la", "de", "que", "y"))
  private val hitsFr = hits(Seq("le", "les", "et", "des", "une"))
  private val hitsDe = hits(Seq("der", "die", "und", "das", "ist"))
  import graft.functions.GraftFunctions.roundPortableSql
  private val distinctRatio = roundPortableSql(
    "LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))::DOUBLE / LEN(STRING_SPLIT(text, ' '))", 4)

  /** THE single SQL spelling of [[graft.functions.TextAnalysis
    * .qualityScore]] over a `text` column — shared by q_text_quality,
    * the curation oracles' `feat` CTE, and the cluster-representative
    * oracle (DedupQueries), so the oracle-side quality arithmetic can
    * never fork from itself. */
  private[queries] lazy val qualityScoreSql: String = roundPortableSql(
    s"""LEAST($wsToks / 100.0, 1.0) * 0.5
                + (LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))::DOUBLE
                   / GREATEST($wsToks::DOUBLE, 1.0)) * 0.3
                + ($hitsEn / 5.0) * 0.2""", 4)

  /** THE single SQL derivation of [[graft.operators.CorpusStats
    * .statsCard]] over a source relation (lang-grouped) — shared by the
    * q_corpus_stats oracle and BOTH sides of the q_corpus_stats_diff
    * oracle, so the card arithmetic can never fork from itself. Emits
    * an UNORDERED (stat, value) SELECT with its own nested WITH (legal
    * as a CTE body; inner names shadow safely). */
  private[queries] def corpusCardSql(src: String): String =
    s"""WITH g AS (
          SELECT COUNT(*) AS n_docs,
            COALESCE(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0)
              AS n_null,
            COALESCE(SUM(COALESCE($wsToks, 0)), 0) AS n_tokens,
            COALESCE(SUM(COALESCE(LENGTH(text), 0)), 0) AS n_chars,
            COUNT(text) AS n_nonnull,
            COUNT(DISTINCT MD5(text)) AS n_distinct
          FROM $src),
        vv AS (
          SELECT COUNT(DISTINCT t) AS vocab FROM (
            SELECT UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(text,
              '${graft.functions.GraftFunctions.WsRun}'),
              x -> x <> '')) AS t
            FROM $src WHERE text IS NOT NULL)),
        base(stat, value) AS (
          SELECT 'n_docs', n_docs::DOUBLE FROM g UNION ALL
          SELECT 'n_null_text', n_null::DOUBLE FROM g UNION ALL
          SELECT 'n_tokens', n_tokens::DOUBLE FROM g UNION ALL
          SELECT 'n_chars', n_chars::DOUBLE FROM g UNION ALL
          SELECT 'avg_tokens_per_doc', ${roundPortableSql(
            "g.n_tokens::DOUBLE / GREATEST(g.n_docs, 1)", 6)} FROM g
          UNION ALL
          SELECT 'vocab_size', vocab::DOUBLE FROM vv UNION ALL
          SELECT 'type_token_ratio', ${roundPortableSql(
            "vv.vocab::DOUBLE / GREATEST(g.n_tokens, 1)", 6)} FROM g, vv
          UNION ALL
          SELECT 'exact_dup_docs',
            (n_nonnull - n_distinct)::DOUBLE FROM g UNION ALL
          SELECT 'exact_dup_fraction', ${roundPortableSql(
            "(g.n_nonnull - g.n_distinct)::DOUBLE / GREATEST(g.n_nonnull, 1)",
            6)} FROM g),
        grp AS (
          SELECT COALESCE(lang, 'null') AS gl,
            COUNT(*)::DOUBLE AS d,
            COALESCE(SUM(COALESCE($wsToks, 0)), 0)::DOUBLE AS t
          FROM $src GROUP BY 1)
        SELECT * FROM base
        UNION ALL SELECT 'docs_lang_' || gl, d FROM grp
        UNION ALL SELECT 'tokens_lang_' || gl, t FROM grp"""

  /** THE single CTE stack deriving the ranked BM25 relation
    * `r(query_id, doc_id, score, rank)` from corpus statistics — shared
    * by the q_bm25_topk oracle and the RRF-fusion oracle's lexical leg.
    * Constants are spelled from the SAME Scala arithmetic the engine's
    * plan embeds (k1+1, 1-b) — Double.toString round-trips, so both
    * engines compute on identical bits. */
  private lazy val bm25RankCtes: String = {
    val qValues = bm25Queries
      .map { case (i, t) => s"($i, '$t')" }.mkString(", ")
    s"""toks AS (
            SELECT doc_id,
              UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(text,
                '${graft.functions.GraftFunctions.WsRun}'),
                x -> x <> '')) AS token
            FROM documents),
          tc AS (SELECT doc_id, token, COUNT(*) AS n_term
                 FROM toks GROUP BY 1, 2),
          dl AS (SELECT doc_id, SUM(n_term) AS n_doc_tokens
                 FROM tc GROUP BY 1),
          dfr AS (SELECT token, COUNT(*) AS df FROM tc GROUP BY 1),
          st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                        AVG(n_doc_tokens) AS avgdl FROM dl),
          q(query_id, qtext) AS (VALUES $qValues),
          qt AS (
            SELECT DISTINCT query_id,
              UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(qtext,
                '${graft.functions.GraftFunctions.WsRun}'),
                x -> x <> '')) AS token
            FROM q),
          sc AS (
            SELECT qt.query_id, tc.doc_id,
              ${roundPortableSql(
                "SUM(LN(1.0 + (st.n - dfr.df + 0.5) / (dfr.df + 0.5)) * " +
                  s"(tc.n_term::DOUBLE * ${1.2 + 1.0}) / (tc.n_term::DOUBLE + 1.2 * " +
                  s"(${1.0 - 0.75} + 0.75 * dl.n_doc_tokens::DOUBLE / st.avgdl)))",
                4)} AS score
            FROM qt JOIN dfr USING (token) JOIN tc USING (token)
            JOIN dl USING (doc_id) CROSS JOIN st
            GROUP BY 1, 2),
          r AS (SELECT sc.*, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, doc_id) AS rank FROM sc)"""
  }

  /** DuckDB re-implementation of the BPE APPLY loop as recursive CTEs —
    * the oracle twin of [[graft.functions.BpeTokenCount]], sharing ONLY
    * the merge-table constant. Each distinct word starts as its
    * character sequence spelled `_c1__c2__…_` (every symbol wrapped in
    * `_`, so `replace` of `_l__r_` → `_lr_` fuses exactly the
    * leftmost-first non-overlapping occurrences — the wrap spends one
    * boundary `_` per match, which is what makes adjacent matches
    * non-overlapping); each recursion step applies the lowest-ranked
    * pair present until none remains. Per-doc counts re-join the
    * distinct-word table. The wrap trick assumes words are `_`-free —
    * true of this corpus (alnum + spaces); the ENGINE side has no such
    * constraint. Caller must open with `WITH RECURSIVE`. Produces
    * `bpe_counts(doc_id, bpe_tokens)` over `src`, which must expose
    * (doc_id, text). */
  private[queries] def bpeCtes(src: String): String = {
    val mergeValues = graft.functions.BpeTokenCount.merges.zipWithIndex
      .map { case ((l, r), i) => s"($i,'$l','$r')" }.mkString(",")
    bpeCtesFrom(src, s"(VALUES $mergeValues)")
  }

  /** [[bpeCtes]] with the merge table from an arbitrary SQL source
    * (`(rank, l, r)` rows) — the q_bpe_train_apply oracle re-applies a
    * CORPUS-LEARNED table read back from its snapshot through the
    * same recursive machinery. */
  private[queries] def bpeCtesFrom(src: String, mergesSql: String): String =
    s"""bpe_merges(rank, l, r) AS ($mergesSql),
          bpe_words AS (
            SELECT DISTINCT unnest(string_split(text,' ')) AS w FROM $src),
          bpe_steps(w, seq) AS (
            SELECT w, '_' || array_to_string(string_split(w,''),'__') || '_'
            FROM bpe_words WHERE w <> ''
            UNION ALL
            SELECT w, (SELECT replace(seq, '_'||m.l||'__'||m.r||'_',
                                           '_'||m.l||m.r||'_')
                       FROM bpe_merges m
                       WHERE position('_'||m.l||'__'||m.r||'_' IN seq) > 0
                       ORDER BY m.rank LIMIT 1)
            FROM bpe_steps
            WHERE EXISTS (SELECT 1 FROM bpe_merges m
                          WHERE position('_'||m.l||'__'||m.r||'_' IN seq) > 0)),
          bpe_final AS (
            SELECT w, CAST(len(string_split(trim(seq,'_'),'__')) AS BIGINT)
                      AS n_toks
            FROM bpe_steps s
            WHERE NOT EXISTS (SELECT 1 FROM bpe_merges m
                          WHERE position('_'||m.l||'__'||m.r||'_' IN seq) > 0)),
          bpe_counts AS MATERIALIZED (
            SELECT doc_id,
                   CAST(SUM(COALESCE(f.n_toks, 0)) AS BIGINT) AS bpe_tokens
            FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w
                  FROM $src) t
            LEFT JOIN bpe_final f USING (w)
            GROUP BY doc_id)"""

  /** The NB language-ID fit + scoring re-derivation as a PREFIXED CTE
    * chain — THE single SQL spelling of [[graft.operators.LangIdNb]]
    * (bigram bucket counts via the codepoint hash, add-one smoothing,
    * doc-count priors, round4 scoring sums, lexicographic-tie argmax),
    * shared by the q_langid_nb gate and the crawl-to-corpus capstones.
    * `trainSrc` must expose `(lang, text)`; `testSrc` `(doc_id,
    * text)`. Emits `<p>f(doc_id, lang, score)` over non-NULL-text docs
    * and `<p>pred(doc_id, pred_lang)`. */
  private[queries] def nbCtes(trainSrc: String, testSrc: String,
      p: String, buckets: Int = 1024): String = {
    def bkt(x: String) =
      s"((unicode(substr($x, 1, 1)) * 997 + unicode(substr($x, 2, 1))) % $buckets)"
    s"""${p}train AS MATERIALIZED (
          SELECT lang, text FROM $trainSrc
          WHERE lang IS NOT NULL AND text IS NOT NULL),
        ${p}test AS (SELECT doc_id, text FROM $testSrc),
        ${p}tb AS (
          SELECT lang, ${bkt("substr(text, i, 2)")} AS b
          FROM (SELECT lang, text, unnest(range(1, length(text))) AS i
                FROM ${p}train) z),
        ${p}cnt AS MATERIALIZED (SELECT lang, b, COUNT(*) AS c
            FROM ${p}tb GROUP BY lang, b),
        ${p}tot AS (SELECT lang, CAST(SUM(c) AS DOUBLE) AS t
            FROM ${p}cnt GROUP BY lang),
        ${p}dc AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS d
            FROM ${p}train GROUP BY lang),
        ${p}pri AS (SELECT lang, LN(d / (SELECT SUM(d) FROM ${p}dc)) AS p
            FROM ${p}dc),
        ${p}qb AS (
          SELECT doc_id, ${bkt("substr(text, i, 2)")} AS b
          FROM (SELECT doc_id, text, unnest(range(1, length(text))) AS i
                FROM ${p}test) z),
        ${p}sums AS (
          SELECT q.doc_id, t.lang,
            SUM(LN((COALESCE(c.c, 0) + 1.0) / (t.t + $buckets))) AS s
          FROM ${p}qb q CROSS JOIN ${p}tot t
          LEFT JOIN ${p}cnt c ON c.lang = t.lang AND c.b = q.b
          GROUP BY q.doc_id, t.lang),
        ${p}f AS MATERIALIZED (
          SELECT te.doc_id, p.lang,
            ${roundPortableSql("p.p + COALESCE(sm.s, 0.0)", 4)} AS score
          FROM ${p}test te CROSS JOIN ${p}pri p
          LEFT JOIN ${p}sums sm
            ON sm.doc_id = te.doc_id AND sm.lang = p.lang
          WHERE te.text IS NOT NULL),
        ${p}pred AS (
          SELECT doc_id, lang AS pred_lang FROM ${p}f
          QUALIFY ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, lang) = 1)"""
  }

  /** [[curationFeatureCtes]] with the language stage SUPPLIED by a
    * predictions CTE `(doc_id, pred_lang)` — the trainable-NB spelling
    * the crawl capstones use — and a parameterized keep-language set.
    * Docs with no prediction row (NULL text) get NULL pred_lang and
    * fail the IN screen, mirroring the engine's NULL contract. */
  private[queries] def curationFeatureCtesWithLang(src: String,
      predCte: String, keepLangs: Seq[String]): String = {
    val langsIn = keepLangs.map(l => s"'$l'").mkString(", ")
    s"""feat AS (
            SELECT s.doc_id, s.text, p.pred_lang,
              $qualityScoreSql AS quality,
              CAST($wsToks AS BIGINT) AS n_tokens,
              MD5(text) AS content_hash
            FROM $src s LEFT JOIN $predCte p USING (doc_id)),
          kept AS MATERIALIZED (
            SELECT * FROM feat
            WHERE pred_lang IN ($langsIn)
              AND quality >= 0.3 AND n_tokens >= 5)"""
  }

  /** Curation FEATURE CTEs (`feat`, `kept` — stages 1-2 plus the
    * content hash) over an arbitrary `(doc_id, text)` source — THE
    * single SQL spelling of the feature/filter stages, shared by the
    * curation oracles here and the training-data capstone
    * ([[TrainingDataQueries]], which runs stage 3 per crawl wave). */
  private[queries] def curationFeatureCtes(src: String): String =
    s"""feat AS (
            SELECT doc_id, text,
              CASE
                WHEN $hitsEn > 0 AND $hitsEn >= GREATEST($hitsEs, $hitsFr, $hitsDe) THEN 'en'
                WHEN $hitsEs > 0 AND $hitsEs >= GREATEST($hitsEn, $hitsFr, $hitsDe) THEN 'es'
                WHEN $hitsFr > 0 AND $hitsFr >= GREATEST($hitsEn, $hitsEs, $hitsDe) THEN 'fr'
                WHEN $hitsDe > 0 AND $hitsDe >= GREATEST($hitsEn, $hitsEs, $hitsFr) THEN 'de'
                ELSE 'und' END AS pred_lang,
              $qualityScoreSql AS quality,
              CAST($wsToks AS BIGINT) AS n_tokens,
              MD5(text) AS content_hash
            FROM $src),
          kept AS (
            SELECT * FROM feat
            WHERE pred_lang IN ('en') AND quality >= 0.3 AND n_tokens >= 5)"""

  /** Stage-1-3 CTEs shared by both curation oracles. */
  private def curationCtes: String =
    s"""WITH ${curationFeatureCtes("documents")},
          canon AS (
            SELECT content_hash, MIN(doc_id) AS doc_id
            FROM kept GROUP BY content_hash),
          surv AS (
            SELECT k.doc_id, k.text, k.pred_lang, k.quality, k.n_tokens
            FROM kept k
            JOIN canon c ON k.content_hash = c.content_hash AND k.doc_id = c.doc_id)"""

  val oracles: ListMap[String, String] = ListMap(
    "q_curation_filter" ->
      s"""$curationCtes
          SELECT doc_id, pred_lang, quality, n_tokens FROM surv
          ORDER BY doc_id""",
    // stage 4 in SQL: exact-Jaccard near-dup pairs of the SURVIVORS at
    // threshold 0.7 (n=3 shingles), drop the higher id of each pair —
    // ≡ the engine's LSH-gated removal while recall is 100%
    "q_curation_full" ->
      s"""$curationCtes,
          ${DedupQueries.jaccardPairCtes("surv")},
          drops AS (
            SELECT DISTINCT d2 FROM ip
            JOIN sizes sa ON sa.doc_id = d1
            JOIN sizes sb ON sb.doc_id = d2
            WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) >= 0.7)
          SELECT doc_id, pred_lang, quality, n_tokens FROM surv
          WHERE doc_id NOT IN (SELECT d2 FROM drops)
          ORDER BY doc_id""",
    // cluster policy: connected components of the same edges (recursive
    // CTE), drop every non-minimum cluster member
    "q_curation_clusters" ->
      s"""WITH RECURSIVE ${curationCtes.stripPrefix("WITH ")},
          ${DedupQueries.jaccardPairCtes("surv")},
          ${DedupQueries.componentCtes}
          SELECT doc_id, pred_lang, quality, n_tokens FROM surv
          WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
          ORDER BY doc_id""",
    "q_text_bpe_tokens" ->
      s"""WITH RECURSIVE ${bpeCtes("documents")}
          SELECT doc_id, bpe_tokens, CAST($wsToks AS BIGINT) AS ws_tokens
          FROM bpe_counts JOIN documents USING (doc_id)
          ORDER BY doc_id""",
    "q_text_token_counts" ->
      s"""SELECT doc_id,
          CAST($wsToks AS BIGINT) AS ws_tokens,
          CAST(LEN(REGEXP_EXTRACT_ALL(text,
            '[A-Za-z0-9]+|[^A-Za-z0-9${graft.functions.GraftFunctions.WsClass}]')) AS BIGINT)
            AS regex_tokens,
          CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
          FROM documents ORDER BY doc_id""",
    "q_text_quality" ->
      s"""SELECT doc_id,
          CAST(LENGTH(text) AS BIGINT) AS n_chars_measured,
          $distinctRatio AS distinct_ratio,
          CAST($hitsEn AS BIGINT) AS en_stopword_hits,
          $qualityScoreSql AS quality_score
          FROM documents ORDER BY doc_id""",
    // duplicate-n-gram fractions at n = 2 and 3, derived from THE
    // shared n-gram spelling (DedupQueries.ngramListSql)
    "q_text_repetition" ->
      s"""WITH g AS (
            SELECT doc_id,
              GREATEST(LEN(STRING_SPLIT(text, ' ')) - 1, 0) AS t2,
              LEN(${DedupQueries.ngramListSql(2)}) AS d2,
              GREATEST(LEN(STRING_SPLIT(text, ' ')) - 2, 0) AS t3,
              LEN(${DedupQueries.ngramListSql(3)}) AS d3
            FROM documents)
          SELECT doc_id,
            ${graft.functions.GraftFunctions.roundPortableSql(
              "CASE WHEN t2 > 0 THEN 1.0 - d2::DOUBLE / t2::DOUBLE ELSE 0.0 END", 4)} AS repetition_2g,
            ${graft.functions.GraftFunctions.roundPortableSql(
              "CASE WHEN t3 > 0 THEN 1.0 - d3::DOUBLE / t3::DOUBLE ELSE 0.0 END", 4)} AS repetition_3g
          FROM g ORDER BY doc_id""",
    "q_text_langid" ->
      s"""SELECT predicted_lang, COUNT(*) AS n_docs FROM (
            SELECT CASE
              WHEN $hitsEn > 0 AND $hitsEn >= GREATEST($hitsEs, $hitsFr, $hitsDe) THEN 'en'
              WHEN $hitsEs > 0 AND $hitsEs >= GREATEST($hitsEn, $hitsFr, $hitsDe) THEN 'es'
              WHEN $hitsFr > 0 AND $hitsFr >= GREATEST($hitsEn, $hitsEs, $hitsDe) THEN 'fr'
              WHEN $hitsDe > 0 AND $hitsDe >= GREATEST($hitsEn, $hitsEs, $hitsFr) THEN 'de'
              ELSE 'und' END AS predicted_lang
            FROM documents)
          GROUP BY predicted_lang ORDER BY predicted_lang""",
    // the bigram LM, counts AND scores re-derived in SQL: adjacent
    // token pairs via list indexing over the same single-space split,
    // stupid backoff (0.4) with the full-corpus token mass, mean log10
    // rounded portably — identical arithmetic to NgramLm
    "q_text_perplexity" ->
      s"""WITH sp AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS s FROM documents),
          bg AS (
            SELECT doc_id, UNNEST(LIST_TRANSFORM(
              GENERATE_SERIES(1, LEN(s) - 1),
              i -> {'w1': s[i], 'w2': s[i + 1]})) AS p
            FROM sp),
          pairs AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
          train_words AS (
            SELECT UNNEST(s) AS w FROM sp WHERE doc_id % 2 = 0),
          uni AS (SELECT w, COUNT(*) AS c FROM train_words GROUP BY w),
          tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM train_words),
          bi AS (SELECT w1, w2, COUNT(*) AS c FROM pairs
                 WHERE doc_id % 2 = 0 GROUP BY w1, w2),
          scored AS (
            SELECT sp2.doc_id,
              CASE WHEN bi.c IS NOT NULL THEN CAST(bi.c AS DOUBLE) / up.c
                   WHEN uc.c IS NOT NULL THEN CAST(0.4 AS DOUBLE) * uc.c / t.t
                   ELSE CAST(0.4 AS DOUBLE) / t.t END AS prob
            FROM pairs sp2
            LEFT JOIN bi ON bi.w1 = sp2.w1 AND bi.w2 = sp2.w2
            LEFT JOIN uni up ON up.w = sp2.w1
            LEFT JOIN uni uc ON uc.w = sp2.w2
            CROSS JOIN tot t
            WHERE sp2.doc_id % 2 = 1)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
            ${roundPortableSql("AVG(LOG10(prob))", 4)} AS avg_logprob
          FROM scored GROUP BY doc_id ORDER BY doc_id""",
    "q_text_fingerprints" ->
      """SELECT doc_id, MD5(text) AS md5_fp,
          LIST_REDUCE(
            LIST_PREPEND(CAST(0 AS BIGINT),
              LIST_TRANSFORM(GENERATE_SERIES(1, LENGTH(text)),
                i -> CAST(ASCII(text[i:i]) AS BIGINT))),
            (acc, u) -> (acc * 31 + u) % 2147483647) AS rolling_fp
          FROM documents ORDER BY doc_id""",
    // same suffix synthesis, same RE2-subset patterns, same pass order
    // (URL → email → IP → phone) — regexp semantics divergence between
    // the engines fails the gate on the full corpus. The patterns are
    // the TextRedact CONSTANTS interpolated verbatim (r12): the two
    // sides structurally cannot drift, and whitespace is the explicit
    // portable class, never `\s` (the Java-vs-RE2 `\v` edge)
    "q_pii_redaction" -> {
      import graft.functions.TextRedact
      val suffix = "text || ' contact user' || doc_id::VARCHAR || " +
        "'@example.com via https://ex.org/u/' || doc_id::VARCHAR || " +
        "'?ref=1 ip 10.' || (doc_id % 200)::VARCHAR || '.3.' || " +
        "(doc_id % 250)::VARCHAR || ' tel +1 (555) 010-' || " +
        "(doc_id % 9000)::VARCHAR"
      s"""SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            $suffix,
            '${TextRedact.UrlPattern}', '<URL>', 'g'),
            '${TextRedact.EmailPattern}', '<EMAIL>', 'g'),
            '${TextRedact.Ipv4Pattern}', '<IP>', 'g'),
            '${TextRedact.PhonePattern}', '<PHONE>', 'g') AS redacted,
          CAST(LEN(regexp_extract_all($suffix,
            '${TextRedact.EmailPattern}', 0)) AS BIGINT) AS n_emails,
          CAST(LEN(regexp_extract_all($suffix,
            '${TextRedact.UrlPattern}', 0)) AS BIGINT) AS n_urls,
          CAST(LEN(regexp_extract_all($suffix,
            '${TextRedact.Ipv4Pattern}', 0)) AS BIGINT) AS n_ips
          FROM documents ORDER BY doc_id"""
    },
    // the full tf-idf derivation in SQL: same tokenizer, same two
    // aggregates, same smooth-idf arithmetic with IDENTICAL
    // parenthesization (tf · (ln((N+1)/(df+1)) + 1)), same portable
    // rounding, same (weight desc, token) rank — DF over the FULL
    // corpus, the doc_id bound applied after ranking. N = docs with
    // ≥1 token, counted from the reduced `dl` relation exactly as the
    // Spark side derives it from docLens (r12: no second corpus pass)
    "q_tfidf_top_terms" ->
      s"""WITH toks AS (
            SELECT doc_id,
              UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(text,
                '${graft.functions.GraftFunctions.WsRun}'),
                x -> x <> '')) AS token
            FROM documents),
          tc AS (SELECT doc_id, token, COUNT(*) AS n_term
                 FROM toks GROUP BY 1, 2),
          dl AS (SELECT doc_id, SUM(n_term) AS n_doc_tokens
                 FROM tc GROUP BY 1),
          dfr AS (SELECT token, COUNT(*) AS df FROM tc GROUP BY 1),
          nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM dl),
          v AS (
            SELECT tc.doc_id, tc.token, tc.n_term, dfr.df,
              ${roundPortableSql(
                "(tc.n_term::DOUBLE / dl.n_doc_tokens) * " +
                  "(LN((nd.n + 1.0) / (dfr.df::DOUBLE + 1.0)) + 1.0)", 4)} AS tfidf
            FROM tc JOIN dfr USING (token) JOIN dl USING (doc_id)
            CROSS JOIN nd),
          r AS (SELECT v.*, ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, token) AS rank FROM v)
          SELECT doc_id, token, CAST(n_term AS BIGINT) AS n_term,
            CAST(df AS BIGINT) AS df, tfidf, CAST(rank AS INTEGER) AS rank
          FROM r WHERE rank <= 3 AND doc_id % 20 = 0
          ORDER BY doc_id, rank""",
    // BM25 re-derived from scratch: same corpus stats CTEs as tfidf,
    // the Lucene plus-one idf, the (k1=1.2, b=0.75) length-normalized
    // tf term, per-(query, doc) sum rounded BEFORE ranking (both
    // engines rank the rounded score, so ties break identically)
    "q_bm25_topk" ->
      s"""WITH $bm25RankCtes
          SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
            CAST(rank AS INTEGER) AS rank
          FROM r WHERE rank <= 5 ORDER BY query_id, rank""",
    // BOTH retrievers re-derived from scratch (the bm25 CTE stack +
    // the exact-cosine rank over the embedded slice), then the RRF
    // arithmetic in the shared rounded domain: round6 per-entry
    // contribution, round6 sum, rank on (rounded score desc, id) —
    // per-(query, doc) sums have ≤2 addends here, so IEEE addition is
    // order-independent and the rounded domain is engine-exact
    "q_rrf_fusion" ->
      s"""WITH $bm25RankCtes,
          lex AS (SELECT query_id, doc_id, rank FROM r WHERE rank <= 5),
          dn AS (
            SELECT * FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
                ROW_NUMBER() OVER (PARTITION BY a.vec_id
                  ORDER BY ${DedupQueries.cosR6} DESC, b.vec_id) AS rank
              FROM embeddings a JOIN embeddings b ON b.vec_id < 500
              WHERE a.vec_id IN (1, 2, 3))
            WHERE rank <= 5),
          contrib AS (
            SELECT query_id, doc_id,
              ${roundPortableSql("1.0 / (60.0 + rank)", 6)} AS c FROM lex
            UNION ALL
            SELECT query_id, doc_id,
              ${roundPortableSql("1.0 / (60.0 + rank)", 6)} FROM dn),
          fs AS (SELECT query_id, doc_id,
                   ${roundPortableSql("SUM(c)", 6)} AS score
                 FROM contrib GROUP BY 1, 2),
          fr AS (SELECT fs.*, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS rank FROM fs)
          SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
            CAST(rank AS INTEGER) AS rank
          FROM fr WHERE rank <= 8 ORDER BY query_id, rank""",
    // the exact global rank re-derived by DuckDB's global ROW_NUMBER
    // over the SAME rounded-quality total order (NULLS LAST spelled to
    // pin Spark's desc default; doc_id makes the order total)
    "q_curriculum_rank" ->
      s"""WITH q AS (
            SELECT doc_id, $qualityScoreSql AS quality FROM documents)
          SELECT doc_id, quality,
            CAST(ROW_NUMBER() OVER (ORDER BY quality DESC NULLS LAST,
              doc_id) - 1 AS BIGINT) AS rank
          FROM q ORDER BY doc_id""",
    // every C4 line rule re-derived from DuckDB's own list ops:
    // terminal punctuation (incl. the typographic close-quote),
    // portable-whitespace word counts, the token-equality javascript
    // screen, both page poisons, and the minLines page rule
    "q_c4_line_filter" ->
      s"""WITH m AS (SELECT doc_id,
            substr(text, 1, 60) || ' ends here.' || chr(10) ||
            'Click here' || chr(10) ||
            'Please enable JavaScript to view the comments powered here.' || chr(10) ||
            substr(text, 61, 40) ||
              CASE WHEN doc_id % 2 = 0 THEN ' and so it ends?'
                   ELSE ' unterminated line' END || chr(10) ||
            CASE WHEN doc_id % 7 = 0
                 THEN 'Lorem Ipsum dolor sit amet consectetur.' ELSE '' END
              || chr(10) ||
            CASE WHEN doc_id % 11 = 0
                 THEN 'function f() { return 1; }' ELSE '' END || chr(10) ||
            'Closing words for doc ' || doc_id ||
              ' arrive at the very end!' AS text
          FROM documents),
          pg AS (SELECT * FROM m
            WHERE POSITION('{' IN text) = 0
              AND POSITION('lorem ipsum' IN LOWER(text)) = 0),
          ln AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM pg),
          kl AS (SELECT doc_id, ls,
              LIST_FILTER(ls, l ->
                (right(l, 1) IN ('.', '!', '?', '"')
                 OR right(l, 1) = chr(8221))
                AND LEN(LIST_FILTER(STRING_SPLIT_REGEX(l,
                  '${graft.functions.GraftFunctions.WsRun}'),
                  x -> x <> '')) >= 5
                AND NOT LIST_CONTAINS(STRING_SPLIT_REGEX(LOWER(l),
                  '${graft.functions.GraftFunctions.WsRun}'),
                  'javascript')) AS kept
            FROM ln)
          SELECT doc_id, ARRAY_TO_STRING(kept, chr(10)) AS text,
            CAST(LEN(kept) AS BIGINT) AS n_lines_kept,
            CAST(LEN(ls) - LEN(kept) AS BIGINT) AS n_lines_dropped
          FROM kl WHERE LEN(kept) >= 3 ORDER BY doc_id""",
    // the five-step cleanup re-derived on DuckDB's OWN nfc_normalize
    // (utf8proc) — an independent UAX #15 implementation — plus the
    // same literal line-ending replaces and the SAME regex pattern
    // text (TextNormalize constants); the messy synthesis spells
    // every codepoint via chr()
    "q_text_normalize" ->
      s"""WITH t AS (
            SELECT doc_id,
              'Cafe' || chr(769) || ' nai' || chr(776) || 've ' ||
              CASE WHEN doc_id % 2 = 0 THEN chr(8491) || ' unit '
                   ELSE chr(8486) || ' ohm ' END ||
              substr(text, 1, 60) ||
              chr(160) || 'tail' || chr(8203) || 'zw' || chr(8195) || 'em' ||
              CASE WHEN doc_id % 3 = 0
                   THEN chr(13) || chr(10) || 'line2' || chr(13) || 'line3'
                   ELSE '' END ||
              CASE WHEN doc_id % 5 = 0 THEN chr(7) || 'bell' || chr(127)
                   ELSE '' END AS messy
            FROM documents),
          c AS (
            SELECT doc_id, messy, ${cleanTextSql("messy")} AS clean
            FROM t)
          SELECT doc_id, clean,
            CAST(length(messy) AS INTEGER) AS n_chars_in,
            CAST(length(clean) AS INTEGER) AS n_chars_out
          FROM c ORDER BY doc_id""",
    // every Gopher shape band re-derived from DuckDB's own string/list
    // ops over the same synthesized multi-line text (the SHARED band
    // builders — gopherRawCte/gopherFeatureSql — also drive the
    // crawl-to-corpus capstone); the composed rule compares the SAME
    // round4 values both engines emit
    "q_gopher_quality" -> {
      val f = gopherFeatureSql
      s"""WITH t AS (
            SELECT doc_id,
              substr(text, 1, 80) || chr(10) ||
              CASE WHEN doc_id % 2 = 0
                   THEN '- bullet item one' || chr(10) ||
                        '- bullet item two' || chr(10)
                   ELSE '' END ||
              CASE WHEN doc_id % 3 = 0
                   THEN 'read more...' || chr(10) ||
                        'snippet' || chr(8230) || chr(10)
                   ELSE '' END ||
              CASE WHEN doc_id % 5 = 0
                   THEN '## section ## 123 456 789' || chr(10)
                   ELSE '' END ||
              '* final ' || substr(text, 81, 40) AS text
            FROM documents),
          fz AS (${gopherRawCte("t")}),
          g AS (
            SELECT doc_id,
              ${f("mean")} AS mean_word_len,
              ${f("sym")} AS symbol_ratio,
              ${f("bullet")} AS bullet_frac,
              ${f("ellip")} AS ellipsis_frac,
              ${f("alpha")} AS alpha_frac
            FROM fz)
          SELECT doc_id, mean_word_len, symbol_ratio, bullet_frac,
            ellipsis_frac, alpha_frac,
            (mean_word_len BETWEEN 3.0 AND 10.0 AND symbol_ratio < 0.1
             AND bullet_frac < 0.9 AND ellipsis_frac < 0.3
             AND alpha_frac > 0.8) AS shape_ok
          FROM g ORDER BY doc_id"""
    },
    // fertility re-derived: the snapshotted LEARNED merges re-applied
    // through the recursive machinery (bpeCtesFrom), then per-lang
    // sums and round4 ratios — identical denominators clamped at 1
    "q_tokenizer_fertility" -> {
      import graft.functions.GraftFunctions.roundPortableSql
      s"""WITH RECURSIVE ${bpeCtesFrom("documents",
            s"""SELECT rank, l, r FROM read_parquet(
                '${SnapshotPaths.tokenDirFor("bpe_fertility")}/*.parquet')""")},
          per_doc AS (
            SELECT d.lang, c.bpe_tokens,
              $wsToks AS words, LENGTH(d.text) AS chars
            FROM documents d JOIN bpe_counts c USING (doc_id)),
          agg AS (
            SELECT lang, COUNT(*) AS n_docs,
              SUM(bpe_tokens) AS bpe_tokens,
              SUM(words) AS ws_tokens, SUM(chars) AS n_chars
            FROM per_doc GROUP BY lang)
          SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
            CAST(bpe_tokens AS BIGINT) AS bpe_tokens,
            ${roundPortableSql(
              "bpe_tokens::DOUBLE / GREATEST(ws_tokens, 1)::DOUBLE", 4)}
              AS fertility,
            ${roundPortableSql(
              "n_chars::DOUBLE / GREATEST(bpe_tokens, 1)::DOUBLE", 4)}
              AS chars_per_token
          FROM agg ORDER BY lang"""
    },
    // the WHOLE NB pipeline re-derived with no snapshot: train-half
    // bigram bucket counts (the orderHash spelling), add-one
    // smoothing, doc-count priors, test-half scoring sums, round4,
    // argmax with the lexicographic tie-break — langs pivoted to the
    // same score_<lang> columns the engine emits (testdata's fixed
    // 5-language set)
    "q_langid_nb" -> {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val pivot = langs.map(l =>
        s"MAX(CASE WHEN f.lang = '$l' THEN f.score END) AS score_$l")
        .mkString(",\n            ")
      s"""WITH ${nbCtes(
            "(SELECT lang, text FROM documents WHERE doc_id % 2 = 0)",
            "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)",
            "nb_")},
          scored AS (
            SELECT f.doc_id, ANY_VALUE(pr.pred_lang) AS pred_lang,
              $pivot
            FROM nb_f f JOIN nb_pred pr ON pr.doc_id = f.doc_id
            GROUP BY f.doc_id)
          -- NULL-text test docs mirror predict's NULL contract: NULL
          -- pred_lang and NULL scores, never a prior-only argmax
          SELECT te.doc_id, s.pred_lang,
            ${langs.map(l => s"s.score_$l").mkString(", ")}
          FROM nb_test te LEFT JOIN scored s ON s.doc_id = te.doc_id
          ORDER BY te.doc_id"""
    },
    // the training TRAJECTORY re-derived: for every learned rank k,
    // re-apply merges 0..k-1 (from the snapshot) over the corpus
    // vocabulary, recount ALL adjacent-pair weights (word-frequency
    // weighted, overlapping adjacencies included — the Sennrich
    // get_stats convention) and recompute the (weight DESC, l, r)
    // argmax — which must equal snapshotted merge k, weight included
    "q_bpe_train" ->
      s"""WITH RECURSIVE
            m AS (SELECT rank, l, r FROM read_parquet(
              '${SnapshotPaths.tokenDirFor("bpe_train")}/*.parquet')),
            wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM (SELECT unnest(string_split(text, ' ')) AS w
                         FROM documents)
                   WHERE w <> '' AND w IS NOT NULL GROUP BY w),
            ks AS (SELECT rank AS k FROM m),
            steps(k, w, cnt, seq, nxt) AS (
              SELECT k, w, cnt,
                '_' || array_to_string(string_split(w, ''), '__') || '_', 0
              FROM wc CROSS JOIN ks
              UNION ALL
              SELECT s.k, s.w, s.cnt,
                replace(s.seq, '_' || m2.l || '__' || m2.r || '_',
                               '_' || m2.l || m2.r || '_'),
                s.nxt + 1
              FROM steps s JOIN m m2 ON m2.rank = s.nxt
              WHERE s.nxt < s.k),
            segs AS (SELECT k, cnt,
                       string_split(trim(seq, '_'), '__') AS syms
                     FROM steps WHERE nxt = k),
            pairs AS (SELECT k, syms[i] AS l, syms[i + 1] AS r, cnt
                      FROM (SELECT k, cnt, syms,
                              unnest(range(1, len(syms))) AS i
                            FROM segs) z),
            agg AS (SELECT k, l, r, CAST(SUM(cnt) AS BIGINT) AS weight
                    FROM pairs GROUP BY k, l, r),
            best AS (SELECT k, l, r, weight FROM agg
                     QUALIFY ROW_NUMBER() OVER (
                       PARTITION BY k ORDER BY weight DESC, l, r) = 1)
          SELECT CAST(k AS INTEGER) AS rank, l, r, weight
          FROM best ORDER BY rank""",
    // the learned table re-APPLIED through the same recursive
    // machinery as the fixture gate (bpeCtesFrom) — merges read back
    // from the snapshot instead of a literal VALUES list
    "q_bpe_train_apply" ->
      s"""WITH RECURSIVE ${bpeCtesFrom("documents",
            s"""SELECT rank, l, r FROM read_parquet(
                '${SnapshotPaths.tokenDirFor("bpe_train_apply")}/*.parquet')""")}
          SELECT doc_id, bpe_tokens
          FROM bpe_counts WHERE doc_id % 10 = 0
          ORDER BY doc_id""",
    // the C4 blocklist rule re-derived: lower-cased portable split,
    // token-equality IN-list filter (word boundaries — 'assassin'
    // cannot trip 'ass'), distinct + sort + join
    "q_blocklist" ->
      s"""WITH b AS (
            SELECT doc_id,
              CASE WHEN text IS NULL THEN []::VARCHAR[]
                   ELSE LIST_SORT(LIST_DISTINCT(LIST_FILTER(
                     STRING_SPLIT_REGEX(LOWER(text),
                       '${graft.functions.GraftFunctions.WsRun}'),
                     x -> x IN ('dup', 'merge', 'window')))) END AS bt
            FROM documents)
          SELECT doc_id, LEN(bt) > 0 AS blocked,
            CAST(LEN(bt) AS BIGINT) AS n_blocked_terms,
            COALESCE(ARRAY_TO_STRING(bt, ','), '') AS blocked_terms
          FROM b ORDER BY doc_id""",
    // the datasheet re-derived from scratch: global counters, exact
    // distinct-md5 dup count, the real-split vocabulary, round6 ratios
    // and the per-language composition (null lang → 'lang_null')
    "q_corpus_stats" ->
      s"""SELECT stat, value FROM (${corpusCardSql("documents")})
          ORDER BY stat""",
    // the release-note view: BOTH versions' contents re-derived from
    // the merge rule (v1 = the created evens; v2 = keep-last of v1 ∪
    // the %3 batch with the appended suffix), a full card computed
    // over each, then the same full-outer 0-defaulted diff — a drifted
    // number in EITHER card or a wrong version read fails the hash
    "q_corpus_stats_diff" -> {
      val card1 = corpusCardSql("v1")
      val card2 = corpusCardSql("v2")
      s"""WITH v1 AS (
            SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 0),
          v2 AS (
            SELECT doc_id, text || ' extra extra' AS text, lang
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id, text, lang FROM documents
            WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0),
          c1 AS ($card1), c2 AS ($card2)
          SELECT stat,
            COALESCE(c1.value, 0.0) AS value_before,
            COALESCE(c2.value, 0.0) AS value_after,
            ${roundPortableSql(
              "COALESCE(c2.value, 0.0) - COALESCE(c1.value, 0.0)", 6)}
              AS delta
          FROM c1 FULL OUTER JOIN c2 USING (stat)
          ORDER BY stat"""
    },
    // the corpus scoring pass re-derived from the engine's model
    // snapshot (full-precision weights; bucket −1 = intercept): same
    // portable split, same md5 bucket hash (salt '/qc' — the
    // Sharding.orderHash spelling), L1-normalized dot, sigmoid, round6
    "q_quality_classifier" ->
      s"""WITH w AS (
            SELECT bucket, weight FROM read_parquet(
              '${SnapshotPaths.tokenDirFor("qc_model")}/*.parquet')
            WHERE bucket >= 0),
          b AS (
            SELECT weight AS intercept FROM read_parquet(
              '${SnapshotPaths.tokenDirFor("qc_model")}/*.parquet')
            WHERE bucket = -1),
          tok AS (
            SELECT doc_id, text,
              LIST_FILTER(STRING_SPLIT_REGEX(text,
                '${graft.functions.GraftFunctions.WsRun}'),
                x -> x <> '') AS ts
            FROM documents),
          occ AS (SELECT doc_id, UNNEST(ts) AS t FROM tok),
          ob AS (
            SELECT doc_id,
              CAST(('0x' || SUBSTR(MD5(t || '/qc'), 1, 15))::BIGINT % 128
                AS INTEGER) AS bucket
            FROM occ),
          dt AS (
            SELECT ob.doc_id, SUM(w.weight) AS s
            FROM ob JOIN w USING (bucket) GROUP BY ob.doc_id)
          SELECT t.doc_id,
            CASE WHEN t.text IS NULL THEN NULL
                 ELSE ${roundPortableSql(
                   """1.0 / (1.0 + EXP(-(COALESCE(dt.s, 0.0)
                      / GREATEST(LEN(t.ts), 1) + b.intercept)))""", 6)}
            END AS p_good
          FROM tok t LEFT JOIN dt ON dt.doc_id = t.doc_id CROSS JOIN b
          ORDER BY t.doc_id""",
    // paragraph dedup re-derived: the same literal split, blank filter,
    // whitespace-normalized md5 keys, corpus-order (doc, pos) first-
    // occurrence rule, and in-order reassembly of the survivors
    "q_paragraph_dedup" ->
      s"""WITH t AS (
            SELECT doc_id,
              LIST_FILTER(STRING_SPLIT_REGEX(text, ' table '),
                x -> TRIM(x) <> '') AS ps
            FROM documents),
          p AS (
            SELECT doc_id, ps,
              UNNEST(RANGE(1, LEN(ps) + 1)) AS i
            FROM t),
          k AS (
            SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ps[i] AS para,
              MD5(TRIM(REGEXP_REPLACE(ps[i],
                '${graft.functions.GraftFunctions.WsRun}', ' ', 'g'))) AS key
            FROM p),
          m AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY key
              ORDER BY doc_id, pos) AS rn
            FROM k)
          SELECT doc_id,
            STRING_AGG(para, ' | ' ORDER BY pos) FILTER (WHERE rn = 1) AS text,
            CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_paras_kept,
            CAST(COUNT(*) FILTER (WHERE rn <> 1) AS BIGINT) AS n_paras_dropped
          FROM m GROUP BY doc_id
          HAVING COUNT(*) FILTER (WHERE rn = 1) > 0
          ORDER BY doc_id""",
    // chunk boundaries re-derived by list slicing: 1-based inclusive
    // DuckDB slices ≡ Spark slice(toks, s+1, 64); range() excludes the
    // end, matching sequence(0, n-1, 48)'s last-start-below-n rule
    "q_text_chunking" ->
      s"""WITH t AS (
            SELECT doc_id,
              LIST_FILTER(STRING_SPLIT_REGEX(text,
                '${graft.functions.GraftFunctions.WsRun}'), x -> x <> '') AS toks
            FROM documents),
          starts AS (
            SELECT doc_id, toks, UNNEST(RANGE(0, LEN(toks), 48)) AS s
            FROM t WHERE LEN(toks) > 0)
          SELECT doc_id,
            CAST(s // 48 AS BIGINT) AS chunk_id,
            ARRAY_TO_STRING(toks[s + 1 : s + 64], ' ') AS chunk_text,
            CAST(LEN(toks[s + 1 : s + 64]) AS BIGINT) AS n_chunk_tokens
          FROM starts ORDER BY doc_id, chunk_id"""
  )
}
