package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Trainable language identification — multinomial Naive Bayes over
  * hashed character BIGRAMS, the data-driven upgrade to the 4-list
  * stopword heuristic ([[graft.functions.TextAnalysis.langId]]): the
  * heuristic covers exactly its marker lists; this model learns any
  * language present in a labeled slice (the corpus's own `lang`
  * column, a hand-labeled sample, or a public LID training set) and
  * scores in ONE map-only projection. Char-n-gram NB is the classic
  * LID baseline (Cavnar & Trenkle 1994; fastText's langid starts from
  * the same feature family).
  *
  * Unlike the L-BFGS fit behind [[QualityClassifier]], the NB "fit"
  * is PURE COUNTING — one distributed aggregate, no sample cap, no
  * iteration: per (lang, hash-bucket) bigram counts plus per-lang
  * document counts, folded to `log P(bucket|lang)` with add-one
  * smoothing and `log P(lang)` priors. That also makes it the
  * strongest oracle shape available: the DuckDB gate re-derives the
  * ENTIRE fit from the corpus (not from a snapshot) and re-scores —
  * fit arithmetic, hashing, smoothing, priors, scoring sums and the
  * argmax are all cross-checked end-to-end.
  *
  * Scale shape: fit = one explode → partial-aggregated (lang, bucket)
  * count exchange (≤ langs × buckets rows reach the reducers) + one
  * O(langs) doc-count aggregate, then a bounded langs × buckets
  * driver pull (the model). Scoring = map-only: the log-prob matrix
  * rides the plan as per-lang literals, each document hashes its
  * bigrams ONCE and does one array lookup per (bigram, lang) — zero
  * exchanges, the 100 TB pass is scan-bound.
  */
object LangIdNb {

  /** A fitted model: `langs` sorted ascending (the tie-break order),
    * `logPrior(l)` = ln(docs_l / docs_total), `logProb(l)(b)` =
    * ln((count_{l,b} + 1) / (total_l + buckets)). */
  case class Model(langs: IndexedSeq[String], logPrior: IndexedSeq[Double],
      logProb: IndexedSeq[Array[Double]], buckets: Int) {
    require(langs.nonEmpty, "empty language set")
    require(langs == langs.sorted, "langs must be sorted (tie-break order)")
    require(logPrior.length == langs.length &&
      logProb.length == langs.length &&
      logProb.forall(_.length == buckets), "ragged model")
  }

  /** Character bigrams of `text` (empty for length < 2; NULL for
    * NULL), computed in-row — the CONTRACT reference spelling; the
    * hot paths run the native kernels ([[graft.functions
    * .CharBigramBuckets]]/[[graft.functions.NbLangScores]]), whose
    * per-row loop the spec asserts ≡ this composition (the
    * simhash64-vs-HOF parity posture). */
  private[graft] def charBigrams(text: Column): Column =
    when(text.isNull, lit(null).cast("array<string>"))
      .when(length(text) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(text) - 1),
        i => text.substr(i, lit(2))))

  /** Bigram → bucket by codepoint arithmetic (`cp1·997 + cp2 mod B`),
    * NOT the md5 [[Sharding.orderHash]]: the hash runs once per
    * CHARACTER of the corpus, and an md5 there measured ~6× the whole
    * operator's runtime at 100× scale. Two codepoint reads and a
    * multiply are portable (the [[graft.functions.TextAnalysis
    * .rollingHash]] precedent) and collision quality is ample for a
    * hashing-trick feature space. */
  private[graft] def bucketOf(g: Column, buckets: Int): Column =
    pmod(ascii(g) * lit(997) + ascii(substring(g, 2, 1)),
      lit(buckets)).cast("int")

  /** Fit on a labeled `(langCol, textCol)` relation — one distributed
    * counting pass, no sample bound (see object doc). Rows with NULL
    * lang or text are excluded from the fit. */
  def fit(labeled: DataFrame, langCol: String, textCol: String,
      buckets: Int = 1024, maxLangs: Int = 256): Model = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    require(maxLangs >= 1, s"maxLangs=$maxLangs must be >= 1")
    Seq(langCol, textCol).foreach(c =>
      require(labeled.columns.contains(c), s"column $c absent"))
    val base = labeled
      .filter(col(langCol).isNotNull && col(textCol).isNotNull)
      .select(col(langCol).as("__lang"), col(textCol).as("__text"))
    // the model pull below is langs × buckets — a high-cardinality
    // label column (a domain, an id) would turn it into a corpus-sized
    // driver collect. Fail loudly BEFORE collecting (one O(1)-result
    // aggregate; fit is offline work)
    val nLangs = base.select(countDistinct(col("__lang"))).collect()(0).getLong(0)
    require(nLangs <= maxLangs,
      s"$nLangs distinct labels in $langCol exceeds maxLangs=$maxLangs — " +
        "is this really a language column? Raise maxLangs deliberately if so")
    // ONE corpus pass for BOTH count families: each doc emits a
    // sentinel bucket −1 (its document count) ahead of its bigram
    // buckets, so the (lang, bucket) aggregate carries doc counts and
    // feature counts in the same partially-aggregated exchange —
    // never a second scan just for priors.
    // NO spread seam here (r22, reverting r21): the r21
    // spreadSmallInput on this input measurably PESSIMIZED q_langid_nb
    // (norm 0.30 → 0.53 — the repartition exchange costs more than the
    // parallelism buys on a few-hundred-row labeled fit slice; a
    // width-8 middle ground re-measured no better), and at scale a
    // real labeled corpus gets its parallelism from the scan splits
    // anyway. The explode is partially aggregated map-side, so the
    // exchange after it is ≤ langs × buckets rows regardless.
    val all = base
      .select(col("__lang"),
        explode(concat(array(lit(-1)),
          GraftFunctions.char_bigram_buckets(col("__text"), buckets)))
          .as("__b"))
      .groupBy("__lang", "__b").agg(count(lit(1)).as("__c"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val counts = all.filter(_._1._2 >= 0)
    val docCounts = all.collect { case ((l, -1), c) => (l, c) }
    require(docCounts.nonEmpty, "fit relation has no labeled rows")
    val langs = docCounts.keys.toVector.sorted
    val totalDocs = docCounts.values.sum.toDouble
    val logPrior = langs.map(l => math.log(docCounts(l) / totalDocs))
    val logProb = langs.map { l =>
      val tot = (0 until buckets).map(b =>
        counts.getOrElse((l, b), 0L)).sum.toDouble
      Array.tabulate(buckets)(b =>
        math.log((counts.getOrElse((l, b), 0L) + 1.0) / (tot + buckets)))
    }
    Model(langs, logPrior, logProb, buckets)
  }

  /** Adds `outCol` = argmax-lang plus one `score_<lang>` column per
    * model language (round-4 log-posterior — the values the argmax
    * compares, so the gate pins the arithmetic, not just the winner).
    * Ties break to the lexicographically SMALLEST language. Map-only:
    * bigrams are hashed once per document; NULL text predicts NULL. */
  def predict(docs: DataFrame, textCol: String, model: Model,
      outCol: String = "pred_lang"): DataFrame = {
    require(docs.columns.contains(textCol), s"column $textCol absent")
    (Seq(outCol) ++ model.langs.map("score_" + _)).foreach(c =>
      require(!docs.columns.contains(c),
        s"output column $c already present in ${docs.columns.mkString(",")}"))
    // ONE native kernel pass per row computes every language's
    // log-posterior (codegen; the interpreted HOF spelling measured
    // ~2.4× the operator's total at 100× corpus)
    val kernel = new graft.functions.NbKernel(
      model.logPrior.toArray, model.logProb.toArray, model.buckets)
    // round ONCE over the kernel's score array; the argmax rides the
    // array (array_max + first-position lookup into the sorted lang
    // list — first position IS the lexicographic tie-break), keeping
    // the plan O(langs) in expression nodes. The earlier folded-when
    // spelling re-referenced every score column per chain link —
    // O(langs²) plan width (r17 verdict nit).
    val rounded = transform(
      GraftFunctions.nb_lang_scores(col(textCol), kernel),
      s => GraftFunctions.roundPortable(s, 4))
    val langsLit = array(model.langs.map(lit(_)): _*)
    val pred = element_at(langsLit, array_position(rounded, array_max(rounded)).cast("int"))
    val withScores = model.langs.zipWithIndex.foldLeft(docs) {
      case (d, (lang, i)) =>
        d.withColumn("score_" + lang, element_at(rounded, i + 1))
    }
    withScores.withColumn(outCol,
      when(col(textCol).isNull, lit(null).cast("string")).otherwise(pred))
  }
}
