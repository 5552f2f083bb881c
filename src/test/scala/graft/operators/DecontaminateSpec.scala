package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // Eval suite: two items, the second deliberately the SMALLEST shingle
  // set (drives minEvalShingles). Corpus: doc 10 embeds eval 1 verbatim
  // (containment 1.0), doc 11 half-overlaps eval 2, doc 12-13 clean.
  private def eval = Seq(
    (1L, "what is the capital of france paris of course"),
    (2L, "two plus two equals four")
  ).toDF("eval_id", "text")

  private def corpus = Seq(
    (10L, "trivia dump begins what is the capital of france paris of course and more"),
    (11L, "two plus two equals five actually"),
    (12L, "completely unrelated training document about catalyst optimizer rules"),
    (13L, "another clean doc mentioning shuffle exchanges and broadcast joins")
  ).toDF("doc_id", "text")

  test("buildEvalBloom: measured sizing, min eval size, no false negatives") {
    val bloom = Decontaminate.buildEvalBloom(eval, "eval_id", "text", n = 3)
    // eval 1: 9 tokens → 7 distinct 3-gram shingles; eval 2: 5 → 3;
    // sizing is an HLL upper bound (padded, floored at 64)
    assert(bloom.nShingles >= 10L)
    assert(bloom.minEvalShingles == 3L)
    // NO false negatives: every true eval shingle must probe true
    val evalShingles = TextDedup.withShingles(eval, "eval_id", "text", 3)
      .select(explode(col("shingles")).as("s")).distinct()
      .as[String].collect()
    assert(evalShingles.length == 10)
    assert(evalShingles.forall(bloom.kernel.mightContain))
  }

  test("bloom_hit_count expression: counts, null array, null elements") {
    import graft.functions.GraftFunctions._
    val bloom = Decontaminate.buildEvalBloom(eval, "eval_id", "text", n = 3)
    val hits = corpus
      .select(col("doc_id"),
        bloom_hit_count(word_shingles(col("text"), 3), bloom.kernel).as("h"))
      .as[(Long, Int)].collect().toMap
    // doc 10 contains all 7 shingles of eval 1 (hit count ≥ 7 — fp may add)
    assert(hits(10L) >= 7)
    // doc 11 shares exactly "two plus two", "plus two equals" (2 true hits)
    assert(hits(11L) >= 2)
    // null array → null out (not 0, not a crash)
    val n = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(bloom_hit_count(word_shingles(col("text"), 3), bloom.kernel))
    assert(n.collect().head.isNullAt(0))
    // null elements inside the array are skipped
    val withNull = spark.sql("SELECT array('x y z', CAST(NULL AS STRING)) AS a")
      .select(bloom_hit_count(col("a"), bloom.kernel).as("h"))
    assert(!withNull.collect().head.isNullAt(0))
  }

  test("neededHits: the cut is a valid lower bound and never zero") {
    assert(Decontaminate.neededHits(0.5, 3L) == 2L)  // ceil(1.5)
    assert(Decontaminate.neededHits(0.5, 4L) == 2L)
    assert(Decontaminate.neededHits(0.0, 100L) == 1L) // floor at 1
    assert(Decontaminate.neededHits(1.0, 7L) == 7L)
    // the float-ceil trap: IEEE 0.07 × 100 = 7.000000000000001, whose
    // ceil (8) would DROP a doc at exactly-threshold containment 7/100
    // — the cut must mirror the verify join's double division instead
    assert(Decontaminate.neededHits(0.07, 100L) == 7L)
    assert(7.0 / 100.0 >= 0.07) // the verify-side compare it must admit
    // exhaustive consistency: for every (t, n) probed, (needed-1)/n
    // fails the verify compare and needed/n rounds consistently
    for (t <- Seq(0.01, 0.07, 0.1, 1.0 / 3.0, 0.5, 0.66, 0.99);
         n <- 1L to 200L) {
      val h = Decontaminate.neededHits(t, n)
      assert(h >= 1 && h <= n.max(1))
      if (h > 1) assert((h - 1).toDouble / n.toDouble < t,
        s"needed=$h not minimal for t=$t n=$n")
    }
  }

  test("bloomPrefilter keeps every truly contaminated doc, passes columns through") {
    val bloom = Decontaminate.buildEvalBloom(eval, "eval_id", "text", n = 3)
    val kept = Decontaminate.bloomPrefilter(corpus, "text", bloom, 0.5)
    assert(kept.columns.toSeq == corpus.columns.toSeq)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    // exact result at threshold 0.5: doc 10 (1.0 vs eval 1), doc 11
    // (2/3 ≈ 0.667 vs eval 2) — both MUST survive phase 1
    assert(Set(10L, 11L).subsetOf(ids))
  }

  test("bloomDecontaminate ≡ crossContainmentPairs (the exactness contract)") {
    val exact = TextDedup.crossContainmentPairs(
        corpus, "doc_id", "text", eval, "eval_id", "text", n = 3, threshold = 0.5)
      .orderBy("corpus_id", "eval_id").collect()
    val bloomed = Decontaminate.bloomDecontaminate(
        corpus, "doc_id", "text", eval, "eval_id", "text", n = 3, threshold = 0.5)
      .orderBy("corpus_id", "eval_id").collect()
    assert(bloomed.toSeq == exact.toSeq)
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((10L, 1L), (11L, 2L)))
  }

  test("bloomDecontaminate ≡ exact on testdata (the q_decontaminate fixture)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val c = docs.filter(col("doc_id") >= 100)
    val e = docs.filter(col("doc_id") < 100)
    val exact = TextDedup.crossContainmentPairs(c, "doc_id", "text",
        e, "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("corpus_id", "eval_id").collect()
    val bloomed = Decontaminate.bloomDecontaminate(c, "doc_id", "text",
        e, "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("corpus_id", "eval_id").collect()
    assert(exact.nonEmpty) // fixture must actually exercise the operator
    assert(bloomed.toSeq == exact.toSeq)
  }

  test("realized false-positive rate is near the requested fpp") {
    val bloom = Decontaminate.buildEvalBloom(eval, "eval_id", "text",
      n = 3, fpp = 0.01)
    // probe 10k strings that are definitely not eval shingles
    val falseHits = (0 until 10000)
      .count(i => bloom.kernel.mightContain(s"not-a-shingle-$i"))
    // 1% nominal; allow generous slack for a tiny filter (11 elements)
    assert(falseHits < 300, s"fp rate ${falseHits / 10000.0} >> fpp 0.01")
  }

  test("phase-1 selectivity: clean corpus rows are dropped before the verify join") {
    // 200 clean docs + the 2 contaminated ones: the candidate set the
    // verify join sees must be ~2, not 202 — the operator's reason to
    // exist (Bloom fp could admit a stray clean doc; allow a little)
    val clean = spark.range(100, 300)
      .select(col("id").as("doc_id"),
        concat(lit("clean filler document number "), col("id").cast("string"),
          lit(" about distributed query planning and executor memory")).as("text"))
    val big = corpus.union(clean)
    val bloom = Decontaminate.buildEvalBloom(eval, "eval_id", "text", n = 3)
    val nCandidates =
      Decontaminate.bloomPrefilter(big, "text", bloom, 0.5).count()
    assert(nCandidates >= 2 && nCandidates <= 10,
      s"prefilter admitted $nCandidates of 204 — selectivity lost")
  }

  test("save/load round-trip: decontaminateAgainstIndex ≡ in-flight path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam").toString
    Decontaminate.saveDecontaminationIndex(eval, "eval_id", "text",
      s"$dir/idx", n = 3, threshold = 0.5)
    val idx = Decontaminate.loadDecontaminationIndex(spark, s"$dir/idx")
    assert(idx.bloom.n == 3 && idx.threshold == 0.5)
    assert(idx.bloom.minEvalShingles == 3L)
    val fromIndex = Decontaminate.decontaminateAgainstIndex(
        corpus, "doc_id", "text", idx)
      .orderBy("corpus_id", "eval_id").collect()
    val inFlight = Decontaminate.bloomDecontaminate(
        corpus, "doc_id", "text", eval, "eval_id", "text",
        n = 3, threshold = 0.5)
      .orderBy("corpus_id", "eval_id").collect()
    assert(fromIndex.toSeq == inFlight.toSeq)
  }

  test("prefilter plan is map-only: no exchange, no join, no broadcast of strings") {
    val bloom = Decontaminate.buildEvalBloom(eval, "eval_id", "text", n = 3)
    val plan = Decontaminate.bloomPrefilter(corpus, "text", bloom, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"phase 1 must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"phase 1 must not join:\n$plan")
  }
}
