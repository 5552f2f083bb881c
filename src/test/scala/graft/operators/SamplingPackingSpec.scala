package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq.tabulate(200)(i =>
    (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh"))
    .toDF("doc_id", "lang")

  test("sampleByHash: deterministic, stable under corpus growth, near-target rate") {
    val s1 = Sampling.sampleByHash(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // deterministic: identical on re-run
    val s2 = Sampling.sampleByHash(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    // stable: growing the corpus keeps every old key's decision (the
    // no-leakage property — hash of key, not position or RNG state)
    val grown = Seq.tabulate(400)(i => (i.toLong, "en")).toDF("doc_id", "lang")
    val s3 = Sampling.sampleByHash(grown, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s3.filter(_ < 200) == s1)
    // rate lands near the target (hash uniformity; 200 keys, ±15 abs)
    assert(math.abs(s1.size - 60) <= 15, s"got ${s1.size} of 200 at 0.3")
    // different salt = independent decision stream
    val other = Sampling.sampleByHash(docs, "doc_id", 0.3, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != s1)
    // the filter is a scan-level predicate: no shuffle in the plan
    val plan = Sampling.sampleByHash(docs, "doc_id", 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("stratifiedSampleByHash applies per-stratum rates; withSplit partitions every key exactly once") {
    val strat = Sampling.stratifiedSampleByHash(docs, "doc_id", "lang",
      Map("en" -> 1.0, "zh" -> 0.0), defaultFraction = 0.5)
    val byLang = strat.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("en", 0L) == 67L) // 1.0 keeps every en doc
    assert(!byLang.contains("zh"))            // 0.0 drops every zh doc
    assert(byLang.getOrElse("de", 0L) > 10 && byLang("de") < 57) // ~0.5

    val split = Sampling.withSplit(docs, "doc_id", valFraction = 0.2, testFraction = 0.2)
    assert(split.count() == 200) // projection: no row gained or lost
    val sets = split.groupBy("split").agg(collect_set(col("doc_id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(sets.keySet.subsetOf(Set("train", "val", "test")))
    // disjoint and exhaustive — the leakage-safety contract
    assert(sets.values.map(_.size).sum == 200)
    assert(sets.values.flatten.toSet.size == 200)
  }

  test("withPackingBins ≡ global cumulative sum, with no single-partition exchange") {
    val toks = Seq.tabulate(500)(i => (i.toLong, (i % 37 + 3).toLong))
      .toDF("doc_id", "n_tokens")
      .repartition(8) // scrambled input: the operator must impose the order
    val packed = Packing.withPackingBins(toks, "doc_id", "n_tokens", budget = 100)
      .orderBy("doc_id").collect()
    // reference: sequential fold on the driver
    var cum = 0L
    Seq.tabulate(500)(i => (i % 37 + 3).toLong).zipWithIndex.foreach {
      case (n, i) =>
        val r = packed(i)
        assert(r.getAs[Long]("doc_id") == i.toLong)
        assert(r.getAs[Long]("start_offset") == cum, s"doc $i")
        assert(r.getAs[Long]("bin") == cum / 100)
        assert(r.getAs[Long]("bin_offset") == cum % 100)
        cum += n
    }
    // the scale claim: the only shuffle is the range partitioning
    // inside the materialization; the second pass is narrow. The output
    // is RDD-backed so its explain cannot show exchanges — instead pin
    // that the requested width SURVIVES to the output: a reintroduced
    // global window, coalesce(1), or re-shuffle would change it.
    val widthPinned = Packing.withPackingBins(
      toks, "doc_id", "n_tokens", 100, numPartitions = Some(5))
    assert(widthPinned.rdd.getNumPartitions == 5,
      "prefix-sum output must keep the range-partition width (narrow second pass)")
    // and the widened result is still the exact global cumsum
    assert(widthPinned.agg(max("start_offset")).head.getLong(0) ==
      packed.map(_.getAs[Long]("start_offset")).max)
    // null token counts pack as 0 tokens, keeping their stream slot
    val withNull = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("doc_id", "n_tokens")
    val np = Packing.withPackingBins(withNull, "doc_id", "n_tokens", 100)
      .orderBy("doc_id").collect()
    assert(np.map(_.getAs[Long]("start_offset")).toSeq == Seq(0L, 5L, 5L))
    // empty input: no rows, no crash
    assert(Packing.withPackingBins(toks.limit(0), "doc_id", "n_tokens", 100).count() == 0)
  }
}
