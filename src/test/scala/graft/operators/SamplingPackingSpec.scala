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

  test("weightedSampleByHash: exact hash-priority top-k, weight-scale-invariant, no global sort") {
    val weighted = Seq.tabulate(300)(i => (i.toLong, (i % 13 + 1).toLong))
      .toDF("doc_id", "weight")
    val got = Sampling.weightedSampleByHash(weighted, "doc_id", "weight", k = 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 40)
    // reference: the same priority computed row-by-row and folded on
    // the driver — the operator must pick exactly the 40 smallest
    val ref = weighted
      .withColumn("h", Sharding.orderHash(col("doc_id"), "weighted"))
      .collect()
      .map(r => (r.getAs[Long]("h").toDouble / r.getAs[Long]("weight"),
        r.getAs[Long]("doc_id")))
      .sorted.take(40).map(_._2).toSet
    assert(got == ref)
    // scale-invariance: priorities are h/w, so scaling EVERY weight by
    // a constant preserves the ranking — the sample only reacts to
    // RELATIVE quality
    val scaled = weighted.withColumn("weight", col("weight") * 1000L)
    assert(Sampling.weightedSampleByHash(scaled, "doc_id", "weight", 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet == got)
    // weight bias: heavier keys overrepresented vs a uniform draw —
    // the top weight class (13) must beat the bottom class (1)
    val byW = Sampling.weightedSampleByHash(weighted, "doc_id", "weight", 100)
      .groupBy("weight").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byW.getOrElse(13L, 0L) > byW.getOrElse(1L, 0L),
      s"weight-13 docs must outnumber weight-1 docs in the sample: $byW")
    // null and non-positive weights are never sampled
    val edgy = Seq((1L, Some(0L)), (2L, Some(-5L)), (3L, None),
      (4L, Some(2L))).toDF("doc_id", "weight")
    assert(Sampling.weightedSampleByHash(edgy, "doc_id", "weight", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(4L))
    // the scale claim: top-k compiles to TakeOrderedAndProject — a
    // per-partition heap + k-sized merge, never a global Sort
    val plan = Sampling.weightedSampleByHash(weighted, "doc_id", "weight", 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted sample must be a distributed top-k:\n$plan")
  }

  test("takeTokenBudget ≡ per-group sequential take, straddle rule, null group/tokens") {
    val mix = Seq.tabulate(300)(i => (i.toLong,
      if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh",
      (i % 29 + 2).toLong)).toDF("doc_id", "lang", "n_tokens")
      .repartition(7) // scrambled input: the operator must impose the order
    val budgets = Map("en" -> 400L, "de" -> 150L)
    val got = Sampling.takeTokenBudget(mix, "doc_id", "lang", "n_tokens",
        budgets, defaultBudget = 90L)
      .select("doc_id", "lang", "n_tokens", "group_start").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // reference: per-group driver fold in (hash, key) order
    val ordered = mix
      .withColumn("h", Sharding.orderHash(col("doc_id"), "budget"))
      .collect()
      .map(r => (r.getString(1), r.getAs[Long]("h"), r.getLong(0), r.getLong(2)))
      .sortBy(t => (t._2, t._3))
    val ref = scala.collection.mutable.Map.empty[Long, (String, Long, Long)]
    val cum = scala.collection.mutable.Map.empty[String, Long]
    ordered.foreach { case (g, _, id, toks) =>
      val start = cum.getOrElse(g, 0L)
      cum.update(g, start + toks)
      if (start < budgets.getOrElse(g, 90L)) ref.update(id, (g, toks, start))
    }
    assert(got == ref.toMap, "kept set + offsets must equal the sequential take")
    // the straddle rule: each group's kept token mass reaches its
    // budget (a floor), and removing the LAST kept doc drops it below
    val massByGroup = got.values.groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sum }
    Seq("en" -> 400L, "de" -> 150L, "zh" -> 90L).foreach { case (g, b) =>
      val lastTok = got.values.filter(_._1 == g).maxBy(_._3)._2
      assert(massByGroup(g) >= b, s"$g budget is a floor")
      assert(massByGroup(g) - lastTok < b, s"$g must stop at the budget")
    }
    // zero budget takes nothing from that group
    val zeroed = Sampling.takeTokenBudget(mix, "doc_id", "lang", "n_tokens",
      Map("en" -> 0L), defaultBudget = 50L)
    assert(zeroed.filter(col("lang") === "en").count() == 0)
    assert(zeroed.filter(col("lang") =!= "en").count() > 0)
    // null group rides the default budget; null tokens consume nothing
    val edgy = Seq((1L, None, Some(5L)), (2L, None, None),
      (3L, Some("en"), Some(4L))).toDF("doc_id", "lang", "n_tokens")
    val e = Sampling.takeTokenBudget(edgy, "doc_id", "lang", "n_tokens",
        Map("en" -> 10L), defaultBudget = 6L)
      .select("doc_id", "group_start").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the null bucket holds 5 total tokens < its 6 budget and the one
    // en doc starts at 0 — every row is kept whichever way the null
    // bucket's hash order falls
    assert(e.keySet == Set(1L, 2L, 3L))
    // narrow second pass: the requested range width survives to output
    val widthPinned = Sampling.takeTokenBudget(mix, "doc_id", "lang",
      "n_tokens", budgets, defaultBudget = 90L, numPartitions = Some(5))
    assert(widthPinned.rdd.getNumPartitions == 5,
      "per-group prefix sum must keep the range width (no global window)")
    assert(widthPinned.select("doc_id", "lang", "n_tokens", "group_start")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap == ref.toMap)
    // empty input: no rows, no crash
    assert(Sampling.takeTokenBudget(mix.limit(0), "doc_id", "lang",
      "n_tokens", budgets).count() == 0)
  }

  test("takeTokenBudget upsample ≡ epoch-replayed sequential take; guard and fallback behavior") {
    val mix = Seq.tabulate(120)(i => (i.toLong,
      if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh",
      (i % 13 + 2).toLong)).toDF("doc_id", "lang", "n_tokens")
      .repartition(5)
    // de gets ~2.5 epochs, en a partial single epoch, zh the default
    val masses = mix.groupBy("lang").agg(sum("n_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = Map("de" -> masses("de") * 5 / 2, "en" -> masses("en") / 2)
    val default = masses("zh") / 3
    val got = Sampling.takeTokenBudget(mix, "doc_id", "lang", "n_tokens",
        budgets, default, upsample = true)
      .select("doc_id", "lang", "n_tokens", "epoch", "group_start").collect()
      .map(r => (r.getLong(0), r.getLong(3)) ->
        (r.getString(1), r.getLong(2), r.getLong(4)))
      .toMap
    // reference: replay the per-group hash-ordered fold epoch by epoch
    val ordered = mix
      .withColumn("h", Sharding.orderHash(col("doc_id"), "budget"))
      .collect()
      .map(r => (r.getString(1), r.getAs[Long]("h"), r.getLong(0), r.getLong(2)))
      .sortBy(t => (t._2, t._3))
    val ref = scala.collection.mutable.Map
      .empty[(Long, Long), (String, Long, Long)]
    masses.keys.foreach { g =>
      val b = budgets.getOrElse(g, default)
      val rows = ordered.filter(_._1 == g)
      var global = 0L
      var epoch = 0L
      while (global < b && rows.nonEmpty) {
        rows.foreach { case (_, _, id, toks) =>
          if (global < b) ref.update((id, epoch), (g, toks, global))
          global += toks
        }
        epoch += 1
      }
    }
    assert(got == ref.toMap,
      "epochs, membership and global offsets must equal the replayed take")
    // de really did repeat: epochs 0..2 present, epoch column dense
    val deEpochs = got.keys.filter(k => got(k)._1 == "de").map(_._2).toSet
    assert(deEpochs == Set(0L, 1L, 2L), s"de epochs were $deEpochs")
    // en stayed single-epoch partial
    assert(got.keys.filter(k => got(k)._1 == "en").map(_._2).toSet == Set(0L))
    // upsample=false on the same over-mass budget: silent single take,
    // no epoch column (the pre-r16 contract, unchanged)
    val flat = Sampling.takeTokenBudget(mix, "doc_id", "lang", "n_tokens",
      budgets, default, upsample = false)
    assert(!flat.columns.contains("epoch"))
    assert(flat.filter(col("lang") === "de").count() ==
      mix.filter(col("lang") === "de").count())
    // the unit-mistake guard fires loudly past maxEpochs
    val e = intercept[IllegalArgumentException] {
      Sampling.takeTokenBudget(mix, "doc_id", "lang", "n_tokens",
        Map("de" -> masses("de") * 1000), default,
        upsample = true, maxEpochs = 10)
    }
    assert(e.getMessage.contains("maxEpochs"))
    // zero-mass group: rows ride once at epoch 0 under a positive budget
    val zm = Seq((1L, "nul", None: Option[Long]), (2L, "nul", None))
      .toDF("doc_id", "lang", "n_tokens")
    val z = Sampling.takeTokenBudget(zm, "doc_id", "lang", "n_tokens",
        Map("nul" -> 100L), upsample = true)
      .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(z.toSet == Set((1L, 0L), (2L, 0L)))
  }

  test("temperatureBudgets: alpha=1 ∝ mass, alpha=0.5 flattens, alpha=0 uniform") {
    // masses: en 90000, de 900, zh 100 (exact squares for clean sqrt)
    val d = Seq(("en", 90000L), ("de", 900L), ("zh", 100L))
      .toDF("lang", "n_tokens")
    val b1 = Sampling.temperatureBudgets(d, "lang", "n_tokens", 10000L, 1.0)
    // proportional: 10000·m/91000, floor
    assert(b1("en") == 9890L && b1("de") == 98L && b1("zh") == 10L)
    val b05 = Sampling.temperatureBudgets(d, "lang", "n_tokens", 10000L, 0.5)
    // sqrt shares 300/30/10 of 340 — exact integer floor division
    assert(b05("en") == 10000L * 300 / 340)
    assert(b05("de") == 10000L * 30 / 340)
    assert(b05("zh") == 10000L * 10 / 340)
    // flattening: the tail's share grew, the head's shrank
    assert(b05("zh") > b1("zh") && b05("en") < b1("en"))
    val b0 = Sampling.temperatureBudgets(d, "lang", "n_tokens", 9000L, 0.0)
    assert(b0.values.toSet == Set(3000L))
  }

  test("temperatureBudgets: null groups excluded, zero mass gets zero, sum ≤ total") {
    val d = Seq(("en", Some(50L)), (null: String, Some(999L)),
      ("de", None), ("fr", Some(30L)))
      .toDF("lang", "n_tokens")
    val b = Sampling.temperatureBudgets(d, "lang", "n_tokens", 1000L, 0.5)
    assert(!b.contains(null))
    assert(b("de") == 0L)
    assert(b.values.sum <= 1000L)
    // composes with takeTokenBudget: every group fills to ≤ its budget
    // (straddle rule: the last kept row may cross it)
    val rows = Seq.tabulate(40)(i =>
      (i.toLong, if (i % 2 == 0) "en" else "fr", 10L))
      .toDF("doc_id", "lang", "n_tokens")
    val bb = Sampling.temperatureBudgets(rows, "lang", "n_tokens", 200L, 0.5)
    val took = Sampling.takeTokenBudget(rows, "doc_id", "lang", "n_tokens", bb)
      .groupBy("lang").agg(max(col("group_start")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    took.foreach { case (g, m) => assert(m < bb(g), s"$g start $m vs ${bb(g)}") }
  }
}
