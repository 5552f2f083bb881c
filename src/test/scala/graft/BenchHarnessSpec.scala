package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness itself under test: the round-5 lesson is that an
  * unmeasured measurement tool quietly lies (a swallowed Throwable timed a
  * crashing query as a fast success; single-shot timings let host load
  * fake a regression). The round-6 lesson is that the ARTIFACT can lie by
  * truncation: the driver keeps only a ~2000-char log tail, and the r6
  * single-line JSON outgrew it — so the final contract line's byte budget
  * is a tested invariant, rendered over the REAL query key set in the
  * worst case (every query failing).
  */
class BenchHarnessSpec extends AnyFunSuite {
  import BenchHarness._

  test("a deliberately broken query visibly sets err and never a phantom success") {
    val st = measure(3)(() => throw new IllegalStateException("boom"))
    assert(st.okRuns == 0)
    assert(st.times.isEmpty)
    assert(st.failTimes.size == 3)
    assert(st.err.exists(e => e.contains("IllegalStateException") && e.contains("boom")))
    // the headline falls back to time-to-failure (parseable, non-negative),
    // while err carries the loud flag
    assert(st.headline >= 0.0)
    val json = jsonLine("/tmp/sf", 3, Seq("q_bad" -> st))
    assert(json.contains(""""q_bad":{"err":"java.lang.IllegalStateException: boom","ok_runs":0}"""))
  }

  test("a flaky-once query keeps real timings AND a visible error") {
    var n = 0
    val st = measure(3) { () =>
      n += 1
      if (n == 1) throw new RuntimeException("first run only")
    }
    assert(st.okRuns == 2)
    assert(st.failTimes.size == 1)
    assert(st.err.exists(_.contains("first run only")))
    assert(st.min.isDefined && st.median.isDefined)
  }

  test("min and median are computed over successful runs (odd and even counts)") {
    val odd = QueryStat(Vector(3.0, 1.0, 2.0), Vector.empty, Vector.empty)
    assert(odd.min.contains(1.0) && odd.median.contains(2.0))
    val even = QueryStat(Vector(4.0, 1.0, 2.0, 3.0), Vector.empty, Vector.empty)
    assert(even.min.contains(1.0) && even.median.contains(2.5))
  }

  test("the three artifact lines split contract / queries / detail correctly") {
    val ok = QueryStat(Vector(1.5, 1.25, 2.0), Vector.empty, Vector.empty)
    val cal = QueryStat(Vector(0.31, 0.25, 0.28), Vector.empty, Vector.empty)
    val calSh = QueryStat(Vector(0.61, 0.55, 0.58), Vector.empty, Vector.empty)
    val contract =
      jsonLine("/root/testdata/sf0.1", 3, Seq("q_ok" -> ok), Some(cal), Some(calSh))
    // contract: headline total, run count, calibration yardstick — and
    // NO per-query map (that's what made r6 truncate)
    assert(contract.contains(""""metric":"total""""))
    assert(contract.contains(""""value":1.2500"""))
    assert(contract.contains(""""unit":"sec""""))
    assert(contract.contains(""""runs_per_query":3"""))
    assert(contract.contains(""""errors":{}"""))
    assert(contract.contains(""""errors_omitted":0"""))
    assert(contract.contains(""""n_queries":1"""))
    assert(contract.contains(""""calibration":[0.2500,0.2800]"""))
    assert(contract.contains(""""calibration_shuffle":[0.5500,0.5800]"""))
    assert(!contract.contains("q_ok"))
    // queries line: the per-query headline map (min of successful runs)
    val ql = queriesLine(Seq("q_ok" -> ok))
    assert(ql.contains(""""metric":"queries""""))
    assert(ql.contains(""""queries":{"q_ok":1.2500}"""))
    // detail line: [min, median] at full precision
    val det = detailLine(3, Seq("q_ok" -> ok))
    assert(det.contains(""""q_ok":[1.2500,1.5000]"""))
    assert(det.contains(""""metric":"detail""""))
  }

  test("calibration is null when the synthetic workload itself failed") {
    val bad = measure(1)(() => throw new RuntimeException("cal broke"))
    val json = jsonLine("/tmp/sf", 1, Seq(), Some(bad), Some(bad))
    assert(json.contains(""""calibration":null"""))
    assert(json.contains(""""calibration_shuffle":null"""))
  }

  test("contract-line error messages are clipped and count-capped; detail keeps them whole") {
    val longMsg = "x" * 500
    val st = QueryStat(Vector.empty, Vector(0.1), Vector(longMsg))
    val json = jsonLine("/tmp/sf", 1, Seq("q" -> st))
    assert(!json.contains(longMsg))
    assert(json.contains("x" * 59 + "…"))
    assert(detailLine(1, Seq("q" -> st)).contains(longMsg))
    // more failures than contractMaxErrors → the overflow is COUNTED,
    // never silently dropped
    val many = (1 to contractMaxErrors + 3).map(i => s"q_$i" -> st)
    val capped = jsonLine("/tmp/sf", 1, many)
    assert(capped.contains(s""""errors_omitted":3"""))
    assert(capped.contains(""""q_1":"""))
    assert(!capped.contains(s""""q_${contractMaxErrors + 1}":"""))
  }

  test("error messages with quotes/newlines stay valid JSON") {
    val st = measure(1)(() => throw new RuntimeException("a \"quoted\"\nmessage"))
    val json = jsonLine("/tmp/sf", 1, Seq("q" -> st))
    assert(json.contains("""a \"quoted\"\nmessage"""))
    assert(!json.contains("\n"))
  }

  test("measure times a working body with the requested run count") {
    val st = measure(3)(() => ())
    assert(st.okRuns == 3 && st.errors.isEmpty)
    assert(st.times.forall(_ >= 0.0))
  }

  test("measureInterleaved pairs each body run with its preceding calibration sample") {
    val ps = measureInterleaved(3)(() => ())(() => ())
    assert(ps.stat.okRuns == 3 && ps.calTimes.size == 3 && ps.pairs.size == 3)
    // a failing body run contributes a cal sample but no pair
    var n = 0
    val flaky = measureInterleaved(3)(() => ()) { () =>
      n += 1; if (n == 2) throw new RuntimeException("boom")
    }
    assert(flaky.stat.okRuns == 2 && flaky.calTimes.size == 3 && flaky.pairs.size == 2)
    // a failing calibration is a missing sample — the body still times
    var m = 0
    val calFlaky = measureInterleaved(3) { () =>
      m += 1; if (m == 1) throw new RuntimeException("cal boom")
    }(() => ())
    assert(calFlaky.stat.okRuns == 3 && calFlaky.calTimes.size == 2 &&
      calFlaky.pairs.size == 2)
    // all runs failing both ways → no normalization, loudly None
    val dead = measureInterleaved(2)(
      () => throw new RuntimeException("c"))(
      () => throw new RuntimeException("b"))
    assert(dead.normalized(0.3).isEmpty)
  }

  test("normalized headline is invariant under uniform host load (the BENCH_r11 failure mode)") {
    // idle host: cal_i ≈ calRef → normalized degrades to the raw min
    val idle = PairedStat(QueryStat(Vector(2.0, 2.2), Vector.empty, Vector.empty),
      Vector(0.3, 0.3), Vector((0.3, 2.0), (0.3, 2.2)))
    assert(math.abs(idle.normalized(0.3).get - 2.0) < 1e-9)
    // loaded host: every pair inflated 4x — raw headline lies 4x,
    // normalized still reports the idle-equivalent time
    val loaded = PairedStat(QueryStat(Vector(8.0, 8.8), Vector.empty, Vector.empty),
      Vector(1.2, 1.2), Vector((1.2, 8.0), (1.2, 8.8)))
    assert(loaded.stat.headline == 8.0)
    assert(math.abs(loaded.normalized(0.3).get - 2.0) < 1e-9)
    // load arriving mid-query (one clean pair, one inflated): both
    // minima land in the quiet run and report its time
    val mixed = PairedStat(QueryStat(Vector(2.0, 8.0), Vector.empty, Vector.empty),
      Vector(0.3, 1.2), Vector((0.3, 2.0), (1.2, 8.0)))
    assert(math.abs(mixed.normalized(0.3).get - 2.0) < 1e-9)
    // anti-correlated noise (q dips while cal spikes, and vice versa):
    // a per-pair product min would report 1.0 (over-correction); the
    // decoupled minima cannot combine one run's luck with another's
    // misfortune and report the true 2.0
    val anti = PairedStat(QueryStat(Vector(2.0, 4.0), Vector.empty, Vector.empty),
      Vector(0.6, 0.3), Vector((0.6, 2.0), (0.3, 4.0)))
    assert(math.abs(anti.normalized(0.3).get - 2.0) < 1e-9)
  }

  test("normalization algebra: uniform-load invariance and idle identity hold for arbitrary pairs") {
    // property over seeded pseudo-random pair sets: for ANY measurement,
    // (a) uniform load cancels exactly — scaling every (cal, q) by the
    // same factor leaves `normalized` unchanged; (b) on a perfectly
    // idle host (cal_i == calRef) `normalized` IS the raw min
    val calRef = 0.3
    (1 to 50).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val pairs = Vector.fill(1 + rnd.nextInt(5))(
        (calRef * (0.5 + rnd.nextDouble()), 0.1 + 10 * rnd.nextDouble()))
      val stat = QueryStat(pairs.map(_._2), Vector.empty, Vector.empty)
      val base = PairedStat(stat, pairs.map(_._1), pairs).normalized(calRef).get
      val f = 0.25 + 4 * rnd.nextDouble()
      val scaled = pairs.map { case (c, q) => (c * f, q * f) }
      val underLoad = PairedStat(
        QueryStat(scaled.map(_._2), Vector.empty, Vector.empty),
        scaled.map(_._1), scaled).normalized(calRef).get
      assert(math.abs(underLoad - base) < 1e-9 * math.max(1.0, base),
        s"seed=$seed f=$f: $underLoad != $base")
      val idlePairs = pairs.map { case (_, q) => (calRef, q) }
      val idle = PairedStat(
        QueryStat(idlePairs.map(_._2), Vector.empty, Vector.empty),
        idlePairs.map(_._1), idlePairs).normalized(calRef).get
      assert(math.abs(idle - idlePairs.map(_._2).min) < 1e-12)
    }
  }

  test("artifact lines carry the normalized column and the pinned reference") {
    val ok = QueryStat(Vector(1.5), Vector.empty, Vector.empty)
    val ql = queriesLine(Seq("q_a" -> ok, "q_b" -> ok),
      Seq("q_a" -> Some(1.25), "q_b" -> None))
    assert(ql.contains(""""queries_norm":{"q_a":1.2500,"q_b":null}"""))
    // without norms the line keeps its r11 shape (no queries_norm key)
    assert(!queriesLine(Seq("q_a" -> ok)).contains("queries_norm"))
    val json = jsonLine("/tmp/sf", 3, Seq("q_a" -> ok),
      normTotal = Some(42.5), calInterleaved = Seq(0.5, 0.3, 0.4),
      normFallback = 2)
    assert(json.contains(""""value_norm":42.5000"""))
    assert(json.contains(""""norm_fallback":2"""))
    assert(json.contains(s""""cal_ref":${"%.4f".formatLocal(java.util.Locale.ROOT, calRefSeconds)}"""))
    assert(json.contains(""""cal_inter":[0.3000,0.4000]"""))
    // no norm → none of the three keys appear (r11-shape contract line)
    val plain = jsonLine("/tmp/sf", 3, Seq("q_a" -> ok))
    assert(!plain.contains("value_norm") && !plain.contains("cal_ref"))
  }

  test("compact queries line: every value, name-sorted, norm-else-raw, adaptive precision") {
    val a = QueryStat(Vector(1.234), Vector.empty, Vector.empty)
    val b = QueryStat(Vector(2.5), Vector.empty, Vector.empty)
    val line = queriesCompactLine(Seq("q_b" -> b, "q_a" -> a),
      Seq("q_a" -> Some(1.0), "q_b" -> None))
    // name-ascending (the r13 reading convention — order and count ride
    // the array itself since the r17 tightening); q_a carries its
    // normalized value, q_b (no norm) falls back to its raw headline
    assert(line.contains(""""nr":[1.00,2.50]"""))
    // adaptive precision: ≥10 s at 0.1 s, ≥100 s whole — ≤4 chars for
    // any sub-1000 value, which is what makes the window bound
    // constructive at 98+ queries (r14 re-tightening)
    val mid = QueryStat(Vector(12.345), Vector.empty, Vector.empty)
    val hund = QueryStat(Vector(123.456), Vector.empty, Vector.empty)
    val big = QueryStat(Vector(12345.678), Vector.empty, Vector.empty)
    assert(queriesCompactLine(Seq("q" -> mid)).contains("[12.3]"))
    assert(queriesCompactLine(Seq("q" -> hund)).contains("[123]"))
    assert(queriesCompactLine(Seq("q" -> big)).contains("[12346]"))
    // format-rounding boundaries: a value in [9.995,10) must NOT render
    // "10.00" (5 chars — the silent byte-bound break), nor [99.95,100)
    // "100.0"; tier cutoffs sit at the rounding edges
    val edge1 = QueryStat(Vector(9.996), Vector.empty, Vector.empty)
    val edge2 = QueryStat(Vector(99.96), Vector.empty, Vector.empty)
    assert(queriesCompactLine(Seq("q" -> edge1)).contains("[10.0]"))
    assert(queriesCompactLine(Seq("q" -> edge2)).contains("[100]"))
  }

  test("compact queries line + contract line fit the driver tail window together over the REAL key set") {
    // the r12 artifact kept 57/84 named rows; the compact line must
    // carry ALL per-query values alongside the worst-case contract line
    // — tested over the real key set at worst-case sub-1000 values
    val wide = QueryStat(Vector(999.9), Vector.empty, Vector.empty)
    val stats = SparkEntry.queries.keys.toSeq.sorted.map(_ -> wide)
    val compact = queriesCompactLine(stats, stats.map(_._1 -> Some(999.9)))
    assert(compact.length + contractLineBudget <= tailWindowBudget,
      s"compact line ${compact.length}B + contract budget $contractLineBudget" +
        s"B exceeds the ~$tailWindowBudget-char driver tail for " +
        s"${stats.size} queries — shrink the rendering or drop to a top-N line")
    assert(!compact.contains("\n"))
  }

  test("contract line fits its budget over the REAL key set with EVERY query failing") {
    // worst case by construction: every SparkEntry query throws (errors
    // map at its count cap), four-digit total, calibration present — if
    // a future round's key set or error plumbing pushes past the budget,
    // THIS fails before BENCH_r{N}.json truncates
    val boom = QueryStat(Vector.empty, Vector(999.99),
      Vector("org.apache.spark.SparkException: " + "y" * 300))
    val stats = SparkEntry.queries.keys.toSeq.sorted.map(_ -> boom)
    val wideCal = QueryStat(Vector(999.99), Vector.empty, Vector.empty)
    val json = jsonLine("/root/testdata/sf0.1", 3, stats,
      Some(wideCal), Some(wideCal),
      normTotal = Some(9999.9999), calInterleaved = Seq(999.99, 999.99))
    info(s"worst-case contract line: ${json.length}B (budget $contractLineBudget)")
    assert(json.length <= contractLineBudget,
      s"contract line ${json.length}B exceeds budget ${contractLineBudget}B " +
        s"for ${stats.size} queries — re-tighten the clipping")
    assert(!json.contains("\n"))
    // the healthy-round line is far smaller still
    val okStats = SparkEntry.queries.keys.toSeq.sorted
      .map(_ -> QueryStat(Vector(9.99), Vector.empty, Vector.empty))
    assert(jsonLine("/root/testdata/sf0.1", 3, okStats).length <= 330)
  }
}
