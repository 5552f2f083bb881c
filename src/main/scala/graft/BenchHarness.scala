package graft

/** The bench measurement core, factored out of [[Bench]] so the harness
  * itself is unit-testable (BenchHarnessSpec): a deliberately broken query
  * must VISIBLY set `err` — the round-5 `timedRun` swallowed `Throwable`,
  * so a crashing query was recorded as a fast success and the bench total
  * IMPROVED. Likewise single-shot timings let a loaded host manufacture a
  * phantom regression (BENCH_r05: 59.4 s driver run vs 37.8 s judge rerun
  * of identical code) — hence ≥3 runs with min + median per query, so a
  * reader can see dispersion instead of guessing.
  */
object BenchHarness {

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

  /** 4-decimal (0.1 ms) timings: full-precision doubles made the JSON
    * line outgrow the driver's log-tail window, truncating its head and
    * breaking the parse — and sub-0.1 ms precision is noise anyway. */
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

  /** The bench artifact as ONE JSON line.
    *
    * Shape (kept tight — the driver tails the log, so every byte of the
    * line competes with parseability):
    *  - `queries`: name → headline seconds (the driver contract, unchanged)
    *  - `detail`:  name → [min, median] over the SUCCESSFUL runs
    *  - `runs_per_query`: the uniform attempt count (per-query deviations
    *    surface through `errors`)
    *  - `errors`: ONLY queries that threw — name → {err, ok_runs}; empty
    *    object when the round is clean, so its mere non-emptiness is the
    *    loud signal
    *  - `value`: sum of headline seconds (same semantic as prior rounds)
    */
  def jsonLine(sfDir: String, runs: Int, stats: Seq[(String, QueryStat)]): String = {
    val qs = stats.map { case (k, st) => s""""${esc(k)}":${r4(st.headline)}""" }
      .mkString("{", ",", "}")
    val detail = stats.collect { case (k, st) if st.okRuns > 0 =>
      s""""${esc(k)}":[${r4(st.min.get)},${r4(st.median.get)}]"""
    }.mkString("{", ",", "}")
    val errors = stats.collect { case (k, st) if st.err.isDefined =>
      s""""${esc(k)}":{"err":"${esc(st.err.get)}","ok_runs":${st.okRuns}}"""
    }.mkString("{", ",", "}")
    val total = stats.map(_._2.headline).sum
    s"""{"metric":"total","value":${r4(total)},"unit":"sec",""" +
      s""""queries":$qs,"runs_per_query":$runs,"detail":$detail,""" +
      s""""errors":$errors,"n_queries":${stats.size},"sf":"${esc(sfDir)}"}"""
  }
}
