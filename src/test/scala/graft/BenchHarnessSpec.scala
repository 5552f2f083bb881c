package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness itself under test: the round-5 lesson is that an
  * unmeasured measurement tool quietly lies (a swallowed Throwable timed a
  * crashing query as a fast success; single-shot timings let host load
  * fake a regression). */
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

  test("jsonLine keeps the driver contract and adds detail/errors/runs") {
    val ok = QueryStat(Vector(1.5, 1.25, 2.0), Vector.empty, Vector.empty)
    val json = jsonLine("/root/testdata/sf0.1", 3, Seq("q_ok" -> ok))
    // contract: queries map carries plain seconds; total sums them
    assert(json.contains(""""queries":{"q_ok":1.2500}"""))
    assert(json.contains(""""value":1.2500"""))
    assert(json.contains(""""unit":"sec""""))
    // new metadata: [min, median], uniform run count, empty errors object
    assert(json.contains(""""detail":{"q_ok":[1.2500,1.5000]}"""))
    assert(json.contains(""""runs_per_query":3"""))
    assert(json.contains(""""errors":{}"""))
    assert(json.contains(""""n_queries":1"""))
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
}
