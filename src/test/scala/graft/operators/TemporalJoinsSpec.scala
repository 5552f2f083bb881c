package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Left: events per key. Right: states per key. Hand-built so every
    * expected match is obvious by inspection. */
  private lazy val left: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a", ts("2024-01-01 10:00:00")), // after s2
      (2L, "a", ts("2024-01-01 08:00:00")), // exactly at s1 (inclusive)
      (3L, "a", ts("2024-01-01 07:00:00")), // before any state -> null
      (4L, "b", ts("2024-01-01 12:00:00")), // b has one state at 09:00
      (5L, "c", ts("2024-01-01 12:00:00"))  // no states for c -> null
    ).toDF("event_id", "k", "t")
  }

  private lazy val right: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", ts("2024-01-01 08:00:00"), 10L), // s1
      ("a", ts("2024-01-01 09:00:00"), 20L), // s2
      ("b", ts("2024-01-01 09:00:00"), 30L)
    ).toDF("rk", "rt", "state")
  }

  private def matches(df: DataFrame): Map[Long, Option[Long]] =
    df.collect().map(r => r.getAs[Long]("event_id") ->
      Option(r.getAs[Any]("state")).map(_.asInstanceOf[Long])).toMap

  test("asofJoin backward: nearest at-or-before, null when none") {
    val out = TemporalJoins.asofJoin(left, right, "k", "rk", "t", "rt",
      Seq("state"))
    assert(out.columns.toSeq == Seq("event_id", "k", "t", "state"))
    assert(matches(out) == Map(
      1L -> Some(20L), // 10:00 sees s2 (09:00)
      2L -> Some(10L), // equal time matches (inclusive)
      3L -> None, 4L -> Some(30L), 5L -> None))
  }

  test("asofJoin forward: nearest at-or-after") {
    val out = TemporalJoins.asofJoin(left, right, "k", "rk", "t", "rt",
      Seq("state"), direction = "forward")
    assert(matches(out) == Map(
      1L -> None,       // 10:00 — no later state for a
      2L -> Some(10L),  // equal time matches (inclusive)
      3L -> Some(10L),  // 07:00 -> next is s1 (08:00), not s2
      4L -> None, 5L -> None))
  }

  test("asofJoin tolerance: matches beyond the horizon are nulled") {
    val out = TemporalJoins.asofJoin(left, right, "k", "rk", "t", "rt",
      Seq("state"), toleranceMicros = Some(3600000000L)) // 1 hour
    assert(matches(out) == Map(
      1L -> Some(20L), // 1 h back exactly — inclusive
      2L -> Some(10L), // 0 back
      3L -> None,
      4L -> None,      // match is 3 h back — out of tolerance
      5L -> None))
  }

  test("asofJoin forward + tolerance: the delta is measured forward") {
    // forward deltas are rt - t: a sign flip would null every forward
    // match (negative ≤ tol always holds, so the flip instead shows as
    // out-of-tolerance matches surviving; both directions pinned here)
    val out = TemporalJoins.asofJoin(left, right, "k", "rk", "t", "rt",
      Seq("state"), toleranceMicros = Some(1800000000L), // 30 min
      direction = "forward")
    assert(matches(out) == Map(
      1L -> None,      // no later state at all
      2L -> Some(10L), // exact-time match, delta 0
      3L -> None,      // next state is 1 h ahead — beyond 30 min
      4L -> None, 5L -> None))
    val wide = TemporalJoins.asofJoin(left, right, "k", "rk", "t", "rt",
      Seq("state"), toleranceMicros = Some(3600000000L), // 1 hour
      direction = "forward")
    assert(matches(wide)(3L) == Some(10L)) // 1 h ahead exactly — inclusive
  }

  test("asofJoin: a payload column named __rt is rejected up front") {
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(left, right.withColumnRenamed("state", "__rt"),
        "k", "rk", "t", "rt", Seq("__rt"))
    }
  }

  test("asofJoin: same-(key,time) right rows resolve to the greatest payload") {
    import spark.implicits._
    val dupes = Seq(
      ("a", ts("2024-01-01 08:00:00"), 7L),
      ("a", ts("2024-01-01 08:00:00"), 9L),
      ("a", ts("2024-01-01 08:00:00"), 3L)
    ).toDF("rk", "rt", "state")
    val out = TemporalJoins.asofJoin(
      left.filter(col("event_id") === 1L), dupes, "k", "rk", "t", "rt",
      Seq("state"))
    assert(matches(out) == Map(1L -> Some(9L)))
  }

  test("asofJoin: null right keys/times never match; null left time matches nothing") {
    import spark.implicits._
    val dirty = Seq(
      (null.asInstanceOf[String], ts("2024-01-01 06:00:00"), 88L),
      ("a", null.asInstanceOf[Timestamp], 99L),
      ("a", ts("2024-01-01 08:00:00"), 10L)
    ).toDF("rk", "rt", "state")
    val nullT = Seq((6L, "a", null.asInstanceOf[Timestamp]))
      .toDF("event_id", "k", "t")
    val out = TemporalJoins.asofJoin(left.unionByName(nullT), dirty,
      "k", "rk", "t", "rt", Seq("state"))
    val m = matches(out)
    assert(m(1L) == Some(10L) && m(2L) == Some(10L))
    assert(m(3L).isEmpty && m(5L).isEmpty && m(6L).isEmpty)
  }

  test("asofJoin plan: exactly one exchange, no join operator at all") {
    val out = TemporalJoins.asofJoin(left, right, "k", "rk", "t", "rt",
      Seq("state"))
    val plan = out.queryExecution.executedPlan.toString
    val shuffles = "Exchange ".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly 1 exchange:\n$plan")
    assert(!plan.contains("Join"), s"asof must be a window, not a join:\n$plan")
  }

  test("asofJoin: collision and reserved-name guards fail loudly") {
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(left, right.withColumnRenamed("state", "t"),
        "k", "rk", "t", "rt", Seq("t"))
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(left.withColumnRenamed("event_id", "__k"),
        right, "k", "rk", "t", "rt", Seq("state"))
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(left, right, "k", "rk", "t", "rt", Seq("state"),
        direction = "sideways")
    }
  }

  private lazy val intervals: DataFrame = {
    import spark.implicits._
    Seq(
      // [08:00, 11:30) — spans several 1h buckets
      ("a", ts("2024-01-01 08:00:00"), ts("2024-01-01 11:30:00"), 100L),
      ("b", ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), 200L),
      // degenerate: end == start — matches nothing
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 300L)
    ).toDF("ik", "start", "end", "ival")
  }

  test("pointInIntervalJoin: [start, end) containment, multi-bucket intervals") {
    val out = TemporalJoins.pointInIntervalJoin(
      left, intervals, "k", "t", "ik", "start", "end",
      bucketMicros = 3600000000L)
    val pairs = out.select("event_id", "ival").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // e1 (a, 10:00) in [08:00,11:30) ✓; e2 (a, 08:00) at start ✓ (inclusive)
    // e3 (a, 07:00) before ✗; e4 (b, 12:00) at end of b's interval ✗ (exclusive)
    assert(pairs == Set((1L, 100L), (2L, 100L)))
    // no duplicate pairs even though interval 100 spans 4 buckets
    assert(out.count() == 2)
  }

  test("pointInIntervalJoin: end-exclusive boundary and bucket-edge alignment") {
    import spark.implicits._
    val pts = Seq(
      (10L, "b", ts("2024-01-01 11:59:59")), // last instant inside
      (11L, "b", ts("2024-01-01 12:00:00"))  // exactly end — excluded
    ).toDF("event_id", "k", "t")
    val out = TemporalJoins.pointInIntervalJoin(
      pts, intervals, "k", "t", "ik", "start", "end",
      bucketMicros = 3600000000L)
    assert(out.select("event_id").collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("pointInIntervalJoin plan: equi-join on (key, bucket), no nested loop") {
    val out = TemporalJoins.pointInIntervalJoin(
      left, intervals, "k", "t", "ik", "start", "end",
      bucketMicros = 3600000000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must be an equi-join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash/sort-merge equi-join:\n$plan")
  }

  test("pointInIntervalJoin: oversized interval fails loudly, not silently") {
    import spark.implicits._
    val huge = Seq(("a", ts("2024-01-01 00:00:00"), ts("2034-01-01 00:00:00"), 1L))
      .toDF("ik", "start", "end", "ival")
    val ex = intercept[Exception] {
      TemporalJoins.pointInIntervalJoin(
        left, huge, "k", "t", "ik", "start", "end",
        bucketMicros = 3600000000L, maxBucketsPerInterval = 100).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("spans more than")), ex.toString)
  }

  test("pointInIntervalJoin: pre-epoch timestamps bucket by true floor division") {
    import spark.implicits._
    // negative epoch micros: truncating division would round TOWARD
    // zero and put 23:30 and 00:30 in the same bucket as their
    // intervals only if floor semantics hold
    val pts = Seq(
      (20L, "a", ts("1969-12-31 23:30:00")),
      (21L, "a", ts("1970-01-01 00:30:00"))
    ).toDF("event_id", "k", "t")
    val ivs = Seq(
      ("a", ts("1969-12-31 23:00:00"), ts("1970-01-01 00:00:00"), 1L),
      ("a", ts("1970-01-01 00:00:00"), ts("1970-01-01 01:00:00"), 2L)
    ).toDF("ik", "start", "end", "ival")
    val out = TemporalJoins.pointInIntervalJoin(
      pts, ivs, "k", "t", "ik", "start", "end", bucketMicros = 3600000000L)
    val pairs = out.select("event_id", "ival").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((20L, 1L), (21L, 2L)))
  }

  test("pointInIntervalJoin: shared column names rejected") {
    intercept[IllegalArgumentException] {
      TemporalJoins.pointInIntervalJoin(
        left, intervals.withColumnRenamed("ival", "event_id"),
        "k", "t", "ik", "start", "end")
    }
  }
}
