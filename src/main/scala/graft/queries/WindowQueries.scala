package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{roundPortable, roundPortableSql}
import graft.operators.Windows
import graft.sources.Scan

/** Event-time window queries over `events` (batch forms; streaming twins
  * in graft.streaming), plus the JSON-props extraction scalar op. All
  * oracle-checked.
  */
object WindowQueries {

  type Q = (SparkSession, String) => DataFrame

  val tumblingHourly: Q = (s, dir) =>
    Windows.tumbling(Scan.table(s, dir, "events"), "ts", 3600,
        Seq("event_type"),
        Seq(count(lit(1)).as("records"),
          roundPortable(coalesce(sum(col("value")), lit(0.0)), 4).as("sum_value")))
      .orderBy(col("window_start"), col("event_type"))

  val slidingHourHalf: Q = (s, dir) =>
    Windows.sliding(Scan.table(s, dir, "events"), "ts", 3600, 1800,
        Seq("event_type"),
        Seq(count(lit(1)).as("records"),
          roundPortable(coalesce(sum(col("value")), lit(0.0)), 4).as("sum_value")))
      .orderBy(col("window_start"), col("event_type"))

  val sessionsPerUser: Q = (s, dir) =>
    Windows.sessionize(Scan.table(s, dir, "events"), "ts", "user_id", 1800,
        Seq(count(lit(1)).as("records"),
          roundPortable(coalesce(sum(col("value")), lit(0.0)), 4).as("sum_value")))
      .withColumn("session_seq", col("session_seq").cast("long"))
      .orderBy(col("user_id"), col("session_seq"))

  /** The streaming engine under the driver gate: the SAME events flow
    * through the actual streaming path — file source → `session_window`
    * with watermark → `Trigger.AvailableNow` into a memory sink — and the
    * read-back result is oracled with gap-based session SQL. Complete
    * mode, because append+watermark never emits the final open window
    * under AvailableNow (all sessions must surface to match batch). */
  val streamSessions: Q = (s, dir) => {
    import graft.streaming.StreamingOps
    val agg = StreamingOps.sessionAgg(
      StreamingOps.readEventsStream(s, dir), "30 minutes", "2 hours")
    StreamingOps.runAvailableNow(agg, "graft_q_stream_sessions",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"),
        roundPortable(coalesce(col("total_value"), lit(0.0)), 4).as("total_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** The streaming spellings of tumbling/sliding windows under the SAME
    * driver gate as their batch twins: file source → `window()` with
    * watermark → `Trigger.AvailableNow` → memory sink, read back and
    * oracled with the identical epoch-aligned bucket SQL. Complete mode
    * for the same reason as [[streamSessions]]: append+watermark never
    * emits the final open windows under AvailableNow, and all windows
    * must surface to match batch. Before this entry, a regression in the
    * streaming execution of these two shapes was invisible — only the
    * batch operator (`Windows.tumbling`/`sliding`) was hash-gated. */
  val streamTumbling: Q = (s, dir) => {
    import graft.streaming.StreamingOps
    val agg = StreamingOps.tumblingCounts(
      StreamingOps.readEventsStream(s, dir), "1 hour", "2 hours")
    StreamingOps.runAvailableNow(agg, "graft_q_stream_tumbling",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      .select(col("window_start"), col("event_type"),
        col("n").as("records"),
        roundPortable(coalesce(col("total_value"), lit(0.0)), 4).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val streamSliding: Q = (s, dir) => {
    import graft.streaming.StreamingOps
    val agg = StreamingOps.slidingCounts(
      StreamingOps.readEventsStream(s, dir), "1 hour", "30 minutes", "2 hours")
    StreamingOps.runAvailableNow(agg, "graft_q_stream_sliding",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      .select(col("window_start"), col("event_type"),
        col("n").as("records"),
        roundPortable(coalesce(col("total_value"), lit(0.0)), 4).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** The keyed-state streaming path (`mapGroupsWithState`) under the
    * driver gate: per-user running totals driven by `AvailableNow` over
    * the events file source. One micro-batch ⇒ the emitted state equals
    * the plain batch GROUP BY — which is exactly what the oracle checks,
    * through the real state-store execution path. Update mode is the
    * one mapGroupsWithState supports. */
  val streamRunningTotals: Q = (s, dir) => {
    import graft.streaming.StreamingOps
    val totals = StreamingOps.runningUserTotals(
        StreamingOps.readEventsStream(s, dir))
      .toDF("user_id", "n_events", "total_value")
    StreamingOps.runAvailableNow(totals, "graft_q_stream_running_totals",
        org.apache.spark.sql.streaming.OutputMode.Update())
      .select(col("user_id"), col("n_events"),
        roundPortable(col("total_value"), 4).as("total_value"))
      .orderBy(col("user_id"))
  }

  val jsonPropsExtract: Q = (s, dir) =>
    Scan.table(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("records"),
        coalesce(sum(col("k")), lit(0L)).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val queries: ListMap[String, Q] = ListMap(
    "q_window_tumbling" -> tumblingHourly,
    "q_window_sliding" -> slidingHourHalf,
    "q_window_sessions" -> sessionsPerUser,
    "q_stream_sessions" -> streamSessions,
    "q_stream_tumbling" -> streamTumbling,
    "q_stream_sliding" -> streamSliding,
    "q_stream_running_totals" -> streamRunningTotals,
    "q_json_props_extract" -> jsonPropsExtract)

  /** Epoch-aligned bucket start in DuckDB, matching Spark's
    * `timestamp_seconds(floor(epoch/secs)*secs)` exactly. */
  private def bucketSql(secs: Long, offsetExpr: String = "0"): String =
    s"make_timestamp(CAST((floor(epoch_us(ts)/1000000.0/$secs) - ($offsetExpr)) * $secs AS BIGINT) * 1000000)"

  private val sumValueR4 = roundPortableSql("COALESCE(SUM(value), 0.0)", 4)

  val oracles: ListMap[String, String] = ListMap(
    "q_window_tumbling" ->
      s"""SELECT ${bucketSql(3600)} AS window_start, event_type,
          COUNT(*) AS records, $sumValueR4 AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q_window_sliding" ->
      s"""SELECT ${bucketSql(1800, "i")} AS window_start, event_type,
          COUNT(*) AS records, $sumValueR4 AS sum_value
          FROM events CROSS JOIN (VALUES (0), (1)) t(i)
          GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q_window_sessions" ->
      s"""SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
          MIN(ts) AS session_start, MAX(ts) AS session_end,
          COUNT(*) AS records, $sumValueR4 AS sum_value
          FROM (
            SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM (
              SELECT *, CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts)/1000000.0 - epoch_us(prev_ts)/1000000.0 > 1800
                THEN 1 ELSE 0 END AS new_session
              FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                    FROM events)))
          GROUP BY user_id, session_seq
          ORDER BY user_id, session_seq""",
    // Streaming session_window ≡ gap-grouped sessions: start = first
    // event, end = last event + gap. Boundary faithful to Spark's
    // HALF-OPEN window ranges: an event exactly gap seconds after the
    // previous one does NOT overlap the previous session ([t, t+gap)
    // vs [t+gap, …)), hence `>=` here — unlike the batch sessionize
    // contract (q_window_sessions, `>`). No exact-30-min gap exists in
    // the data at any SF, so the two gates agree on today's data; this
    // spelling stays correct if that ever changes.
    "q_stream_sessions" ->
      s"""SELECT user_id, MIN(ts) AS session_start,
          MAX(ts) + INTERVAL 30 MINUTE AS session_end,
          COUNT(*) AS n_events, ${roundPortableSql("COALESCE(SUM(value), 0.0)", 4)} AS total_value
          FROM (
            SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM (
              SELECT *, CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts)/1000000.0 - epoch_us(prev_ts)/1000000.0 >= 1800
                THEN 1 ELSE 0 END AS new_session
              FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                    FROM events)))
          GROUP BY user_id, session_seq
          ORDER BY user_id, session_start""",
    // The streaming window() paths share the batch oracles' exact bucket
    // spelling: one AvailableNow batch over a bounded file source emits
    // every window, so streaming ≡ batch ≡ this SQL.
    "q_stream_tumbling" ->
      s"""SELECT ${bucketSql(3600)} AS window_start, event_type,
          COUNT(*) AS records, $sumValueR4 AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q_stream_sliding" ->
      s"""SELECT ${bucketSql(1800, "i")} AS window_start, event_type,
          COUNT(*) AS records, $sumValueR4 AS sum_value
          FROM events CROSS JOIN (VALUES (0), (1)) t(i)
          GROUP BY 1, 2 ORDER BY window_start, event_type""",
    // one AvailableNow batch ⇒ keyed state ≡ the batch GROUP BY
    // (COALESCE: the state op counts null-value rows at 0.0 contribution)
    "q_stream_running_totals" ->
      s"""SELECT user_id, COUNT(*) AS n_events,
          ${roundPortableSql("COALESCE(SUM(value), 0.0)", 4)} AS total_value
          FROM events GROUP BY user_id ORDER BY user_id""",
    "q_json_props_extract" ->
      """SELECT event_type, COUNT(*) AS records,
          COALESCE(CAST(SUM(json_extract_string(props, '$.k')::BIGINT) AS BIGINT), 0) AS sum_k,
          MIN(json_extract_string(props, '$.k')::BIGINT) AS min_k,
          MAX(json_extract_string(props, '$.k')::BIGINT) AS max_k
          FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
