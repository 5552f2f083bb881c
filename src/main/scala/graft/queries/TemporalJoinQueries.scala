package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins
import graft.sources.Scan

/** As-of and range (point-in-interval) joins under the driver's hard
  * gate, oracled against DuckDB's native `ASOF JOIN` and a plain
  * inequality join respectively — the oracle side is the obvious
  * (quadratic-friendly) spelling, the Spark side is the scale plan
  * (carry-forward window / bucketed equi-join), and the hash compare
  * proves them equal row-for-row.
  *
  * Shape: non-purchase `events` rows are the left/point side; the
  * user's `purchase` events are the right/interval side, collapsed to
  * one row per (user, ts) — greatest event_id wins — so the as-of
  * match is deterministic under ties on both engines.
  */
object TemporalJoinQueries {

  type Q = (SparkSession, String) => DataFrame

  private def purchases(s: SparkSession, dir: String): DataFrame =
    Scan.table(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"),
        max_by(col("value"), col("event_id")).as("purchase_value"))
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("purchase_id"), col("purchase_value"))

  private def nonPurchases(s: SparkSession, dir: String): DataFrame =
    Scan.table(s, dir, "events")
      .filter(col("event_type") =!= "purchase")

  /** Each event labeled with the user's most recent purchase at-or-
    * before it (null when none) — the classic "state current at event
    * time" feature join. */
  val asofJoin: Q = (s, dir) =>
    TemporalJoins.asofJoin(
        nonPurchases(s, dir).select("event_id", "user_id", "ts"),
        purchases(s, dir),
        "user_id", "p_user", "ts", "p_ts",
        Seq("purchase_id", "purchase_value"))
      .orderBy(col("event_id"))

  /** Same, but a match older than one day is discarded (tolerance) —
    * gates the tolerance arithmetic and the typed-null path. */
  val asofJoinTolerance: Q = (s, dir) =>
    TemporalJoins.asofJoin(
        nonPurchases(s, dir).select("event_id", "user_id", "ts"),
        purchases(s, dir),
        "user_id", "p_user", "ts", "p_ts",
        Seq("purchase_id", "purchase_value"),
        toleranceMicros = Some(86400000000L))
      .orderBy(col("event_id"))

  /** The forward direction: the user's NEXT purchase at-or-after each
    * event — gates the reversed scan order. */
  val asofJoinForward: Q = (s, dir) =>
    TemporalJoins.asofJoin(
        nonPurchases(s, dir).select("event_id", "user_id", "ts"),
        purchases(s, dir),
        "user_id", "p_user", "ts", "p_ts",
        Seq("purchase_id", "purchase_value"),
        direction = "forward")
      .orderBy(col("event_id"))

  /** Every (event, purchase) pair where the event falls inside the
    * hour after the purchase — point-in-interval via the bucketed
    * equi-join (1-hour buckets ⇒ each interval explodes into ≤ 2). */
  val rangeJoin: Q = (s, dir) =>
    TemporalJoins.pointInIntervalJoin(
        nonPurchases(s, dir).select("event_id", "user_id", "ts"),
        purchases(s, dir)
          .select(col("purchase_id"), col("p_user"), col("p_ts").as("p_start"),
            (col("p_ts") + expr("INTERVAL 1 HOUR")).as("p_end")),
        "user_id", "ts", "p_user", "p_start", "p_end",
        bucketMicros = 3600000000L)
      .select(col("event_id"), col("purchase_id"))
      .orderBy(col("event_id"), col("purchase_id"))

  val queries: ListMap[String, Q] = ListMap(
    "q_asof_join" -> asofJoin,
    "q_asof_join_tolerance" -> asofJoinTolerance,
    "q_asof_join_forward" -> asofJoinForward,
    "q_range_join" -> rangeJoin)

  private val purchasesSql =
    """p AS (SELECT user_id AS p_user, ts AS p_ts,
         max(event_id) AS purchase_id,
         arg_max(value, event_id) AS purchase_value
         FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)"""

  val oracles: ListMap[String, String] = ListMap(
    "q_asof_join" ->
      s"""WITH $purchasesSql
         SELECT e.event_id, e.user_id, e.ts, p.purchase_id, p.purchase_value
         FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
         ASOF LEFT JOIN p ON e.user_id = p.p_user AND e.ts >= p.p_ts
         ORDER BY e.event_id""",
    // tolerance: matches further than one day back are nulled — the
    // INTERVAL comparison is inclusive on both engines
    "q_asof_join_tolerance" ->
      s"""WITH $purchasesSql,
         a AS (SELECT e.event_id, e.user_id, e.ts, p.p_ts, p.purchase_id,
                      p.purchase_value
               FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
               ASOF LEFT JOIN p ON e.user_id = p.p_user AND e.ts >= p.p_ts)
         SELECT event_id, user_id, ts,
           CASE WHEN ts - p_ts <= INTERVAL 1 DAY THEN purchase_id END
             AS purchase_id,
           CASE WHEN ts - p_ts <= INTERVAL 1 DAY THEN purchase_value END
             AS purchase_value
         FROM a ORDER BY event_id""",
    "q_asof_join_forward" ->
      s"""WITH $purchasesSql
         SELECT e.event_id, e.user_id, e.ts, p.purchase_id, p.purchase_value
         FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
         ASOF LEFT JOIN p ON e.user_id = p.p_user AND e.ts <= p.p_ts
         ORDER BY e.event_id""",
    "q_range_join" ->
      s"""WITH $purchasesSql
         SELECT e.event_id, p.purchase_id
         FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
         JOIN p ON e.user_id = p.p_user
          AND e.ts >= p.p_ts AND e.ts < p.p_ts + INTERVAL 1 HOUR
         ORDER BY 1, 2""")
}
