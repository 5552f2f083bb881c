package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Event-time windowing over a timestamp column — the generalization of
  * the reference's 15-minute scheduled micro-batch (SURVEY §2.9 T1) into
  * proper event-time semantics. Batch forms here (all DuckDB-oracle-able);
  * the streaming twins with watermarks live in
  * [[graft.streaming.StreamingOps]].
  */
object Windows {

  /** Tumbling window aggregate: epoch-aligned buckets of `seconds`.
    * Identical to Spark's `window(ts, dur)` start alignment (origin
    * 1970-01-01 UTC) but expressed arithmetically so the same bucketing
    * runs on any engine. One hash aggregate, shuffle carries |buckets| ×
    * |keys| rows. */
  def tumbling(
      events: DataFrame, tsCol: String, seconds: Long,
      keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val bucket = timestamp_seconds(
      floor(col(tsCol).cast("double") / seconds).cast("long") * seconds)
    events.withColumn("window_start", bucket)
      .groupBy((col("window_start") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Sliding window aggregate: duration `seconds`, slide `slideSeconds`
    * (must divide evenly for alignment); each event lands in
    * `seconds/slideSeconds` windows — made explicit via an overlap-factor
    * explode (a projection; the aggregate stays one shuffle). */
  def sliding(
      events: DataFrame, tsCol: String, seconds: Long, slideSeconds: Long,
      keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(seconds % slideSeconds == 0, "window must be a multiple of slide")
    val overlap = (seconds / slideSeconds).toInt
    val base = floor(col(tsCol).cast("double") / slideSeconds).cast("long")
    val withStarts = events.withColumn("window_start",
      explode(transform(sequence(lit(0), lit(overlap - 1)),
        i => timestamp_seconds((base - i) * slideSeconds))))
    withStarts
      .groupBy((col("window_start") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Session windows (batch): per key, events closer than `gapSeconds` to
    * the previous event merge into one session (gaps-and-islands).
    * Matches Structured Streaming's `session_window` semantics: a session
    * spans first-event .. last-event (+gap for the close rule only).
    *
    * Physical shape: one shuffle on the key (window lag + running sum in
    * the same partition-local sort), then one aggregate per session id.
    */
  def sessionize(
      events: DataFrame, tsCol: String, keyCol: String, gapSeconds: Long,
      aggs: Seq[Column]): DataFrame = {
    val byKey = W.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val withGap = events.withColumn("__prev_ts", lag(col(tsCol), 1).over(byKey))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          col(tsCol).cast("double") - col("__prev_ts").cast("double") > gapSeconds, 1)
          .otherwise(0))
    val withId = withGap.withColumn("session_seq",
      sum(col("__new_session")).over(byKey.rowsBetween(W.unboundedPreceding, 0)))
    val full = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end")) ++ aggs
    withId
      .groupBy(col(keyCol), col("session_seq"))
      .agg(full.head, full.tail: _*)
  }
}
