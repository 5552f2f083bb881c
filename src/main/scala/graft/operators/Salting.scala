package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (SURVEY §8 scale notes).
  *
  * A grouped aggregate over a key where one value holds a large share of
  * all rows puts that whole share into one reduce task. Salting splits
  * each key into `buckets` sub-keys for the first (partial) aggregate —
  * spreading the heavy key over `buckets` tasks — then merges the tiny
  * partial results in a second aggregate keyed on the true key. Spark's
  * AQE skew handling covers joins; aggregate-side heavy hitters still
  * want explicit salt when partial aggregation alone can't keep up
  * (e.g. high-cardinality distinct-ish states per group).
  *
  * Algebra: only works for mergeable aggregates; count/sum/min/max are
  * provided (avg = merged sum / merged count).
  */
object Salting {

  /** Deterministic salt column in [0, buckets): hash of the whole row's
    * key + a spread column when provided, else a per-row pseudo-random
    * (but plan-deterministic) spread from `monotonically_increasing_id`. */
  private def saltCol(buckets: Int, spread: Option[Column]): Column =
    pmod(hash(spread.getOrElse(monotonically_increasing_id())), lit(buckets))

  /** Two-stage salted rollup producing `records`, `sum_<v>`, `min_<v>`,
    * `max_<v>`, `avg_<v>` per key set. Result is identical to the plain
    * `groupBy(keys)` aggregate — verified by the DuckDB oracle — with the
    * first shuffle spread over `keys × buckets`. */
  def saltedRollup(
      df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16, spread: Option[Column] = None): DataFrame = {
    val v = col(valueCol).cast("double")
    val partial = df
      .withColumn("__salt", saltCol(buckets, spread))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        count(lit(1)).as("__n"),
        count(v).as("__nv"), // non-null values — avg denominator
        sum(v).as("__sum"),
        min(v).as("__min"),
        max(v).as("__max"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__n")).as("records"),
        coalesce(sum(col("__sum")), lit(0.0)).as(s"sum_${valueCol.toLowerCase}"),
        min(col("__min")).as(s"min_${valueCol.toLowerCase}"),
        max(col("__max")).as(s"max_${valueCol.toLowerCase}"),
        when(sum(col("__nv")) > 0, sum(col("__sum")) / sum(col("__nv")))
          .as(s"avg_${valueCol.toLowerCase}"))
  }
}
