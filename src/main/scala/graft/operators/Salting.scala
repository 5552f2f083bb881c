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

  /** Deterministic salt column in [0, buckets): hash of the caller's
    * spread column when provided, else of the row CONTENT (keys + value).
    * Content-derived salt makes the intermediate partition layout
    * reproducible across cluster layouts — `monotonically_increasing_id`
    * would spread marginally more uniformly but ties the salt to the
    * physical partition numbering. (Identical (key, value) duplicates
    * share a bucket, which is harmless: they collapse into one partial
    * group either way; the skew being spread is value cardinality.) */
  private def saltCol(buckets: Int, spread: Option[Column], content: Seq[Column]): Column =
    pmod(hash(spread.map(Seq(_)).getOrElse(content): _*), lit(buckets))

  /** Two-stage salted rollup producing `records`, `sum_<v>`, `min_<v>`,
    * `max_<v>`, `avg_<v>` per key set. Result is identical to the plain
    * `groupBy(keys)` aggregate — verified by the DuckDB oracle — with the
    * first shuffle spread over `keys × buckets`. */
  def saltedRollup(
      df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16, spread: Option[Column] = None): DataFrame = {
    val v = col(valueCol).cast("double")
    val partial = df
      .withColumn("__salt", saltCol(buckets, spread, keys.map(col) :+ v))
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
