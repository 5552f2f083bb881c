package graft.spec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles an [[ObjectSpec]]'s `metrics` map into aggregate `Column`s and
  * derives the (empty-input-stable) output schema.
  *
  * This is the Spark-native re-expression of the reference's `_build_aggs`
  * (`tasks/process.py:27-54`) and its empty-output schema synthesis
  * (`tasks/process.py:76-87`). The compiled expressions are all built-in
  * Catalyst functions, so the whole aggregate stays inside whole-stage
  * codegen with automatic partial (map-side) aggregation.
  */
object SpecCompiler {

  /** `op -> output-name prefix` (`tasks/process.py:80`). `count` folds into
    * the unconditional `records` counter (`tasks/process.py:53`). */
  val opPrefix: Map[String, String] =
    Map("sum" -> "sum_", "mean" -> "avg_", "min" -> "min_", "max" -> "max_", "count" -> "")

  /** Output column name for (metricCol, op); None when the op folds into
    * `records` (the `count` case). Metric names are lower-cased
    * (`tasks/process.py:46-52`). */
  def outputName(metricCol: String, op: String): Option[String] = {
    val prefix = opPrefix.getOrElse(op.toLowerCase,
      throw new IllegalArgumentException(s"Unsupported aggregation op: $op"))
    val base =
      if (metricCol == ObjectSpec.DurationHours) "duration_hours" else metricCol.toLowerCase
    if (prefix.isEmpty) None else Some(prefix + base)
  }

  /** The aggregate expression list: an unconditional `records` row counter
    * first (`pl.count()` counts rows incl. nulls → `count(lit(1))`, NOT
    * `count(col)`), then one column per (metric, op) in spec order.
    *
    * Metric columns are aggregated after a tolerant double cast — the
    * normalization step ([[graft.ops.Normalize.castMetrics]]) has already
    * cast them, so here the cast is a no-op for present columns but keeps
    * the compiler total for ad-hoc inputs. Polars `sum` over an all-null
    * group yields 0.0 where Spark yields null — parity via
    * `coalesce(sum(..), 0.0)` (SURVEY §2.5 A4).
    */
  def buildAggs(metrics: Map[String, Seq[String]]): Seq[Column] = {
    val counter = count(lit(1)).as("records")
    val metricAggs = metrics.toSeq.flatMap { case (metricCol, ops) =>
      val source =
        if (metricCol == ObjectSpec.DurationHours) col("duration_hours")
        else col(metricCol).cast(DoubleType)
      ops.flatMap { op =>
        outputName(metricCol, op).map { name =>
          op.toLowerCase match {
            case "sum"  => coalesce(sum(source), lit(0.0)).as(name)
            case "mean" => avg(source).as(name)
            case "min"  => min(source).as(name)
            case "max"  => max(source).as(name)
          }
        }
      }
    }
    counter +: metricAggs
  }

  /** Names of the physical metric columns the input must carry (excludes
    * the derived-duration pseudo-column) — `tasks/process.py:100`. */
  def physicalMetricCols(spec: ObjectSpec): Seq[String] =
    spec.metrics.keys.filter(_ != ObjectSpec.DurationHours).toSeq

  /** Schema of the aggregate output, derivable without any input data:
    * group keys as string, metric outputs as double, `records` as long
    * (`tasks/process.py:76-87`). Guarantees output-schema stability on
    * empty input (SURVEY §1.2).
    */
  def emptyOutputSchema(spec: ObjectSpec): StructType = {
    val keyFields = spec.groupBy.map(StructField(_, StringType, nullable = true))
    val metricFields = spec.metrics.toSeq.flatMap { case (metricCol, ops) =>
      ops.flatMap(op => outputName(metricCol, op))
        .map(StructField(_, DoubleType, nullable = true))
    }
    StructType(keyFields ++ metricFields :+ StructField("records", LongType, nullable = true))
  }

  /** Output column order of the non-empty aggregate: group keys, then
    * `records`, then metric outputs (groupBy(...).agg(records, metrics...)). */
  def outputColumns(spec: ObjectSpec): Seq[String] =
    spec.groupBy ++ Seq("records") ++
      spec.metrics.toSeq.flatMap { case (c, ops) => ops.flatMap(op => outputName(c, op)) }
}
