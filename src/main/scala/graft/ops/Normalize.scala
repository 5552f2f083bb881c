package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-tolerant normalization applied before aggregation — the Spark
  * re-expression of `tasks/process.py:11-25,89-97`. All transforms are
  * single `select`/`withColumns` projections (no shuffle, codegen'd).
  */
object Normalize {

  /** Adds any absent column as a literal fill (default `"UNKNOWN"`) so
    * group-by keys always exist (`_ensure_cols`, `tasks/process.py:11-16`). */
  def ensureCols(df: DataFrame, cols: Seq[String], fill: String = "UNKNOWN"): DataFrame = {
    val present = df.columns.toSet
    val missing = cols.filterNot(present.contains)
    if (missing.isEmpty) df
    else df.withColumns(missing.map(c => c -> lit(fill)).toMap)
  }

  /** Tolerant numeric cast: present columns cast to double (failure→null —
    * requires non-ANSI cast mode, set in [[graft.GraftSession]]); absent
    * columns synthesized as literal `0.0` (`_cast_float`,
    * `tasks/process.py:18-25`). */
  def castMetrics(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    val replacements = cols.map { c =>
      if (present.contains(c)) c -> col(c).cast(DoubleType)
      else c -> lit(0.0)
    }
    if (replacements.isEmpty) df else df.withColumns(replacements.toMap)
  }

  /** Derives `duration_hours = (end - start) in fractional hours, null→0.0`
    * from two (string- or timestamp-typed) columns — the Event rewrite
    * (`tasks/process.py:89-97`). Casting the timestamps to double keeps
    * Polars' sub-second precision (SURVEY §2.3 P9).
    */
  def deriveDurationHours(
      df: DataFrame,
      startCol: String = "StartDateTime",
      endCol: String = "EndDateTime"
  ): DataFrame = {
    def ts(c: String) = to_timestamp(col(c)).cast(DoubleType)
    df.withColumn(
      "duration_hours",
      coalesce((ts(endCol) - ts(startCol)) / 3600.0, lit(0.0))
    )
  }

  /** Casts every temporal column to string — the pre-JSON normalization
    * (`tasks/load.py:64-71`). */
  def temporalsToString(df: DataFrame): DataFrame = {
    val temporal = df.schema.fields.collect {
      case f if f.dataType == DateType || f.dataType == TimestampType ||
        f.dataType == TimestampNTZType => f.name
    }
    if (temporal.isEmpty) df
    else df.withColumns(temporal.map(c => c -> col(c).cast(StringType)).toMap)
  }
}
