package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.spec.ObjectSpec

/** Source scans. The reference's remote relation is Salesforce SOQL with
  * SELECT/WHERE/LIMIT compiled from the spec and pushed into the source
  * (`tasks/extract.py:29-33,66-101`); here the remote relation is a
  * parquet (or CSV) table and the same pushdowns are expressed
  * declaratively — Catalyst's `ColumnPruning` / `PushDownPredicates` /
  * `LocalLimit` rules push them into the scan (verify via
  * `.explain("formatted")`: `ReadSchema` lists only `spec.fields`,
  * `PushedFilters` carries the predicate).
  */
object Scan {

  /** Reads one named table from a scale-factor directory.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no type for;
    * with `spark.sql.legacy.parquet.nanosAsLong` the scan yields raw nanos
    * as long, converted here to a microsecond timestamp (`ts div 1000`,
    * truncation — byte-identical to DuckDB's read of the same file). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Spec-driven scan: projection + optional predicate + optional limit,
    * the analog of `_build_soql_from_spec` + `extract_salesforce_to_csv`
    * (`tasks/extract.py:29-33,59-101`). Fields absent from the physical
    * table are skipped at projection (they are re-synthesized downstream by
    * `Normalize.ensureCols` / `castMetrics`, preserving the reference's
    * schema tolerance).
    */
  def specScan(df: DataFrame, spec: ObjectSpec, limit: Option[Int] = None): DataFrame = {
    val present = df.columns.toSet
    val projected =
      if (spec.fields.isEmpty) df
      else {
        val keep = spec.fields.filter(present.contains)
        if (keep.isEmpty) df else df.select(keep.map(col): _*)
      }
    val filtered =
      if (spec.where == null || spec.where.isEmpty) projected
      else projected.filter(expr(spec.where))
    limit.fold(filtered)(filtered.limit)
  }

  /** Typed 0-row relation — the empty-input synthesis path
    * (`tasks/extract.py:86-90`, `tasks/process.py:76-87`). */
  def emptyRelation(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Schema-inferred CSV read with empty-file tolerance: a missing,
    * zero-byte, or header-only file yields a typed empty relation with
    * `fallback` schema instead of failing — the `NoDataError` path
    * (`tasks/process.py:71-74`). */
  def csv(spark: SparkSession, path: String, fallback: StructType): DataFrame = {
    val f = new java.io.File(path)
    if (!f.exists() || f.length() == 0) emptyRelation(spark, fallback)
    else {
      val df = spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        // parse quoted embedded newlines — Spark's CSV writer quotes
        // them, but the default reader splits records on every newline
        .option("multiLine", "true")
        .csv(path)
      if (df.columns.isEmpty || df.isEmpty) emptyRelation(spark, fallback) else df
    }
  }
}
