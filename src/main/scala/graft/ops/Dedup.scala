package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based deduplication (SURVEY §2.6).
  *
  * The reference's `deduplicate_by_id` keeps the FIRST row per `Id` in file
  * order (`tasks/quality_parallel.py:92-95`) and its ledger dedupe keeps the
  * LAST line per `run_id` (`utils/paths.py:75-96`). "File order" is not a
  * distributed-safe concept, so the engine makes the tie-break explicit: a
  * deterministic `orderBy` within each key group. With an explicit order the
  * result is reproducible on any cluster layout — the property you need when
  * the same dedup runs over 100 TB on 1000 executors.
  *
  * Physical shape: one hash-partition shuffle on the key + per-partition
  * sort (window `row_number`), no second shuffle. For keep-"any" semantics
  * where no order matters, prefer [[keepAny]] (`dropDuplicates`), which
  * needs only a partial aggregate.
  */
object Dedup {

  private def pick(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep the first row per key under `order` (asc). ≙ D1 with an explicit
    * tie-break replacing Polars' implicit file order. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pick(df, keys, order)

  /** Keep the last row per key under `order` — i.e. first under the
    * reversed order. ≙ D3 (`utils/paths.py:75-96`, last line wins). */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pick(df, keys, order.map(_.desc))

  /** Keep an arbitrary row per key — Spark-native `dropDuplicates`; the
    * cheapest plan (map-side partial aggregate) when determinism within the
    * key group doesn't matter. Keys absent from the schema → pass-through,
    * matching the reference's "no Id column" branch
    * (`tasks/quality_parallel.py:96-98`). */
  def keepAny(df: DataFrame, keys: Seq[String]): DataFrame =
    if (keys.forall(df.columns.contains)) df.dropDuplicates(keys) else df
}
