package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing bins for LLM pretraining batch assembly (extension
  * surface): assign every document a position in a stream of
  * fixed-token-budget bins, by cumulative token count in a total key
  * order. Output per row: `start_offset` (tokens before this doc),
  * `bin` (= start_offset / budget) and `bin_offset` (position inside
  * the bin). A document may straddle a bin boundary — the offsets are
  * exactly what a writer needs to split or shift it; greedy no-split
  * packing is an inherently sequential fold, and this cumulative form
  * is its parallelizable variant with the same stream layout.
  *
  * THE SCALE POINT: the naive spelling is
  * `sum(tokens) OVER (ORDER BY key)` — a GLOBAL window, which Spark
  * executes by shuffling the entire relation into ONE partition (the
  * single-task straggler this repo's top-k work removed elsewhere).
  * This implementation is the classic two-pass distributed prefix sum:
  *
  *   1. range-partition by key and locally sort (one ordinary shuffle,
  *      any width);
  *   2. aggregate ONE subtotal row per partition and prefix-sum those
  *      on the driver (O(partitions) rows — aggregate-sized at any
  *      corpus scale);
  *   3. per-partition local cumulative sum (a PARTITIONED window — every
  *      partition works in parallel) plus its broadcast prefix offset.
  *
  * No single-partition exchange anywhere (PackingSpec asserts it), and
  * the result is independent of the partition count: local cumsum +
  * exclusive prefix of partition subtotals is exactly the global
  * cumulative sum.
  */
object Packing {

  /** @param budget tokens per bin (the training context length)
    * @return input columns + `n_tokens`, `start_offset`, `bin`,
    *         `bin_offset`, ordered by `keyCol` semantics (row order is
    *         not materialized — add `.orderBy` for display) */
  def withPackingBins(
      docs: DataFrame, keyCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val spark = docs.sparkSession

    // (1) range-partition on the packing order and pin each row's
    // partition id as a COLUMN — the window and the offset join below
    // must see the same pid, so it is materialized once (the
    // checkpoint-multiply-consumed pattern used throughout the repo).
    val ranged = docs
      .repartitionByRange(col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)

    // (2) one subtotal row per partition → driver prefix sum. This is
    // O(partitions) driver data by construction, not O(rows).
    val subtotals = ranged.groupBy(col("__pid"))
      .agg(sum(col(tokensCol)).as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (subtotals.isEmpty) -1 else subtotals.keys.max
    val prefixes = (0 to maxPid).scanLeft(0L) {
      case (acc, pid) => acc + subtotals.getOrElse(pid, 0L)
    }.init // exclusive prefix: tokens in all partitions BEFORE pid
    // ONE array literal indexed by pid — not a per-partition when-chain,
    // which bloats the generated code linearly with the partition count
    val prefixCol =
      if (prefixes.isEmpty) lit(0L)
      else element_at(typedLit(prefixes), col("__pid") + 1)

    // (3) partition-LOCAL running sum — the window is partitioned, so
    // every range partition computes in parallel.
    val localCum = sum(col(tokensCol)).over(
      Window.partitionBy(col("__pid")).orderBy(col(keyCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranged
      .withColumn("start_offset", prefixCol + localCum - col(tokensCol))
      .withColumn("bin", (col("start_offset") / budget).cast("long"))
      .withColumn("bin_offset", col("start_offset") % budget)
      .drop("__pid")
  }
}
