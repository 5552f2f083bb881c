package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert + delete) into a published parquet snapshot —
  * the CDC/crawl-loop generalization of the reference's keep-last
  * dedup (`utils/paths.py:75-96`, last write per key wins) from a JSONL
  * ledger to a table-sized snapshot with atomic publication.
  *
  * A batch of updates is folded into the snapshot at `dir` in one pass:
  * rows whose key exists REPLACE the current row, new keys are
  * inserted, and rows flagged in `deleteCol` remove their key. The new
  * snapshot is swapped in with [[IndexFs.publishRelation]] — readers
  * see the complete old version or the complete new one, never a
  * partial mix, under either commit protocol (rename swap /
  * object-store version pointer), and a crash mid-merge leaves the old
  * snapshot intact and resolvable.
  *
  * Scale shape: the updates' KEY SET is broadcast (a CDC batch is
  * batch-sized by contract) so the survivor anti-join is map-side —
  * the snapshot never shuffles; the merge cost is one snapshot scan +
  * one snapshot write. That full rewrite is the honest lower bound for
  * an UNPARTITIONED snapshot; at 100 TB the snapshot should be
  * key-sharded ([[Sharding.writeShards]]) so a batch rewrites only the
  * shards its keys touch — the same "rewrite what changed" contract,
  * manifest-pointer committed. Set `broadcastKeys = false` for
  * backfill-sized batches (the join then shuffles both sides at the
  * corpus-tracked width).
  *
  * Replay: `commitTag` short-circuits an already-committed tag
  * (at-most-once per tag); a crash AFTER publish but BEFORE the tag
  * marker lands re-runs the merge on replay, which is harmless —
  * upserting the same batch twice is idempotent by construction (the
  * anti-join removes what the re-insert re-adds).
  */
object SnapshotMerge {

  /** The snapshot's data relation (published — read through
    * [[IndexFs.resolveDir]]). */
  private def dataDir(dir: String): String = s"$dir/data"

  /** True when the snapshot has been published at least once. */
  def exists(spark: SparkSession, dir: String): Boolean =
    IndexFs.exists(spark, IndexFs.resolveDir(spark, dataDir(dir)))

  /** The current snapshot content — a lazy scan of the resolved
    * published relation. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(IndexFs.resolveDir(spark, dataDir(dir)))

  /** Merge `updates` into the snapshot at `dir` by `keyCols`.
    *
    * @param deleteCol boolean column in `updates` marking rows whose
    *        key is REMOVED (the column itself never reaches the
    *        snapshot); null reads as false
    * @param updateOrder when the batch can carry several rows per key,
    *        the within-batch precedence: LAST under this order wins
    *        (the reference's ledger rule, [[graft.ops.Dedup.keepLast]]
    *        spelling). None = the caller guarantees one row per key
    * @param commitTag exactly-once handle: an already-committed tag
    *        skips the merge entirely
    * @param broadcastKeys broadcast the batch key set into the
    *        survivor anti-join (the CDC default); disable for
    *        backfill-sized batches
    * @return true if this call merged the batch; false on an
    *         idempotent replay skip */
  def upsert(updates: DataFrame, keyCols: Seq[String], dir: String,
      deleteCol: Option[String] = None,
      updateOrder: Option[Seq[Column]] = None,
      commitTag: Option[String] = None,
      broadcastKeys: Boolean = true): Boolean = {
    val spark = updates.sparkSession
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    require(keyCols.forall(updates.columns.contains),
      s"key columns ${keyCols.filterNot(updates.columns.contains)} absent from updates")
    deleteCol.foreach(c => require(updates.columns.contains(c),
      s"deleteCol $c absent from updates"))
    commitTag.foreach(IndexFs.requireValidTag)
    if (commitTag.exists(t => IndexFs.isCommitted(spark, dir, t)))
      return false

    val ranked = updateOrder match {
      case Some(order) => graft.ops.Dedup.keepLast(updates, keyCols, order)
      case None => updates
    }
    val inserts = deleteCol match {
      case Some(c) => ranked.filter(!coalesce(col(c), lit(false))).drop(c)
      case None => ranked
    }
    // both updates AND deletes knock their key out of the current rows
    val touchedKeys = ranked.select(keyCols.map(col): _*).distinct()

    val merged =
      if (!exists(spark, dir)) inserts
      else {
        val current = read(spark, dir)
        require(current.columns.sorted.toSeq == inserts.columns.sorted.toSeq,
          s"upsert schema mismatch: snapshot has ${current.columns.sorted.mkString(",")}, " +
            s"updates bring ${inserts.columns.sorted.mkString(",")}")
        val keys = if (broadcastKeys) broadcast(touchedKeys) else touchedKeys
        current.join(keys, keyCols, "left_anti").unionByName(inserts)
      }
    IndexFs.publishRelation(merged, dataDir(dir))
    commitTag.foreach(t => IndexFs.markCommitted(spark, dir, t))
    true
  }
}
