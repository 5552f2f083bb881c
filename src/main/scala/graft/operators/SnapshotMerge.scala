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

  // ------------------------------------------------------------------
  // Sharded variant — the 100 TB shape: the snapshot lives as key-hash
  // shard directories behind a MANIFEST (shard → physical dir), and a
  // batch rewrites ONLY the shards its keys touch; the commit is one
  // atomic pointer swap to the new manifest. Untouched shards are not
  // read, not rewritten, not even listed — merge cost tracks the
  // TOUCHED fraction, not the snapshot (measured in ScaleBench
  // `merge_upsert` vs `merge_upsert_sharded`). The manifest is the
  // same version-pointer idea as IndexFs's marker protocol, applied
  // per shard so unchanged data is REFERENCED, not copied — what a
  // table format's metadata layer does, in one small file.
  // ------------------------------------------------------------------

  private def manifestPtr(dir: String) = s"$dir/manifest.current"

  /** Version tag of the shard-assignment function, persisted in the
    * manifest header: a snapshot built under a DIFFERENT assignment
    * must fail loudly at read (silently looking keys up in the wrong
    * shard dirs would duplicate rows on upsert) — any change to
    * [[shardExpr]]'s encoding must bump this. */
  private val ShardHashVersion = "h1"

  /** (version, nShards, salt, shard → physical dir). */
  private[operators] final case class Manifest(
      version: Long, nShards: Int, salt: String, shards: Map[Long, String])

  private def shardExpr(keyCols: Seq[String], nShards: Int,
      salt: String): Column = {
    // \u0001-separated components with a \u0002 null sentinel:
    // ("a", null) ≠ ("a", "") and ("ab","c") ≠ ("a","bc") — the control
    // chars never occur in real key text, so the encoding is injective
    val key = concat_ws("\u0001",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    pmod(Sharding.orderHash(key, salt), lit(nShards.toLong))
  }

  private def writeManifest(spark: SparkSession, dir: String,
      m: Manifest): Unit = {
    val f = IndexFs.fs(spark, dir)
    val body = (s"meta\t${m.nShards}\t${m.salt}\t$ShardHashVersion" +:
      m.shards.toSeq.sortBy(_._1).map { case (k, p) => s"$k\t$p" })
      .mkString("\n")
    val name = s"manifest-v${m.version}"
    val out = f.create(new org.apache.hadoop.fs.Path(s"$dir/$name"), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // the atomic commit: readers resolve through this pointer only
    IndexFs.atomicWriteSmallFile(spark, f,
      new org.apache.hadoop.fs.Path(manifestPtr(dir)), name)
  }

  private[operators] def readManifest(spark: SparkSession,
      dir: String): Manifest = {
    val f = IndexFs.fs(spark, dir)
    val name = IndexFs.readSmallFile(f,
      new org.apache.hadoop.fs.Path(manifestPtr(dir)))
    val lines = IndexFs.readSmallFile(f,
      new org.apache.hadoop.fs.Path(s"$dir/$name")).split("\n").toSeq
    val meta = lines.head.split("\t")
    require(meta(0) == "meta", s"corrupt manifest $name: bad header")
    // manifests written before the tag existed were built under the
    // same (never-changed) h1 assignment — read them as h1
    val ver = if (meta.length >= 4) meta(3) else "h1"
    require(ver == ShardHashVersion,
      s"snapshot at $dir was sharded under hash version $ver, this " +
        s"build uses $ShardHashVersion — rebuild it (createSharded) " +
        "before merging into it")
    Manifest(name.stripPrefix("manifest-v").toLong,
      meta(1).toInt, meta(2),
      lines.tail.filter(_.nonEmpty).map { l =>
        val Array(k, p) = l.split("\t", 2); k.toLong -> p
      }.toMap)
  }

  def existsSharded(spark: SparkSession, dir: String): Boolean =
    IndexFs.exists(spark, manifestPtr(dir))

  /** Bootstraps a sharded snapshot: rows land in `nShards` key-hash
    * shard dirs (ONE partitioned write — a hash exchange on the shard
    * key, like any clustered write), plus a zero-row `schema/` dir so
    * an all-deleted snapshot stays readable. `nShards` and the hash
    * salt are persisted in the manifest — every later batch derives
    * the IDENTICAL assignment from there, never from its own params. */
  def createSharded(df: DataFrame, keyCols: Seq[String], nShards: Int,
      dir: String, salt: String = "merge"): Unit = {
    val spark = df.sparkSession
    require(keyCols.nonEmpty && keyCols.forall(df.columns.contains),
      s"bad key columns $keyCols for ${df.columns.mkString(",")}")
    require(nShards > 0, s"nShards=$nShards must be positive")
    require(!df.columns.contains("__shard"),
      "reserved internal column name in input: __shard")
    require(!existsSharded(spark, dir),
      s"sharded snapshot already exists at $dir — upsertSharded into it")
    df.limit(0).write.mode("overwrite").parquet(s"$dir/schema")
    val vDir = s"$dir/shards-v1"
    df.withColumn("__shard", shardExpr(keyCols, nShards, salt))
      .repartition(col("__shard"))
      .write.partitionBy("__shard").mode("overwrite").parquet(vDir)
    val present = IndexFs.listDirNames(spark, vDir)
      .filter(_.startsWith("__shard="))
      .map(n => n.stripPrefix("__shard=").toLong -> s"$vDir/$n")
    writeManifest(spark, dir, Manifest(1L, nShards, salt, present.toMap))
  }

  /** The current sharded snapshot — a union scan of the manifest's
    * shard dirs (schema anchored by the zero-row `schema/` relation, so
    * even an empty snapshot reads with full schema). */
  def readSharded(spark: SparkSession, dir: String): DataFrame = {
    val m = readManifest(spark, dir)
    val dirs = s"$dir/schema" +: m.shards.toSeq.sortBy(_._1).map(_._2)
    spark.read.parquet(dirs: _*)
  }

  /** [[upsert]] against a sharded snapshot: reads and rewrites ONLY the
    * shards the batch's keys hash into; everything else is carried into
    * the new manifest by REFERENCE. Commit = the manifest pointer swap
    * (atomic); a crash before it leaves the old manifest resolving the
    * complete old snapshot, and the half-written delta dirs are inert
    * until [[vacuumSharded]] reaps them. Same merge/delete/precedence/
    * replay contract as [[upsert]]. Single writer per snapshot. */
  def upsertSharded(updates: DataFrame, keyCols: Seq[String], dir: String,
      deleteCol: Option[String] = None,
      updateOrder: Option[Seq[Column]] = None,
      commitTag: Option[String] = None): Boolean = {
    val spark = updates.sparkSession
    require(keyCols.nonEmpty && keyCols.forall(updates.columns.contains),
      s"bad key columns $keyCols for ${updates.columns.mkString(",")}")
    deleteCol.foreach(c => require(updates.columns.contains(c),
      s"deleteCol $c absent from updates"))
    commitTag.foreach(IndexFs.requireValidTag)
    if (commitTag.exists(t => IndexFs.isCommitted(spark, dir, t)))
      return false
    require(existsSharded(spark, dir),
      s"no sharded snapshot at $dir — createSharded first")
    val m = readManifest(spark, dir)
    val shard = shardExpr(keyCols, m.nShards, m.salt)

    val ranked = updateOrder match {
      case Some(order) => graft.ops.Dedup.keepLast(updates, keyCols, order)
      case None => updates
    }
    val inserts = (deleteCol match {
      case Some(c) => ranked.filter(!coalesce(col(c), lit(false))).drop(c)
      case None => ranked
    }).withColumn("__shard", shard)
    val touchedKeys = ranked.select(keyCols.map(col): _*).distinct()
      .withColumn("__shard", shard)
    // the batch's shard footprint — at most nShards rows
    val touched = touchedKeys.select(col("__shard")).distinct()
      .collect().map(_.getLong(0)).toSet

    val currentTouchedDirs = m.shards.view.filterKeys(touched).values.toSeq
    val survivors =
      if (currentTouchedDirs.isEmpty) inserts.limit(0)
      else {
        val current = spark.read.parquet(currentTouchedDirs: _*)
        require(
          current.columns.sorted.toSeq ==
            inserts.columns.filterNot(_ == "__shard").sorted.toSeq,
          s"upsertSharded schema mismatch: snapshot has " +
            s"${current.columns.sorted.mkString(",")}, updates bring " +
            s"${inserts.drop("__shard").columns.sorted.mkString(",")}")
        current
          .join(broadcast(touchedKeys.drop("__shard")), keyCols, "left_anti")
          .withColumn("__shard", shard)
      }

    val next = m.version + 1
    val deltaDir = s"$dir/shards-v$next"
    survivors.unionByName(inserts)
      .repartition(col("__shard"))
      .write.partitionBy("__shard").mode("overwrite").parquet(deltaDir)
    val rewritten = IndexFs.listDirNames(spark, deltaDir)
      .filter(_.startsWith("__shard="))
      .map(n => n.stripPrefix("__shard=").toLong -> s"$deltaDir/$n")
      .toMap
    // untouched shards ride along by reference; touched ones remap to
    // the delta (a touched shard rewritten to zero rows drops out)
    val merged = (m.shards -- touched) ++ rewritten
    writeManifest(spark, dir, Manifest(next, m.nShards, m.salt, merged))
    // retire the superseded physical dirs (crash here → inert orphans,
    // reaped by vacuumSharded)
    currentTouchedDirs.foreach(IndexFs.deleteRecursively(spark, _))
    val f = IndexFs.fs(spark, dir)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/manifest-v${m.version}"), false)
    commitTag.foreach(t => IndexFs.markCommitted(spark, dir, t))
    true
  }

  /** Deletes physical shard dirs and manifest files no CURRENT manifest
    * references — the orphans a crash between pointer swap and retire
    * leaves behind. Safe for readers that resolved the current
    * manifest; single-writer discipline covers the rest. */
  def vacuumSharded(spark: SparkSession, dir: String): Int = {
    val m = readManifest(spark, dir)
    val live = m.shards.values.toSet
    val f = IndexFs.fs(spark, dir)
    var reaped = 0
    IndexFs.listDirNames(spark, dir).filter(_.startsWith("shards-v")).foreach { v =>
      val vDir = s"$dir/$v"
      IndexFs.listDirNames(spark, vDir).filter(_.startsWith("__shard=")).foreach { s =>
        val p = s"$vDir/$s"
        if (!live.contains(p)) { IndexFs.deleteRecursively(spark, p); reaped += 1 }
      }
      // a version dir with no live shards left is a husk (only write
      // markers like _SUCCESS remain) — drop it whole
      if (IndexFs.listDirNames(spark, vDir)
          .count(_.startsWith("__shard=")) == 0) {
        IndexFs.deleteRecursively(spark, vDir)
      }
    }
    val curName = s"manifest-v${m.version}"
    f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isFile && st.getPath.getName.startsWith("manifest-v")
        && st.getPath.getName != curName)
      .foreach { st => f.delete(st.getPath, false); reaped += 1 }
    reaped
  }
}
