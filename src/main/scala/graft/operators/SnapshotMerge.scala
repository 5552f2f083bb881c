package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A sharded-snapshot commit lost its compare-and-swap: another writer
  * committed the same target version first. Thrown by the maintenance
  * ops ([[SnapshotMerge.optimizeSharded]], [[SnapshotMerge.evolveSharded]],
  * [[SnapshotMerge.migrateSharded]], [[SnapshotMerge.compactSharded]]),
  * which must NOT silently redo their full-rewrite work against a moved
  * snapshot — and by [[SnapshotMerge.upsertSharded]] only after its
  * bounded re-read-and-retry loop is exhausted. The losing writer's
  * delta dirs are already deleted (or left for the orphan vacuum path)
  * when this surfaces; no committed state is ever touched. */
final class ConcurrentCommitException(msg: String)
  extends RuntimeException(msg)

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
  * Key semantics are NULL-SAFE: a null key component matches itself
  * (the anti-join uses `<=>`), consistent with how
  * [[graft.ops.Dedup.keepLast]] groups nulls and how [[shardExpr]]
  * routes them — upserting a null-keyed row REPLACES the existing
  * null-keyed row instead of silently duplicating it.
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
  * corpus-tracked width) — both the flat and the sharded path take the
  * flag.
  *
  * Replay: `commitTag` short-circuits an already-committed tag
  * (at-most-once per tag); a crash AFTER publish but BEFORE the tag
  * marker lands re-runs the merge on replay, which is harmless —
  * upserting the same batch twice is idempotent by construction (the
  * anti-join removes what the re-insert re-adds).
  */
object SnapshotMerge {

  /** Trailing-slash-insensitive snapshot root (a caller spelling
    * `dir/` must address the same snapshot as `dir`). */
  private def norm(dir: String): String =
    if (dir.length > 1 && dir.endsWith("/")) dir.dropRight(1) else dir

  /** The snapshot's data relation (published — read through
    * [[IndexFs.resolveDir]]). */
  private def dataDir(dir: String): String = s"${norm(dir)}/data"

  /** True when the snapshot has been published at least once. */
  def exists(spark: SparkSession, dir: String): Boolean =
    IndexFs.exists(spark, IndexFs.resolveDir(spark, dataDir(dir)))

  /** The current snapshot content — a lazy scan of the resolved
    * published relation. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(IndexFs.resolveDir(spark, dataDir(dir)))

  /** The EXACT column names [[survivorAntiJoin]] reserves for the
    * given keys — the only spellings that can collide (a snapshot
    * column named `__mergekey_notes` under key `id` is harmless). */
  private def reservedKeyNames(keyCols: Seq[String]): Seq[String] =
    keyCols.map(c => s"__mergekey_$c")

  /** Rejects an input frame that carries one of this merge's reserved
    * renamed-key columns — checked at EVERY entry point (including the
    * snapshot-creating first upsert and createSharded), because a
    * reserved column persisted at creation would brick every LATER
    * incremental merge with an ambiguous-reference error. */
  private def requireNoReservedKeyNames(df: DataFrame,
      keyCols: Seq[String], what: String): Unit = {
    val clash = reservedKeyNames(keyCols).filter(df.columns.contains)
    require(clash.isEmpty,
      s"reserved internal column name(s) ${clash.mkString(",")} in $what " +
        s"(the merge renames key columns to __mergekey_<key> internally)")
  }

  /** The survivor side of a merge: current rows whose key does NOT
    * appear in the batch's key set. NULL-SAFE equality (`<=>`) on every
    * key component — plain equality would let a null-keyed current row
    * survive its own replacement (nulls never `=` each other) and the
    * re-insert would duplicate it. Spark hash joins support
    * EqualNullSafe keys, so the broadcast shape is preserved.
    * Factored out so the plan (broadcast vs shuffle) is directly
    * spec-assertable. */
  private[operators] def survivorAntiJoin(current: DataFrame,
      touchedKeys: DataFrame, keyCols: Seq[String],
      broadcastKeys: Boolean): DataFrame = {
    // same reserved-name discipline as __shard, scoped to the EXACT
    // names this merge renames to — a snapshot column colliding with
    // them would make the join condition ambiguous with an error that
    // names neither cause
    requireNoReservedKeyNames(current, keyCols, "snapshot")
    val keyed = touchedKeys.toDF(keyCols.map(c => s"__mergekey_$c"): _*)
    val rhs = if (broadcastKeys) broadcast(keyed) else keyed
    val cond = keyCols.map(c => col(c) <=> col(s"__mergekey_$c"))
      .reduce(_ && _)
    current.join(rhs, cond, "left_anti")
  }

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
    * @param allowSchemaEvolution accept a batch whose non-key columns
    *        differ from the snapshot's (the Delta `mergeSchema`
    *        posture): the published snapshot's schema becomes the UNION
    *        — survivors null-fill columns only the batch brings, batch
    *        rows null-fill columns only the snapshot has. Key columns
    *        must exist on both sides regardless. Off by default: an
    *        unannounced schema change is usually a bug, and the loud
    *        mismatch error is the guard. FLAT snapshots only — the
    *        sharded layout's untouched shards are carried by reference
    *        (never rewritten), so their files would keep the old
    *        physical schema and every read would need file-level schema
    *        merging; evolving a sharded snapshot is the explicit
    *        [[evolveSharded]] maintenance op (full per-shard rewrite),
    *        enforced loudly in [[upsertSharded]].
    * @return true if this call merged the batch; false on an
    *         idempotent replay skip */
  def upsert(updates: DataFrame, keyCols: Seq[String], dir: String,
      deleteCol: Option[String] = None,
      updateOrder: Option[Seq[Column]] = None,
      commitTag: Option[String] = None,
      broadcastKeys: Boolean = true,
      allowSchemaEvolution: Boolean = false): Boolean = {
    val spark = updates.sparkSession
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    require(keyCols.forall(updates.columns.contains),
      s"key columns ${keyCols.filterNot(updates.columns.contains)} absent from updates")
    deleteCol.foreach(c => require(updates.columns.contains(c),
      s"deleteCol $c absent from updates"))
    requireNoReservedKeyNames(updates, keyCols, "updates")
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
        if (allowSchemaEvolution)
          require(keyCols.forall(current.columns.contains),
            s"key columns ${keyCols.filterNot(current.columns.contains)} " +
              s"absent from the snapshot at $dir")
        else
          require(current.columns.sorted.toSeq == inserts.columns.sorted.toSeq,
            s"upsert schema mismatch: snapshot has ${current.columns.sorted.mkString(",")}, " +
              s"updates bring ${inserts.columns.sorted.mkString(",")} " +
              "(set allowSchemaEvolution = true to union the schemas)")
        survivorAntiJoin(current, touchedKeys, keyCols, broadcastKeys)
          .unionByName(inserts, allowMissingColumns = allowSchemaEvolution)
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
  //
  // COMMIT vs RETIRE are separate phases (the Delta/Iceberg posture):
  // the commit is ONLY the manifest publication — superseded shard
  // dirs and manifests are never deleted inline. The upsert records
  // them in a retire log (`_retired/retired-v<N>`, mtime = the moment
  // of supersession) and [[vacuumSharded]] reaps them later, behind a
  // caller-chosen retention window — so a long-running reader that
  // resolved the OLD manifest keeps a complete, scannable old snapshot
  // for at least `minAgeMs` after the merge that superseded it.
  //
  // CONCURRENCY is optimistic (the Delta commit-file posture): the
  // commit point is a no-clobber CREATE of `manifest-v<N>` — a writer
  // that read version N-1 can publish N only if no one else has, so
  // two concurrent writers (a mergeStream CDC batch racing an
  // optimizeSharded maintenance window, say) can never silently
  // discard each other's committed work. The loser's verdict is
  // per-op: upsertSharded re-reads the moved snapshot and retries its
  // (batch-sized) merge; the full-rewrite maintenance ops fail loudly
  // with [[ConcurrentCommitException]]. Readers resolve the NEWEST
  // committed manifest file (one root listing); `manifest.current` is
  // kept as a best-effort cache/back-compat pointer, never the source
  // of truth — a crash between the CAS and the pointer write therefore
  // rolls FORWARD (the committed file wins) instead of wedging the
  // version number against debris. Each attempt writes its delta under
  // a writer-unique `shards-v<N>-<uid>` dir, so a loser's in-flight
  // write can never clobber the winner's committed files; lost deltas
  // are reaped by the orphan vacuum path.
  // ------------------------------------------------------------------

  private def manifestPtr(dir: String) = s"${norm(dir)}/manifest.current"
  private def retiredDir(dir: String) = s"${norm(dir)}/_retired"

  /** LEGACY anchor resolution — snapshots written before the anchor
    * went into the manifest (r15) keep their zero-row schema relation
    * at `schema/` behind the marker-protocol pointer; a manifest with
    * no anchor field resolves here. New snapshots version the anchor
    * THROUGH the manifest ([[Manifest.anchor]]): each schema change
    * writes a fresh `schema-v<N>-<uid>` dir that is invisible until
    * its manifest CAS lands, schema-neutral commits carry the anchor
    * path forward by reference, and a restore across a schema change
    * rolls the schema back with the data. */
  private def schemaAnchorDir(spark: SparkSession, dir: String): String =
    IndexFs.resolveDir(spark, s"${norm(dir)}/schema")

  /** The anchor dir a given version reads with: the manifest's own
    * (versioned, r15) or the legacy pointer. */
  private def anchorDirOf(spark: SparkSession, dir: String,
      m: Manifest): String =
    m.anchor.getOrElse(schemaAnchorDir(spark, dir))

  /** Version tag of the shard-assignment function, persisted in the
    * manifest header: a snapshot built under a DIFFERENT assignment
    * must fail loudly at read (silently looking keys up in the wrong
    * shard dirs would duplicate rows on upsert) — any change to
    * [[shardExpr]]'s encoding must bump this. */
  private val ShardHashVersion = "h1"

  /** Header flag announcing the body ends in a `end\t<n>` count
    * trailer (manifest self-validation — see [[tryCommitManifest]]). */
  private val TrailerFlag = "t1"

  /** (version, nShards, salt, shard → physical dir, anchor dir).
    * In-memory paths are always ABSOLUTE (resolved against the
    * snapshot root at read); on disk they are stored RELATIVE to the
    * root, so the snapshot survives being moved/mounted under a
    * different spelling and no maintenance op ever compares paths
    * across spellings. `anchor` is the zero-row schema relation THIS
    * version reads with (r15) — None on legacy manifests, which
    * resolve the pointer-managed `schema/` dir instead. */
  private[operators] final case class Manifest(
      version: Long, nShards: Int, salt: String, shards: Map[Long, String],
      anchor: Option[String] = None)

  /** A stored shard path, resolved against the snapshot root. Legacy
    * manifests (written before paths went relative) carried absolute
    * paths — those pass through untouched. Absolute means a leading `/`
    * OR any URI scheme, including the single-slash Hadoop
    * `Path.toString` spelling (`file:/tmp/...`) — treating that form as
    * relative would resolve a legacy entry to `<dir>/file:/tmp/...`
    * and fail the shard read. */
  private val SchemePrefix = "^[a-zA-Z][a-zA-Z0-9+.-]*:/".r
  private def resolveShardPath(dir: String, p: String): String =
    if (p.startsWith("/") || SchemePrefix.findPrefixOf(p).isDefined) p
    else s"${norm(dir)}/$p"

  /** The on-disk (relative) spelling of a shard path under `dir`. */
  private def relativizeShardPath(dir: String, p: String): String = {
    val root = norm(dir) + "/"
    if (p.startsWith(root)) p.stripPrefix(root) else p
  }

  /** Writer-unique suffix for a version's delta dir: two writers racing
    * the same target version must never share a physical dir — the
    * loser's `mode=overwrite` write would clobber the winner's
    * already-committed files. The manifest stores whatever dir the
    * winner wrote, so the spelling carries no meaning beyond the
    * `shards-v` prefix the vacuum walks. */
  private def writerUid(): String =
    f"${java.util.concurrent.ThreadLocalRandom.current().nextLong() & 0xffffffffL}%08x"

  private def shardExpr(keyCols: Seq[String], nShards: Int,
      salt: String): Column = {
    // \u0001-separated components with a \u0002 null sentinel:
    // ("a", null) ≠ ("a", "") and ("ab","c") ≠ ("a","bc") — the control
    // chars never occur in real key text, so the encoding is injective
    val key = concat_ws("\u0001",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    pmod(Sharding.orderHash(key, salt), lit(nShards.toLong))
  }

  /** The commit: CAS-create `manifest-v<version>` — no-clobber, so at
    * most one writer per version number ever wins — then roll the
    * `manifest.current` cache pointer forward. Returns false when the
    * version was already committed (a concurrent writer, or a previous
    * crash's committed-but-unpointed file — indistinguishable by
    * design, and both read the same way: someone owns this version,
    * re-read and go again). The pointer write is best-effort: readers
    * resolve through the newest committed FILE ([[readManifest]]), so
    * a crash between the two leaves a fully-committed version that the
    * next reader/writer simply rolls forward to. */
  private[operators] def tryCommitManifest(spark: SparkSession, dir: String,
      m: Manifest): Boolean = {
    val f = IndexFs.fs(spark, dir)
    // the anchor rides as a 5th header field (absent on pre-r15
    // manifests); relative like every stored path. The 6th field is
    // the trailer FORMAT FLAG: it announces, from the header line —
    // which a torn tail can never lose — that this body ends in a
    // count trailer, so readManifestFile can require the trailer for
    // manifests that promised one while still reading pre-flag
    // snapshots (which never wrote a trailer) untouched.
    val header = Seq("meta", m.nShards.toString, m.salt, ShardHashVersion,
      m.anchor.map(relativizeShardPath(dir, _)).getOrElse(""),
      TrailerFlag).mkString("\t")
    // trailer = shard-line count: makes the body SELF-VALIDATING. On
    // schemes where writeSmallFileNoClobber falls back to a direct
    // create (no AbstractFileSystem binding), a concurrent reader can
    // glimpse the create-to-close window; without the trailer a
    // truncated shard list parses SUCCESSFULLY (header intact, tail
    // lines missing) and that reader silently scans a smaller
    // snapshot. readManifestFile requires the trailer, so a torn read
    // fails loudly instead.
    val shardLines = m.shards.toSeq.sortBy(_._1)
      .map { case (k, p) => s"$k\t${relativizeShardPath(dir, p)}" }
    val body = ((header +: shardLines) :+ s"end\t${shardLines.length}")
      .mkString("\n")
    val name = s"manifest-v${m.version}"
    val won = IndexFs.writeSmallFileNoClobber(spark, f,
      new org.apache.hadoop.fs.Path(s"${norm(dir)}/$name"), body)
    if (won)
      IndexFs.atomicWriteSmallFile(spark, f,
        new org.apache.hadoop.fs.Path(manifestPtr(dir)), name)
    won
  }

  /** The LIVE manifest — the NEWEST committed manifest file (one root
    * listing; a manifest file exists iff its commit CAS won, so the
    * listing can never surface a torn or in-flight version). The
    * `manifest.current` pointer is only a fallback for snapshots
    * written before the CAS protocol whose superseded files were all
    * vacuumed — when manifest files exist they win, so a stale pointer
    * (crash between CAS and pointer write, or a delayed pointer write
    * racing a later commit) can never roll a reader backwards.
    * Manifests written before the hash-version tag existed were built
    * under the same (never-changed) h1 assignment — read as h1. */
  private[operators] def readManifest(spark: SparkSession,
      dir: String): Manifest = {
    val versions = shardedVersions(spark, dir)
    if (versions.nonEmpty)
      readManifestFile(spark, dir, s"manifest-v${versions.last}")
    else {
      val f = IndexFs.fs(spark, dir)
      val name = IndexFs.readSmallFile(f,
        new org.apache.hadoop.fs.Path(manifestPtr(dir)))
      readManifestFile(spark, dir, name)
    }
  }

  /** Appends a retire log entry: the shard dirs + manifest file that
    * version `supersededBy` made unreachable. The LOG FILE's mtime is
    * the supersession instant — exactly what [[vacuumSharded]]'s
    * retention window must measure from (a shard dir's own mtime is its
    * WRITE time, which can be arbitrarily older than the merge that
    * retired it). Advisory, not transactional: a torn write degrades
    * to the orphan path (mtime-cutoff reaping), never to data loss. */
  private def writeRetireLog(spark: SparkSession, dir: String,
      supersededBy: Long, retiredDirs: Seq[String],
      retiredManifest: String): Unit = {
    if (retiredDirs.isEmpty && retiredManifest.isEmpty) return
    val f = IndexFs.fs(spark, dir)
    val body = (retiredManifest +: retiredDirs.map(relativizeShardPath(dir, _)))
      .filter(_.nonEmpty).mkString("\n")
    val p = new org.apache.hadoop.fs.Path(
      s"${retiredDir(dir)}/retired-v$supersededBy")
    val out = f.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  def existsSharded(spark: SparkSession, dir: String): Boolean =
    IndexFs.exists(spark, manifestPtr(dir)) ||
      shardedVersions(spark, dir).nonEmpty // committed, pointer write lost

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
    requireNoReservedKeyNames(df, keyCols, "input")
    require(!existsSharded(spark, dir),
      s"sharded snapshot already exists at $dir — upsertSharded into it")
    // micros timestamps (scoped, Layout.withMicrosTimestamps): shard
    // files are internal — read back only through Spark — and INT64
    // stats are what lets a timestamp Band prune in readShardedPruned
    val uid = writerUid()
    val vDir = s"${norm(dir)}/shards-v1-$uid"
    val anchorDir = s"${norm(dir)}/schema-v1-$uid"
    Layout.withMicrosTimestamps(spark) {
      df.limit(0).write.mode("overwrite").parquet(anchorDir)
      df.withColumn("__shard", shardExpr(keyCols, nShards, salt))
        .repartition(col("__shard"))
        .write.partitionBy("__shard").mode("overwrite").parquet(vDir)
    }
    val present = IndexFs.listDirNames(spark, vDir)
      .filter(_.startsWith("__shard="))
      .map(n => n.stripPrefix("__shard=").toLong -> s"$vDir/$n")
    if (!tryCommitManifest(spark, dir,
        Manifest(1L, nShards, salt, present.toMap, Some(anchorDir)))) {
      IndexFs.deleteRecursively(spark, vDir)
      IndexFs.deleteRecursively(spark, anchorDir)
      throw new ConcurrentCommitException(
        s"sharded snapshot at $dir was created concurrently (version 1 " +
          "already committed) — upsertSharded into it instead")
    }
  }

  /** The current sharded snapshot — a union scan of the manifest's
    * shard dirs (schema anchored by the manifest's zero-row anchor
    * relation, so even an empty snapshot reads with full schema). */
  def readSharded(spark: SparkSession, dir: String): DataFrame = {
    val m = readManifest(spark, dir)
    // the anchor joins the scan ONLY when no shard holds rows: when
    // shards exist they carry the schema themselves, and the anchor
    // is pure schema metadata (both now version together through the
    // manifest, so a read can never mix two physical schemas)
    val dirs =
      if (m.shards.isEmpty) Seq(anchorDirOf(spark, dir, m))
      else m.shards.toSeq.sortBy(_._1).map(_._2)
    spark.read.parquet(dirs: _*)
  }

  /** Reads a named manifest FILE (not the pointer) — shared by
    * [[readManifest]] and the time-travel path. */
  private def readManifestFile(spark: SparkSession, dir: String,
      name: String): Manifest = {
    val f = IndexFs.fs(spark, dir)
    val lines = IndexFs.readSmallFile(f,
      new org.apache.hadoop.fs.Path(s"${norm(dir)}/$name")).split("\n").toSeq
    val meta = lines.head.split("\t")
    require(meta(0) == "meta", s"corrupt manifest $name: bad header")
    val ver = if (meta.length >= 4) meta(3) else "h1"
    require(ver == ShardHashVersion,
      s"snapshot at $dir was sharded under hash version $ver, this " +
        s"build uses $ShardHashVersion — rebuild it (createSharded) " +
        "before merging into it")
    // the self-validation gate, keyed on the header's format flag: a
    // flagged manifest whose body lacks a correct `end\t<n>` trailer
    // is a torn read (fallback-path create-to-close window) or
    // corruption — fail loudly, never scan a partial shard map. The
    // flag lives in the HEADER because a torn tail can lose the
    // trailer but never the first line — so "flagged but trailerless"
    // is unambiguously torn, while an UNflagged manifest is a
    // pre-flag snapshot that never wrote a trailer and still reads
    // (its end lines, if any interim build wrote them, are skipped).
    val bodyLines = lines.tail.filter(_.nonEmpty)
    val shardLines =
      if (meta.length >= 6 && meta(5) == TrailerFlag) {
        require(bodyLines.nonEmpty && bodyLines.last.startsWith("end\t"),
          s"corrupt or torn manifest $name at $dir: missing end trailer " +
            "(concurrent read of an in-flight commit? retry the read)")
        require(bodyLines.last == s"end\t${bodyLines.init.length}",
          s"corrupt or torn manifest $name at $dir: trailer " +
            s"'${bodyLines.last}' does not match ${bodyLines.init.length} " +
            "shard lines (concurrent read of an in-flight commit? retry)")
        bodyLines.init
      } else bodyLines.filterNot(_.startsWith("end\t"))
    Manifest(name.stripPrefix("manifest-v").toLong,
      meta(1).toInt, meta(2),
      shardLines.map { l =>
        val Array(k, p) = l.split("\t", 2)
        k.toLong -> resolveShardPath(dir, p)
      }.toMap,
      anchor = if (meta.length >= 5 && meta(4).nonEmpty)
        Some(resolveShardPath(dir, meta(4))) else None)
  }

  /** The snapshot versions currently READABLE — every manifest whose
    * file [[vacuumSharded]] has not yet reaped, ascending. The newest
    * entry is the live version; older entries are time-travel targets
    * for as long as the retention window keeps them. O(1) driver
    * listing of the snapshot root. */
  def shardedVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = IndexFs.fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(norm(dir))
    if (!f.exists(p)) return Seq.empty
    f.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.matches("manifest-v\\d+"))
      .map(_.getPath.getName.stripPrefix("manifest-v").toLong).sorted
  }

  /** TIME TRAVEL: the snapshot exactly as version `version` committed
    * it — the emergent read the commit-vs-retire split pays for: every
    * upsert/optimize leaves its predecessor's manifest AND shard dirs
    * intact until [[vacuumSharded]]'s window expires, so any version
    * inside the window is a complete, consistent union scan (the
    * Delta/Iceberg `VERSION AS OF` shape). Fails LOUDLY — never a
    * partial result — when the version's manifest or any of its shard
    * dirs has been vacuumed: a time-travel read outside the retention
    * window is a caller error, not a silently-smaller snapshot.
    *
    * The anchor is versioned through the manifest (r15), so an EMPTY
    * version (all-deleted or just-created) reads with ITS OWN schema,
    * even across a later [[evolveSharded]]/[[migrateSharded]]. Legacy
    * manifests (no anchor field) fall back to the current pointer
    * anchor — for those the pre-r15 limit stands: an empty legacy
    * version reports today's schema (rows are correct either way —
    * zero). */
  def readShardedVersion(spark: SparkSession, dir: String,
      version: Long): DataFrame = {
    val m = requireReadableVersion(spark, dir, version)
    // shards carry the schema; the version's anchor joins only when
    // the version is empty
    val dirs =
      if (m.shards.isEmpty) Seq(anchorDirOf(spark, dir, m))
      else m.shards.toSeq.sortBy(_._1).map(_._2)
    spark.read.parquet(dirs: _*)
  }

  /** [[upsert]] against a sharded snapshot: reads and rewrites ONLY the
    * shards the batch's keys hash into; everything else is carried into
    * the new manifest by REFERENCE. Commit = a CAS-create of the target
    * version's manifest file (atomic, no-clobber); superseded dirs are
    * NOT deleted here — they are logged to `_retired/` and reaped by
    * [[vacuumSharded]] behind its retention window, so a reader that
    * resolved the old manifest keeps a complete old snapshot. A crash
    * before the commit leaves the old manifest resolving the complete
    * old snapshot, and the half-written delta dirs are inert until
    * [[vacuumSharded]] reaps them. Same merge/delete/precedence/replay/
    * broadcast contract as [[upsert]].
    *
    * CONCURRENT writers are safe (optimistic concurrency): a writer
    * that read version N can commit N+1 only if nobody else has — a
    * lost CAS re-reads the moved snapshot and REDOES the merge against
    * it, so no committed batch is ever silently discarded. The outcome
    * for keys both writers touch is keep-last in commit order, exactly
    * as if the batches had arrived sequentially. The retry is bounded;
    * exhaustion throws [[ConcurrentCommitException]] rather than
    * spinning against a sustained hotter writer (the batch stays
    * replayable — nothing was committed and the tag was not marked).
    *
    * @param onCommitAttempt hook invoked on EVERY attempt, after the
    *        delta write and immediately before the commit CAS — the
    *        observability/test seam for the race window (count commit
    *        retries, or interleave a competing writer deterministically
    *        the way SnapshotMergeSpec does). Must not mutate this
    *        writer's inputs. */
  def upsertSharded(updates: DataFrame, keyCols: Seq[String], dir: String,
      deleteCol: Option[String] = None,
      updateOrder: Option[Seq[Column]] = None,
      commitTag: Option[String] = None,
      broadcastKeys: Boolean = true,
      onCommitAttempt: () => Unit = () => ()): Boolean = {
    val spark = updates.sparkSession
    require(keyCols.nonEmpty && keyCols.forall(updates.columns.contains),
      s"bad key columns $keyCols for ${updates.columns.mkString(",")}")
    deleteCol.foreach(c => require(updates.columns.contains(c),
      s"deleteCol $c absent from updates"))
    requireNoReservedKeyNames(updates, keyCols, "updates")
    commitTag.foreach(IndexFs.requireValidTag)
    if (commitTag.exists(t => IndexFs.isCommitted(spark, dir, t)))
      return false
    require(existsSharded(spark, dir),
      s"no sharded snapshot at $dir — createSharded first")

    val ranked = updateOrder match {
      case Some(order) => graft.ops.Dedup.keepLast(updates, keyCols, order)
      case None => updates
    }
    val insertRows = deleteCol match {
      case Some(c) => ranked.filter(!coalesce(col(c), lit(false))).drop(c)
      case None => ranked
    }

    // everything below depends on the manifest just read, so a lost CAS
    // restarts from here against the moved snapshot: the shard → dir
    // map and schema anchor can move, and since reshardSharded even
    // nShards/salt can change between attempts — which is exactly why
    // shardExpr below is re-derived from the re-read manifest each time
    val maxCommitAttempts = 5
    for (attempt <- 1 to maxCommitAttempts) {
      val m = readManifest(spark, dir)
      val shard = shardExpr(keyCols, m.nShards, m.salt)
      val inserts = insertRows.withColumn("__shard", shard)
      // (r22 note: a one-collect variant — pulling the distinct key set
      // to the driver to serve both the footprint and the anti-join's
      // broadcast side as a LocalRelation — measured consistently
      // SLOWER on q_merge_concurrent across three windows: the
      // key rows embedded in every downstream plan grow analysis and
      // task-binary cost by more than the saved broadcast-build job.
      // Reverted to the plan-side spelling.)
      val touchedKeys = ranked.select(keyCols.map(col): _*).distinct()
        .withColumn("__shard", shard)
      // the batch's shard footprint — at most nShards rows
      val touched = touchedKeys.select(col("__shard")).distinct()
        .collect().map(_.getLong(0)).toSet
      val keySide = touchedKeys.drop("__shard")

      // schema gate against the zero-row anchor relation, NOT just the
      // touched dirs (a batch landing only in empty shards must not
      // smuggle a divergent schema past the check): the sharded layout
      // does not evolve in place — untouched shards are carried by
      // reference with their old physical schema, so evolution is the
      // explicit evolveSharded/migrateSharded maintenance op
      val anchorCols = spark.read.parquet(anchorDirOf(spark, dir, m)).columns
      require(
        anchorCols.sorted.toSeq ==
          inserts.columns.filterNot(_ == "__shard").sorted.toSeq,
        s"upsertSharded schema mismatch: snapshot has " +
          s"${anchorCols.sorted.mkString(",")}, updates bring " +
          s"${inserts.drop("__shard").columns.sorted.mkString(",")} — " +
          "the sharded layout does not evolve in place (untouched shards " +
          "are carried by reference); run evolveSharded first")
      val currentTouchedDirs =
        m.shards.view.filterKeys(touched).values.toSeq
      val survivors =
        if (currentTouchedDirs.isEmpty) inserts.limit(0)
        else {
          val current = spark.read.parquet(currentTouchedDirs: _*)
          survivorAntiJoin(current, keySide, keyCols, broadcastKeys)
            .withColumn("__shard", shard)
        }

      val next = m.version + 1
      val deltaDir = s"${norm(dir)}/shards-v$next-${writerUid()}"
      Layout.withMicrosTimestamps(spark) {
        survivors.unionByName(inserts)
          .repartition(col("__shard"))
          .write.partitionBy("__shard").mode("overwrite").parquet(deltaDir)
      }
      val rewritten = IndexFs.listDirNames(spark, deltaDir)
        .filter(_.startsWith("__shard="))
        .map(n => n.stripPrefix("__shard=").toLong -> s"$deltaDir/$n")
        .toMap
      // untouched shards ride along by reference; touched ones remap to
      // the delta (a touched shard rewritten to zero rows drops out)
      val merged = (m.shards -- touched) ++ rewritten
      onCommitAttempt()
      if (tryCommitManifest(spark, dir,
          Manifest(next, m.nShards, m.salt, merged, m.anchor))) {
        // the commit is complete at the CAS above; superseded dirs +
        // manifest go to the retire log for a windowed vacuum
        writeRetireLog(spark, dir, next, currentTouchedDirs,
          s"manifest-v${m.version}")
        commitTag.foreach(t => IndexFs.markCommitted(spark, dir, t))
        return true
      }
      // lost the race: our delta references nothing committed — drop it
      // and re-merge against whatever version beat us
      IndexFs.deleteRecursively(spark, deltaDir)
    }
    throw new ConcurrentCommitException(
      s"upsertSharded at $dir lost the commit CAS $maxCommitAttempts " +
        "times in a row — a sustained concurrent writer owns this " +
        "snapshot; back off and replay the batch (idempotent, and " +
        "at-most-once under its commitTag)")
  }

  /** Re-clusters every shard of a sharded snapshot on `clusterCols`
    * ([[Layout]] curve layout, per shard) — the OPTIMIZE that gives the
    * MERGE store the same footer-stat file skipping the plain z-ordered
    * datasets have ([[Layout.readPruned]] /
    * [[readShardedPruned]]). ONE Spark job for all shards: the z-key is
    * computed over the full snapshot (global min/max ranks, so a band
    * maps to the same rank window in every shard), rows are
    * range-exchanged on (shard, z) into ≈`nShards × filesPerShard`
    * slices, and the partitioned write splits boundary slices per
    * shard — clustered files land under each `__shard=` dir, each with
    * a narrow stats window, plus a [[Layout]] stats sidecar per shard.
    * Commits like an upsert: new version dir, manifest CAS, superseded
    * dirs retire-logged for [[vacuumSharded]]. Content is preserved
    * row-for-row (hash-gated in q_merge_optimize_sharded). A lost CAS
    * (a concurrent CDC batch committed mid-rewrite) throws
    * [[ConcurrentCommitException]] — retrying a FULL-rewrite against a
    * moved snapshot is an operator decision, not something to spin on
    * silently; the committed snapshot is untouched and the failed
    * delta is deleted. Maintenance-window cost: one full snapshot
    * read + clustered write — the same posture as [[Layout.optimize]]
    * and the index refits. `keyCols` are the snapshot's merge keys (the
    * manifest persists the hash params but not the key column NAMES —
    * schema-level knowledge the caller owns, same as
    * [[upsertSharded]]); the shard assignment is recomputed from them,
    * deterministically identical to every batch's. */
  def optimizeSharded(spark: SparkSession, dir: String,
      keyCols: Seq[String], clusterCols: Seq[String],
      filesPerShard: Int = 1, curve: String = "morton",
      rankMode: String = "equiwidth"): Unit = {
    require(filesPerShard > 0, s"filesPerShard=$filesPerShard must be positive")
    val m = readManifest(spark, dir)
    require(m.shards.nonEmpty, s"nothing to optimize at $dir (empty snapshot)")
    val current = spark.read.parquet(m.shards.toSeq.sortBy(_._1).map(_._2): _*)
    require(keyCols.nonEmpty && keyCols.forall(current.columns.contains),
      s"bad key columns $keyCols for ${current.columns.mkString(",")}")
    require(clusterCols.nonEmpty && clusterCols.forall(current.columns.contains),
      s"bad cluster columns $clusterCols for ${current.columns.mkString(",")}")
    val next = m.version + 1
    val deltaDir = s"${norm(dir)}/shards-v$next-${writerUid()}"
    val withShard = current.withColumn("__shard",
      shardExpr(keyCols, m.nShards, m.salt))
    Layout.withMicrosTimestamps(spark) {
      Layout.withZValue(withShard, clusterCols, curve = curve,
          rankMode = rankMode)
        .repartitionByRange(math.max(1, m.shards.size * filesPerShard),
          col("__shard"), col("__zvalue"))
        .sortWithinPartitions("__shard", "__zvalue")
        .drop("__zvalue")
        .write.partitionBy("__shard").mode("overwrite").parquet(deltaDir)
    }
    val rewritten = IndexFs.listDirNames(spark, deltaDir)
      .filter(_.startsWith("__shard="))
      .map(n => n.stripPrefix("__shard=").toLong -> s"$deltaDir/$n")
      .toMap
    rewritten.values.foreach(d => Layout.writeStatsSidecar(spark, d, clusterCols))
    val mergedShards = m.shards.filter { case (k, _) =>
      !rewritten.contains(k) } ++ rewritten
    commitMaintenanceOrThrow(spark, dir, deltaDir,
      Manifest(next, m.nShards, m.salt, mergedShards, m.anchor),
      "optimizeSharded")
    writeRetireLog(spark, dir, next,
      m.shards.view.filterKeys(rewritten.contains).values.toSeq,
      s"manifest-v${m.version}")
  }

  /** Small-file COMPACTION without re-clustering — the maintenance op
    * between CDC batches and a full [[optimizeSharded]] (Delta's
    * OPTIMIZE minus ZORDER): after N batches a hot shard holds one
    * small file per batch that touched it, and every read of that
    * shard pays N opens. This bin-packs each QUALIFYING shard's files
    * back into one and carries every other shard by reference, so the
    * cost tracks the touched SMALL-FILE bytes, not the snapshot.
    * Qualifying = at least `minFiles` parquet files AND total bytes
    * ≤ `targetFileBytes`: a shard already past the target needs the
    * full re-cluster (which decides row order for the split); plain
    * bin-packing it would write multi-file output in arbitrary order
    * and destroy any clustering it had. Row content is preserved
    * exactly; existing stats sidecars do NOT carry over (the new file
    * replaces the old boundaries — pruned reads fall back to parquet
    * footers until the next OPTIMIZE refreshes the sidecar).
    *
    * ONE Spark job for all qualifying shards (each shard's rows tagged
    * with its manifest shard id — no key re-hash, so no `keyCols`
    * param and no reshard risk), then the standard maintenance commit:
    * writer-unique version dir, manifest CAS (lost race throws
    * [[ConcurrentCommitException]]), superseded dirs retire-logged.
    * The per-shard listing fan-out is overlapped
    * ([[IndexFs.parMapOrdered]]). Returns the number of shards
    * compacted (0 = nothing qualified, no version committed). */
  def compactSharded(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      minFiles: Int = 2): Int = {
    require(targetFileBytes > 0 && minFiles >= 2,
      s"need targetFileBytes > 0 and minFiles >= 2, got " +
        s"($targetFileBytes, $minFiles)")
    val m = readManifest(spark, dir)
    val f = IndexFs.fs(spark, dir)
    val stats = IndexFs.parMapOrdered(m.shards.toSeq.sortBy(_._1)) {
      case (k, p) =>
        val sts = f.listStatus(new org.apache.hadoop.fs.Path(p))
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        (k, p, sts.length, sts.map(_.getLen).sum)
    }
    val qualifying = stats.filter { case (_, _, n, bytes) =>
      n >= minFiles && bytes <= targetFileBytes }
    if (qualifying.isEmpty) return 0
    // ONE multi-dir scan (not a per-shard union — a 256-leaf union plan
    // costs more to plan and schedule than the data); each row's shard
    // id is recovered from its file's immediate PARENT dir (`__shard=K`
    // — parent-only, so a user root path that happens to contain a
    // `__shard=` segment can never hijack it), evaluated at the scan
    // before the exchange — no key re-hash
    val packed = spark.read.parquet(qualifying.map(_._2): _*)
      .withColumn("__shard",
        regexp_extract(element_at(split(input_file_name(), "/"), -2),
          "^__shard=(\\d+)$", 1).cast("long"))
    val next = m.version + 1
    val deltaDir = s"${norm(dir)}/shards-v$next-${writerUid()}"
    Layout.withMicrosTimestamps(spark) {
      packed
        .repartition(col("__shard")) // all of a shard's rows → one task → one file
        .write.partitionBy("__shard").mode("overwrite").parquet(deltaDir)
    }
    val rewritten = IndexFs.listDirNames(spark, deltaDir)
      .filter(_.startsWith("__shard="))
      .map(n => n.stripPrefix("__shard=").toLong -> s"$deltaDir/$n")
      .toMap
    val mergedShards = m.shards.filter { case (k, _) =>
      !rewritten.contains(k) } ++ rewritten
    commitMaintenanceOrThrow(spark, dir, deltaDir,
      Manifest(next, m.nShards, m.salt, mergedShards, m.anchor),
      "compactSharded")
    writeRetireLog(spark, dir, next,
      m.shards.view.filterKeys(rewritten.contains).values.toSeq,
      s"manifest-v${m.version}")
    qualifying.size
  }

  /** Shared commit tail of the full-rewrite maintenance ops
    * (optimize/evolve/migrate/compact): CAS the manifest; on a lost
    * race delete the already-written delta and fail LOUDLY — a
    * maintenance rewrite must never silently redo itself against a
    * snapshot that moved underneath it (the operator re-decides;
    * upserts are the ones that auto-retry). */
  private[operators] def commitMaintenanceOrThrow(spark: SparkSession, dir: String,
      deltaDir: String, m: Manifest, op: String,
      alsoDelete: Seq[String] = Nil): Unit = {
    if (!tryCommitManifest(spark, dir, m)) {
      IndexFs.deleteRecursively(spark, deltaDir)
      alsoDelete.foreach(IndexFs.deleteRecursively(spark, _))
      throw new ConcurrentCommitException(
        s"$op lost the commit race for version ${m.version} of $dir — a " +
          "concurrent writer committed first; the snapshot is untouched " +
          "and this rewrite was discarded. Re-run against the new " +
          "current version if still wanted")
    }
  }

  /** The sharded snapshot's SCHEMA MIGRATION — the maintenance op the
    * [[upsertSharded]] mismatch error points at: rewrites EVERY shard
    * under the union of the current schema and `template`'s (survivor
    * rows null-fill columns only the template brings; a column the
    * template drops is KEPT — evolution only widens, narrowing is
    * [[migrateSharded]]), writes the widened zero-row anchor as a NEW
    * versioned dir carried by the new manifest (r15 — invisible until
    * the commit CAS lands, so there is no anchor-vs-manifest crash
    * window), and commits like an upsert (new version dir, manifest
    * pointer swap, superseded SHARD dirs AND the superseded anchor
    * retire-logged for [[vacuumSharded]]'s retention window — a legacy
    * pointer-managed anchor is left in place for the legacy manifests
    * that still resolve it). After it,
    * batches carrying the new columns merge normally. Full-rewrite
    * cost by design — the same maintenance-window posture as
    * [[optimizeSharded]]: the sharded layout's by-reference carry means
    * there is no cheaper sound evolution (untouched shards would keep
    * the old physical schema and every read would need file-level
    * schema merging forever). Shard ASSIGNMENT is untouched (same
    * nShards/salt — keys don't move), so `keyCols` are needed only to
    * recompute each row's shard. A lost commit CAS throws
    * [[ConcurrentCommitException]], like every maintenance op. */
  def evolveSharded(spark: SparkSession, dir: String,
      keyCols: Seq[String], template: DataFrame): Unit = {
    val m = readManifest(spark, dir)
    val anchor = spark.read.parquet(anchorDirOf(spark, dir, m))
    require(keyCols.nonEmpty && keyCols.forall(anchor.columns.contains),
      s"bad key columns $keyCols for ${anchor.columns.mkString(",")}")
    require(!template.columns.contains("__shard"),
      "reserved internal column name in template: __shard")
    // same guard as every other entry point: a __mergekey_<key> column
    // persisted into the shards + anchor here would brick every later
    // upsertSharded at survivorAntiJoin's snapshot check, and
    // widening-only evolution offers no way back short of a rebuild
    requireNoReservedKeyNames(template, keyCols, "template")
    val newCols = template.columns.filterNot(anchor.columns.contains)
    require(newCols.nonEmpty,
      s"nothing to evolve at $dir: template brings no new columns " +
        s"(snapshot already has ${anchor.columns.sorted.mkString(",")})")
    val widened = anchor.limit(0)
      .unionByName(template.limit(0), allowMissingColumns = true)
    val current =
      if (m.shards.isEmpty) anchor.limit(0)
      else spark.read.parquet(m.shards.toSeq.sortBy(_._1).map(_._2): _*)
    val rewrittenRows = current
      .unionByName(widened.limit(0), allowMissingColumns = true)
      .withColumn("__shard", shardExpr(keyCols, m.nShards, m.salt))
    val next = m.version + 1
    val uid = writerUid()
    val deltaDir = s"${norm(dir)}/shards-v$next-$uid"
    val anchorDir = s"${norm(dir)}/schema-v$next-$uid"
    Layout.withMicrosTimestamps(spark) {
      // the anchor evolves WITH the data, atomically: it lands in a
      // NEW versioned dir that nothing resolves until the manifest CAS
      // commits — a crash or lost race leaves the old manifest (and
      // its old anchor) fully live, and the orphaned dirs are inert
      // until vacuum
      widened.write.mode("overwrite").parquet(anchorDir)
      rewrittenRows
        .repartition(col("__shard"))
        .write.partitionBy("__shard").mode("overwrite").parquet(deltaDir)
    }
    val rewritten = IndexFs.listDirNames(spark, deltaDir)
      .filter(_.startsWith("__shard="))
      .map(n => n.stripPrefix("__shard=").toLong -> s"$deltaDir/$n")
      .toMap
    val mergedShards = m.shards.filter { case (k, _) =>
      !rewritten.contains(k) } ++ rewritten
    commitMaintenanceOrThrow(spark, dir, deltaDir,
      Manifest(next, m.nShards, m.salt, mergedShards, Some(anchorDir)),
      "evolveSharded", alsoDelete = Seq(anchorDir))
    writeRetireLog(spark, dir, next,
      m.shards.view.filterKeys(rewritten.contains).values.toSeq ++
        m.anchor, // the superseded anchor gets the same windowed retention
      s"manifest-v${m.version}")
  }

  /** RESTORE — roll the LIVE snapshot back to a retained version (the
    * Delta `RESTORE TABLE ... VERSION AS OF` shape): commits the target
    * version's shard map as a NEW version, so the rollback is itself
    * versioned, CAS-protected against concurrent writers, and
    * time-travel-able (the rolled-back-over versions stay readable
    * inside the retention window — a restore never destroys history).
    * METADATA-ONLY: no shard data moves; the cost is two manifest
    * reads + one commit, regardless of snapshot size. The target must
    * still be inside [[vacuumSharded]]'s window (loud otherwise — same
    * gate as time travel); restoring to the current version is a loud
    * no-op error. Dirs only the superseded current version referenced
    * are retire-logged; dirs the restore makes live again are protected
    * from every pending retire entry by vacuum's liveness check (live
    * paths are never reaped, whatever named them).
    *
    * Composes with the other maintenance ops: the restored manifest
    * carries ITS OWN nShards/salt AND its own schema anchor, so
    * restoring across a [[reshardSharded]] boundary re-activates the
    * old assignment, and restoring across an
    * [[evolveSharded]]/[[migrateSharded]] rolls the SCHEMA back with
    * the data — the next upsert merges under the restored schema (a
    * legacy no-anchor target keeps resolving the pointer anchor, whose
    * schema the migrate lifecycle owns). Returns the new (restored)
    * version number. */
  def restoreSharded(spark: SparkSession, dir: String,
      version: Long): Long = {
    val m = readManifest(spark, dir)
    require(version != m.version,
      s"restoreSharded: version $version IS the live version of $dir")
    val target = requireReadableVersion(spark, dir, version)
    val next = m.version + 1
    if (!tryCommitManifest(spark, dir,
        Manifest(next, target.nShards, target.salt, target.shards,
          target.anchor)))
      throw new ConcurrentCommitException(
        s"restoreSharded lost the commit race for version $next of $dir — " +
          "a concurrent writer committed first; re-read and re-decide " +
          "the restore target")
    val reactivated = target.shards.values.toSet ++ target.anchor
    writeRetireLog(spark, dir, next,
      (m.shards.values ++ m.anchor).filterNot(reactivated.contains).toSeq,
      s"manifest-v${m.version}")
    next
  }

  /** RESHARD — change the snapshot's shard COUNT (the answer to
    * [[describeSharded]]'s bytes-skew signal: shards sized for last
    * year's corpus stop matching this year's): a full rewrite under
    * the new assignment (`newNShards`, same salt), committed like
    * every maintenance op (CAS; lost race throws
    * [[ConcurrentCommitException]]; every old shard dir retire-logged).
    * Key VALUES and rows are untouched — only which shard each key
    * hashes into changes, and every later batch reads the new
    * `nShards` from the manifest, so the assignment can never diverge
    * between writers. Old versions time-travel with THEIR assignment
    * (each manifest carries its own params), and a CDF span crossing
    * the reshard compares by value and emits nothing for it. Returns
    * false (committing nothing) when the snapshot is already at
    * `newNShards` — so callers can invoke it idempotently from a
    * maintenance loop. Full-rewrite cost by design. */
  def reshardSharded(spark: SparkSession, dir: String,
      keyCols: Seq[String], newNShards: Int): Boolean = {
    require(newNShards > 0, s"newNShards=$newNShards must be positive")
    val m = readManifest(spark, dir)
    if (newNShards == m.nShards) return false
    val anchor = spark.read.parquet(anchorDirOf(spark, dir, m))
    require(keyCols.nonEmpty && keyCols.forall(anchor.columns.contains),
      s"bad key columns $keyCols for ${anchor.columns.mkString(",")}")
    val current =
      if (m.shards.isEmpty) anchor.limit(0)
      else spark.read.parquet(m.shards.toSeq.sortBy(_._1).map(_._2): _*)
    val next = m.version + 1
    val deltaDir = s"${norm(dir)}/shards-v$next-${writerUid()}"
    Layout.withMicrosTimestamps(spark) {
      current
        .withColumn("__shard", shardExpr(keyCols, newNShards, m.salt))
        .repartition(col("__shard"))
        .write.partitionBy("__shard").mode("overwrite").parquet(deltaDir)
    }
    val rewritten = IndexFs.listDirNames(spark, deltaDir)
      .filter(_.startsWith("__shard="))
      .map(n => n.stripPrefix("__shard=").toLong -> s"$deltaDir/$n")
      .toMap
    commitMaintenanceOrThrow(spark, dir, deltaDir,
      Manifest(next, newNShards, m.salt, rewritten, m.anchor),
      "reshardSharded")
    writeRetireLog(spark, dir, next, m.shards.values.toSeq,
      s"manifest-v${m.version}")
    true
  }

  /** COLUMN RENAME / DROP migration — the narrowing counterpart of
    * [[evolveSharded]] (which only widens): rewrites EVERY shard under
    * the target schema (`renames` applied, `drops` removed), refreshes
    * the zero-row `schema/` anchor, and commits like every maintenance
    * op (writer-unique version dir, manifest CAS — a lost race throws
    * [[ConcurrentCommitException]] — superseded shard dirs
    * retire-logged). Old versions keep their OLD schema: shard files
    * are immutable and time travel reads them as written, so a
    * `readShardedVersion` before the migration still shows the dropped
    * column. After it, batches must arrive in the NEW spelling and
    * callers address the snapshot with the NEW key names.
    *
    * Renaming a KEY column is legal — the shard assignment hashes key
    * VALUES, which don't move (the assignment is recomputed under the
    * old names before the rename is applied). Dropping a key column is
    * refused: it would merge previously-distinct keys, which is a
    * semantic rekey, not a migration — rebuild via [[createSharded]].
    * Full-rewrite cost by design, same posture (and same reason) as
    * [[evolveSharded]]. */
  def migrateSharded(spark: SparkSession, dir: String, keyCols: Seq[String],
      renames: Map[String, String] = Map.empty,
      drops: Seq[String] = Nil): Unit = {
    val m = readManifest(spark, dir)
    val anchor = spark.read.parquet(anchorDirOf(spark, dir, m))
    val cols = anchor.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"bad key columns $keyCols for ${cols.mkString(",")}")
    require(renames.nonEmpty || drops.nonEmpty,
      s"nothing to migrate at $dir: no renames, no drops")
    val absent = (renames.keys ++ drops).filterNot(cols.contains).toSeq
    require(absent.isEmpty,
      s"migrateSharded names absent column(s) ${absent.mkString(",")} " +
        s"(snapshot has ${cols.sorted.mkString(",")})")
    require(!drops.exists(keyCols.contains),
      s"cannot drop key column(s) ${drops.filter(keyCols.contains).mkString(",")} " +
        "— merging distinct keys is a rekey; rebuild with createSharded")
    require(!renames.keys.exists(drops.contains),
      "a column cannot be both renamed and dropped")
    val newKeyCols = keyCols.map(c => renames.getOrElse(c, c))
    // the target anchor carries every remaining validation: duplicate
    // targets fail in withColumnsRenamed, reserved names in the guards
    val newAnchor = renames.foldLeft(
        drops.foldLeft(anchor.limit(0))(_.drop(_))) {
      case (df, (from, to)) =>
        require(!df.columns.contains(to) || from == to,
          s"rename target $to collides with an existing column")
        df.withColumnRenamed(from, to)
    }
    require(!newAnchor.columns.contains("__shard"),
      "reserved internal column name in migrated schema: __shard")
    requireNoReservedKeyNames(newAnchor, newKeyCols, "migrated schema")

    val current =
      if (m.shards.isEmpty) anchor.limit(0)
      else spark.read.parquet(m.shards.toSeq.sortBy(_._1).map(_._2): _*)
    // shard BEFORE renaming: assignment hashes the same key values
    // every batch hashed, regardless of what the columns are called
    val rewrittenRows = renames.foldLeft(
        drops.foldLeft(
          current.withColumn("__shard", shardExpr(keyCols, m.nShards, m.salt))
        )(_.drop(_))) {
      case (df, (from, to)) => df.withColumnRenamed(from, to)
    }
    val next = m.version + 1
    val uid = writerUid()
    val deltaDir = s"${norm(dir)}/shards-v$next-$uid"
    val anchorDir = s"${norm(dir)}/schema-v$next-$uid"
    Layout.withMicrosTimestamps(spark) {
      // versioned anchor (r15): the narrowed anchor lands in a new dir
      // nothing resolves until the CAS commits — the pre-r15 ordering
      // dilemma (publish before the CAS under-reports columns to the
      // old manifest, publish after leaves a crash window where the
      // new manifest sees the old wider anchor) is gone
      newAnchor.write.mode("overwrite").parquet(anchorDir)
      rewrittenRows
        .repartition(col("__shard"))
        .write.partitionBy("__shard").mode("overwrite").parquet(deltaDir)
    }
    val rewritten = IndexFs.listDirNames(spark, deltaDir)
      .filter(_.startsWith("__shard="))
      .map(n => n.stripPrefix("__shard=").toLong -> s"$deltaDir/$n")
      .toMap
    val mergedShards = m.shards.filter { case (k, _) =>
      !rewritten.contains(k) } ++ rewritten
    commitMaintenanceOrThrow(spark, dir, deltaDir,
      Manifest(next, m.nShards, m.salt, mergedShards, Some(anchorDir)),
      "migrateSharded", alsoDelete = Seq(anchorDir))
    writeRetireLog(spark, dir, next,
      m.shards.view.filterKeys(rewritten.contains).values.toSeq ++
        m.anchor,
      s"manifest-v${m.version}")
  }

  /** CHANGE DATA FEED between two retained versions — what turns the
    * snapshot from a thing CDC flows INTO into a thing downstream
    * incremental consumers flow OUT of (index maintenance, replication,
    * cache invalidation — the Delta CDF shape): every row-level change
    * that takes version `fromVersion` to `toVersion`, typed in
    * `_change_type` as `insert` / `delete` / `update_preimage` /
    * `update_postimage` (updates emit BOTH images, one row each).
    *
    * Computed from the two version manifests' DIFFERING shards only —
    * shards carried by reference between the versions are provably
    * unchanged and are not read, so the cost tracks the bytes the
    * intervening merges touched, not the snapshot (a span containing an
    * [[optimizeSharded]]/[[evolveSharded]] full rewrite honestly reads
    * everything — and emits nothing for it, because both rewrites
    * preserve content: rows are compared by VALUE, null-safe, never by
    * file identity). Both sides are diffed with ONE null-safe full-outer
    * join on `keyCols` over struct-packed payloads; schemas are widened
    * to their union first, so a span crossing a schema evolution
    * compares old and new rows on common ground (a column one side
    * lacks reads as null there).
    *
    * Both versions must still be inside [[vacuumSharded]]'s retention
    * window — a vacuumed endpoint fails loudly via
    * [[readShardedVersion]]'s checks, never returns a partial feed.
    * `keyCols` are the snapshot's merge keys, caller-owned as
    * everywhere. Deterministic: one output row per (key, change side).
    */
  def readShardedChanges(spark: SparkSession, dir: String,
      keyCols: Seq[String], fromVersion: Long, toVersion: Long,
      changeTypeCol: String = "_change_type"): DataFrame = {
    require(fromVersion < toVersion,
      s"readShardedChanges needs fromVersion < toVersion, got " +
        s"$fromVersion >= $toVersion")
    val mFrom = requireReadableVersion(spark, dir, fromVersion)
    val mTo = requireReadableVersion(spark, dir, toVersion)
    // only shards whose PHYSICAL dir moved can differ; identical
    // entries are byte-identical by the commit protocol (dirs are
    // immutable once committed) and are skipped unread
    val changedIds = (mFrom.shards.keySet ++ mTo.shards.keySet)
      .filter(k => mFrom.shards.get(k) != mTo.shards.get(k))
    def side(m: Manifest): DataFrame = {
      val dirs = m.shards.view.filterKeys(changedIds).values.toSeq.sorted
      if (dirs.isEmpty)
        spark.read.parquet(anchorDirOf(spark, dir, m)).limit(0)
      else spark.read.parquet(dirs: _*)
    }
    val oldSide = side(mFrom)
    val newSide = side(mTo)
    require(keyCols.nonEmpty &&
      keyCols.forall(c => oldSide.columns.contains(c) &&
        newSide.columns.contains(c)),
      s"bad key columns $keyCols for CDF over $dir " +
        s"(${oldSide.columns.mkString(",")} / ${newSide.columns.mkString(",")})")
    require(!oldSide.columns.contains(changeTypeCol) &&
      !newSide.columns.contains(changeTypeCol),
      s"snapshot already carries a $changeTypeCol column — pass a " +
        "different changeTypeCol")
    // union schema so a cross-evolution span compares on common ground
    val widen = oldSide.limit(0)
      .unionByName(newSide.limit(0), allowMissingColumns = true)
    val dataCols = widen.columns.filterNot(keyCols.contains).toSeq
    def packed(df: DataFrame, payload: String): DataFrame = {
      val w = df.unionByName(widen, allowMissingColumns = true)
      w.select(keyCols.map(col) :+
        struct(dataCols.map(col): _*).as(payload): _*)
    }
    val o = packed(oldSide, "__pre")
    val n = packed(newSide, "__post")
      .toDF(keyCols.map(c => s"__mergekey_$c") :+ "__post": _*)
    val cond = keyCols.map(c => col(c) <=> col(s"__mergekey_$c"))
      .reduce(_ && _)
    val joined = o.join(n, cond, "full_outer")
    val keyOut = keyCols.map(c =>
      coalesce(col(c), col(s"__mergekey_$c")).as(c))
    // one pass over the join: deletes (old only), inserts (new only),
    // and VALUE-changed keys as (pre, post) image pairs — null-safe
    // struct equality makes an untouched row (or a pure
    // re-cluster/evolution rewrite) fall through every branch to a null
    // change array, which explode drops
    val changes = joined.select(keyOut ++ Seq(
      when(col("__post").isNull,
          array(struct(lit("delete").as("t"), col("__pre").as("p"))))
        .when(col("__pre").isNull,
          array(struct(lit("insert").as("t"), col("__post").as("p"))))
        .when(!(col("__pre") <=> col("__post")), array(
          struct(lit("update_preimage").as("t"), col("__pre").as("p")),
          struct(lit("update_postimage").as("t"), col("__post").as("p"))))
        .as("__changes")): _*)
    val exploded = changes
      .select(keyCols.map(col) :+ explode(col("__changes")).as("__c"): _*)
    exploded.select(
      (keyCols.map(col) ++
        dataCols.map(c => col(s"__c.p.$c").as(c))) :+
        col("__c.t").as(changeTypeCol): _*)
  }

  /** Loud readable-version gate shared by [[readShardedVersion]] and
    * [[readShardedChanges]]: the version's manifest AND every shard dir
    * it references must have survived vacuum. */
  private def requireReadableVersion(spark: SparkSession, dir: String,
      version: Long): Manifest = {
    val name = s"manifest-v$version"
    require(IndexFs.exists(spark, s"${norm(dir)}/$name"),
      s"version $version of $dir is not readable — never committed, or " +
        s"its manifest was vacuumed past the retention window " +
        s"(readable versions: ${shardedVersions(spark, dir).mkString(",")})")
    val m = readManifestFile(spark, dir, name)
    val missing = IndexFs.parMapOrdered(
        m.shards.values.toSeq ++ m.anchor)(p =>
      p -> IndexFs.exists(spark, p)).collect { case (p, false) => p }
    require(missing.isEmpty,
      s"version $version of $dir lost ${missing.size} dir(s) to " +
        s"vacuum — raise vacuumSharded's minAgeMs above the longest " +
        s"time-travel horizon (first missing: ${missing.head})")
    m
  }

  /** Footer-stat pruned read over a sharded snapshot (after
    * [[optimizeSharded]]): file selection across every live shard dir
    * from each shard's stats sidecar / parquet footers — a SUPERSET of
    * the rows matching `bands` (re-apply the exact filter), same
    * contract as [[Layout.readPruned]]. */
  def readShardedPruned(spark: SparkSession, dir: String,
      bands: Seq[Layout.Band]): DataFrame = {
    val m = readManifest(spark, dir)
    val dirs = m.shards.toSeq.sortBy(_._1).map(_._2)
    // one sidecar/footer fetch per shard, overlapped — serial
    // round-trips would make the driver stall additive in shard count
    // on an object store
    val selected = IndexFs.parMapOrdered(dirs)(d =>
      Layout.prunedFilesInDir(spark, d, bands)._1).flatten
    if (selected.isEmpty)
      spark.read.parquet(anchorDirOf(spark, dir, m)).limit(0)
    else spark.read.parquet(selected: _*)
  }

  /** The operational DESCRIBE of a sharded snapshot — one row per live
    * shard: (version, shard, path, files, bytes) — plus what an
    * operator planning maintenance needs to see at a glance: which
    * shards have accumulated small files (the OPTIMIZE signal), how the
    * bytes skew across shards (the re-shard signal), and which version
    * is live. Driver-side metadata listing, O(shards) — the same
    * plane `vacuumSharded` walks; read-only. Retained older versions
    * are visible through [[shardedVersions]], not here. */
  def describeSharded(spark: SparkSession, dir: String): DataFrame = {
    val m = readManifest(spark, dir)
    val f = IndexFs.fs(spark, dir)
    // one listStatus per shard, overlapped (IndexFs.parMapOrdered) —
    // a serial walk makes DESCRIBE latency additive in shard count
    val rows = IndexFs.parMapOrdered(m.shards.toSeq.sortBy(_._1)) {
      case (k, pth) =>
        val sts = f.listStatus(new org.apache.hadoop.fs.Path(pth))
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        (m.version, k, pth, sts.length.toLong, sts.map(_.getLen).sum)
    }
    spark.createDataFrame(rows)
      .toDF("version", "shard", "path", "files", "bytes")
  }

  /** Reaps snapshot state nothing can reach anymore, behind a
    * retention window:
    *
    *  - RETIRED shard dirs + manifests (logged by [[upsertSharded]] /
    *    [[optimizeSharded]] at supersession time): deleted once their
    *    retire-log entry is older than `minAgeMs` — measured from the
    *    SUPERSESSION instant (the log file's mtime), so "readers get at
    *    least `minAgeMs` to finish a scan of the old version" holds
    *    regardless of when the data was originally written.
    *  - ORPHANS (delta dirs a crashed upsert half-wrote before its
    *    commit — reachable by no manifest, logged by no retire entry):
    *    under a real window these are reaped CONSERVATIVELY — a
    *    synthesized retire-log entry is written at first sight and the
    *    dir falls to phase 1 a full window later, because an unlogged
    *    dead dir can also be a just-superseded shard whose merge
    *    crashed before its retire-log write (write-time mtime says
    *    nothing about the supersession instant). `minAgeMs = 0` reaps
    *    them immediately on newest-mtime.
    *
    * Liveness is decided on QUALIFIED paths (`fs.makeQualified`) — a
    * caller spelling `dir` differently than at write time (trailing
    * slash, `file:` scheme, a moved snapshot read via relative
    * manifests) can never make a live dir look dead. The current
    * manifest and its shard dirs are never touched. Default
    * `minAgeMs = 0` reaps everything superseded — the spec/CI setting;
    * production callers pass a window comfortably above their longest
    * query (the Delta VACUUM posture). */
  def vacuumSharded(spark: SparkSession, dir: String,
      minAgeMs: Long = 0L): Int = {
    require(minAgeMs >= 0, s"minAgeMs=$minAgeMs must be >= 0")
    val m = readManifest(spark, dir)
    val f = IndexFs.fs(spark, dir)
    def qual(p: String): String =
      f.makeQualified(new org.apache.hadoop.fs.Path(p)).toString
    val cutoff = System.currentTimeMillis() - minAgeMs
    // liveness covers the anchor too (r15: the anchor is a versioned
    // dir the manifest references like any shard dir)
    val live = (m.shards.values ++ m.anchor).map(qual).toSet
    val curManifest = s"manifest-v${m.version}"
    var reaped = 0

    // phase 1: expired retire logs — delete what they name, then them.
    // TWO passes over the log files: a path can appear in SEVERAL
    // retire entries (retired at vN, reactivated by restoreSharded,
    // superseded again at vM — a second retire log, or a crash-window
    // orphan marker), so the protection set from ALL unexpired entries
    // must be complete BEFORE any expired entry deletes — a single
    // interleaved pass would reap a dir inside a later entry's
    // retention window, breaking the "readers keep the old version for
    // minAgeMs after supersession" guarantee. A protected path skipped
    // here is reaped one window later, when its protecting entry
    // expires and names it again.
    val rDir = new org.apache.hadoop.fs.Path(retiredDir(dir))
    val protectedPaths = scala.collection.mutable.Set.empty[String]
    val protectedManifests = scala.collection.mutable.Set.empty[String]
    if (f.exists(rDir)) {
      val retireLogs = f.listStatus(rDir).filter(_.isFile)
        .sortBy(_.getPath.getName)
        .map(st => (st, IndexFs.readSmallFile(f, st.getPath)
          .split("\n").map(_.trim).filter(_.nonEmpty)))
      // pass A: everything any UNEXPIRED entry names stays
      retireLogs.foreach { case (st, entries) =>
        if (st.getModificationTime > cutoff) {
          entries.foreach { e =>
            if (e.startsWith("manifest-v")) protectedManifests += e
            else protectedPaths += qual(resolveShardPath(dir, e))
          }
        }
      }
      // pass B: expired entries reap what they name, minus the
      // protected sets, then delete themselves
      retireLogs.foreach { case (st, entries) =>
        if (st.getModificationTime <= cutoff) {
          entries.foreach { e =>
            if (e.startsWith("manifest-v")) {
              if (e != curManifest && !protectedManifests.contains(e)) {
                val mp = new org.apache.hadoop.fs.Path(s"${norm(dir)}/$e")
                if (f.exists(mp)) { f.delete(mp, false); reaped += 1 }
              }
            } else {
              val p = resolveShardPath(dir, e)
              if (!live.contains(qual(p)) &&
                  !protectedPaths.contains(qual(p)) &&
                  IndexFs.exists(spark, p)) {
                IndexFs.deleteRecursively(spark, p); reaped += 1
              }
            }
          }
          f.delete(st.getPath, false)
        }
      }
    }

    // phase 2: orphans — unreachable and unlogged. With a real window
    // these are NOT reaped on their write-time mtime: an unlogged dead
    // dir can be a JUST-superseded shard whose upsert crashed between
    // the pointer swap and its retire-log write, and its write mtime
    // can be arbitrarily older than the supersession instant — reaping
    // on it would break the "readers keep the old version for minAgeMs
    // after supersession" guarantee across that crash. Instead a
    // retire-log entry is SYNTHESIZED at first sight (mtime = now, the
    // earliest provable supersession bound) and phase 1 reaps it one
    // full window later. True orphans (crashed half-writes) pay the
    // same extra window — slower hygiene, never data loss. minAgeMs=0
    // (the spec/CI setting) keeps the immediate-reap behavior: a zero
    // window waives the reader guarantee by definition.
    val versionDirs = IndexFs.listDirNames(spark, dir)
      .filter(_.startsWith("shards-v")).map(v => s"${norm(dir)}/$v")
    // versioned anchor dirs (r15) are top-level candidates with the
    // same orphan rule — an unreferenced one is a crashed writer's
    // debris or a retire-log-crash leftover, never deletable while the
    // live manifest (or an unexpired retire entry) names it
    val anchorCandidates = IndexFs.listDirNames(spark, dir)
      .filter(_.startsWith("schema-v"))
      .map(s => (norm(dir), s"${norm(dir)}/$s"))
    val shardDirCandidates = versionDirs.flatMap { vDir =>
      IndexFs.listDirNames(spark, vDir).filter(_.startsWith("__shard="))
        .map(s => (vDir, s"$vDir/$s"))
    } ++ anchorCandidates
    // the slow per-dir decision input (a recursive mtime walk each) is
    // gathered with overlapped round-trips; the mutations below stay
    // serial and cheap
    val candidateMtimes = IndexFs.parMapOrdered(shardDirCandidates) {
      case (_, p) => p -> IndexFs.newestMtime(spark, p)
    }.toMap
    shardDirCandidates.foreach { case (_, p) =>
        val q = qual(p)
        if (!live.contains(q) && !protectedPaths.contains(q)) {
          if (minAgeMs == 0L) {
            if (candidateMtimes(p) <= cutoff) {
              IndexFs.deleteRecursively(spark, p); reaped += 1
            }
          } else {
            // deterministic name per qualified path: re-sighting never
            // refreshes the window (create only when absent)
            val digest = java.security.MessageDigest.getInstance("MD5")
              .digest(q.getBytes("UTF-8")).map("%02x".format(_)).mkString
            val marker = new org.apache.hadoop.fs.Path(
              s"${retiredDir(dir)}/orphan-$digest")
            if (!f.exists(marker)) {
              val rel = relativizeShardPath(dir, p)
              val out = f.create(marker, false)
              try out.write(rel.getBytes("UTF-8")) finally out.close()
            }
          }
        }
    }
    // a version dir with no shard children left is a husk (only write
    // markers like _SUCCESS remain) — drop it whole
    versionDirs.foreach { vDir =>
      if (IndexFs.listDirNames(spark, vDir)
          .count(_.startsWith("__shard=")) == 0 &&
          IndexFs.newestMtime(spark, vDir) <= cutoff) {
        IndexFs.deleteRecursively(spark, vDir)
      }
    }

    // phase 3: superseded manifest FILES (pre-retire-log leftovers and
    // crash debris); the current one and any named by an unexpired
    // retire log stay. Same conservative rule as phase 2: under a real
    // window an UNLOGGED superseded manifest gets a synthesized retire
    // entry (its file mtime is the version's COMMIT time, not its
    // supersession time — reaping on it would shrink a time-travel
    // reader's window across the crash); minAgeMs = 0 reaps inline.
    f.listStatus(new org.apache.hadoop.fs.Path(norm(dir)))
      .filter(st => st.isFile && st.getPath.getName.matches("manifest-v\\d+")
        && st.getPath.getName != curManifest
        && !protectedManifests.contains(st.getPath.getName))
      .foreach { st =>
        val name = st.getPath.getName
        if (minAgeMs == 0L) {
          if (st.getModificationTime <= cutoff) {
            f.delete(st.getPath, false); reaped += 1
          }
        } else {
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(name.getBytes("UTF-8")).map("%02x".format(_)).mkString
          val marker = new org.apache.hadoop.fs.Path(
            s"${retiredDir(dir)}/orphanm-$digest")
          if (!f.exists(marker)) {
            val out = f.create(marker, false)
            try out.write(name.getBytes("UTF-8")) finally out.close()
          }
        }
      }
    // CAS tmp debris (a crashed writer's `.manifest-v<N>.cas-<uid>`
    // body that never renamed in): never referenced by anything — reap
    // past the window on write mtime
    f.listStatus(new org.apache.hadoop.fs.Path(norm(dir)))
      .filter(st => st.isFile
        && st.getPath.getName.matches("\\.manifest-v\\d+\\.cas-.*")
        && st.getModificationTime <= cutoff)
      .foreach { st => f.delete(st.getPath, false); reaped += 1 }
    reaped
  }
}
