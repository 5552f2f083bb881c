package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing for persisted-index maintenance, routed through
  * the Hadoop `FileSystem` API so every operation works on any scheme
  * Spark itself can write (`file://`, `hdfs://`, `s3a://`, ...). The
  * r7 version used `java.nio.file`, which silently supported ONLY the
  * local filesystem while the write half of the very same operators
  * already went through Hadoop via parquet — on a cluster the index
  * lives on HDFS/S3 and compaction would throw after writing its tmp
  * dir.
  *
  * Semantics that maintenance protocols lean on: on HDFS-like
  * filesystems (HDFS, local, ABFS) `rename` of a directory is a single
  * atomic metadata operation — the commit primitive of both the
  * relation publish and the staged append. Object stores (S3A) emulate
  * rename as an O(data) copy-and-delete with NO atomicity; for them
  * [[publishRelation]] implements the versioned-dir + marker-file
  * protocol (write `<dir>.v<N>/`, then PUT a tiny `<dir>.current`
  * pointer naming it — the pointer PUT is the atomic step, and readers
  * resolve through [[resolveDir]]), selected per deployment by
  * [[CommitProtocolKey]] or by scheme. The two protocols share one
  * read path but are NOT interchangeable on the same index: pick one
  * per deployment (spec-proven equivalent on the same data —
  * IndexFsSpec / TextDedupSpec protocol twins).
  */
private[graft] object IndexFs {

  /** The `FileSystem` owning `path`'s scheme, from the session's Hadoop
    * configuration (so `fs.defaultFS`, credentials, etc. all apply). */
  def fs(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new HPath(path))

  /** Recursive delete; absent paths are a no-op (idempotent cleanup). */
  def deleteRecursively(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new HPath(path)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Directory rename, the atomic-on-HDFS-like-FS commit step. Hadoop's
    * `rename` signals failure by RETURNING false (parent missing, dest
    * exists, cross-FS move) — turn that into a loud error so a failed
    * commit can never read as a successful one. */
  def rename(spark: SparkSession, src: String, dst: String): Unit = {
    val f = fs(spark, src)
    val d = new HPath(dst)
    val parent = d.getParent
    if (parent != null && !f.exists(parent)) f.mkdirs(parent)
    if (!f.rename(new HPath(src), d))
      throw new java.io.IOException(s"IndexFs.rename failed: $src -> $dst")
  }

  /** No-clobber directory rename — the commit step of [[stagedAppend]].
    * Returns true when THIS call moved `src` to `dst`; false when `dst`
    * already exists (a same-tag writer won the race). Built on
    * `FileContext.rename` with `Rename.NONE`, whose contract REJECTS an
    * existing destination — unlike `FileSystem.rename`, which on
    * HDFS-like filesystems moves the source INTO an existing destination
    * directory (nesting the loser's data as `dst/<srcName>` while
    * returning true — the silent-wrong outcome for two same-tag
    * writers). Schemes with no `AbstractFileSystem` binding fall back to
    * a guarded `FileSystem.rename` with existence re-checks; there the
    * no-clobber window narrows to the rename call itself, so same-tag
    * concurrency is detected best-effort and the formal contract stays
    * single-writer-per-tag (see [[stagedAppend]]). */
  def renameNoClobber(spark: SparkSession, src: String, dst: String): Boolean = {
    val f = fs(spark, src)
    val srcP = f.makeQualified(new HPath(src))
    val dstP = f.makeQualified(new HPath(dst))
    val parent = dstP.getParent
    if (parent != null && !f.exists(parent)) f.mkdirs(parent)
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        srcP.toUri, spark.sparkContext.hadoopConfiguration)
      try { fc.rename(srcP, dstP); true }
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        renameNoClobberFallback(f, srcP, dstP)
    }
  }

  /** The no-`AbstractFileSystem` fallback of [[renameNoClobber]],
    * factored out so its race resolution is directly testable. The
    * hazard it closes: two same-tag writers can both pass the exists
    * pre-check, after which `FileSystem.rename` moves the LOSER's
    * source INTO the just-created destination (as `dst/<srcName>`) and
    * still returns true — exactly the silent-wrong nesting the
    * `FileContext` path rejects by contract. Detection: a clean move
    * leaves `dst`'s child set equal to `src`'s; nesting leaves
    * `dst/<srcName>` holding it instead. A detected nesting is resolved
    * as a lost race (the loser's nested copy is deleted, returns
    * false — the winner's commit IS the batch); any other unexpected
    * destination layout throws rather than reading as success. */
  private[graft] def renameNoClobberFallback(
      f: FileSystem, srcP: HPath, dstP: HPath,
      /** Test seam: runs between the exists pre-check and the rename —
        * the race window this fallback's detection exists for. */
      beforeRename: () => Unit = () => ()): Boolean = {
    if (f.exists(dstP)) return false
    val srcChildren = f.listStatus(srcP).map(_.getPath.getName).toSet
    beforeRename()
    if (!f.rename(srcP, dstP)) {
      if (f.exists(dstP)) return false // lost the race inside the rename
      throw new java.io.IOException(
        s"IndexFs.renameNoClobber failed: $srcP -> $dstP")
    }
    val dstChildren = f.listStatus(dstP).map(_.getPath.getName).toSet
    if (dstChildren == srcChildren) true
    else {
      val nested = new HPath(dstP, srcP.getName)
      if (f.exists(nested) && f.getFileStatus(nested).isDirectory &&
          f.listStatus(nested).map(_.getPath.getName).toSet == srcChildren) {
        f.delete(nested, true); false
      } else throw new java.io.IOException(
        s"IndexFs.renameNoClobber: unexpected destination layout after " +
          s"fallback rename $srcP -> $dstP (children $dstChildren, " +
          s"expected $srcChildren) — manual inspection required")
    }
  }

  /** A tag counts as committed when its commit dir is present (landed,
    * not yet folded), OR its tombstone survives under `committed/`
    * (landed, then folded into the base by a compaction), OR it is
    * recorded in the folded-tombstone relation ([[foldTombstones]]) —
    * the replay-protection check that OUTLIVES both the commit dir and
    * the per-tag tombstone file. Before r9 this keyed on
    * `commits/<tag>` alone, so a batch replayed after a compaction
    * re-appended its rows (duplicates) and, load-side, could no longer
    * exclude its own folded-in data. */
  def isCommitted(spark: SparkSession, path: String, tag: String): Boolean =
    commitLanded(spark, path, tag) ||
      exists(spark, s"$path/committed/$tag") ||
      foldedTags(spark, path).contains(tag)

  /** Zero-byte tombstone recording that `tag` landed and was folded;
    * written by compaction BEFORE it deletes `commits/<tag>`, so there
    * is no instant at which a landed tag reads as uncommitted. Per-tag
    * files are transient: each compaction ends by folding them into one
    * versioned `_folded-<n>` text file ([[foldTombstones]]), so
    * `committed/` stays O(1) files at any append cadence — at a
    * tag-per-15-minutes crawl loop, the unfolded r9 scheme grew ~35k
    * listing entries per year per index, an FS-listing hazard on object
    * stores. A `save*Index` full rebuild wipes the whole tag namespace
    * (commits, staged, committed — fold file included) together. */
  def markCommitted(spark: SparkSession, path: String, tag: String): Unit = {
    // path-safety only, NOT the full new-tag rule: maintenance must be
    // able to tombstone a commit dir that ALREADY EXISTS under a name a
    // stricter round would no longer accept (e.g. an r9-era `_`-prefixed
    // tag) — rejecting it here would abort every future compaction of
    // that index. The fold-file test is exact (`_folded-<digits>`), so
    // even those legacy names can't be misparsed as fold versions.
    requirePathSegment(tag)
    val f = fs(spark, path)
    val p = new HPath(s"$path/committed/$tag")
    if (!f.exists(p)) { f.create(p, true).close() }
  }

  /** Reserved prefix of the folded-tombstone files under `committed/`
    * ([[requireValidTag]] keeps user tags out of this namespace). */
  private val FoldedPrefix = "_folded-"

  /** Fold files are `_folded-<digits>` EXACTLY — a stricter test than a
    * prefix check so a crashed fold's temp file (or a legacy tag that
    * happens to start with `_`) can never be parsed as a version. */
  private def isFoldFile(name: String): Boolean =
    name.startsWith(FoldedPrefix) &&
      name.length > FoldedPrefix.length &&
      name.drop(FoldedPrefix.length).forall(_.isDigit)

  /** Tags recorded in the NEWEST folded-tombstone file (empty when none
    * exists). Fold files are versioned `_folded-<n>`: a fold writes
    * version n+1 (containing everything it absorbs) BEFORE deleting
    * version n and the per-tag files, so a concurrent reader finds
    * every folded tag in whichever version its listing surfaces. The
    * list→open window can still see a version vanish mid-read (the fold
    * deleting what it superseded); that reads again — the replacement
    * version is a superset — and a persistent failure is LOUD, never an
    * empty (silently-wrong) answer. */
  private[graft] def foldedTags(spark: SparkSession, path: String): Set[String] = {
    def readOnce(): Set[String] = {
      val f = fs(spark, path)
      val dir = new HPath(s"$path/committed")
      if (!f.exists(dir)) return Set.empty
      val folds = f.listStatus(dir)
        .filter(s => s.isFile && isFoldFile(s.getPath.getName))
      if (folds.isEmpty) return Set.empty
      val latest = folds.maxBy(_.getPath.getName.stripPrefix(FoldedPrefix).toLong)
      val in = f.open(latest.getPath)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSet
      finally in.close()
    }
    try readOnce()
    catch { case _: java.io.FileNotFoundException =>
      try readOnce()
      catch { case _: java.io.FileNotFoundException => readOnce() }
    }
  }

  /** Fold the per-tag tombstone files under `committed/` into a single
    * versioned `_folded-<n>` text file (one tag per line) — the growth
    * bound on replay protection: recognition of every folded tag is
    * permanent, but the FILE COUNT under `committed/` stays constant
    * instead of growing by one per folded tag forever. Two orderings
    * make it safe: the new version is written to a temp name and
    * RENAMED into place (a crash mid-write leaves only the temp, which
    * the fold-file test ignores and the next fold deletes — a truncated
    * newest version can never exist), and it lands before anything it
    * absorbed is deleted, so no concurrent [[isCommitted]] probe can
    * miss a tag. Driver-side IO on driver-sized data. */
  private[graft] def foldTombstones(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val dir = new HPath(s"$path/committed")
    if (!f.exists(dir)) return
    val entries = f.listStatus(dir).filter(_.isFile)
    val folds = entries.filter(e => isFoldFile(e.getPath.getName))
    // leftover temp from a crashed fold; stale, single-scheduler contract
    val crashedTmp = entries.filter(_.getPath.getName == FoldTmpName)
    val tagFiles = entries.filterNot(e =>
      isFoldFile(e.getPath.getName) || e.getPath.getName == FoldTmpName)
    if (tagFiles.isEmpty && folds.length <= 1 && crashedTmp.isEmpty) return
    val union = foldedTags(spark, path) ++ tagFiles.map(_.getPath.getName)
    val next =
      (0L +: folds.toSeq.map(_.getPath.getName.stripPrefix(FoldedPrefix).toLong))
        .max + 1
    crashedTmp.foreach(s => f.delete(s.getPath, false))
    val tmp = new HPath(dir, FoldTmpName)
    val out = f.create(tmp, true)
    try out.write((union.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new HPath(dir, FoldedPrefix + next)))
      throw new java.io.IOException(
        s"IndexFs.foldTombstones: rename of $tmp to version $next failed")
    // only now retire what the new version absorbed
    (folds ++ tagFiles).foreach(s => f.delete(s.getPath, false))
  }

  /** Temp name of an in-progress fold — `_`-prefixed (outside the tag
    * namespace) but NOT a valid fold-file name, so readers ignore it. */
  private val FoldTmpName = "_folding-tmp"

  /** Conf key selecting the relation-publish protocol:
    *  - `rename` — write a tmp sibling, swap it in with directory
    *    renames (atomic on HDFS-like filesystems; the default there).
    *  - `marker` — write a fresh VERSIONED dir (`<dir>.v<N>`), then
    *    atomically overwrite a tiny `<dir>.current` pointer file naming
    *    it; the pointer PUT is the commit step. The right protocol for
    *    object stores, where rename is a non-atomic O(data)
    *    copy-and-delete: data dirs are never mutated in place, only
    *    superseded, and a reader resolves through the pointer.
    * Unset, the protocol is chosen by scheme: marker for known
    * object-store schemes, rename otherwise. The setting is
    * per-deployment — an index written under one protocol must be read
    * under the same one. */
  val CommitProtocolKey = "spark.graft.commitProtocol"

  /** Schemes whose `rename` is an emulated copy (no atomicity, O(data))
    * — these default to the marker protocol. ABFS/HDFS-like stores keep
    * real renames. */
  private val objectStoreSchemes = Set("s3", "s3a", "s3n", "gs", "oss", "cos")

  private def useMarker(spark: SparkSession, path: String): Boolean =
    spark.conf.getOption(CommitProtocolKey) match {
      case Some("marker") => true
      case Some("rename") => false
      case Some(other) => throw new IllegalArgumentException(
        s"$CommitProtocolKey must be 'rename' or 'marker', got '$other'")
      case None =>
        val scheme = new HPath(path).toUri.getScheme
        scheme != null && objectStoreSchemes.contains(scheme.toLowerCase)
    }

  private[graft] def readSmallFile(f: FileSystem, p: HPath): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** The CURRENT physical dir of a published relation: the versioned
    * dir the `<dir>.current` pointer names when one exists (marker
    * protocol), else `dir` itself — every relation read goes through
    * this, so the two protocols share one read path. */
  def resolveDir(spark: SparkSession, dir: String): String = {
    val ptr = new HPath(dir + ".current")
    val f = fs(spark, dir)
    if (!f.exists(ptr)) dir else dir + "." + readSmallFile(f, ptr)
  }

  /** When set (milliseconds), marker-protocol [[publishRelation]] does
    * NOT retire the superseded version dir inline: it stays on disk and
    * [[vacuumPublished]] reaps versions older than the window — so a
    * long-running reader that resolved the OLD pointer keeps a
    * complete, scannable old version for at least this long after the
    * publish that superseded it (the same commit-vs-retire split
    * [[graft.operators.SnapshotMerge.vacuumSharded]] gives the sharded
    * snapshot). Unset (the default): retire stays inline — single-
    * reader/short-query deployments keep today's storage footprint. */
  val PublishRetentionKey = "spark.graft.publishRetention.ms"

  private def publishRetention(spark: SparkSession): Option[Long] =
    spark.conf.getOption(PublishRetentionKey).map(_.toLong)

  /** Publish `df` as the new content of relation `dir` under the
    * selected protocol ([[CommitProtocolKey]]). Rename protocol: durable
    * write-then-swap (tmp sibling, two renames — a crash leaves old or
    * new data intact, never neither; the two final renames are not one
    * atomic step, so a concurrent reader can see a missing dir — an
    * error, never partial data). Marker protocol: write `<dir>.v<N+1>`,
    * atomically overwrite the `<dir>.current` pointer, THEN retire the
    * superseded version — a reader that resolved before the PUT keeps
    * reading a complete old version; one that resolves after sees the
    * complete new one; there is no missing-dir window at all (the
    * marker protocol is strictly stronger — it is the default only on
    * object stores because it leaves pointer files and doubles
    * transient storage). With [[PublishRetentionKey]] set the retire is
    * DEFERRED to [[vacuumPublished]] behind that window, protecting
    * long-running readers of the old version too. */
  def publishRelation(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    if (!useMarker(spark, dir)) {
      if (!exists(spark, dir)) { df.write.mode("overwrite").parquet(dir); return }
      val tmp = dir + ".tmp-publish"
      val old = dir + ".old-publish"
      df.write.mode("overwrite").parquet(tmp)
      deleteRecursively(spark, old)
      rename(spark, dir, old)
      rename(spark, tmp, dir)
      deleteRecursively(spark, old)
    } else {
      val f = fs(spark, dir)
      val ptr = new HPath(dir + ".current")
      val cur: Option[Long] =
        if (f.exists(ptr)) Some(readSmallFile(f, ptr).stripPrefix("v").toLong)
        else None
      val next = cur.getOrElse(0L) + 1
      df.write.mode("overwrite").parquet(s"$dir.v$next")
      atomicWriteSmallFile(spark, f, ptr, s"v$next") // the atomic commit
      if (publishRetention(spark).isEmpty)
        cur.foreach(k => deleteRecursively(spark, s"$dir.v$k"))
      else cur.foreach { k =>
        // tombstone mtime = the SUPERSESSION instant — what the
        // retention window must measure from (the version dir's own
        // mtime is its write time, arbitrarily older than the publish
        // that superseded it: a version current for a day would be
        // reapable seconds after supersession)
        val t = f.create(new HPath(s"$dir.retired-v$k"), true)
        try t.write(s"v$k".getBytes("UTF-8")) finally t.close()
      }
      if (cur.isEmpty) deleteRecursively(spark, dir) // pre-marker plain dir
    }
  }

  /** Reaps superseded marker-protocol versions of relation `dir` older
    * than `minAgeMs` (defaults to [[PublishRetentionKey]], else 0 =
    * everything superseded). Age is measured from each version's
    * `.retired-v<K>` tombstone — written at the SUPERSESSION instant by
    * [[publishRelation]]'s deferred retire — so the window counts from
    * when readers could last RESOLVE the version, not from when its
    * bytes were written (a version current for a day must not become
    * reapable seconds after supersession). Versions with no tombstone
    * (crash debris, pre-tombstone leftovers) fall back to their newest
    * mtime. The CURRENT version is never touched. Returns dirs reaped.
    * No-op under the rename protocol (no versioned dirs exist). */
  def vacuumPublished(spark: SparkSession, dir: String,
      minAgeMs: Option[Long] = None): Int = {
    val f = fs(spark, dir)
    val ptr = new HPath(dir + ".current")
    if (!f.exists(ptr)) return 0
    val curName = dir + "." + readSmallFile(f, ptr)
    val p = new HPath(dir)
    val parent = p.getParent
    if (parent == null || !f.exists(parent)) return 0
    val window = minAgeMs.orElse(publishRetention(spark)).getOrElse(0L)
    val cutoff = System.currentTimeMillis() - window
    // digits-only suffix: a sibling relation named e.g. `<name>.vectors`
    // must never match
    val versioned = java.util.regex.Pattern
      .compile(java.util.regex.Pattern.quote(p.getName + ".v") + "\\d+")
    var reaped = 0
    f.listStatus(parent)
      .filter(st => st.isDirectory
        && versioned.matcher(st.getPath.getName).matches()
        && st.getPath.toString != f.makeQualified(new HPath(curName)).toString)
      .foreach { st =>
        val ver = st.getPath.getName.stripPrefix(p.getName + ".v")
        val tomb = new HPath(parent, s"${p.getName}.retired-v$ver")
        // one RPC, not exists+getFileStatus: absent tombstone (crash
        // debris, pre-tombstone leftovers) falls back to write mtime
        val retiredAt =
          try f.getFileStatus(tomb).getModificationTime
          catch { case _: java.io.FileNotFoundException =>
            newestMtime(spark, st.getPath.toString) }
        if (retiredAt <= cutoff) {
          // tombstone FIRST: a crash between the two deletes then
          // leaves a dir with no tombstone, which the next vacuum
          // self-heals via the mtime fallback (already past the
          // window) — dir-first would orphan the tombstone forever
          f.delete(tomb, false)
          deleteRecursively(spark, st.getPath.toString)
          reaped += 1
        }
      }
    reaped
  }

  /** Replace a tiny control file (the publish pointer) with NO
    * truncation window: write a temp sibling, rename over with
    * `Options.Rename.OVERWRITE` (atomic on any FS with an
    * `AbstractFileSystem` binding — a bare `create(overwrite = true)`
    * would truncate the LIVE pointer first, so a crash or a concurrent
    * read in that window sees an empty file and the whole read path
    * bricks). Schemes without a binding are the true object stores,
    * where the direct overwrite PUT is itself atomic — there the PUT is
    * used as-is. */
  private[graft] def atomicWriteSmallFile(spark: SparkSession, f: FileSystem,
      p: HPath, content: String): Unit = {
    val tmp = new HPath(p.getParent, p.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        p.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(p),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        val out2 = f.create(p, true)
        try out2.write(content.getBytes("UTF-8")) finally out2.close()
        f.delete(tmp, false); ()
    }
  }

  /** Order-preserving parallel map for DRIVER-SIDE metadata fan-out
    * (one sidecar read / listStatus / exists per shard): O(shards)
    * round-trips is the right complexity for a metadata plane, but
    * running them serially makes the object-store latency additive —
    * at 10k shards, minutes of driver stall for work that is pure
    * wait. A bounded pool overlaps the round-trips; results come back
    * in input order, so callers stay deterministic. NOT for Spark
    * actions (jobs already parallelize) and not for mutations that
    * must be ordered. A thrown `f` propagates its ORIGINAL exception
    * (first failing item wins), after the pool drains. */
  private[graft] def parMapOrdered[A, B](items: Seq[A],
      parallelism: Int = 16)(f: A => B): Seq[B] = {
    if (items.lengthCompare(2) < 0 || parallelism <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, items.length))
    try {
      val futures = items.map { a =>
        pool.submit(new java.util.concurrent.Callable[B] {
          def call(): B = f(a)
        })
      }
      futures.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdownNow()
  }

  /** No-clobber creation of a small control FILE — the compare-and-swap
    * primitive under [[graft.operators.SnapshotMerge]]'s optimistic
    * commit: at most ONE concurrent caller per target path ever returns
    * true, and a reader never observes a partial body. The body is
    * written to a dot-prefixed tmp sibling and moved in with
    * `FileContext.rename` under `Rename.NONE`, whose contract
    * atomically REJECTS an existing destination (the file-shaped twin
    * of [[renameNoClobber]]). Schemes with no `AbstractFileSystem`
    * binding fall back to a direct `create(overwrite = false)` — the
    * existence check is still atomic at the store, but a concurrent
    * reader can glimpse a partially-written body in the create-to-close
    * window; those schemes are the true object stores, where a
    * conditional small-object PUT is the native primitive a production
    * binding would supply. Returns false when the destination already
    * exists — the caller lost the race (or found a previous crash's
    * committed file, which reads the same way by design). */
  private[graft] def writeSmallFileNoClobber(spark: SparkSession,
      f: FileSystem, p: HPath, content: String): Boolean = {
    if (f.exists(p)) return false // cheap fast-path; the rename is the gate
    val tmp = new HPath(p.getParent,
      s".${p.getName}.cas-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        p.toUri, spark.sparkContext.hadoopConfiguration)
      try { fc.rename(f.makeQualified(tmp), f.makeQualified(p)); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: org.apache.hadoop.fs.ParentNotDirectoryException =>
          f.delete(tmp, false); false
      }
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        try {
          val out2 = f.create(p, false)
          try out2.write(content.getBytes("UTF-8")) finally out2.close()
          f.delete(tmp, false); true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            f.delete(tmp, false); false
        }
    }
  }

  /** Remove a relation's marker-protocol state (pointer + every
    * versioned dir) — part of a `save*Index` full rebuild, which writes
    * the plain base dir fresh: a stale pointer from a previous
    * incarnation's compactions must not shadow it. */
  private[graft] def clearPublished(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val p = new HPath(dir)
    val parent = p.getParent
    deleteRecursively(spark, dir + ".current")
    deleteRecursively(spark, dir + ".current.tmp")
    if (parent != null && f.exists(parent)) {
      // digits-anchored, like vacuumPublished: a sibling relation named
      // `<name>.vectors` (and ITS versions/pointer) must never match a
      // rebuild of `<name>`
      val versioned = java.util.regex.Pattern.compile(
        java.util.regex.Pattern.quote(p.getName) + "\\.(retired-)?v\\d+")
      f.listStatus(parent)
        .filter(s => versioned.matcher(s.getPath.getName).matches())
        .foreach(s => f.delete(s.getPath, true))
    }
  }

  /** Newest modification time (epoch ms) across `path` and its children
    * two levels deep — the recency signal the staged-orphan reaper uses.
    * One level is not enough: a staged dir's relation subdirs are
    * created once, but their mtimes bump as each part-file lands, so an
    * append actively writing always reads as recent. Returns
    * Long.MinValue for an absent path. */
  private[graft] def newestMtime(spark: SparkSession, path: String): Long = {
    val f = fs(spark, path)
    val p = new HPath(path)
    if (!f.exists(p)) return Long.MinValue
    // entries can vanish mid-walk: the contract ALLOWS tagged appends
    // concurrent with the compaction that calls this (a retry's
    // delete-and-restage, a parquet writer retiring `_temporary`) — a
    // vanished entry is simply not evidence of recency, never a crash
    def mtimes(q: HPath, depth: Int): Seq[Long] =
      try {
        val st = f.getFileStatus(q)
        st.getModificationTime +: (
          if (depth <= 0 || !st.isDirectory) Seq.empty
          else f.listStatus(q).toSeq.flatMap(c => mtimes(c.getPath, depth - 1)))
      } catch { case _: java.io.FileNotFoundException => Seq.empty }
    val all = mtimes(p, 2)
    if (all.isEmpty) Long.MinValue else all.max
  }

  /** Names of the immediate child DIRECTORIES of `path` (empty when the
    * path is absent) — how maintenance enumerates landed commits. */
  def listDirNames(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val p = new HPath(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName).sorted
  }

  /** Bare path-segment safety — a `/` or `..` would escape the index's
    * namespace. The floor every tag-shaped input must clear. */
  private def requirePathSegment(tag: String): Unit =
    require(
      tag.nonEmpty && tag != "." && tag != ".." &&
        tag.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"tag must be a [A-Za-z0-9._-]+ path segment, got '$tag'")

  /** Valid NEW commit tags are single path segments — a `/` or `..`
    * would escape the index's `commits/` namespace — and may not start
    * with `_`, which is reserved for index metadata files (the folded
    * tombstones under `committed/`, the `_OK` commit marker). Applied
    * at append time; maintenance of already-landed names is more
    * permissive ([[markCommitted]]). */
  def requireValidTag(tag: String): Unit = {
    requirePathSegment(tag)
    require(!tag.startsWith("_"),
      s"commit tag must not start with '_' (reserved for index metadata), " +
        s"got '$tag'")
  }

  /** Marker file that makes a commit dir COUNT under the marker
    * protocol: relations are written directly into `commits/<tag>/`
    * (invisible to readers, which enumerate landed commits only) and
    * the exclusive creation of this zero-byte file is the commit step —
    * atomic where the store supports conditional PUT (S3 conditional
    * writes; exists-check + create elsewhere, best-effort like the
    * rename fallback). Reserved name: relations cannot be called this
    * (`_` prefix, filtered from relation listings by parquet anyway). */
  private val CommitMarker = "_OK"

  /** Is `commits/<tag>` a LANDED commit? Rename protocol: existence is
    * landing (the rename was the commit). Marker protocol: only with
    * its [[CommitMarker]] — a dir without one is an in-flight or
    * crashed append, invisible to readers and maintenance. */
  private def commitLanded(spark: SparkSession, path: String, tag: String): Boolean =
    exists(spark, s"$path/commits/$tag") &&
      (!useMarker(spark, path) || exists(spark, s"$path/commits/$tag/$CommitMarker"))

  /** Tags of every LANDED commit at `path` — the single enumeration
    * every reader and maintenance pass uses, so in-flight marker-mode
    * appends are invisible everywhere at once. */
  private[graft] def landedCommits(spark: SparkSession, path: String): Seq[String] = {
    val all = listDirNames(spark, s"$path/commits")
    if (!useMarker(spark, path)) all
    else all.filter(t => exists(spark, s"$path/commits/$t/$CommitMarker"))
  }

  /** Marker file a refit creates before its first family-changing write
    * and removes after its last — the crash-visibility fix for the one
    * failure mode that LOOKS healthy: a refit that dies between
    * publishing the re-bucketed/re-assigned relations and overwriting
    * the family metadata (or vice versa) leaves an index whose family
    * and assignments disagree, and unlike a crashed save nothing is
    * missing — probes would just silently lose recall. While the marker
    * exists, loads and maintenance refuse loudly
    * ([[requireNoCrashedRefit]]); re-running the refit converges (it
    * derives everything from the family-independent vector relation and
    * republishes family + assignments together), which is the documented
    * recovery. `_`-prefixed: outside the tag namespace, invisible to
    * parquet. */
  private val RefitMarker = "_REFIT-INPROGRESS"

  private[graft] def beginRefit(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    f.create(new HPath(s"$path/$RefitMarker"), true).close()
  }

  private[graft] def endRefit(spark: SparkSession, path: String): Unit =
    deleteRecursively(spark, s"$path/$RefitMarker")

  private[graft] def refitCrashed(spark: SparkSession, path: String): Boolean =
    exists(spark, s"$path/$RefitMarker")

  /** The read-side guard: every index load and non-refit maintenance
    * entry point calls this, so a family/assignment mismatch left by a
    * crashed refit fails LOUDLY at the next touch instead of serving
    * silently-degraded recall. (A reader racing a LIVE refit hits the
    * same error — correctly: refits run under the rebuild contract,
    * single maintainer, no concurrent readers.) */
  def requireNoCrashedRefit(spark: SparkSession, path: String): Unit =
    if (refitCrashed(spark, path)) throw new IllegalStateException(
      s"index at $path has an in-progress or crashed refit " +
        s"($RefitMarker present): its family metadata and bucket/cell " +
        "assignments may disagree (a recall-losing state that looks " +
        "healthy). Re-run the refit to converge, then retry.")

  /** The commit-namespace snapshot every maintenance pass (compaction,
    * refit) takes FIRST: the landed tags it will fold, plus the
    * staged/unlanded dirs present at start — the only dirs the orphan
    * reap may later consider (anything appearing AFTER the snapshot is
    * a live concurrent append, untouchable). */
  private[graft] final case class MaintenanceSnapshot(
      landed: Seq[String], stagedAtStart: Seq[String],
      unlandedAtStart: Seq[String])

  private[graft] def maintenanceSnapshot(
      spark: SparkSession, path: String): MaintenanceSnapshot = {
    val landed = landedCommits(spark, path)
    MaintenanceSnapshot(landed,
      listDirNames(spark, s"$path/staged"),
      listDirNames(spark, s"$path/commits").diff(landed))
  }

  /** Retire commit tags whose rows a maintenance pass just folded into
    * the rebuilt/compacted base: tombstone BEFORE delete — a replay
    * arriving between the two still reads the tag as committed, so
    * there is no instant at which a folded tag could re-append (the r8
    * gap: idempotence keyed on the very commit dirs this loop
    * deletes). `beforeCommitDelete` is the test seam proving that
    * ordering: it runs inside the window. THE single copy of this
    * ordering — compaction and both index refits all route here. */
  private[graft] def retireFoldedCommits(spark: SparkSession, path: String,
      folded: Seq[String],
      beforeCommitDelete: String => Unit = _ => ()): Unit =
    folded.foreach { t =>
      markCommitted(spark, path, t)
      beforeCommitDelete(t)
      deleteRecursively(spark, s"$path/commits/$t")
    }

  /** Reap provably-dead append orphans, then fold tombstones to O(1)
    * files — the shared tail of every maintenance pass. The contract
    * allows tagged appends CONCURRENT with maintenance, so "present at
    * snapshot and still uncommitted" is NOT proof of death — a slow
    * append staged before this pass began may still be mid-write, and
    * deleting under it would let its later relation writes recreate
    * the dir and commit a half-appended batch. Reap only what is
    * provably or overwhelmingly-likely dead: (a) tags already
    * committed (stagedAppend early-returns on those forever — the
    * staged copy can never be consumed), or (b) dirs whose newest
    * mtime, part-files included, is older than the TTL — far longer
    * than any plausible append. The marker-protocol twin applies the
    * same discipline to commit dirs that were already unmarked at
    * snapshot, are STILL unlanded now, and have gone stale (a crashed
    * marker-mode append — never committed, never retried). */
  private[graft] def reapDeadOrphans(spark: SparkSession, path: String,
      snapshot: MaintenanceSnapshot,
      stagedOrphanTtlMs: Long = DefaultStagedOrphanTtlMs): Unit = {
    val now = System.currentTimeMillis()
    snapshot.stagedAtStart
      .filter(t => isCommitted(spark, path, t) ||
        now - newestMtime(spark, s"$path/staged/$t") > stagedOrphanTtlMs)
      .foreach(t => deleteRecursively(spark, s"$path/staged/$t"))
    snapshot.unlandedAtStart
      .filterNot(t => isCommitted(spark, path, t))
      .filter(t =>
        now - newestMtime(spark, s"$path/commits/$t") > stagedOrphanTtlMs)
      .foreach(t => deleteRecursively(spark, s"$path/commits/$t"))
    foldTombstones(spark, path)
  }

  /** Staged-orphan reap age threshold: a staged dir untouched this long
    * (newest part-file mtime) is not a live append. Generous on purpose
    * — reaping is a space reclaim, never a correctness need. */
  private[graft] val DefaultStagedOrphanTtlMs: Long = 24L * 3600 * 1000

  /** The exactly-once half of index appends. Rename protocol (HDFS-like
    * stores): write every relation of the batch under `staged/<tag>/`,
    * then commit with ONE no-clobber directory rename to
    * `commits/<tag>/`. Marker protocol (object stores, where that
    * rename is a non-atomic O(data) copy): write the relations directly
    * into `commits/<tag>/` — invisible until landed, because every
    * reader enumerates [[landedCommits]] — then commit by EXCLUSIVELY
    * creating the `_OK` marker inside it. Both spellings are idempotent
    * per tag ACROSS compactions: if the tag [[isCommitted]] — its
    * commit landed, or only its tombstone survives a fold — the batch
    * landed in a prior attempt and NOTHING is written (returns false);
    * a crash before the commit step leaves only an orphan (a `staged/`
    * dir, or an unmarked commit dir) that the next attempt overwrites
    * and compaction eventually reaps. There is no half-appended state —
    * either every relation of the batch is visible or none is.
    *
    * Concurrency: writers of DISTINCT tags never share a staged or
    * commit dir and may run fully concurrently (spec-proven). Two
    * writers of the SAME tag are formally out of contract (they would
    * interleave inside one dir); the commit step still resolves the
    * detectable outcomes — the rename loser gets `false` (never the
    * nested `commits/<tag>/<tag>` layout — see [[renameNoClobber]]) and
    * its staged copy is discarded; the marker loser's exclusive create
    * fails and returns `false` (though under the marker protocol its
    * interleaved relation writes may have mixed with the winner's —
    * single-writer-per-tag is a hard requirement there, not just a
    * formality). */
  def stagedAppend(spark: SparkSession, path: String, tag: String,
      relations: Seq[(String, org.apache.spark.sql.DataFrame)],
      /** Test seam: runs after the relation writes, before the commit
        * step — the window where external disturbance of the written
        * relations must be caught by the post-commit verification. */
      beforeCommitRename: () => Unit = () => ()): Boolean = {
    requireValidTag(tag)
    if (isCommitted(spark, path, tag)) return false
    val commitDir = s"$path/commits/$tag"
    // the batch's relations are independent projections — overlap their
    // writes (guide §2.6); nothing is visible until the commit step
    // below, so the all-or-nothing contract is untouched
    def writeRelations(base: String): Unit = relations match {
      case Seq((n1, d1), (n2, d2)) =>
        graft.GraftSession.inParallel(
          d1.write.mode("overwrite").parquet(s"$base/$n1"),
          d2.write.mode("overwrite").parquet(s"$base/$n2"))
        ()
      case rs => rs.foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$base/$name")
      }
    }
    val landed =
      if (useMarker(spark, path)) {
        writeRelations(commitDir)
        beforeCommitRename()
        val f = fs(spark, path)
        try { f.create(new HPath(s"$commitDir/$CommitMarker"), false).close(); true }
        catch {
          case e: java.io.IOException => // incl. FileAlreadyExistsException
            if (exists(spark, s"$commitDir/$CommitMarker")) false // lost the race
            else throw e
        }
      } else {
        val stageDir = s"$path/staged/$tag"
        deleteRecursively(spark, stageDir)
        writeRelations(stageDir)
        beforeCommitRename()
        val won = renameNoClobber(spark, stageDir, commitDir)
        if (!won) deleteRecursively(spark, stageDir)
        won
      }
    if (!landed) return false
    // Post-commit verification that the commit carries EVERY relation of
    // the batch: anything that disturbed the written relations mid-write
    // (an out-of-contract concurrent writer; historically, the orphan
    // reaper racing a slow append) would otherwise land a half-appended
    // batch — bands without shingles — that silently violates the
    // all-or-nothing invariant and breaks later loads. Fail LOUDLY and
    // clear the commit (the tag has no tombstone yet), so a clean retry
    // can land.
    val missing = relations.map(_._1)
      .filterNot(name => exists(spark, s"$commitDir/$name"))
    if (missing.nonEmpty) {
      deleteRecursively(spark, commitDir)
      throw new java.io.IOException(
        s"IndexFs.stagedAppend: commit '$tag' landed missing relation(s) " +
          s"${missing.mkString(", ")} — the batch's writes were disturbed " +
          "mid-append; commit removed, retry the append")
    }
    true
  }

  /** Parquet dirs holding relation `name` of the index at `path`: the
    * base dir (resolved through the publish pointer when the marker
    * protocol owns it) plus every LANDED commit's copy, minus `exclude`
    * — the read-side contract of the staged-append protocol. Excluding
    * a tag is what makes a replayed batch deterministic: it reads the
    * index exactly as its first execution did, blind to its own append.
    * Commit dirs are never republished in place, so only the base
    * resolves. */
  def relationDirs(spark: SparkSession, path: String, name: String,
      exclude: Set[String]): Seq[String] =
    resolveDir(spark, s"$path/$name") +: landedCommits(spark, path)
      .filterNot(exclude)
      .map(tag => s"$path/commits/$tag/$name")
}
