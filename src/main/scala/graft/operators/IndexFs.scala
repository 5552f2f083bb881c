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
  * atomic metadata operation — the commit primitive of both
  * [[TextDedup]]'s write-then-swap and its staged append. Object stores
  * (S3A) emulate rename as an O(data) copy-and-delete with NO
  * atomicity; there the right protocol is versioned directories plus a
  * marker-file commit (write `<dir>.v<N>/`, then PUT a tiny
  * `<dir>.current` pointer naming it — the pointer PUT is the atomic
  * step), which this layer deliberately does not hide behind the same
  * API: a swap that is atomic on one store and silently not on another
  * is worse than an explicit contract. Callers document which regime
  * they assume.
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
        if (f.exists(dstP)) false
        else if (f.rename(srcP, dstP)) true
        else if (f.exists(dstP)) false // lost the race inside the rename
        else throw new java.io.IOException(
          s"IndexFs.renameNoClobber failed: $src -> $dst")
    }
  }

  /** A tag counts as committed when its commit dir is present (landed,
    * not yet folded) OR its tombstone survives under `committed/`
    * (landed, then folded into the base by a compaction) — the
    * replay-protection check that OUTLIVES the commit dir. Before r9
    * this keyed on `commits/<tag>` alone, so a batch replayed after a
    * compaction re-appended its rows (duplicates) and, load-side, could
    * no longer exclude its own folded-in data. */
  def isCommitted(spark: SparkSession, path: String, tag: String): Boolean =
    exists(spark, s"$path/commits/$tag") || exists(spark, s"$path/committed/$tag")

  /** Zero-byte tombstone recording that `tag` landed and was folded;
    * written by compaction BEFORE it deletes `commits/<tag>`, so there
    * is no instant at which a landed tag reads as uncommitted. One tiny
    * file per folded tag accumulates under `committed/` for the index's
    * lifetime — the price of replay protection with no bounded-replay
    * horizon assumption; a `save*Index` full rebuild wipes the whole
    * tag namespace (commits, staged, committed) together. */
  def markCommitted(spark: SparkSession, path: String, tag: String): Unit = {
    requireValidTag(tag)
    val f = fs(spark, path)
    val p = new HPath(s"$path/committed/$tag")
    if (!f.exists(p)) { f.create(p, true).close() }
  }

  /** Names of the immediate child DIRECTORIES of `path` (empty when the
    * path is absent) — how maintenance enumerates landed commits. */
  def listDirNames(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val p = new HPath(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName).sorted
  }

  /** Valid commit tags are single path segments — a `/` or `..` would
    * escape the index's `commits/` namespace. */
  def requireValidTag(tag: String): Unit =
    require(
      tag.nonEmpty && tag != "." && tag != ".." &&
        tag.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"commit tag must be a [A-Za-z0-9._-]+ path segment, got '$tag'")

  /** The exactly-once half of index appends: write every relation of
    * the batch under `staged/<tag>/`, then commit with ONE no-clobber
    * directory rename to `commits/<tag>/` (atomic on HDFS-like
    * filesystems — see the object-store caveat above). Idempotent per
    * tag ACROSS compactions: if the tag [[isCommitted]] — its commit
    * dir is live, or only its tombstone survives a fold — the batch
    * landed in a prior attempt and NOTHING is written (returns false);
    * a crash before the rename leaves only a `staged/` orphan that the
    * next attempt overwrites (and that compaction eventually reaps).
    * There is no half-appended state — either every relation of the
    * batch is visible or none is.
    *
    * Concurrency: writers of DISTINCT tags never share a staged or
    * commit dir and may run fully concurrently (spec-proven). Two
    * writers of the SAME tag are formally out of contract (they would
    * interleave inside one staged dir); the commit step still resolves
    * the detectable outcomes — a loser whose rename finds the dest
    * already present gets `false` (a lost race, not an error, and never
    * the nested `commits/<tag>/<tag>` layout `FileSystem.rename` would
    * produce — see [[renameNoClobber]]) and its staged copy is
    * discarded: the winner's commit IS this batch. */
  def stagedAppend(spark: SparkSession, path: String, tag: String,
      relations: Seq[(String, org.apache.spark.sql.DataFrame)]): Boolean = {
    requireValidTag(tag)
    if (isCommitted(spark, path, tag)) return false
    val stageDir = s"$path/staged/$tag"
    deleteRecursively(spark, stageDir)
    relations.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$stageDir/$name")
    }
    val landed = renameNoClobber(spark, stageDir, s"$path/commits/$tag")
    if (!landed) deleteRecursively(spark, stageDir)
    landed
  }

  /** Parquet dirs holding relation `name` of the index at `path`: the
    * base dir plus every LANDED commit's copy, minus `exclude` — the
    * read-side contract of the staged-append protocol. Excluding a tag
    * is what makes a replayed batch deterministic: it reads the index
    * exactly as its first execution did, blind to its own append. */
  def relationDirs(spark: SparkSession, path: String, name: String,
      exclude: Set[String]): Seq[String] =
    s"$path/$name" +: listDirNames(spark, s"$path/commits")
      .filterNot(exclude)
      .map(tag => s"$path/commits/$tag/$name")
}
