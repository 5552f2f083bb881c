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

  /** Names of the immediate child DIRECTORIES of `path` (empty when the
    * path is absent) — how maintenance enumerates landed commits. */
  def listDirNames(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val p = new HPath(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName).sorted
  }
}
