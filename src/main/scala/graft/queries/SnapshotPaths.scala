package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-(data dir, session) scratch paths for queries whose oracle reads
  * back a Spark-written parquet snapshot (the simhash-fingerprint trick)
  * or that round-trip an index/output dir inside the measured query.
  *
  * A FIXED path would let concurrent sessions clobber each other and let a
  * stale snapshot be read silently if the oracle ever ran without the
  * engine query — so the path is derived from BOTH the data dir the query
  * ran on (different scale factors never collide) AND a session tag
  * (two concurrent sessions on the SAME data dir never share a snapshot
  * dir — the round-6 residual). The oracle SQL can't know either when
  * [[graft.SparkEntry.oracleSql]] is built, so it embeds [[DataDirToken]]
  * and [[graft.Verify]] substitutes the concrete (dir, session) tag at
  * dump time — the same session that ran the queries, so the dumped SQL
  * always reads the bytes this run produced. The snapshot write is part
  * of the measured query.
  */
object SnapshotPaths {

  /** Placeholder for the (data dir, session) tag inside builder-authored
    * oracle SQL. */
  val DataDirToken = "__GRAFT_DATA_DIR__"

  /** Per-process disambiguator: `System.identityHashCode` alone is only
    * unique within one JVM; this makes the session tag unique across
    * concurrent processes too. Random by design — never persisted,
    * never compared across runs. */
  private val jvmTag: String =
    java.lang.Long.toHexString(new java.security.SecureRandom().nextLong())
      .takeRight(8)

  /** Session component of the tag: stable for the session's lifetime
    * (a query's snapshot write and the Verify dump use the same session,
    * so they can never disagree), distinct across sessions in one JVM
    * (`newSession()` included) and across JVMs (jvmTag). */
  def sessionTag(spark: SparkSession): String =
    jvmTag + "-" + java.lang.Integer.toHexString(System.identityHashCode(spark))

  /** Sanitized dir + a short hash of the RAW dir + the session tag.
    * The hash exists because sanitization alone maps every
    * non-[A-Za-z0-9._-] char to '_', so distinct dirs like `/data/sf1`
    * and `/data_sf1` would collide to one snapshot dir; `String.hashCode`
    * is specified by the JLS (stable across JVMs). */
  private def tag(dataDir: String, spark: SparkSession): String =
    dataDir.replaceAll("[^A-Za-z0-9._-]", "_") +
      "_" + java.lang.Integer.toHexString(dataDir.hashCode) +
      "_" + sessionTag(spark)

  /** Every SnapshotPaths dir lives under this dedicated subdirectory of
    * the temp dir — which is what makes the reaper SAFE: it enumerates
    * only dirs this object itself created, never an unrelated process's
    * `graft_*`-prefixed temp dirs (the r7 reaper keyed on the name
    * prefix alone and could delete a live foreign dir aged past the
    * cutoff, e.g. another session's streaming staging dir). */
  def scratchRoot: String = {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_snapshots")
    java.nio.file.Files.createDirectories(root)
    root.toString
  }

  /** Session-scoped dirs can't overwrite a previous session's (that's
    * the point), so without collection every Bench/Verify process would
    * leak its snapshot/index dirs into [[scratchRoot]] forever. Deleting
    * on JVM exit is WRONG here — the Verify flow's oracle SQL is read
    * by DuckDB after the JVM exits — so instead the first [[dirFor]]
    * call of a JVM reaps scratchRoot dirs UNTOUCHED FOR 24 h: far past
    * any live write-then-read window, far before the disk fills. */
  private lazy val reapStale: Unit = {
    import scala.jdk.CollectionConverters._
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    val tmp = java.nio.file.Paths.get(scratchRoot)
    try java.nio.file.Files.list(tmp).iterator().asScala
      .filter(p => try
        java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff
      catch { case _: Exception => false })
      .foreach { p =>
        try java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
        catch { case _: Exception => () } // concurrent reaper — fine
      }
    catch { case _: Exception => () } // reaping is best-effort hygiene
  }

  /** Scratch dir for snapshot `name` of queries run against `dataDir`
    * in `spark`. */
  def dirFor(name: String, dataDir: String, spark: SparkSession): String = {
    reapStale
    s"$scratchRoot/graft_${name}_${tag(dataDir, spark)}"
  }

  /** The token-bearing form for builder-authored oracle SQL: the whole
    * variable suffix ((dir, session) tag) is one token, substituted by
    * [[resolve]] at dump time. */
  def tokenDirFor(name: String): String =
    s"$scratchRoot/graft_${name}_$DataDirToken"

  /** Resolve every [[DataDirToken]]-carrying snapshot path in oracle SQL
    * to the concrete dir for (`dataDir`, `spark`). */
  def resolve(sql: String, dataDir: String, spark: SparkSession): String =
    sql.replace(DataDirToken, tag(dataDir, spark))
}
