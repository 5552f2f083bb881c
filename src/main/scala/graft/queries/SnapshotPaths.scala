package graft.queries

/** Per-data-dir scratch paths for queries whose oracle reads back a
  * Spark-written parquet snapshot (the simhash-fingerprint trick).
  *
  * A FIXED path would let concurrent sessions clobber each other and let a
  * stale snapshot be read silently if the oracle ever ran without the
  * engine query — so the path is derived from the data dir the query ran
  * on. The oracle SQL can't know that dir when [[graft.SparkEntry.oracleSql]]
  * is built, so it embeds [[DataDirToken]] and [[graft.Verify]] substitutes
  * the concrete dir at dump time (both sides call [[dirFor]], so they can
  * never disagree). The snapshot write is part of the measured query.
  */
object SnapshotPaths {

  /** Placeholder for the data dir inside builder-authored oracle SQL. */
  val DataDirToken = "__GRAFT_DATA_DIR__"

  /** Sanitized dir + a short hash of the RAW dir: sanitization alone maps
    * every non-[A-Za-z0-9._-] char to '_', so distinct dirs like
    * `/data/sf1` and `/data_sf1` would collide to one snapshot dir —
    * re-admitting the cross-session clobber this module exists to prevent.
    * `String.hashCode` is specified by the JLS (stable across JVMs), so
    * the Verify dump and a later oracle run can never disagree. The token
    * passes through untouched: [[resolve]] substitutes the WHOLE tag for
    * it at dump time. */
  private def tag(dataDir: String): String =
    if (dataDir == DataDirToken) dataDir
    else dataDir.replaceAll("[^A-Za-z0-9._-]", "_") +
      "_" + java.lang.Integer.toHexString(dataDir.hashCode)

  /** Scratch dir for snapshot `name` of queries run against `dataDir`. */
  def dirFor(name: String, dataDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${tag(dataDir)}"

  /** Resolve every [[DataDirToken]]-carrying snapshot path in oracle SQL
    * to the concrete dir for `dataDir`. */
  def resolve(sql: String, dataDir: String): String =
    sql.replace(DataDirToken, tag(dataDir))
}
