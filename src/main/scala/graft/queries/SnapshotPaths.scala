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

  private def tag(dataDir: String): String =
    dataDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Scratch dir for snapshot `name` of queries run against `dataDir`. */
  def dirFor(name: String, dataDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${tag(dataDir)}"

  /** Resolve every [[DataDirToken]]-carrying snapshot path in oracle SQL
    * to the concrete dir for `dataDir`. */
  def resolve(sql: String, dataDir: String): String =
    sql.replace(DataDirToken, tag(dataDir))
}
