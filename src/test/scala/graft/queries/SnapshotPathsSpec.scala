package graft.queries

import graft.SparkSpec

/** Snapshot-path derivation: per-data-dir isolation must survive
  * sanitization (distinct raw dirs may sanitize identically), and two
  * sessions on the SAME data dir must get disjoint dirs (the round-6
  * residual: concurrent same-dir sessions could clobber mid-oracle). */
class SnapshotPathsSpec extends SparkSpec {

  test("dirs differing only in a sanitized character get distinct snapshots") {
    // both sanitize to data_sf1 — the hash suffix must separate them
    val a = SnapshotPaths.dirFor("fp", "/data/sf1", spark)
    val b = SnapshotPaths.dirFor("fp", "/data_sf1", spark)
    assert(a != b)
  }

  test("dirFor is deterministic within a session and filesystem-safe") {
    val d = SnapshotPaths.dirFor("fp", "/root/testdata/sf0.01", spark)
    assert(d == SnapshotPaths.dirFor("fp", "/root/testdata/sf0.01", spark))
    val name = d.substring(d.lastIndexOf('/') + 1)
    assert(name.matches("[A-Za-z0-9._-]+"), s"unsafe chars in $name")
  }

  test("two sessions on ONE data dir get disjoint snapshot dirs") {
    val s2 = spark.newSession()
    val dir = "/root/testdata/sf0.01"
    assert(SnapshotPaths.dirFor("fp", dir, spark) !=
      SnapshotPaths.dirFor("fp", dir, s2))
    // and each session's resolve points at ITS OWN snapshot, so a dump
    // can never read a concurrent session's bytes
    val sql = s"read_parquet('${SnapshotPaths.tokenDirFor("fp")}/*.parquet')"
    assert(SnapshotPaths.resolve(sql, dir, spark)
      .contains(SnapshotPaths.dirFor("fp", dir, spark)))
    assert(SnapshotPaths.resolve(sql, dir, s2)
      .contains(SnapshotPaths.dirFor("fp", dir, s2)))
    assert(!SnapshotPaths.resolve(sql, dir, spark)
      .contains(SnapshotPaths.dirFor("fp", dir, s2)))
  }

  test("snapshots live under the dedicated scratch root (the reaper's scope)") {
    // the stale-dir reaper enumerates ONLY this subdirectory, so every
    // dir SnapshotPaths hands out must live inside it — a dir outside
    // would leak forever, and a reaper scoped wider could delete
    // unrelated processes' graft_* temp dirs (the r7 hazard)
    val root = SnapshotPaths.scratchRoot
    assert(java.nio.file.Paths.get(root).getFileName.toString == "graft_snapshots")
    assert(SnapshotPaths.dirFor("fp", "/root/testdata/sf0.01", spark)
      .startsWith(root + "/graft_"))
    assert(SnapshotPaths.tokenDirFor("fp").startsWith(root + "/graft_"))
  }

  test("resolve substitutes exactly what dirFor produces") {
    val sql = s"read_parquet('${SnapshotPaths.tokenDirFor("fp")}/*.parquet')"
    val resolved = SnapshotPaths.resolve(sql, "/root/testdata/sf0.01", spark)
    assert(resolved.contains(
      SnapshotPaths.dirFor("fp", "/root/testdata/sf0.01", spark)))
    assert(!resolved.contains(SnapshotPaths.DataDirToken))
  }
}
