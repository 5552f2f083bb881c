package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Snapshot-path derivation: per-data-dir isolation must survive
  * sanitization (distinct raw dirs may sanitize identically). */
class SnapshotPathsSpec extends AnyFunSuite {

  test("dirs differing only in a sanitized character get distinct snapshots") {
    // both sanitize to data_sf1 — the hash suffix must separate them
    val a = SnapshotPaths.dirFor("fp", "/data/sf1")
    val b = SnapshotPaths.dirFor("fp", "/data_sf1")
    assert(a != b)
  }

  test("dirFor is deterministic and filesystem-safe") {
    val d = SnapshotPaths.dirFor("fp", "/root/testdata/sf0.01")
    assert(d == SnapshotPaths.dirFor("fp", "/root/testdata/sf0.01"))
    val name = d.substring(d.lastIndexOf('/') + 1)
    assert(name.matches("[A-Za-z0-9._-]+"), s"unsafe chars in $name")
  }

  test("resolve substitutes exactly what dirFor produces") {
    val sql = s"read_parquet('${SnapshotPaths.dirFor("fp", SnapshotPaths.DataDirToken)}/*.parquet')"
    val resolved = SnapshotPaths.resolve(sql, "/root/testdata/sf0.01")
    assert(resolved.contains(SnapshotPaths.dirFor("fp", "/root/testdata/sf0.01")))
    assert(!resolved.contains(SnapshotPaths.DataDirToken))
  }
}
