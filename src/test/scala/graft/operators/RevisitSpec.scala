package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RevisitSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1767225600L + s))

  private def seed(path: String): Unit =
    SnapshotMerge.upsert(
      Seq(
        ("http://v.com/a", "body a", ts(0)),
        ("http://v.com/b", "body b", ts(0)),
        ("http://v.com/c", "body c", ts(0)),
        ("http://v.com/d", "body d", ts(0)),
        ("http://v.com/e", "body e", ts(0)))
        .toDF("url", "body", "last_fetch_ts"),
      Seq("url"), path)

  test("every outcome class folds correctly; counts are per class") {
    val path = java.nio.file.Files.createTempDirectory("rv").toString + "/snap"
    seed(path)
    val revisits = Seq(
      ("http://v.com/a", ts(100), 200, "body a v2"), // replace
      ("http://v.com/b", ts(100), 304, null),        // carry forward
      ("http://v.com/c", ts(100), 301, null),        // moved → delete
      ("http://v.com/d", ts(100), 404, null),        // gone → delete
      ("http://v.com/e", ts(100), 503, null),        // transient → no-op
      ("http://v.com/new", ts(100), 200, "fresh"),   // insert
      ("http://v.com/ghost", ts(100), 304, null))    // no history → drop
      .toDF("url", "fetch_ts", "http_status", "body")
    val counts = Revisit.applyRevisitOutcomes(spark, path, revisits,
      "url", "fetch_ts", "http_status", "body")
    assert(counts == Map("written" -> 2L, "carried" -> 1L, "deleted" -> 2L))
    val back = SnapshotMerge.read(spark, path)
      .orderBy("url").collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        r.getAs[java.sql.Timestamp](2)))).toMap
    assert(back("http://v.com/a") == (("body a v2", ts(100))))
    assert(back("http://v.com/b") == (("body b", ts(100)))) // ts-only
    assert(!back.contains("http://v.com/c"))
    assert(!back.contains("http://v.com/d"))
    assert(back("http://v.com/e") == (("body e", ts(0)))) // untouched
    assert(back("http://v.com/new") == (("fresh", ts(100))))
    assert(!back.contains("http://v.com/ghost"))
  }

  test("two waves' outcomes for one URL key down to the LATEST fetch") {
    val path = java.nio.file.Files.createTempDirectory("rv2").toString + "/snap"
    seed(path)
    val revisits = Seq(
      ("http://v.com/a", ts(100), 200, "wave1"),
      ("http://v.com/a", ts(200), 200, "wave2"), // newer wins
      ("http://v.com/b", ts(200), 404, null),
      ("http://v.com/b", ts(100), 200, "stale")) // older loses → delete
      .toDF("url", "fetch_ts", "http_status", "body")
    Revisit.applyRevisitOutcomes(spark, path, revisits,
      "url", "fetch_ts", "http_status", "body")
    val back = SnapshotMerge.read(spark, path).orderBy("url").collect()
    assert(back.find(_.getString(0) == "http://v.com/a")
      .get.getString(1) == "wave2")
    assert(!back.exists(_.getString(0) == "http://v.com/b"))
  }

  test("a tagged wave replays as a no-op; sharded path folds identically") {
    val flat = java.nio.file.Files.createTempDirectory("rv3").toString + "/f"
    val shrd = java.nio.file.Files.createTempDirectory("rv3").toString + "/s"
    seed(flat)
    SnapshotMerge.createSharded(
      SnapshotMerge.read(spark, flat), Seq("url"), 4, shrd)
    val revisits = Seq(
      ("http://v.com/a", ts(100), 200, "v2"),
      ("http://v.com/b", ts(100), 404, null))
      .toDF("url", "fetch_ts", "http_status", "body")
    Revisit.applyRevisitOutcomes(spark, flat, revisits, "url",
      "fetch_ts", "http_status", "body", commitTag = Some("w1"))
    Revisit.applyRevisitOutcomes(spark, shrd, revisits, "url",
      "fetch_ts", "http_status", "body", sharded = true,
      commitTag = Some("w1"))
    val f1 = SnapshotMerge.read(spark, flat).orderBy("url").collect()
    val s1 = SnapshotMerge.readSharded(spark, shrd).orderBy("url").collect()
    assert(f1.map(_.toString).toSeq == s1.map(_.toString).toSeq)
    // replay: the tag short-circuits — state unchanged
    Revisit.applyRevisitOutcomes(spark, flat, revisits, "url",
      "fetch_ts", "http_status", "body", commitTag = Some("w1"))
    val f2 = SnapshotMerge.read(spark, flat).orderBy("url").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
  }
}
