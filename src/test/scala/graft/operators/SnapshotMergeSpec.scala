package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_merge").toString + "/snap"

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "score")

  test("first upsert creates the snapshot; read returns it") {
    val dir = tmp()
    assert(!SnapshotMerge.exists(spark, dir))
    assert(SnapshotMerge.upsert(base, Seq("id"), dir))
    assert(SnapshotMerge.exists(spark, dir))
    val got = SnapshotMerge.read(spark, dir).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("merge semantics: replace, insert, delete in one batch") {
    val dir = tmp()
    SnapshotMerge.upsert(base, Seq("id"), dir)
    val batch = Seq(
      (2L, "b2", 21.0, false), // replace id 2
      (4L, "d", 40.0, false),  // insert id 4
      (3L, "x", 0.0, true)     // delete id 3 (payload ignored)
    ).toDF("id", "name", "score", "is_deleted")
    assert(SnapshotMerge.upsert(batch, Seq("id"), dir,
      deleteCol = Some("is_deleted")))
    val got = SnapshotMerge.read(spark, dir).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0)))
  }

  test("within-batch precedence: last under updateOrder wins") {
    val dir = tmp()
    val batch = Seq(
      (1L, "old", 1.0, 100L), (1L, "new", 2.0, 200L), (2L, "only", 3.0, 50L)
    ).toDF("id", "name", "score", "version")
    SnapshotMerge.upsert(batch, Seq("id"), dir,
      updateOrder = Some(Seq(col("version"))))
    val got = SnapshotMerge.read(spark, dir).orderBy("id")
      .select("name").as[String].collect().toSeq
    assert(got == Seq("new", "only"))
  }

  test("commitTag: replay skips, content unchanged; untagged replay is idempotent") {
    val dir = tmp()
    SnapshotMerge.upsert(base, Seq("id"), dir)
    val batch = Seq((2L, "b2", 21.0)).toDF("id", "name", "score")
    assert(SnapshotMerge.upsert(batch, Seq("id"), dir,
      commitTag = Some("batch_1")))
    val after1 = SnapshotMerge.read(spark, dir).orderBy("id").collect().toSeq
    // tagged replay: short-circuits without touching the snapshot
    assert(!SnapshotMerge.upsert(batch, Seq("id"), dir,
      commitTag = Some("batch_1")))
    assert(SnapshotMerge.read(spark, dir).orderBy("id").collect().toSeq == after1)
    // untagged replay of the SAME batch: merges again, same fixed point
    assert(SnapshotMerge.upsert(batch, Seq("id"), dir))
    assert(SnapshotMerge.read(spark, dir).orderBy("id").collect().toSeq == after1)
  }

  test("schema mismatch and bad inputs fail loudly") {
    val dir = tmp()
    SnapshotMerge.upsert(base, Seq("id"), dir)
    val wrong = Seq((1L, "z")).toDF("id", "name")
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.upsert(wrong, Seq("id"), dir)
    }
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.upsert(base, Seq("absent"), tmp())
    }
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.upsert(base, Seq("id"), tmp(), deleteCol = Some("nope"))
    }
  }

  test("upsert ≡ the keep-last oracle over accumulated batches") {
    // fold three batches in sequence; the result must equal keep-last
    // (by batch sequence) over the union — the reference's ledger rule
    // lifted to the snapshot
    val dir = tmp()
    val b1 = Seq((1L, "a1"), (2L, "b1")).toDF("id", "v")
    val b2 = Seq((2L, "b2"), (3L, "c2")).toDF("id", "v")
    val b3 = Seq((1L, "a3"), (4L, "d3")).toDF("id", "v")
    Seq(b1, b2, b3).foreach(b => SnapshotMerge.upsert(b, Seq("id"), dir))
    val expected = graft.ops.Dedup.keepLast(
      b1.withColumn("seq", lit(1)).unionByName(b2.withColumn("seq", lit(2)))
        .unionByName(b3.withColumn("seq", lit(3))),
      Seq("id"), Seq(col("seq"))).drop("seq")
    val got = SnapshotMerge.read(spark, dir)
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
  }

  test("sharded: create/read round-trip and merge ≡ the unsharded operator") {
    val flat = tmp(); val sharded = tmp()
    val big = spark.range(0, 500)
      .select(col("id"), concat(lit("n"), col("id")).as("name"),
        (col("id") * 1.5).as("score"))
    SnapshotMerge.upsert(big, Seq("id"), flat)
    SnapshotMerge.createSharded(big, Seq("id"), 8, sharded)
    assert(SnapshotMerge.readSharded(spark, sharded).count() == 500)
    val batch = spark.range(0, 500, 7) // touches a subset of keys
      .select(col("id"), lit("upd").as("name"), lit(-1.0).as("score"),
        (col("id") % 3 === 0).as("del"))
    SnapshotMerge.upsert(batch, Seq("id"), flat, deleteCol = Some("del"))
    SnapshotMerge.upsertSharded(batch, Seq("id"), sharded, deleteCol = Some("del"))
    val a = SnapshotMerge.read(spark, flat)
    val b = SnapshotMerge.readSharded(spark, sharded)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("sharded: untouched shards are carried by reference, not rewritten") {
    val dir = tmp()
    val big = spark.range(0, 400)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 16, dir)
    val before = SnapshotMerge.readManifest(spark, dir)
    assert(before.shards.nonEmpty)
    // a one-key batch touches exactly one shard
    val batch = Seq((7L, "updated")).toDF("id", "name")
    SnapshotMerge.upsertSharded(batch, Seq("id"), dir)
    val after = SnapshotMerge.readManifest(spark, dir)
    assert(after.version == before.version + 1)
    val changed = after.shards.filter { case (k, p) => before.shards.get(k) != Some(p) }
    assert(changed.size == 1,
      s"one-key batch rewrote ${changed.size} shards: ${changed.keys}")
    // the untouched entries point at the ORIGINAL physical dirs
    (after.shards -- changed.keys).foreach { case (k, p) =>
      assert(before.shards(k) == p)
    }
    assert(SnapshotMerge.readSharded(spark, dir)
      .filter(col("id") === 7L).select("name").as[String].head() == "updated")
  }

  test("sharded: replay skip, schema survival on empty, vacuum reaps orphans") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 4, dir)
    val batch = Seq((2L, "b2", 21.0)).toDF("id", "name", "score")
    assert(SnapshotMerge.upsertSharded(batch, Seq("id"), dir,
      commitTag = Some("b1")))
    assert(!SnapshotMerge.upsertSharded(batch, Seq("id"), dir,
      commitTag = Some("b1")))
    // delete everything: snapshot empties but keeps its schema
    val killAll = SnapshotMerge.readSharded(spark, dir)
      .withColumn("del", lit(true))
    SnapshotMerge.upsertSharded(killAll, Seq("id"), dir, deleteCol = Some("del"))
    val empty = SnapshotMerge.readSharded(spark, dir)
    assert(empty.count() == 0)
    assert(empty.columns.sorted.toSeq == Seq("id", "name", "score"))
    // plant an orphan (a crashed upsert's half-published delta)
    val orphan = s"$dir/shards-v99/__shard=0"
    base.limit(1).write.parquet(orphan)
    assert(SnapshotMerge.vacuumSharded(spark, dir) > 0)
    assert(!IndexFs.exists(spark, orphan))
    // the live state survives vacuum
    assert(SnapshotMerge.readSharded(spark, dir).count() == 0)
  }

  test("marker protocol: version swap leaves a resolvable snapshot at every step") {
    val dir = tmp()
    spark.conf.set(IndexFs.CommitProtocolKey, "marker")
    try {
      SnapshotMerge.upsert(base, Seq("id"), dir)
      val v1 = IndexFs.resolveDir(spark, s"$dir/data")
      assert(v1.matches(".*data\\.v\\d+$"), s"expected versioned dir, got $v1")
      SnapshotMerge.upsert(Seq((2L, "b9", 99.0)).toDF("id", "name", "score"),
        Seq("id"), dir)
      val v2 = IndexFs.resolveDir(spark, s"$dir/data")
      assert(v2 != v1, "publish must supersede the version dir")
      assert(SnapshotMerge.read(spark, dir)
        .filter(col("id") === 2L).select("name").as[String].head() == "b9")
    } finally spark.conf.unset(IndexFs.CommitProtocolKey)
  }
}
