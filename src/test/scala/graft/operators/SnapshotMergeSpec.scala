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
