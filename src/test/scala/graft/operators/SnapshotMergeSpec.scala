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

  test("null-keyed rows REPLACE, never duplicate (null-safe key equality)") {
    val dir = tmp()
    val withNull = Seq((Some(1L), "a", 10.0), (None, "nullkey", 20.0))
      .toDF("id", "name", "score")
    SnapshotMerge.upsert(withNull, Seq("id"), dir)
    // upsert the null key again with a new payload: one row, new value
    val update = Seq((Option.empty[Long], "nullkey2", 21.0))
      .toDF("id", "name", "score")
    SnapshotMerge.upsert(update, Seq("id"), dir)
    val got = SnapshotMerge.read(spark, dir)
    assert(got.count() == 2, "null-keyed row duplicated instead of replaced")
    assert(got.filter(col("id").isNull).select("name").as[String].head() == "nullkey2")
    // and a null-keyed DELETE removes it
    SnapshotMerge.upsert(
      Seq((Option.empty[Long], "x", 0.0, true)).toDF("id", "name", "score", "del"),
      Seq("id"), dir, deleteCol = Some("del"))
    assert(SnapshotMerge.read(spark, dir).filter(col("id").isNull).count() == 0)
    // sharded path: same contract (shardExpr routes nulls deterministically)
    val sDir = tmp()
    SnapshotMerge.createSharded(withNull, Seq("id"), 4, sDir)
    SnapshotMerge.upsertSharded(update, Seq("id"), sDir)
    val gotS = SnapshotMerge.readSharded(spark, sDir)
    assert(gotS.count() == 2)
    assert(gotS.filter(col("id").isNull).select("name").as[String].head() == "nullkey2")
  }

  test("broadcastKeys=false: backfill regime shuffles instead of broadcasting") {
    val current = spark.range(0, 1000)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    val keys = spark.range(0, 1000, 2).select(col("id"))
    def planOf(broadcastKeys: Boolean): String =
      SnapshotMerge.survivorAntiJoin(current, keys, Seq("id"), broadcastKeys)
        .queryExecution.executedPlan.toString
    assert(planOf(true).contains("BroadcastHashJoin"),
      "CDC default must broadcast the key set")
    // without the hint AND below the auto-broadcast size cutoff the
    // planner may still pick broadcast on its own (fine in practice);
    // the flag's contract is that it never FORCES one — assert with
    // auto-broadcast off, the backfill regime where the flag matters
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    val shuffled = try { spark.conf.set(thresholdKey, "-1"); planOf(false) }
    finally spark.conf.set(thresholdKey, saved)
    assert(!shuffled.contains("BroadcastHashJoin") &&
      !shuffled.contains("BroadcastExchange"),
      s"broadcastKeys=false must not broadcast:\n$shuffled")
    // end-to-end: both regimes reach the identical snapshot (sharded too)
    val a = tmp(); val b = tmp()
    val big = spark.range(0, 300)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    val batch = spark.range(0, 300, 3)
      .select(col("id"), lit("upd").as("name"))
    SnapshotMerge.upsert(big, Seq("id"), a)
    SnapshotMerge.upsert(batch, Seq("id"), a, broadcastKeys = false)
    SnapshotMerge.createSharded(big, Seq("id"), 8, b)
    SnapshotMerge.upsertSharded(batch, Seq("id"), b, broadcastKeys = false)
    val fa = SnapshotMerge.read(spark, a)
    val fb = SnapshotMerge.readSharded(spark, b)
    assert(fa.exceptAll(fb).count() == 0 && fb.exceptAll(fa).count() == 0)
  }

  test("a reader on the old manifest survives a concurrent upsert (deferred retire)") {
    val dir = tmp()
    val big = spark.range(0, 400)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 8, dir)
    // the long-running reader: resolves the CURRENT manifest now…
    val oldReader = SnapshotMerge.readSharded(spark, dir)
    // …then a merge supersedes every shard it touches
    val batch = spark.range(0, 400, 5)
      .select(col("id"), lit("upd").as("name"))
    SnapshotMerge.upsertSharded(batch, Seq("id"), dir)
    // the old scan still completes over the complete OLD snapshot —
    // nothing it resolved was deleted at commit time
    assert(oldReader.count() == 400)
    assert(oldReader.filter(col("name") === "upd").count() == 0,
      "old reader must see the old version, not a mix")
    // a retention window keeps the superseded dirs through vacuum…
    assert(SnapshotMerge.vacuumSharded(spark, dir, minAgeMs = 3600L * 1000) == 0)
    assert(oldReader.count() == 400)
    // …and an expired window reaps them (retire-log mtime, not write mtime)
    assert(SnapshotMerge.vacuumSharded(spark, dir) > 0)
    val after = SnapshotMerge.readSharded(spark, dir)
    assert(after.filter(col("name") === "upd").count() == batch.count())
    assert(after.count() == 400)
  }

  test("vacuum decides liveness on qualified paths — spelling never kills live dirs") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 4, dir)
    SnapshotMerge.upsertSharded(
      Seq((2L, "b2", 21.0)).toDF("id", "name", "score"), Seq("id"), dir)
    // vacuum addressed with a trailing slash AND a file: scheme — both
    // must resolve to the same snapshot and reap only the retirees
    SnapshotMerge.vacuumSharded(spark, dir + "/")
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
    SnapshotMerge.upsertSharded(
      Seq((3L, "c2", 31.0)).toDF("id", "name", "score"), Seq("id"), dir)
    SnapshotMerge.vacuumSharded(spark, "file:" + dir)
    val got = SnapshotMerge.readSharded(spark, dir).orderBy("id")
      .select("name").as[String].collect().toSeq
    assert(got == Seq("a", "b2", "c2"))
  }

  test("a moved snapshot keeps working (relative manifest paths)") {
    val root = java.nio.file.Files.createTempDirectory("graft_merge_mv").toString
    val a = s"$root/orig"; val b = s"$root/moved"
    SnapshotMerge.createSharded(base, Seq("id"), 4, a)
    SnapshotMerge.upsertSharded(
      Seq((2L, "b2", 21.0)).toDF("id", "name", "score"), Seq("id"), a)
    IndexFs.rename(spark, a, b)
    assert(SnapshotMerge.readSharded(spark, b).count() == 3)
    assert(SnapshotMerge.readSharded(spark, b)
      .filter(col("id") === 2L).select("name").as[String].head() == "b2")
    // and it stays writable + vacuumable at the new location
    SnapshotMerge.upsertSharded(
      Seq((4L, "d", 40.0)).toDF("id", "name", "score"), Seq("id"), b)
    SnapshotMerge.vacuumSharded(spark, b)
    assert(SnapshotMerge.readSharded(spark, b).count() == 4)
  }

  test("reserved __mergekey_<key> names fail loudly AT CREATION, exact-match only") {
    val dir = tmp()
    // the colliding spelling is rejected on the very first upsert —
    // letting it persist would brick every later incremental merge
    val e = intercept[IllegalArgumentException] {
      SnapshotMerge.upsert(
        Seq((1L, "x")).toDF("id", "__mergekey_id"), Seq("id"), dir)
    }
    assert(e.getMessage.contains("__mergekey_id"))
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.createSharded(
        Seq((1L, "x")).toDF("id", "__mergekey_id"), Seq("id"), 4, dir)
    }
    // but only the EXACT renamed-key spellings are reserved: a column
    // merely sharing the prefix merges fine, forever
    SnapshotMerge.upsert(
      Seq((1L, "n1")).toDF("id", "__mergekey_notes"), Seq("id"), dir)
    SnapshotMerge.upsert(
      Seq((1L, "n2"), (2L, "n3")).toDF("id", "__mergekey_notes"),
      Seq("id"), dir)
    val got = SnapshotMerge.read(spark, dir).orderBy("id")
      .select("__mergekey_notes").as[String].collect().toSeq
    assert(got == Seq("n2", "n3"))
  }

  test("schema evolution: union schema with null fill; off by default; sharded declines") {
    val dir = tmp()
    SnapshotMerge.upsert(
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), Seq("id"), dir)
    val widened = Seq((2L, "b2", 21.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
    // off by default: the mismatch is loud and names the escape hatch
    val e = intercept[IllegalArgumentException] {
      SnapshotMerge.upsert(widened, Seq("id"), dir)
    }
    assert(e.getMessage.contains("allowSchemaEvolution"))
    // on: survivors null-fill the new column, batch rows carry it
    SnapshotMerge.upsert(widened, Seq("id"), dir, allowSchemaEvolution = true)
    val got = SnapshotMerge.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq((1L, "a", None), (2L, "b2", Some(21.0)),
      (3L, "c", Some(30.0))))
    // the reverse direction: a batch MISSING a column null-fills it
    SnapshotMerge.upsert(Seq((4L, "d")).toDF("id", "name"), Seq("id"), dir,
      allowSchemaEvolution = true)
    assert(SnapshotMerge.read(spark, dir)
      .filter(col("id") === 4L && col("score").isNull).count() == 1)
    // evolution never relaxes the key requirement
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.upsert(
        Seq((1, "x")).toDF("other", "name"), Seq("other"), dir,
        allowSchemaEvolution = true)
    }
    // sharded: divergent schema is a loud error even when the batch
    // touches only EMPTY shards (the anchor relation is the gate, not
    // the touched dirs)
    val sDir = tmp()
    SnapshotMerge.createSharded(
      Seq((1L, "a")).toDF("id", "name"), Seq("id"), 4, sDir)
    val sE = intercept[IllegalArgumentException] {
      SnapshotMerge.upsertSharded(
        Seq((99L, "z", 1.0)).toDF("id", "name", "score"), Seq("id"), sDir)
    }
    assert(sE.getMessage.contains("evolveSharded"))
  }

  test("evolveSharded: full-rewrite migration unlocks wider batches; old versions keep their schema") {
    val dir = tmp()
    SnapshotMerge.createSharded(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"),
      Seq("id"), 4, dir) // v1, 2-column schema
    val wide = Seq((2L, "b2", 21.0)).toDF("id", "name", "score")
    // the decline names the migration op
    val e = intercept[IllegalArgumentException] {
      SnapshotMerge.upsertSharded(wide, Seq("id"), dir)
    }
    assert(e.getMessage.contains("evolveSharded"))
    // migrate: every shard rewritten under the union schema (v2)
    SnapshotMerge.evolveSharded(spark, dir, Seq("id"), wide)
    val after = SnapshotMerge.readSharded(spark, dir)
    assert(after.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(after.count() == 3)
    assert(after.filter(col("score").isNotNull).count() == 0)
    // the wider batch now merges normally (v3)
    SnapshotMerge.upsertSharded(wide, Seq("id"), dir)
    val got = SnapshotMerge.readSharded(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq((1L, None), (2L, Some(21.0)), (3L, None)))
    // evolving with nothing new is a loud no-op error
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.evolveSharded(spark, dir, Seq("id"), wide)
    }
    // time travel: the pre-evolution version reads with ITS schema
    val v1 = SnapshotMerge.readShardedVersion(spark, dir, 1L)
    assert(v1.columns.sorted.toSeq == Seq("id", "name"))
    assert(v1.count() == 3)
    // and the retirees reap through the same windowed vacuum
    assert(SnapshotMerge.vacuumSharded(spark, dir) > 0)
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
  }

  test("migrateSharded: rename + drop rewrite; old versions keep the old schema; guards are loud") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 4, dir) // v1: id,name,score
    SnapshotMerge.migrateSharded(spark, dir, Seq("id"),
      renames = Map("id" -> "doc_id", "name" -> "title"),
      drops = Seq("score")) // v2: doc_id,title
    val after = SnapshotMerge.readSharded(spark, dir)
    assert(after.columns.sorted.toSeq == Seq("doc_id", "title"))
    assert(after.count() == 3)
    // the renamed KEY keeps addressing the same rows (value-hash
    // assignment): an upsert in the NEW spelling replaces, not dups
    SnapshotMerge.upsertSharded(
      Seq((2L, "b-migrated")).toDF("doc_id", "title"), Seq("doc_id"), dir) // v3
    val got = SnapshotMerge.readSharded(spark, dir).orderBy("doc_id")
      .select("title").as[String].collect().toSeq
    assert(got == Seq("a", "b-migrated", "c"))
    // a batch in the OLD spelling now declines loudly
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.upsertSharded(
        Seq((2L, "x", 0.0)).toDF("id", "name", "score"), Seq("id"), dir)
    }
    // time travel BACK across the migration: v1 reads with ITS schema
    val v1 = SnapshotMerge.readShardedVersion(spark, dir, 1L)
    assert(v1.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(v1.count() == 3)
    // guards: dropping a key, absent columns, chained/colliding renames
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.migrateSharded(spark, dir, Seq("doc_id"),
        drops = Seq("doc_id"))
    }
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.migrateSharded(spark, dir, Seq("doc_id"),
        renames = Map("absent_col" -> "x"))
    }
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.migrateSharded(spark, dir, Seq("doc_id"),
        renames = Map("doc_id" -> "title")) // target collides
    }
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.migrateSharded(spark, dir, Seq("doc_id")) // no-op
    }
    // and the migration retires through the windowed vacuum like any op
    assert(SnapshotMerge.vacuumSharded(spark, dir) > 0)
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
  }

  test("time travel: VERSION AS OF reads retained versions; vacuum expiry fails loudly") {
    val dir = tmp()
    val big = spark.range(0, 200)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 4, dir) // v1
    SnapshotMerge.upsertSharded(
      spark.range(0, 200, 2).select(col("id"), lit("u1").as("name")),
      Seq("id"), dir) // v2
    SnapshotMerge.upsertSharded(
      Seq((7L, "u2")).toDF("id", "name"), Seq("id"), dir) // v3
    assert(SnapshotMerge.shardedVersions(spark, dir) == Seq(1L, 2L, 3L))
    // v1: the original content, untouched by either batch
    val v1 = SnapshotMerge.readShardedVersion(spark, dir, 1L)
    assert(v1.count() == 200)
    assert(v1.filter(col("name") =!= concat(lit("n"), col("id"))).count() == 0)
    // v2: evens updated, the v3 batch invisible
    val v2 = SnapshotMerge.readShardedVersion(spark, dir, 2L)
    assert(v2.filter(col("name") === "u1").count() == 100)
    assert(v2.filter(col("name") === "u2").count() == 0)
    // the live read is v3
    assert(SnapshotMerge.readSharded(spark, dir)
      .filter(col("name") === "u2").count() == 1)
    // a version that never committed fails loudly
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.readShardedVersion(spark, dir, 99L)
    }
    // expired retention: old versions reaped → time travel to them is a
    // LOUD error, never a partial result; the live version is untouched
    assert(SnapshotMerge.vacuumSharded(spark, dir) > 0)
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.readShardedVersion(spark, dir, 1L)
    }
    assert(SnapshotMerge.shardedVersions(spark, dir) == Seq(3L))
    assert(SnapshotMerge.readShardedVersion(spark, dir, 3L).count() == 200)
  }

  test("optimizeSharded: clustered shards, pruned read skips files, content intact") {
    val dir = tmp()
    val big = spark.range(0, 2000)
      .select(col("id"), (col("id") % 100).as("cat"),
        concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 4, dir)
    SnapshotMerge.optimizeSharded(spark, dir, Seq("id"), Seq("cat", "id"),
      filesPerShard = 4)
    // content preserved row-for-row
    val back = SnapshotMerge.readSharded(spark, dir)
    assert(back.exceptAll(big).count() == 0 && big.exceptAll(back).count() == 0)
    // the pruned path reads fewer files than the snapshot holds
    val m = SnapshotMerge.readManifest(spark, dir)
    val allFiles = m.shards.values.toSeq.map { d =>
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    }.sum
    val band = Seq(Layout.Band("cat", 0L, 9L))
    val prunedFiles = m.shards.values.toSeq.map { d =>
      Layout.prunedFilesInDir(spark, d, band)._1.length
    }.sum
    assert(prunedFiles < allFiles,
      s"optimizeSharded must enable skipping: $prunedFiles/$allFiles files")
    // and the pruned read + exact filter ≡ the full filter
    val pruned = SnapshotMerge.readShardedPruned(spark, dir, band)
      .filter(col("cat").between(0, 9))
    val full = back.filter(col("cat").between(0, 9))
    assert(pruned.exceptAll(full).count() == 0)
    assert(full.exceptAll(pruned).count() == 0)
    assert(full.count() == 200)
    // superseded pre-optimize dirs retire through the windowed vacuum
    assert(SnapshotMerge.vacuumSharded(spark, dir) > 0)
    assert(SnapshotMerge.readSharded(spark, dir).count() == 2000)
    // the skew-robust rank mode threads through too, content intact
    SnapshotMerge.optimizeSharded(spark, dir, Seq("id"), Seq("cat", "id"),
      filesPerShard = 2, rankMode = "equidepth")
    val backEq = SnapshotMerge.readSharded(spark, dir)
    assert(backEq.exceptAll(big).count() == 0 &&
      big.exceptAll(backEq).count() == 0)
  }

  test("restoreSharded: metadata-only rollback to a retained version, itself versioned") {
    val dir = tmp()
    val big = spark.range(0, 300)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 8, dir) // v1
    SnapshotMerge.upsertSharded(
      spark.range(0, 300, 3).select(col("id"), lit("bad").as("name")),
      Seq("id"), dir) // v2 — the batch we want undone
    assert(SnapshotMerge.restoreSharded(spark, dir, 1L) == 3L) // v3 = v1's map
    val live = SnapshotMerge.readSharded(spark, dir)
    assert(live.count() == 300)
    assert(live.filter(col("name") === "bad").count() == 0,
      "restore must re-surface the pre-batch content")
    // history survives the rollback: the rolled-back-over v2 is still a
    // time-travel target, and the restore itself is a version
    assert(SnapshotMerge.shardedVersions(spark, dir) == Seq(1L, 2L, 3L))
    assert(SnapshotMerge.readShardedVersion(spark, dir, 2L)
      .filter(col("name") === "bad").count() == 100)
    // the snapshot stays writable after the restore (replace, not dup)
    SnapshotMerge.upsertSharded(
      Seq((7L, "fixed")).toDF("id", "name"), Seq("id"), dir) // v4
    val after = SnapshotMerge.readSharded(spark, dir)
    assert(after.count() == 300)
    assert(after.filter(col("id") === 7L)
      .select("name").as[String].head() == "fixed")
    // restoring to the live version is a loud no-op
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.restoreSharded(spark, dir, 4L)
    }
    // vacuum after the restore keeps the LIVE (reactivated v1) dirs —
    // liveness always wins over any retire entry that named them
    SnapshotMerge.vacuumSharded(spark, dir)
    val postVacuum = SnapshotMerge.readSharded(spark, dir)
    assert(postVacuum.count() == 300)
    assert(postVacuum.filter(col("name") === "bad").count() == 0)
  }

  test("reshardSharded: new shard count, same content; old versions keep their assignment") {
    val dir = tmp()
    val big = spark.range(0, 400)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 4, dir) // v1 @ 4 shards
    SnapshotMerge.upsertSharded(
      spark.range(0, 400, 5).select(col("id"), lit("u1").as("name")),
      Seq("id"), dir) // v2
    assert(SnapshotMerge.reshardSharded(spark, dir, Seq("id"), 16)) // v3 @ 16
    // idempotent from a maintenance loop: already at 16 → no commit
    assert(!SnapshotMerge.reshardSharded(spark, dir, Seq("id"), 16))
    val m = SnapshotMerge.readManifest(spark, dir)
    assert(m.nShards == 16 && m.version == 3L)
    val back = SnapshotMerge.readSharded(spark, dir)
    val want = SnapshotMerge.readShardedVersion(spark, dir, 2L)
    assert(back.exceptAll(want).count() == 0 && want.exceptAll(back).count() == 0,
      "reshard must preserve content exactly")
    // later batches follow the NEW assignment from the manifest:
    // replacement, never duplication
    SnapshotMerge.upsertSharded(
      Seq((10L, "u2")).toDF("id", "name"), Seq("id"), dir) // v4
    val got = SnapshotMerge.readSharded(spark, dir)
    assert(got.count() == 400)
    assert(got.filter(col("id") === 10L)
      .select("name").as[String].head() == "u2")
    // a CDF span crossing the reshard compares by value: only the real
    // change surfaces, not 400 rows of relocation noise
    val span = SnapshotMerge.readShardedChanges(spark, dir, Seq("id"), 2L, 4L)
      .collect()
    assert(span.length == 2 &&
      span.forall(_.getLong(0) == 10L), s"got ${span.mkString(";")}")
    // time travel to the pre-reshard version still reads correctly
    assert(SnapshotMerge.readShardedVersion(spark, dir, 1L).count() == 400)
    // and a restore ACROSS the reshard re-activates the old assignment
    SnapshotMerge.restoreSharded(spark, dir, 2L) // v5 @ 4 shards again
    assert(SnapshotMerge.readManifest(spark, dir).nShards == 4)
    SnapshotMerge.upsertSharded(
      Seq((10L, "u3")).toDF("id", "name"), Seq("id"), dir) // v6 under 4 shards
    val restored = SnapshotMerge.readSharded(spark, dir)
    assert(restored.count() == 400)
    assert(restored.filter(col("id") === 10L)
      .select("name").as[String].head() == "u3")
  }

  test("compactSharded: bin-packs multi-file shards to one file, content intact, size-gated") {
    val dir = tmp()
    val big = spark.range(0, 2000)
      .select(col("id"), (col("id") % 100).as("cat"),
        concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 4, dir) // v1
    SnapshotMerge.optimizeSharded(spark, dir, Seq("id"), Seq("cat", "id"),
      filesPerShard = 4) // v2 — every shard now holds several files
    val beforeFiles = SnapshotMerge.describeSharded(spark, dir)
      .agg(sum("files")).head.getLong(0)
    assert(beforeFiles > 4, s"fixture must start multi-file, got $beforeFiles")
    // a target below every shard's bytes qualifies nothing: no commit,
    // no version bump — big shards are optimizeSharded's job
    val v = SnapshotMerge.readManifest(spark, dir).version
    assert(SnapshotMerge.compactSharded(spark, dir, targetFileBytes = 1L) == 0)
    assert(SnapshotMerge.readManifest(spark, dir).version == v)
    // a generous target packs every shard back to one file
    assert(SnapshotMerge.compactSharded(spark, dir) == 4)
    val d = SnapshotMerge.describeSharded(spark, dir).collect()
    assert(d.length == 4 && d.forall(_.getLong(3) == 1L),
      s"expected 1 file per shard, got ${d.map(_.getLong(3)).mkString(",")}")
    // row content preserved exactly
    val back = SnapshotMerge.readSharded(spark, dir)
    assert(back.exceptAll(big).count() == 0 && big.exceptAll(back).count() == 0)
    // idempotent: single-file shards never qualify again
    assert(SnapshotMerge.compactSharded(spark, dir) == 0)
    // the superseded multi-file dirs retire through the windowed vacuum
    assert(SnapshotMerge.vacuumSharded(spark, dir) > 0)
    assert(SnapshotMerge.readSharded(spark, dir).count() == 2000)
  }

  test("describeSharded: one row per live shard with real file/byte counts") {
    val dir = tmp()
    val big = spark.range(0, 500)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 8, dir)
    val d1 = SnapshotMerge.describeSharded(spark, dir).collect()
    assert(d1.length == 8)
    assert(d1.forall(_.getLong(0) == 1L)) // version
    assert(d1.forall(r => r.getLong(3) >= 1L && r.getLong(4) > 0L))
    // a one-key merge bumps the version everywhere but rewrites one
    // shard's path; file counts stay real
    SnapshotMerge.upsertSharded(
      Seq((7L, "upd")).toDF("id", "name"), Seq("id"), dir)
    val d2 = SnapshotMerge.describeSharded(spark, dir).collect()
    assert(d2.length == 8)
    assert(d2.forall(_.getLong(0) == 2L))
    val moved = d2.map(r => r.getLong(1) -> r.getString(2)).toMap
    val before = d1.map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(moved.count { case (k, p) => before(k) != p } == 1,
      "exactly the touched shard should point at a new physical dir")
  }

  test("marker protocol: the full sharded lifecycle composes (create→merge→evolve→optimize→vacuum→time-travel)") {
    val dir = tmp()
    spark.conf.set(IndexFs.CommitProtocolKey, "marker")
    try {
      val big = spark.range(0, 300)
        .select(col("id"), concat(lit("n"), col("id")).as("name"))
      SnapshotMerge.createSharded(big, Seq("id"), 8, dir) // v1
      SnapshotMerge.upsertSharded(
        spark.range(0, 300, 3).select(col("id"), lit("upd").as("name")),
        Seq("id"), dir) // v2
      SnapshotMerge.evolveSharded(spark, dir, Seq("id"),
        big.limit(0).withColumn("score", lit(0.0))) // v3 — anchor republished
      SnapshotMerge.upsertSharded(
        Seq((5L, "wide", 5.5)).toDF("id", "name", "score"),
        Seq("id"), dir) // v4
      SnapshotMerge.optimizeSharded(spark, dir, Seq("id"),
        Seq("id"), filesPerShard = 1) // v5
      val got = SnapshotMerge.readSharded(spark, dir)
      assert(got.count() == 300)
      assert(got.filter(col("name") === "upd").count() == 100) // ids 0,3,…,297; id 5 was "n5"
      assert(got.filter(col("id") === 5L)
        .select("score").as[Double].head() == 5.5)
      assert(got.filter(col("score").isNotNull).count() == 1)
      // time travel across the evolution boundary, under marker
      val v2 = SnapshotMerge.readShardedVersion(spark, dir, 2L)
      assert(v2.columns.sorted.toSeq == Seq("id", "name"))
      assert(v2.filter(col("name") === "upd").count() == 100)
      // vacuum reaps every retired version; the live state survives
      assert(SnapshotMerge.vacuumSharded(spark, dir) > 0)
      assert(SnapshotMerge.shardedVersions(spark, dir) == Seq(5L))
      val after = SnapshotMerge.readSharded(spark, dir)
      assert(after.count() == 300)
      assert(after.filter(col("id") === 5L)
        .select("score").as[Double].head() == 5.5)
    } finally spark.conf.unset(IndexFs.CommitProtocolKey)
  }

  test("two interleaved writers: the CAS loser retries onto the winner's version — no lost rows") {
    val dir = tmp()
    val big = spark.range(0, 300)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 8, dir) // v1
    // writer A reads v1, writes its delta … and in its commit window
    // writer B runs a COMPLETE upsert (committing v2). Under the r14
    // pointer swap A's later swap silently discarded B's batch; under
    // the CAS, A's commit of v2 loses, A re-reads v2 and commits v3.
    val batchA = spark.range(0, 300, 3)
      .select(col("id"), lit("from_a").as("name"))
    val batchB = spark.range(0, 300, 5)
      .select(col("id"), lit("from_b").as("name"))
    var attempts = 0
    assert(SnapshotMerge.upsertSharded(batchA, Seq("id"), dir,
      onCommitAttempt = () => {
        attempts += 1
        if (attempts == 1)
          SnapshotMerge.upsertSharded(batchB, Seq("id"), dir)
      }))
    assert(attempts == 2, s"A must lose once then win, got $attempts attempts")
    assert(SnapshotMerge.shardedVersions(spark, dir) == Seq(1L, 2L, 3L))
    val got = SnapshotMerge.readSharded(spark, dir)
    assert(got.count() == 300)
    // A committed after B, so contested keys (%15) are A's — exactly
    // the sequential B-then-A outcome
    assert(got.filter(col("name") === "from_a").count() == 100)
    assert(got.filter(col("name") === "from_b").count() ==
      batchB.count() - 20) // %5 keys minus the 20 contested %15 keys
    // and B's batch is fully present where uncontested — nothing lost
    assert(got.filter(col("id") % 5 === 0 && col("id") % 3 =!= 0 &&
      col("name") =!= "from_b").count() == 0)
  }

  test("a torn commit (manifest file without pointer) rolls forward, never backwards") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 4, dir) // v1
    SnapshotMerge.upsertSharded(
      Seq((2L, "b2", 21.0)).toDF("id", "name", "score"), Seq("id"), dir) // v2
    // simulate the crash between the manifest CAS and the pointer
    // write: wind the pointer back to v1 — the committed v2 FILE must
    // still win for readers and writers (listing is the source of truth)
    val f = IndexFs.fs(spark, dir)
    IndexFs.atomicWriteSmallFile(spark, f,
      new org.apache.hadoop.fs.Path(s"$dir/manifest.current"), "manifest-v1")
    assert(SnapshotMerge.readSharded(spark, dir)
      .filter(col("id") === 2L).select("name").as[String].head() == "b2")
    // the next writer targets v3, not a re-fight over v2
    SnapshotMerge.upsertSharded(
      Seq((3L, "c2", 31.0)).toDF("id", "name", "score"), Seq("id"), dir)
    assert(SnapshotMerge.shardedVersions(spark, dir) == Seq(1L, 2L, 3L))
    val got = SnapshotMerge.readSharded(spark, dir).orderBy("id")
      .select("name").as[String].collect().toSeq
    assert(got == Seq("a", "b2", "c2"))
    // a lost pointer ALTOGETHER still resolves (existsSharded + reads)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/manifest.current"), false)
    assert(SnapshotMerge.existsSharded(spark, dir))
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
  }

  test("maintenance ops fail loudly on a contested commit, leaving the snapshot untouched") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 4, dir)
    val m = SnapshotMerge.readManifest(spark, dir)
    // a competing writer owns the target version → the maintenance
    // commit must throw AND discard its already-written delta
    val deltaDir = s"$dir/shards-v${m.version + 1}-deadbeef"
    base.limit(1).write.parquet(s"$deltaDir/__shard=0")
    val e = intercept[ConcurrentCommitException] {
      SnapshotMerge.commitMaintenanceOrThrow(spark, dir, deltaDir,
        m.copy(version = m.version), "optimizeSharded") // v1 already committed
    }
    assert(e.getMessage.contains("optimizeSharded"))
    assert(!IndexFs.exists(spark, deltaDir), "failed delta must be deleted")
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
    assert(SnapshotMerge.readManifest(spark, dir).version == m.version)
    // an uncontested version commits fine through the same path
    SnapshotMerge.tryCommitManifest(spark, dir,
      m.copy(version = m.version + 1)) // simulate the competitor
    assert(SnapshotMerge.readManifest(spark, dir).version == m.version + 1)
    // concurrent CREATE: the second creator fails loudly too
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.createSharded(base, Seq("id"), 4, dir)
    }
  }

  test("CDF: typed change rows between versions; reference-carried shards unread; re-cluster emits nothing") {
    val dir = tmp()
    val big = spark.range(0, 400)
      .select(col("id"), concat(lit("n"), col("id")).as("name"),
        (col("id") * 1.5).as("score"))
    SnapshotMerge.createSharded(big, Seq("id"), 8, dir) // v1
    val batch = Seq(
      (7L, "updated", -1.0, false),  // update
      (1000L, "fresh", 9.0, false),  // insert (new key)
      (14L, "x", 0.0, true)          // delete
    ).toDF("id", "name", "score", "del")
    SnapshotMerge.upsertSharded(batch, Seq("id"), dir,
      deleteCol = Some("del")) // v2
    val cdf = SnapshotMerge.readShardedChanges(spark, dir, Seq("id"), 1L, 2L)
      .cache()
    assert(cdf.columns.toSeq == Seq("id", "name", "score", "_change_type"))
    val byType = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 1L, "delete" -> 1L,
      "update_preimage" -> 1L, "update_postimage" -> 1L), s"got $byType")
    assert(cdf.filter(col("_change_type") === "insert")
      .select("id").as[Long].head() == 1000L)
    assert(cdf.filter(col("_change_type") === "delete")
      .select("id").as[Long].head() == 14L)
    assert(cdf.filter(col("_change_type") === "update_preimage")
      .select("name").as[String].head() == "n7")
    assert(cdf.filter(col("_change_type") === "update_postimage")
      .select("name").as[String].head() == "updated")
    // scale contract: only the DIFFERING shard dirs are scanned — a
    // 3-key batch against 8 shards must not read the whole snapshot
    // twice (reference-carried shards are provably unchanged)
    val scannedDirs = cdf.inputFiles
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(scannedDirs.length <= 6,
      s"CDF scanned ${scannedDirs.length} shard dirs: ${scannedDirs.mkString(",")}")
    // a multi-version span diffs endpoints directly: v1→v3 after a
    // second batch reverts id 7 — the revert cancels out
    SnapshotMerge.upsertSharded(
      Seq((7L, "n7", 10.5)).toDF("id", "name", "score"), Seq("id"), dir) // v3
    val span = SnapshotMerge.readShardedChanges(spark, dir, Seq("id"), 1L, 3L)
    assert(span.filter(col("id") === 7L).count() == 0,
      "a value reverted inside the span must not appear in the diff")
    assert(span.count() == 2) // the insert + the delete survive
    // a pure re-cluster changes every shard dir but no values → empty feed
    SnapshotMerge.optimizeSharded(spark, dir, Seq("id"), Seq("score", "id")) // v4
    assert(SnapshotMerge.readShardedChanges(spark, dir, Seq("id"), 3L, 4L)
      .count() == 0)
    // bad spans and vacuumed endpoints fail loudly
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.readShardedChanges(spark, dir, Seq("id"), 2L, 2L)
    }
    SnapshotMerge.vacuumSharded(spark, dir)
    assertThrows[IllegalArgumentException] {
      SnapshotMerge.readShardedChanges(spark, dir, Seq("id"), 1L, 4L)
    }
  }

  test("CDF drives a downstream incremental consumer to the full-rebuild state") {
    val dir = tmp()
    val big = spark.range(0, 300)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    SnapshotMerge.createSharded(big, Seq("id"), 8, dir) // v1
    // a replica bootstrapped from v1…
    val replica = tmp()
    SnapshotMerge.upsert(SnapshotMerge.readShardedVersion(spark, dir, 1L),
      Seq("id"), replica)
    // …then the source moves on (updates + inserts + deletes)
    SnapshotMerge.upsertSharded(
      spark.range(0, 300, 7)
        .select(col("id"), lit("upd").as("name"),
          (col("id") % 3 === 0).as("del")),
      Seq("id"), dir, deleteCol = Some("del")) // v2
    SnapshotMerge.upsertSharded(
      Seq((900L, "new"), (901L, "new")).toDF("id", "name"),
      Seq("id"), dir) // v3
    // the CDF span IS the incremental maintenance feed: postimages +
    // inserts upsert, deletes delete — no source rescan
    val feed = SnapshotMerge.readShardedChanges(spark, dir, Seq("id"), 1L, 3L)
    SnapshotMerge.upsert(
      feed.filter(col("_change_type").isin("insert", "update_postimage", "delete"))
        .withColumn("__is_del", col("_change_type") === "delete")
        .drop("_change_type"),
      Seq("id"), replica, deleteCol = Some("__is_del"))
    val want = SnapshotMerge.readSharded(spark, dir)
    val got = SnapshotMerge.read(spark, replica)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "CDF-driven replica must equal the source's live state")
  }

  test("evolveSharded rejects a reserved __mergekey_<key> template column") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 4, dir)
    // letting this through would persist the reserved column into every
    // shard + the anchor and brick all later merges — with no recovery
    // short of a rebuild, since evolution only widens
    val e = intercept[IllegalArgumentException] {
      SnapshotMerge.evolveSharded(spark, dir, Seq("id"),
        Seq((1L, "x")).toDF("id", "__mergekey_id"))
    }
    assert(e.getMessage.contains("__mergekey_id"))
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
  }

  test("legacy absolute manifest paths survive, including the single-slash file: spelling") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 2, dir)
    // rewrite the manifest in the pre-relative legacy form, with the
    // Hadoop Path.toString spelling (file:/…, ONE slash) — a reader
    // treating it as relative would resolve <dir>/file:/… and fail
    val f = IndexFs.fs(spark, dir)
    val ptr = new org.apache.hadoop.fs.Path(s"$dir/manifest.current")
    val name = IndexFs.readSmallFile(f, ptr)
    val mPath = new org.apache.hadoop.fs.Path(s"$dir/$name")
    val lines = IndexFs.readSmallFile(f, mPath).split("\n").toSeq
    val (shardLines, trailer) = lines.tail.partition(!_.startsWith("end\t"))
    val legacy = ((lines.head +: shardLines.map { l =>
      val Array(k, p) = l.split("\t", 2)
      s"$k\t${f.makeQualified(new org.apache.hadoop.fs.Path(s"$dir/$p"))}"
    }) ++ trailer).mkString("\n")
    assert(legacy.contains("\tfile:/") && !legacy.contains("file:///"),
      s"fixture must exercise the single-slash scheme spelling:\n$legacy")
    val out = f.create(mPath, true)
    try out.write(legacy.getBytes("UTF-8")) finally out.close()
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
    // and maintenance keeps resolving them (vacuum liveness, upsert)
    SnapshotMerge.upsertSharded(
      Seq((2L, "b2", 21.0)).toDF("id", "name", "score"), Seq("id"), dir)
    assert(SnapshotMerge.vacuumSharded(spark, dir, minAgeMs = 3600L * 1000) == 0)
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
  }

  test("windowed vacuum never reaps an unlogged superseded dir on its write mtime") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 2, dir)
    SnapshotMerge.upsertSharded(
      Seq((2L, "b2", 21.0)).toDF("id", "name", "score"), Seq("id"), dir)
    // simulate the crash window: the pointer swapped but the retire log
    // never landed — the superseded v1 dirs are now unlogged dead dirs
    // whose WRITE mtime is arbitrarily older than the supersession
    val f = IndexFs.fs(spark, dir)
    val rDir = new org.apache.hadoop.fs.Path(s"$dir/_retired")
    f.listStatus(rDir).foreach(st => f.delete(st.getPath, false))
    val oldReader = SnapshotMerge.readShardedVersion(spark, dir, 1L)
    // a windowed vacuum must NOT reap them immediately (old behavior
    // did, via the orphan write-mtime path) — it synthesizes a retire
    // entry instead and the reader keeps its complete old version
    assert(SnapshotMerge.vacuumSharded(spark, dir, minAgeMs = 150L) == 0)
    assert(oldReader.count() == 3)
    // one full window later the synthesized entry expires and phase 1
    // reaps the dirs like any logged retiree
    Thread.sleep(300)
    assert(SnapshotMerge.vacuumSharded(spark, dir, minAgeMs = 150L) > 0)
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
    // minAgeMs = 0 (CI posture) keeps immediate reaping — covered by
    // the orphan test above
  }

  test("vacuum: a dir named by both an expired and an unexpired retire entry survives the window") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 2, dir)
    SnapshotMerge.upsertSharded(
      Seq((1L, "a2", 11.0), (2L, "b2", 21.0), (3L, "c2", 31.0))
        .toDF("id", "name", "score"), Seq("id"), dir)
    val f = IndexFs.fs(spark, dir)
    val rDir = new org.apache.hadoop.fs.Path(s"$dir/_retired")
    val logs = f.listStatus(rDir).filter(_.isFile)
    assert(logs.nonEmpty)
    // the restore-then-supersede shape: the SAME dirs (and manifest)
    // named by a second, fresh retire entry
    val src = logs.minBy(_.getPath.getName)
    val content = IndexFs.readSmallFile(f, src.getPath)
    val dup = new org.apache.hadoop.fs.Path(s"$dir/_retired/retired-v9")
    val out = f.create(dup, true)
    out.write(content.getBytes("UTF-8")); out.close()
    // expire the FIRST entry only; the duplicate is inside the window
    f.setTimes(src.getPath, System.currentTimeMillis() - 10000L, -1)
    val oldReader = SnapshotMerge.readShardedVersion(spark, dir, 1L)
    // the expired entry must NOT reap dirs the unexpired twin protects
    // (pre-fix: a single interleaved pass deleted them when the expired
    // file sorted first) — in-window readers and time travel survive
    assert(SnapshotMerge.vacuumSharded(spark, dir, minAgeMs = 5000L) == 0)
    assert(oldReader.count() == 3)
    assert(SnapshotMerge.readShardedVersion(spark, dir, 1L).count() == 3)
    // once the protecting entry expires too, the next pass reaps
    f.setTimes(dup, System.currentTimeMillis() - 10000L, -1)
    assert(SnapshotMerge.vacuumSharded(spark, dir, minAgeMs = 5000L) > 0)
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
  }

  test("a torn manifest body fails loudly, never a silently smaller snapshot") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 4, dir)
    val f = IndexFs.fs(spark, dir)
    val full = IndexFs.readSmallFile(f,
      new org.apache.hadoop.fs.Path(s"$dir/manifest-v1"))
    assert(full.split("\n").last.startsWith("end\t"),
      "every committed manifest carries the count trailer")
    // the fallback-path create-to-close window: a reader glimpses a
    // newer commit mid-write — header intact, tail lines missing
    val torn = full.split("\n").dropRight(2).mkString("\n")
    val o1 = f.create(new org.apache.hadoop.fs.Path(s"$dir/manifest-v2"), true)
    o1.write(torn.getBytes("UTF-8")); o1.close()
    val e1 = intercept[IllegalArgumentException] {
      SnapshotMerge.readSharded(spark, dir)
    }
    assert(e1.getMessage.contains("trailer"))
    // trailer present but a shard line lost: the count gate catches it
    val lines = full.split("\n")
    val dropMiddle = (lines.take(1) ++ lines.drop(2)).mkString("\n")
    val o2 = f.create(new org.apache.hadoop.fs.Path(s"$dir/manifest-v2"), true)
    o2.write(dropMiddle.getBytes("UTF-8")); o2.close()
    val e2 = intercept[IllegalArgumentException] {
      SnapshotMerge.readSharded(spark, dir)
    }
    assert(e2.getMessage.contains("does not match"))
    // clearing the torn file restores the good version
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/manifest-v2"), false)
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
  }

  test("pre-flag manifests (no trailer, no header flag) still read") {
    val dir = tmp()
    SnapshotMerge.createSharded(base, Seq("id"), 4, dir)
    val f = IndexFs.fs(spark, dir)
    val mPath = new org.apache.hadoop.fs.Path(s"$dir/manifest-v1")
    val lines = IndexFs.readSmallFile(f, mPath).split("\n")
    // rewrite in the pre-r16 format: header without the t1 flag field,
    // body without the end trailer — an existing snapshot written by an
    // older build must stay readable after the library upgrade
    val meta = lines.head.split("\t")
    assert(meta.length >= 6 && meta(5) == "t1",
      "fixture expects the current flagged header")
    val legacyHeader = meta.take(if (meta(4).isEmpty) 4 else 5).mkString("\t")
    val legacy = (legacyHeader +: lines.tail.filterNot(_.startsWith("end\t")))
      .mkString("\n")
    val o = f.create(mPath, true)
    try o.write(legacy.getBytes("UTF-8")) finally o.close()
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
    // and the interim trailer-without-flag form (written between the
    // trailer landing and the flag landing) reads too: the end line is
    // skipped, never parsed as a shard entry
    val interim = (legacyHeader +: lines.tail).mkString("\n")
    val o2 = f.create(mPath, true)
    try o2.write(interim.getBytes("UTF-8")) finally o2.close()
    assert(SnapshotMerge.readSharded(spark, dir).count() == 3)
    // a later commit re-stamps the current flagged format
    SnapshotMerge.upsertSharded(
      Seq((2L, "b2", 21.0)).toDF("id", "name", "score"), Seq("id"), dir)
    val m2 = IndexFs.readSmallFile(f,
      new org.apache.hadoop.fs.Path(s"$dir/manifest-v2")).split("\n")
    assert(m2.head.split("\t")(5) == "t1" && m2.last.startsWith("end\t"))
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
