package graft.operators

import org.apache.hadoop.fs.{Path => HPath}

import graft.SparkSpec

/** Contract tests for the staged-commit filesystem layer all three
  * persisted index families share — the r9 exactly-once machinery
  * (tombstones, no-clobber commit rename, orphan handling) proven at
  * the primitive level; the per-family twins live in TextDedupSpec /
  * SimilaritySpec / StreamingOpsSpec. */
class IndexFsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def touch(path: String): Unit = {
    val f = IndexFs.fs(spark, path)
    f.mkdirs(new HPath(path).getParent)
    f.create(new HPath(path), true).close()
  }

  test("isCommitted: live commit dir, per-tag tombstone, and folded tombstone all count") {
    val dir = tmp("idxfs_committed")
    assert(!IndexFs.isCommitted(spark, dir, "t1"))
    // live commit dir
    IndexFs.fs(spark, dir).mkdirs(new HPath(s"$dir/commits/t1"))
    assert(IndexFs.isCommitted(spark, dir, "t1"))
    // per-tag tombstone outlives the commit dir
    IndexFs.markCommitted(spark, dir, "t1")
    IndexFs.deleteRecursively(spark, s"$dir/commits/t1")
    assert(IndexFs.isCommitted(spark, dir, "t1"))
    // folded tombstone outlives the per-tag file
    IndexFs.foldTombstones(spark, dir)
    assert(!IndexFs.exists(spark, s"$dir/committed/t1"))
    assert(IndexFs.isCommitted(spark, dir, "t1"))
  }

  test("foldTombstones bounds committed/ to one file and never loses a tag") {
    val dir = tmp("idxfs_fold")
    def committedFiles(): Seq[String] = {
      val f = IndexFs.fs(spark, dir)
      val p = new HPath(s"$dir/committed")
      if (!f.exists(p)) Seq.empty
      else f.listStatus(p).map(_.getPath.getName).toSeq.sorted
    }
    // rounds of mark → fold: the file count stays 1 regardless of how
    // many tags have ever been folded, and every tag stays recognized
    (1 to 4).foreach { round =>
      IndexFs.markCommitted(spark, dir, s"tag_$round")
      IndexFs.markCommitted(spark, dir, s"extra_$round")
      IndexFs.foldTombstones(spark, dir)
      assert(committedFiles() == Seq(s"_folded-$round"),
        s"round $round: ${committedFiles()}")
      (1 to round).foreach { r =>
        assert(IndexFs.isCommitted(spark, dir, s"tag_$r"))
        assert(IndexFs.isCommitted(spark, dir, s"extra_$r"))
      }
    }
    assert(!IndexFs.isCommitted(spark, dir, "never_seen"))
    // an already-folded dir is a no-op (no version churn)
    IndexFs.foldTombstones(spark, dir)
    assert(committedFiles() == Seq("_folded-4"))
    // a crashed fold's temp file is never read as a version and is
    // cleaned by the next fold without losing recognition
    touch(s"$dir/committed/_folding-tmp")
    assert(IndexFs.isCommitted(spark, dir, "tag_1"))
    IndexFs.markCommitted(spark, dir, "tag_5")
    IndexFs.foldTombstones(spark, dir)
    assert(committedFiles() == Seq("_folded-5"))
    (1 to 5).foreach(r => assert(IndexFs.isCommitted(spark, dir, s"tag_$r")))
    // legacy '_'-prefixed tags (pre-r10 rule) stay maintainable: the
    // tombstone lands, folds, and stays recognized — only NEW appends
    // reject the reserved prefix
    IndexFs.markCommitted(spark, dir, "_legacy")
    assert(IndexFs.isCommitted(spark, dir, "_legacy"))
    IndexFs.foldTombstones(spark, dir)
    assert(committedFiles() == Seq("_folded-6"))
    assert(IndexFs.isCommitted(spark, dir, "_legacy"))
  }

  test("requireValidTag rejects path escapes and the reserved '_' namespace") {
    IndexFs.requireValidTag("batch_0") // the crawl loop's shape
    IndexFs.requireValidTag("b-1.2")
    Seq("", ".", "..", "a/b", "_folded-1", "_anything").foreach { bad =>
      assertThrows[IllegalArgumentException](IndexFs.requireValidTag(bad))
    }
  }

  test("renameNoClobber fallback: a dst created inside the race window resolves as a lost race, never nesting") {
    val root = tmp("idxfs_nest")
    val f = IndexFs.fs(spark, root)
    def mkCommit(dir: String): Unit =
      Seq("bands", "shingles").foreach(r => touch(s"$dir/$r/part-0"))
    mkCommit(s"$root/staged/t1") // the loser's staged copy
    val src = f.makeQualified(new HPath(s"$root/staged/t1"))
    val dst = f.makeQualified(new HPath(s"$root/commits/t1"))
    f.mkdirs(dst.getParent)
    // the winner's commit lands BETWEEN the exists pre-check and the
    // rename — FileSystem.rename would move the loser INTO it
    // (commits/t1/t1) and return true, the silent-wrong layout
    val won = IndexFs.renameNoClobberFallback(f, src, dst,
      beforeRename = () => mkCommit(s"$root/commits/t1"))
    assert(!won) // resolved as a lost race...
    assert(!f.exists(new HPath(s"$root/commits/t1/t1")),
      "loser nested inside the winner's commit")
    // ...with the winner's layout intact
    assert(f.listStatus(dst).map(_.getPath.getName).toSet ==
      Set("bands", "shingles"))
  }

  test("renameNoClobber fallback: clean move when nothing races") {
    val root = tmp("idxfs_clean")
    val f = IndexFs.fs(spark, root)
    touch(s"$root/staged/t1/bands/part-0")
    val src = f.makeQualified(new HPath(s"$root/staged/t1"))
    val dst = f.makeQualified(new HPath(s"$root/commits/t1"))
    f.mkdirs(dst.getParent)
    assert(IndexFs.renameNoClobberFallback(f, src, dst))
    assert(!f.exists(src))
    assert(f.exists(new HPath(s"$root/commits/t1/bands/part-0")))
    // pre-existing dst short-circuits to false without touching it
    touch(s"$root/staged/t1/bands/part-0")
    assert(!IndexFs.renameNoClobberFallback(f, src, dst))
    assert(f.exists(new HPath(s"$root/commits/t1/bands/part-0")))
  }

  test("stagedAppend: a staged dir disturbed mid-write fails LOUDLY, never a half-appended commit") {
    import spark.implicits._
    val dir = tmp("idxfs_half")
    val rel1 = Seq((1L, "a")).toDF("id", "v")
    val rel2 = Seq((2L, "b")).toDF("id", "v")
    // the historical reaper race: the staged dir is deleted after the
    // first relation lands and recreated by the second write — the
    // commit rename would land a batch missing relation "r1"
    val ex = intercept[java.io.IOException] {
      IndexFs.stagedAppend(spark, dir, "t1",
        Seq("r1" -> rel1, "r2" -> rel2),
        beforeCommitRename = () =>
          IndexFs.deleteRecursively(spark, s"$dir/staged/t1/r1"))
    }
    assert(ex.getMessage.contains("r1"))
    // the half-commit was removed and the tag NOT burned: a clean retry lands
    assert(!IndexFs.exists(spark, s"$dir/commits/t1"))
    assert(!IndexFs.isCommitted(spark, dir, "t1"))
    assert(IndexFs.stagedAppend(spark, dir, "t1",
      Seq("r1" -> rel1, "r2" -> rel2)))
    assert(spark.read.parquet(s"$dir/commits/t1/r1").count() == 1)
    assert(spark.read.parquet(s"$dir/commits/t1/r2").count() == 1)
  }

  test("stagedAppend: same-tag double commit yields one winner, one false, no nested dir") {
    import spark.implicits._
    val dir = tmp("idxfs_double")
    val rel = Seq((1L, "a")).toDF("id", "v")
    // the loser stages, then the winner commits inside the loser's
    // write→rename window; the loser's no-clobber rename must yield
    // false and leave the winner's commit exactly as it landed
    val loser = IndexFs.stagedAppend(spark, dir, "t1", Seq("r" -> rel),
      beforeCommitRename = () => {
        val won = IndexFs.stagedAppend(spark, dir + "_w", "t1", Seq("r" -> rel))
        assert(won)
        // move the winner's commit into OUR index (same-tag writer)
        IndexFs.rename(spark, s"${dir}_w/commits/t1", s"$dir/commits/t1")
      })
    assert(!loser)
    assert(!IndexFs.exists(spark, s"$dir/commits/t1/t1"),
      "loser nested inside the winner's commit")
    assert(!IndexFs.exists(spark, s"$dir/staged/t1"), "loser's staging not discarded")
    assert(IndexFs.listDirNames(spark, s"$dir/commits/t1") == Seq("r"))
    assert(spark.read.parquet(s"$dir/commits/t1/r").count() == 1)
  }

  private def withMarkerProtocol[T](body: => T): T = {
    spark.conf.set(IndexFs.CommitProtocolKey, "marker")
    try body finally spark.conf.unset(IndexFs.CommitProtocolKey)
  }

  test("publishRelation marker protocol: versioned dirs, pointer commit, superseded version retired") {
    import spark.implicits._
    withMarkerProtocol {
      val dir = tmp("idxfs_marker") + "/rel"
      IndexFs.publishRelation(Seq((1L, "a")).toDF("id", "v"), dir)
      assert(IndexFs.resolveDir(spark, dir) == s"$dir.v1")
      assert(spark.read.parquet(IndexFs.resolveDir(spark, dir))
        .collect().map(_.getLong(0)).toSeq == Seq(1L))
      // a republish bumps the version, moves the pointer, retires v1 —
      // and at NO point does a resolved dir go missing (the window the
      // rename swap has; the marker protocol's reason to exist)
      IndexFs.publishRelation(Seq((2L, "b")).toDF("id", "v"), dir)
      assert(IndexFs.resolveDir(spark, dir) == s"$dir.v2")
      assert(spark.read.parquet(IndexFs.resolveDir(spark, dir))
        .collect().map(_.getLong(0)).toSeq == Seq(2L))
      assert(!IndexFs.exists(spark, s"$dir.v1"))
      assert(!IndexFs.exists(spark, dir)) // no stale plain dir either
    }
  }

  test("publish retention: deferred retire keeps old versions for readers; vacuumPublished reaps behind the window") {
    import spark.implicits._
    withMarkerProtocol {
      val root = tmp("idxfs_retention")
      val dir = s"$root/rel"
      spark.conf.set(IndexFs.PublishRetentionKey, "3600000")
      try {
        IndexFs.publishRelation(Seq((1L, "a")).toDF("id", "v"), dir)
        // the long-running reader resolves v1…
        val oldResolved = IndexFs.resolveDir(spark, dir)
        val oldReader = spark.read.parquet(oldResolved)
        // …then a republish supersedes it WITHOUT deleting it
        IndexFs.publishRelation(Seq((2L, "b")).toDF("id", "v"), dir)
        assert(IndexFs.resolveDir(spark, dir) == s"$dir.v2")
        assert(IndexFs.exists(spark, s"$dir.v1"),
          "retention must defer the retire")
        assert(oldReader.collect().map(_.getLong(0)).toSeq == Seq(1L))
        // a sibling relation whose name shares the `<name>.v` prefix is
        // never a vacuum candidate
        IndexFs.publishRelation(Seq((9L, "z")).toDF("id", "v"), s"$dir.vectors")
        // the supersession tombstone exists, and the window measures
        // from ITS mtime, not the version dir's write time: age the
        // DIR far past the window — a version that was current for
        // days must not become reapable seconds after supersession
        assert(IndexFs.exists(spark, s"$dir.retired-v1"))
        val old = java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 100L * 3600 * 1000)
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir.v1"))
          .forEach(p => java.nio.file.Files.setLastModifiedTime(p, old))
        assert(IndexFs.vacuumPublished(spark, dir) == 0,
          "window must count from supersession (tombstone), not write mtime")
        assert(IndexFs.exists(spark, s"$dir.v1"))
        // expired window: v1 + its tombstone reaped, current + sibling
        // untouched
        assert(IndexFs.vacuumPublished(spark, dir, Some(0L)) == 1)
        assert(!IndexFs.exists(spark, s"$dir.v1"))
        assert(!IndexFs.exists(spark, s"$dir.retired-v1"))
        assert(spark.read.parquet(IndexFs.resolveDir(spark, dir))
          .collect().map(_.getLong(0)).toSeq == Seq(2L))
        assert(IndexFs.exists(spark, IndexFs.resolveDir(spark, s"$dir.vectors")))
      } finally spark.conf.unset(IndexFs.PublishRetentionKey)
      // with the conf unset the inline retire is back (the default)
      IndexFs.publishRelation(Seq((3L, "c")).toDF("id", "v"), dir)
      assert(!IndexFs.exists(spark, s"$dir.v2"))
    }
  }

  test("stagedAppend marker protocol: the _OK marker IS the commit; crashed appends stay invisible and retry cleanly") {
    import spark.implicits._
    withMarkerProtocol {
      val dir = tmp("idxfs_mkcommit")
      val rel = Seq((1L, "a")).toDF("id", "v")
      // a crash after the relation writes but before the marker:
      // the commit dir exists, but no reader or maintenance pass
      // counts it (the marker-protocol analog of a staged/ orphan)
      rel.write.mode("overwrite").parquet(s"$dir/commits/t1/r")
      assert(IndexFs.landedCommits(spark, dir).isEmpty)
      assert(!IndexFs.isCommitted(spark, dir, "t1"))
      assert(IndexFs.relationDirs(spark, dir, "r", Set.empty).size == 1) // base only
      // the retry overwrites the orphan and lands with the marker
      assert(IndexFs.stagedAppend(spark, dir, "t1", Seq("r" -> rel)))
      assert(IndexFs.exists(spark, s"$dir/commits/t1/_OK"))
      assert(IndexFs.landedCommits(spark, dir) == Seq("t1"))
      assert(IndexFs.isCommitted(spark, dir, "t1"))
      assert(IndexFs.relationDirs(spark, dir, "r", Set.empty).size == 2)
      // replay is a no-op; no staged/ dir ever exists in marker mode
      assert(!IndexFs.stagedAppend(spark, dir, "t1", Seq("r" -> rel)))
      assert(!IndexFs.exists(spark, s"$dir/staged"))
      // same-tag loser: a marker that appears inside the commit window
      // makes the exclusive create fail → false, winner's marker stands
      assert(!IndexFs.stagedAppend(spark, dir + "2", "t1", Seq("r" -> rel),
        beforeCommitRename = () =>
          touch(s"${dir}2/commits/t1/_OK")))
    }
  }

  test("publishRelation adopts a plain pre-marker dir; clearPublished resets for a rebuild") {
    import spark.implicits._
    val dir = tmp("idxfs_adopt") + "/rel"
    // rename protocol first (the default on file://): plain dir
    IndexFs.publishRelation(Seq((1L, "a")).toDF("id", "v"), dir)
    assert(IndexFs.resolveDir(spark, dir) == dir)
    withMarkerProtocol {
      // marker publish over a plain dir: v1 + pointer, plain retired
      IndexFs.publishRelation(Seq((2L, "b")).toDF("id", "v"), dir)
      assert(IndexFs.resolveDir(spark, dir) == s"$dir.v1")
      assert(!IndexFs.exists(spark, dir))
    }
    // a save*-style rebuild clears pointer + versions so its fresh plain
    // dir cannot be shadowed by the stale pointer — and ONLY this
    // relation's: a sibling sharing the name prefix must survive
    withMarkerProtocol {
      IndexFs.publishRelation(Seq((9L, "z")).toDF("id", "v"), s"$dir.vectors")
    }
    IndexFs.clearPublished(spark, dir)
    assert(IndexFs.resolveDir(spark, dir) == dir)
    assert(!IndexFs.exists(spark, s"$dir.v1") &&
      !IndexFs.exists(spark, s"$dir.current"))
    assert(IndexFs.exists(spark,
      IndexFs.resolveDir(spark, s"$dir.vectors")),
      "clearPublished must never touch a sibling relation")
  }

  test("parMapOrdered: overlapped round-trips, input order, original exceptions") {
    // 64 simulated 20 ms metadata round-trips: serial would be ≥1.28 s,
    // a 16-wide pool must land well under half that (generous bound —
    // CI hosts stall; the point is overlap happened at all)
    val t0 = System.nanoTime()
    val got = IndexFs.parMapOrdered(1 to 64) { i => Thread.sleep(20); i * 2 }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(got == (1 to 64).map(_ * 2), "results must come back in input order")
    assert(sec < 0.64, f"expected overlapped execution, took $sec%.2f s")
    // the ORIGINAL exception surfaces, not an ExecutionException wrapper
    val e = intercept[IllegalStateException] {
      IndexFs.parMapOrdered(1 to 8) { i =>
        if (i == 3) throw new IllegalStateException("boom-3") else i
      }
    }
    assert(e.getMessage == "boom-3")
    // degenerate inputs stay on the caller thread
    assert(IndexFs.parMapOrdered(Seq(5))(_ + 1) == Seq(6))
    assert(IndexFs.parMapOrdered(Seq.empty[Int])(_ + 1).isEmpty)
  }

  test("writeSmallFileNoClobber: exactly one writer per target wins; body is complete") {
    val dir = tmp("idxfs_cas")
    val f = IndexFs.fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/commit-v7")
    assert(IndexFs.writeSmallFileNoClobber(spark, f, p, "winner-body"))
    // the loser's attempt reports the loss and never corrupts the body
    assert(!IndexFs.writeSmallFileNoClobber(spark, f, p, "loser-body"))
    assert(IndexFs.readSmallFile(f, p) == "winner-body")
    // no tmp debris left behind by either attempt
    val leftovers = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.contains(".cas-"))
    assert(leftovers.isEmpty, s"tmp debris: ${leftovers.mkString(",")}")
    // a different target is independent
    assert(IndexFs.writeSmallFileNoClobber(spark, f,
      new org.apache.hadoop.fs.Path(s"$dir/commit-v8"), "next"))
  }

  test("newestMtime sees part-file recency two levels deep") {
    val dir = tmp("idxfs_mtime")
    touch(s"$dir/staged/t1/bands/part-0")
    val old = System.currentTimeMillis() - 100L * 3600 * 1000
    // age the dir and the relation dir but NOT the part file — the
    // part-file write is what a live append keeps fresh
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/staged/t1"),
      java.nio.file.attribute.FileTime.fromMillis(old))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/staged/t1/bands"),
      java.nio.file.attribute.FileTime.fromMillis(old))
    val got = IndexFs.newestMtime(spark, s"$dir/staged/t1")
    assert(got > old + 90L * 3600 * 1000, "part-file mtime not surfaced")
    assert(IndexFs.newestMtime(spark, s"$dir/absent") == Long.MinValue)
  }
}
