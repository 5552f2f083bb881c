package graft

import org.apache.spark.sql.functions._

/** The scratch-strategy seam: every composed operator pins
  * intermediates through [[GraftSession.pin]], so flipping
  * `spark.graft.scratchDir` moves the whole engine from
  * localCheckpoint (local-fast) to parquet scratch (cluster-durable,
  * survives executor loss) — results must be identical both ways. */
class GraftSessionSpec extends SparkSpec {

  private def withScratchDir[T](body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scratch").toString
    spark.conf.set(GraftSession.ScratchDirKey, dir)
    try body finally spark.conf.unset(GraftSession.ScratchDirKey)
  }

  test("pin: parquet strategy round-trips rows and cuts lineage to a scan") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val local = GraftSession.pin(df) // default: localCheckpoint
    assert(local.collect().toSet == df.collect().toSet)
    withScratchDir {
      val pinned = GraftSession.pin(df)
      assert(pinned.collect().toSet == df.collect().toSet)
      // the pinned frame is a genuine parquet scan (durable, re-readable
      // by any executor), not a persisted-RDD view
      assert(pinned.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]))
    }
  }

  test("releasingScratch reclaims parquet pins created in its scope (the crawl-loop leak)") {
    import spark.implicits._
    val df = (1L to 10L).toDF("id")
    withScratchDir {
      val root = spark.conf.get(GraftSession.ScratchDirKey)
      def pinDirs() = java.nio.file.Files.list(java.nio.file.Paths.get(root))
        .filter(_.getFileName.toString.startsWith("pin-")).count()
      // a pin OUTSIDE any scope stays (caller-managed)
      val outside = GraftSession.pin(df)
      assert(pinDirs() == 1)
      // pins INSIDE the scope are reclaimed once the scope ends; the
      // pre-existing one is untouched and stays readable
      GraftSession.releasingScratch(spark) {
        assert(GraftSession.pin(df).count() == 10)
        assert(GraftSession.pin(df).count() == 10)
        assert(pinDirs() == 3)
      }
      assert(pinDirs() == 1)
      assert(outside.count() == 10)
    }
  }

  test("composed flow (curate → dedup-against-index → append → pack) is strategy-invariant") {
    // the REAL capstone flow on the real corpus — the same spelling
    // q_training_data_e2e gates — run under both scratch strategies
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(): Set[org.apache.spark.sql.Row] = {
      val idx = java.nio.file.Files.createTempDirectory("scratch_idx").toString
      graft.queries.TrainingDataQueries.ingestFlow(docs, idx)
        .collect().toSet
    }
    val viaLocal = run()
    val viaParquet = withScratchDir(run())
    assert(viaLocal.nonEmpty)
    assert(viaParquet == viaLocal)
  }

  test("partitionsForPlan schedules NO job, even for aggregate-shaped plans under AQE") {
    import spark.implicits._
    // an exchange-bearing plan: the old Dataset.rdd spelling would
    // force AQE's getFinalPhysicalPlan() and EXECUTE the shuffle here
    val agg = (1L to 10000L).toDF("id")
      .groupBy(col("id") % 7).agg(count(lit(1)).as("n"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val p = GraftSession.partitionsForPlan(agg.toDF())
      Thread.sleep(500) // listener bus is async; job-start events land fast
      val cores = spark.sparkContext.defaultParallelism
      assert(p >= cores && p <= 6 * cores)
      assert(jobs.get() == 0, s"partitionsForPlan ran ${jobs.get()} job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
