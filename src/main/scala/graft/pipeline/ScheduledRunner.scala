package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixed-interval micro-batch scheduling — the reference's cron
  * deployment (`deployments/serve_15min.py:5-14`, every-15-minutes cron)
  * re-expressed as a bounded in-process loop. In production the loop is
  * owned by an external scheduler (the north-star architecture keeps
  * Prefect as the orchestration layer driving this Spark job); this
  * runner exists so the cadence semantics — run, sleep the REMAINDER of
  * the interval, repeat, with cross-run drift state accumulating — are
  * executable and testable in-process. The streaming-native form is
  * `graft.streaming.StreamingOps` with `Trigger.AvailableNow`.
  */
object ScheduledRunner {

  final case class ScheduleReport(runs: Seq[Orchestrator.RunReport])

  /** Runs the pipeline every `intervalMs` for `iterations` rounds
    * (`run_multiple_times.py` generalized: its 3× back-to-back ritual is
    * `intervalMs = 0, iterations = 3`). A run longer than the interval
    * starts the next one immediately — cron catch-up semantics. */
  def runEvery(
      spark: SparkSession,
      objectName: String,
      source: () => DataFrame,
      baseDir: String,
      intervalMs: Long,
      iterations: Int,
      opts: Orchestrator.RunOptions = Orchestrator.RunOptions(),
      specOverride: Option[graft.spec.ObjectSpec] = None): ScheduleReport = {
    val reports = (1 to iterations).map { i =>
      val t0 = System.currentTimeMillis()
      val report = Orchestrator.run(spark, objectName, source(), baseDir, opts, specOverride)
      val elapsed = System.currentTimeMillis() - t0
      if (i < iterations && intervalMs > elapsed)
        Thread.sleep(intervalMs - elapsed)
      report
    }
    ScheduleReport(reports)
  }
}
