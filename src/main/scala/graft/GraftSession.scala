package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's required settings.
  *
  * - `spark.sql.ansi.enabled=false`: the reference's casts are tolerant —
  *   failures become nulls (`tasks/process.py:22`, `tasks/extract.py:95`);
  *   Spark 4 defaults ANSI on, which would turn them into errors.
  * - `spark.sql.session.timeZone=UTC`: timestamp↔epoch arithmetic parity
  *   with the (naive-UTC) parquet testdata and the DuckDB oracle.
  * - AQE on: runtime coalescing of shuffle partitions + skew-join
  *   splitting — the knobs that keep the same plans healthy at 100 TB.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", math.max(cores, 1)).getOrCreate()

  /** Shuffle-partition count that tracks input size — SCALE.md knob #2
    * (the measured 100× fix: per-task shuffle/agg state stays
    * heap-bounded only when partitions grow with rows; fixed-width
    * shuffles OOM'd the candidate-distinct at 100×). One partition per
    * `rowsPerPartition` input rows, floored at `cores` (full parallelism
    * on small inputs) and capped at 6 tasks/core — measured: past ~6
    * tasks/core single-JVM scheduling overhead dominates (11.7 s →
    * 55.8 s for the same sweep at 800 partitions). On a real cluster
    * `cores` is the executor-core total, so the cap scales with the
    * fleet. Operators consume this via their `numPartitions` default —
    * explicit repartition-by-key nodes, so the width binds in the plan
    * (a session-conf set inside a lazily-evaluated operator would not). */
  def partitionsFor(nRows: Long, cores: Int,
      rowsPerPartition: Long = 2500L): Int = {
    val c = math.max(1, cores).toLong
    val rpp = math.max(1L, rowsPerPartition)
    def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
    // r22 (the 8-core-beats-32-core fix): sub-core-scale relations no
    // longer saturate at `cores` — a few-hundred-row input paid a
    // cores-wide exchange whose per-task fixed cost (~100 ms on these
    // large plans) dwarfed the work, and the 8-core driver bench BEAT
    // 32-core on exactly those queries. Width now also tracks the
    // input below the cores floor (≥64 rows per task — tasks smaller
    // than that are pure overhead), so it still GROWS with rows:
    // identical to the old value for any input ≥ 64·cores rows, and
    // the 6×cores cap + rows-per-partition bound (per-task state stays
    // heap-bounded) are unchanged.
    val byRows = nRows / rpp
    math.max(math.min(c, ceilDiv(nRows, 64L)),
      math.min(6L * c, byRows)).max(1L).toInt
  }

  /** [[partitionsFor]] with cores from the session. */
  def partitionsFor(spark: SparkSession, nRows: Long): Int =
    partitionsFor(nRows, spark.sparkContext.defaultParallelism)

  /** Shuffle width from the PLAN, not the data: the optimizer's size
    * estimate divided by `spark.sql.files.maxPartitionBytes` (the same
    * split arithmetic the file scan uses), clamped to the [cores,
    * 6×cores] band of [[partitionsFor]]. Reads ONLY
    * `optimizedPlan.stats` — logical statistics come from the file
    * index (scan-shaped inputs) or size propagation (computed
    * projections) and NEVER schedule a job. The earlier `.rdd
    * .getNumPartitions` spelling was job-free only for scan-shaped
    * plans: with AQE on (this session's default) `Dataset.rdd` forces
    * `getFinalPhysicalPlan()`, EXECUTING every upstream exchange as a
    * real job that the subsequent repartitionByRange pass then re-ran
    * — double execution for join/aggregate-shaped inputs to Packing /
    * Ranking / Sampling. The estimate is coarse for computed plans
    * (propagated sizes over-count pruned columns), but the band clamp
    * makes precision irrelevant: any estimate lands within 6× of
    * cores, which is the whole decision space. */
  def partitionsForPlan(df: org.apache.spark.sql.DataFrame): Int = {
    val spark = df.sparkSession
    val cores = math.max(1, spark.sparkContext.defaultParallelism)
    val maxPart = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    val byBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes / maxPart
    byBytes.min(BigInt(6L * cores)).max(BigInt(cores)).toInt
  }

  /** Round-robin-spread a SMALL input before an expensive map stage
    * (explode + per-feature hashing, heavyweight regex/BPE projections)
    * — guide §2.5's "input skew: one unsplittable file → repartition
    * immediately after the read". A scan of a file smaller than
    * `cores × maxPartitionBytes` yields fewer splits than cores, so an
    * explode- or regex-amplified map stage runs on a handful of tasks
    * (measured: the DSIR LM fit and the QC scoring pass each ran as ONE
    * task over the single-split documents scan — seconds of serial
    * compute with 31 idle cores). Spreading costs one exchange of the
    * SMALL input, bounded by the same threshold that triggers it.
    *
    * No-op when the input already fills every core's scan split (at
    * scale the scan is parallel by itself; round-robin repartitioning
    * a 100 TB corpus would be the bug, not the fix). The decision sums
    * the LEAF scans' `stats.sizeInBytes` — never schedules a job (the
    * [[partitionsForPlan]] posture) — because whole-plan estimates
    * multiply through joins/windows (a 600 KB scan behind the URL
    * screens reports 10²⁰ bytes) and would silently disable the
    * spread exactly where it matters. Caveat: a genuinely exploding
    * join above small leaves would be spread too — the exchange then
    * costs one extra pass over data the downstream map stage must walk
    * anyway, bounded by the same work it parallelizes. Result-safe for
    * the keyed aggregates/joins downstream of every call site:
    * round-robin placement changes which task holds a row, never the
    * row set. */
  def spreadSmallInput(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cores = math.max(1, spark.sparkContext.defaultParallelism)
    val maxPart = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    val leafBytes = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    // width = cores, deliberately (r22 re-measured): narrowing to 8
    // helped the giant-plan crawl stages a little but REGRESSED the
    // compute-dense DSIR fit 1.6× (its per-row explode+md5 work
    // dominates per-task overhead) — the r21 full-width spread stays.
    if (leafBytes < BigInt(maxPart) * cores) df.repartition(cores)
    else df
  }

  /** Run two INDEPENDENT driver-side legs concurrently (guide §2.6:
    * actions are only sequential because the driver calls them
    * sequentially) — the buildIvfPq thread-pool pattern as a reusable
    * seam for paired writes/fits whose inputs share no data
    * dependency. Each leg's jobs back-fill executors idled by the
    * other's driver latency; job descriptions are thread-local, so
    * callers label inside the legs. Exceptions propagate (first leg's
    * first). */
  def inParallel[A, B](a: => A, b: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val fa = scala.concurrent.Future(a)
      val fb = scala.concurrent.Future(b)
      val ra = scala.concurrent.Await.result(
        fa, scala.concurrent.duration.Duration(3600, "s"))
      val rb = scala.concurrent.Await.result(
        fb, scala.concurrent.duration.Duration(3600, "s"))
      (ra, rb)
    } finally pool.shutdown()
  }

  /** Conf key selecting the scratch strategy for [[pin]]: unset (the
    * default) pins with `localCheckpoint(eager = true)` — executor
    * block storage, the fastest choice in local mode and on healthy
    * clusters; set to a directory URI, pins round-trip through parquet
    * under it — CLUSTER-DURABLE scratch that survives executor loss,
    * the right choice for long multi-stage jobs on preemptible fleets
    * (a lost executor invalidates localCheckpoint blocks and kills the
    * job, because truncated lineage cannot recompute). The caller owns
    * the directory's lifecycle (point it at job-temp storage). */
  val ScratchDirKey = "spark.graft.scratchDir"

  /** Materialize an intermediate that is consumed more than once (or
    * must be frozen before its inputs mutate — the dedup operators'
    * signature pinning), cutting lineage either way. THE single scratch
    * seam: every composed operator pins through here, so switching
    * [[ScratchDirKey]] moves the whole engine between local-fast and
    * cluster-durable scratch with no operator changes — spec-proven
    * equivalent (GraftSessionSpec).
    *
    * Contract: pin preserves VALUES, not physical structure — the
    * parquet strategy reassembles partitions by file-size bin-packing
    * and keeps no ordering. An operator whose later passes read the
    * materialized frame's partition index or within-partition order
    * (e.g. [[graft.operators.Packing]]'s prefix sum) must materialize
    * with `localCheckpoint` itself, not through this seam. */
  def pin(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ScratchDirKey) match {
      case Some(root) =>
        val path = s"$root/pin-${java.util.UUID.randomUUID().toString}"
        df.write.mode("overwrite").parquet(path)
        parquetPins.add(path)
        df.sparkSession.read.parquet(path)
      case None => df.localCheckpoint(true)
    }

  /** Parquet pins created and not yet reclaimed — the bookkeeping that
    * lets [[releasingScratch]] treat parquet scratch exactly like the
    * localCheckpoint blocks it already releases. Without it every pin
    * under [[ScratchDirKey]] leaked a full intermediate copy until the
    * job ended (the 15-minute crawl loop would leak one batch-sized dir
    * set per trigger, forever). */
  private val parquetPins = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** `.pinScratch()` — the postfix spelling of [[pin]], so call sites
    * read like the `.localCheckpoint(true)` chains they replace. */
  implicit final class Pinnable(private val df: DataFrame) extends AnyVal {
    def pinScratch(): DataFrame = pin(df)
  }

  /** Runs `body`, then releases every RDD persisted DURING it (the
    * localCheckpoint scratch the dedup/similarity operators materialize).
    * Scoped by snapshot-diff: pre-existing persisted state is untouched,
    * so callers keeping genuine cross-query caches are safe. Release runs
    * in a finally — a failed query must not leak its scratch blocks into
    * the sessions that follow (the round-1 block-pressure failure mode).
    * Shared by Bench / Verify / ScaleBench; TextDedup's per-round
    * checkpointTracked/release is the finer-grained sibling. */
  def releasingScratch[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val pre = sc.getPersistentRDDs.keySet.toSet
    val prePins = new java.util.HashSet(parquetPins)
    try body
    finally {
      (sc.getPersistentRDDs.keySet.toSet -- pre)
        .foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      // parquet pins created DURING the body: every consumer is done,
      // reclaim the files (the parquet twin of the unpersist above)
      parquetPins.iterator().asScala.filterNot(prePins.contains).toList
        .foreach { p =>
          parquetPins.remove(p)
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(sc.hadoopConfiguration).delete(hp, true)
        }
    }
  }

  /** The deliberate scratch release above logs a "lineage truncated,
    * cannot be recomputed" WARN per localCheckpoint block — noise when
    * the release is by design (every consumer is done). Silences exactly
    * that logger; call once per CLI main. */
  def silenceCheckpointReleaseWarns(): Unit = {
    org.apache.logging.log4j.core.config.Configurator
      .setLevel("org.apache.spark.rdd.MapPartitionsRDD",
        org.apache.logging.log4j.Level.ERROR)
    // FileStreamSink.hasMetadata probes every batch-read GLOB path as a
    // literal file and logs the FileNotFoundException it catches — a
    // WARN whose message is byte-identical to a REAL empty-glob read
    // failure ("File <dir>/batch_* does not exist"). That red herring
    // is the r20 adjudication of the r19 "stream produced zero batches"
    // flake: the message appears deterministically on EVERY healthy
    // run's log (3× per bench query), while 318 instrumented
    // same-session reruns produced zero actual failures. Silence the
    // probe's logger so a log-tail reader can never again mistake the
    // benign analysis-time probe for a query failure — a REAL zero-
    // batch stream now fails loudly in
    // [[graft.streaming.StreamingOps.readBatchOutputs]] instead.
    org.apache.logging.log4j.core.config.Configurator
      .setLevel(
        "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
        org.apache.logging.log4j.Level.ERROR)
  }

  /** Applies the engine-required SQL confs to an externally-built session
    * (used by Verify/Bench whose session shape is driver-imposed). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Parquet TIMESTAMP(NANOS) (events.ts) has no Spark type; read the
    // raw nanos as long — Scan.table converts to a microsecond timestamp,
    // matching DuckDB's nanos→micros truncation.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
