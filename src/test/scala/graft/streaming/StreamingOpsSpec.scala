package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows
import graft.sources.Scan

class StreamingOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming tumbling counts equal the batch tumbling aggregate") {
    val stream = StreamingOps.readEventsStream(spark, sfDir)
    val streamed = StreamingOps.runAvailableNow(
      StreamingOps.tumblingCounts(stream, "1 hour", "0 seconds"),
      "t_tumbling", OutputMode.Complete())
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = Windows.tumbling(Scan.table(spark, sfDir, "events"), "ts", 3600,
        Seq("event_type"), Seq(count(lit(1)).as("n")))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
  }

  test("streaming sliding counts equal the batch sliding aggregate") {
    val stream = StreamingOps.readEventsStream(spark, sfDir)
    val streamed = StreamingOps.runAvailableNow(
      StreamingOps.slidingCounts(stream, "1 hour", "30 minutes", "0 seconds"),
      "t_sliding", OutputMode.Complete())
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = Windows.sliding(Scan.table(spark, sfDir, "events"), "ts", 3600, 1800,
        Seq("event_type"), Seq(count(lit(1)).as("n")))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
  }

  test("streaming session windows match batch sessionize session counts") {
    val stream = StreamingOps.readEventsStream(spark, sfDir)
    val streamed = StreamingOps.runAvailableNow(
      StreamingOps.sessionAgg(stream, "30 minutes", "0 seconds"),
      "t_sessions", OutputMode.Complete())
    val streamedSessions = streamed.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val batchSessions = Windows.sessionize(
        Scan.table(spark, sfDir, "events"), "ts", "user_id", 1800,
        Seq(count(lit(1)).as("records")))
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(streamedSessions == batchSessions)
    // batch session rows agree with event totals
    val totalEvents = Windows.sessionize(
        Scan.table(spark, sfDir, "events"), "ts", "user_id", 1800,
        Seq(count(lit(1)).as("records")))
      .agg(sum("records")).head.getLong(0)
    assert(totalEvents == Scan.table(spark, sfDir, "events").count())
  }

  test("streaming dedup collapses duplicated input files to distinct events") {
    // stage the events file TWICE — every event arrives duplicated
    val staged = java.nio.file.Files.createTempDirectory("dup_events")
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    Seq("a.parquet", "b.parquet").foreach { n =>
      try java.nio.file.Files.createLink(staged.resolve(n), src)
      catch { case _: Exception => java.nio.file.Files.copy(src, staged.resolve(n)) }
    }
    val stream = spark.readStream
      .schema(StreamingOps.eventsRawSchema)
      .parquet(staged.toString)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    // bounded-state dedup: watermark covers the full 30-day event span,
    // so every duplicate is within the horizon and collapses
    val deduped = StreamingOps.runAvailableNow(
      StreamingOps.dedupEvents(stream, watermark = "31 days"), "t_dedup")
    val batchDistinct = Scan.table(spark, sfDir, "events").count()
    assert(deduped.count() == batchDistinct) // 2N in, N out
  }

  test("foreachBatch snapshots each micro-batch to parquet and ledgers it") {
    val out = java.nio.file.Files.createTempDirectory("snap").toString
    val ledger = s"$out/runs.jsonl"
    val q = StreamingOps.snapshotEachBatch(
      StreamingOps.readEventsStream(spark, sfDir), out, ledger)
    q.awaitTermination()
    val entries = graft.meta.RunLedger.read(ledger)
    assert(entries.nonEmpty)
    val snapshotRows = entries.map { e =>
      val org.json4s.JString(path) = (e \ "path"): @unchecked
      spark.read.parquet(path).count()
    }.sum
    assert(snapshotRows == Scan.table(spark, sfDir, "events").count())
  }

  test("mapGroupsWithState running totals equal a batch groupBy") {
    val stream = StreamingOps.readEventsStream(spark, sfDir)
    val streamed = StreamingOps.runAvailableNow(
      StreamingOps.runningUserTotals(stream).toDF("user_id", "n", "total"),
      "t_state", OutputMode.Update())
    // final state per user (last update wins)
    val finalState = streamed.groupBy("user_id")
      .agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val batch = Scan.table(spark, sfDir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalState == batch)
  }
}
