package graft.tools

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.pipeline.Orchestrator
import graft.sources.Scan
import graft.spec.ObjectSpec

/** Dev tool: per-task timing of the e2e orchestrator run at a given SF. */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("e2e-probe").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val spec = ObjectSpec("Opportunity",
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"),
      Seq("o_orderkey", "o_orderstatus"), Seq("o_orderstatus"),
      ListMap("o_totalprice" -> Seq("sum", "mean", "count")))
    (1 to 2).foreach { p =>
      val baseDir = java.nio.file.Files.createTempDirectory("e2e_probe")
      val t0 = System.nanoTime()
      val report = Orchestrator.run(spark, "Opportunity", Scan.table(spark, dir, "orders"),
        baseDir.toString, Orchestrator.RunOptions(limit = None, timestampRaw = false,
          dedupKey = "o_orderkey", extractRetryDelayMs = 0, processRetryDelayMs = 0),
        specOverride = Some(spec))
      println(f"pass $p total ${(System.nanoTime() - t0) / 1e9}%.1fs states=${report.taskStates}")
      // don't leave ~100 MB of orchestrator artifacts per pass in /tmp
      import java.nio.file.{Files => F}
      import scala.jdk.CollectionConverters._
      F.walk(baseDir).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists)
    }
    spark.stop()
  }
}
