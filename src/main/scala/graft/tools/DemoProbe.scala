package graft.tools

import scala.collection.immutable.ListMap

import graft.GraftSession
import graft.pipeline.Orchestrator
import graft.sources.Scan
import graft.spec.ObjectSpec

object DemoProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val spec = ObjectSpec("Opportunity",
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"), Seq("o_orderkey", "o_orderstatus"),
      Seq("o_orderstatus"), ListMap("o_totalprice" -> Seq("sum", "mean", "count")))
    val out = java.nio.file.Files.createTempDirectory("demo_probe").toString
    for ((eDelay, pDelay, label) <- Seq(
        (0L, 0L, "delays=0"), (10000L, 5000L, "delays=ref"))) {
      val t0 = System.nanoTime()
      Orchestrator.run(spark, "Opportunity",
        Scan.table(spark, "/root/testdata/sf0.001", "orders"), out,
        Orchestrator.RunOptions(limit = None, timestampRaw = true,
          dedupKey = spec.requiredCols.head,
          extractRetryDelayMs = eDelay, processRetryDelayMs = pDelay),
        specOverride = Some(spec))
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
