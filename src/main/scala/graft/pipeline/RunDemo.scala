package graft.pipeline

import scala.collection.immutable.ListMap

import graft.GraftSession
import graft.sources.Scan
import graft.spec.ObjectSpec

/** One-command end-to-end pipeline demo:
  * `runMain graft.pipeline.RunDemo [sfDir] [outDir]`.
  *
  * Runs the full orchestrated DAG (extract → process/load + parallel QA →
  * ledger) for three reference-shaped objects mapped onto the testdata
  * (FIXTURES.md §"Mapping A→B"), twice — the second pass exercises the
  * cross-run drift state and ledger dedupe — then prints each run report.
  */
object RunDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val mapped = Seq(
      ("Opportunity", "orders", ObjectSpec("Opportunity",
        Seq("o_orderkey", "o_orderstatus", "o_totalprice"), Seq("o_orderkey", "o_orderstatus"),
        Seq("o_orderstatus"), ListMap("o_totalprice" -> Seq("sum", "mean", "count")))),
      ("Account", "customer", ObjectSpec("Account",
        Seq("c_custkey", "c_name", "c_mktsegment", "c_acctbal"), Seq("c_custkey", "c_name"),
        Seq("c_mktsegment"), ListMap("c_acctbal" -> Seq("sum", "mean", "count")))),
      ("Lead", "lineitem", ObjectSpec("Lead",
        Seq("l_orderkey", "l_returnflag", "l_linestatus"), Seq("l_orderkey"),
        Seq("l_returnflag", "l_linestatus"), ListMap("l_orderkey" -> Seq("count")))))

    (1 to 2).foreach { pass =>
      println(s"\n===== pass $pass =====")
      mapped.foreach { case (objectName, table, spec) =>
        val report = Orchestrator.run(
          spark, objectName, Scan.table(spark, sfDir, table), outDir,
          Orchestrator.RunOptions(limit = None, timestampRaw = true,
            dedupKey = spec.requiredCols.head),
          specOverride = Some(spec))
        println(f"$objectName%-12s raw=${report.rawRows}%6d processed=${report.processedRows}%4d " +
          f"json=${report.jsonRecords}%4d drift=${report.driftAlert.getOrElse("-")} " +
          f"states=${report.taskStates.toSeq.sorted.map { case (k, v) => s"$k:$v" }.mkString(",")} " +
          f"${report.durationSeconds}%.1fs")
      }
    }
    println(s"\nartifacts under: $outDir (ledger: $outDir/meta/runs.jsonl)")
    spark.stop()
  }
}
