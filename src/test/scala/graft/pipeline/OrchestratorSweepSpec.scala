package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.meta.RunLedger
import graft.spec.SpecRegistry

/** The full registry sweep the reference runs object-by-object from its
  * flow entry point (`flows/sf_etl_orchestrator_flow.py:85-250` over
  * `OBJECT_SPECS`): every one of the 23 specs drives the complete DAG —
  * extract (through the DSv2 connector with the reference's default
  * LIMIT 100 pushed) → process/load → parallel QA → ledger. Complements
  * the oracled `q_orchestrator_e2e` (one spec, hash-checked against
  * DuckDB) with breadth: no spec in the registry can silently stop
  * compiling or running end-to-end. */
class OrchestratorSweepSpec extends SparkSpec {

  test("all 23 registry specs run the full DAG over the simulated org") {
    val base = Files.createTempDirectory("orch_sweep").toString
    SpecRegistry.specs.keys.foreach { name =>
      val source = spark.read.format("graft.sources.v2.SalesforceSimSource")
        .option("object", name).option("rows", "120").load()
      val report = Orchestrator.run(spark, name, source, base,
        Orchestrator.RunOptions(limit = Some(100), timestampRaw = false,
          extractRetryDelayMs = 0, processRetryDelayMs = 0))
      Seq("extract", "process", "load_json", "dedup", "profile",
          "snapshot_parquet", "drift").foreach { task =>
        assert(report.taskStates.get(task).contains("COMPLETED"), s"$name/$task")
      }
      assert(report.rawRows == 100, s"$name: LIMIT 100 not applied at extract")
      assert(report.processedRows > 0, name)
      // the ledger count comes from the JSON artifact on disk (Q6)
      assert(report.jsonRecords == report.processedRows, name)
    }
    assert(RunLedger.read(s"$base/meta/runs.jsonl").size == SpecRegistry.specs.size)
  }
}
