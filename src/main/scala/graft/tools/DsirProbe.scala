package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Throwaway diagnostic for the dsir_resample ScaleBench row: times the
  * scoring aggregate, the skinny sample, and the full resample over the
  * ScaleBench 100× fixture, and prints the resample's executed plan. */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100")
    val docs = spark.read.parquet(s"$dir/documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val target = docs.filter(col("doc_id") % 10 === 0)

    time("score.count") {
      graft.operators.Dsir.importanceLogRatio(
        docs, "doc_id", "text", target, "text", docs, "text").count()
    }
    time("skinny sample.count") {
      graft.operators.Sampling.weightedSampleByHash(
        graft.operators.Dsir.importanceLogRatio(
          docs, "doc_id", "text", target, "text", docs, "text")
          .select(col("doc_id"), col("log_ratio"))
          .withColumn("__w", exp(col("log_ratio"))),
        "doc_id", "__w", 1000).count()
    }
    val res = graft.operators.Dsir.resampleByImportance(
      docs, "doc_id", "text", target, "text", docs, "text", k = 1000)
    time("resample.count") { res.count() }
    time("resample.count (2nd)") { res.count() }
    println(res.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
