package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Plan inspector: prints `explain("formatted")` for the named queries
  * (or all). Usage: `runMain graft.tools.Explain <sfDir> [name ...]`.
  * The review loop for the scale posture: check that filters/projections
  * reach the parquet scan (`PushedFilters`, `ReadSchema`), small dims
  * broadcast (`BroadcastHashJoin`), and hot paths sit inside
  * `WholeStageCodegen` spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
