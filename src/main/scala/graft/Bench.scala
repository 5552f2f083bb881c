package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen compiler, parquet footer reads, shuffle
    // machinery) so the first timed query doesn't absorb JVM spin-up.
    try SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).count())
    catch { case _: Throwable => }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val elapsed = (System.nanoTime() - t0) / 1e9 // capture BEFORE cleanup
      // The dedup queries materialize intermediates via localCheckpoint;
      // those blocks are per-query scratch, not cross-query state. Release
      // them (outside the timed region) so a 42-query session doesn't
      // accumulate block-manager pressure that distorts later timings
      // (observed: same query 8 s fresh vs 40+ s after five
      // checkpointing queries).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
