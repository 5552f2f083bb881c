package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Per-query wall-clock probe: times the named `SparkEntry.queries`
  * entries with the same materialize-then-release protocol as the
  * bench, without running the whole 70+-query sweep. The inner loop of
  * a performance investigation: `runMain graft.tools.TimeProbe
  * <sfDir> <runs> name [name ...]`.
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.silenceCheckpointReleaseWarns()
    // warm codegen/shuffle machinery like Bench does
    try SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).count())
    catch { case _: Throwable => }
    // ... and spark.ml (first-fit class-load — see Bench.warmSparkMl)
    try graft.Bench.warmSparkMl(spark) catch { case _: Throwable => }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        GraftSession.releasingScratch(spark) { fn(spark, sfDir).count(); () }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEPROBE $name%-40s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
