package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints optimizedPlan.stats.sizeInBytes for representative plan
  * shapes, to sanity-check the spread-small threshold. */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Scan.table(spark, sfDir, "documents")
    def stat(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.optimizedPlan
      val leaves = plan.collectLeaves().map(_.stats.sizeInBytes)
      println(s"STATS $tag = ${plan.stats.sizeInBytes} leaves=${leaves.mkString("+")}")
    }
    stat("scan", docs)
    stat("proj", docs.select(col("doc_id"), concat(col("text"), lit("x")).as("t")))
    val deduped = graft.operators.UrlCuration.dedupByUrl(
      docs.select(col("doc_id"), col("text"),
        concat(lit("http://h"), col("doc_id") % 10, lit("/p/"),
          col("doc_id") % 250).as("url")), "doc_id", "url")
    stat("dedupByUrl", deduped)
    stat("domainCap", graft.operators.UrlCuration.domainCap(
      deduped, "doc_id", "url", cap = 20))

    // timing: the URL-screen chain with and without a top spread
    def screen(src: org.apache.spark.sql.DataFrame) = {
      val withUrl = src.select(col("doc_id"), col("text"),
        concat(lit("http://Site"), col("doc_id") % 10,
          lit(".Example.COM/Page/"), col("doc_id") % 250).as("url"))
      graft.operators.UrlCuration.domainCap(
        graft.operators.UrlCuration.dedupByUrl(withUrl, "doc_id", "url"),
        "doc_id", "url", cap = 20)
    }
    def time(tag: String, df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    time("screens_plain", screen(docs))
    time("screens_spread", screen(docs.repartition(32)))
    println("---- spread screens plan ----")
    screen(docs.repartition(32)).explain("formatted")
    spark.stop()
  }
}
