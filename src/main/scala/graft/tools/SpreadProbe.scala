package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sharding
import graft.functions.GraftFunctions.word_ngrams

/** Micro-probe for the spread-small-input regression: times the DSIR
  * LM-fit shape (explode unigram+bigram → md5 bucket → count) over the
  * raw 1-split scan vs a repartition(cores) spread, and prints both
  * plans. */
object SpreadProbe {
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

    def fit(df: DataFrame): DataFrame =
      df.select(explode(concat(word_ngrams(col("text"), 1),
          word_ngrams(col("text"), 2))).as("__f"))
        .select(pmod(Sharding.orderHash(col("__f"), "dsir"),
          lit(1024L)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

    def time(tag: String, df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("plain-1split", fit(docs))
    time("repartition32", fit(docs.repartition(32)))
    time("repartition4", fit(docs.repartition(4)))
    println("---- plain plan ----")
    fit(docs).explain("formatted")
    println("---- spread plan ----")
    fit(docs.repartition(32)).explain("formatted")
    spark.stop()
  }
}
