package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{QualityClassifier, Sharding}

/** Micro-probe for the QC fit/score pipeline pieces. */
object QcPartsProbe {
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
    val labeled = docs.filter(col("doc_id") < 300)
      .withColumn("y",
        (graft.functions.TextAnalysis.stopwordHits(col("text"), "en") >= 2)
          .cast("double"))

    def time(tag: String, df: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    val ts = filter(split(col("text"), GraftFunctions.WsRun), t => t =!= "")
    val bs = transform(ts, t =>
      pmod(Sharding.orderHash(t, "qc"), lit(128L)).cast("int"))
    val n = greatest(size(ts), lit(1)).cast("double")
    val counts = GraftFunctions.array_bincount(bs, 128)

    time("labels_only", labeled.select(col("y")))
    time("toks_only", labeled.select(size(ts).as("z")))
    time("buckets_md5", labeled.select(size(bs).as("z")))
    time("bincount", labeled.select(size(counts).as("z")))
    time("xvec", labeled.select(
      size(transform(counts, c => c / n)).as("z")))
    val m = QualityClassifier.Model(Array.fill(128)(0.1), 0.0, "qc")
    time("score5000", QualityClassifier.score(docs, "text", m)
      .select(col("p_good")))
    spark.stop()
  }
}
