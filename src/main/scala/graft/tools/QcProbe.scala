package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Throwaway diagnostic: decompose q_quality_classifier's cost into
  * feature build, L-BFGS fit, model dump and corpus scoring. */
object QcProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.Bench.warmSparkMl(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.sources.Scan.table(spark, dir, "documents")
    val labeled = docs.filter(col("doc_id") < 300)
      .withColumn("y",
        (graft.functions.TextAnalysis.stopwordHits(col("text"), "en") >= 2)
          .cast("double"))
    time("labeled.count")(labeled.count())
    val m = time("fit(35)")(
      graft.operators.QualityClassifier.fit(labeled, "text", "y", buckets = 128))
    val m2 = time("fit(10)")(
      graft.operators.QualityClassifier.fit(labeled, "text", "y",
        buckets = 128, maxIter = 10))
    time("modelRelation.write")(
      graft.operators.QualityClassifier.modelRelation(spark, m)
        .coalesce(1).write.mode("overwrite")
        .parquet("/tmp/qc_probe_model"))
    time("score.count")(
      graft.operators.QualityClassifier.score(docs, "text", m).count())
    time("score+round+sort.count")(
      graft.operators.QualityClassifier.score(docs, "text", m2)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.roundPortable(col("p_good"), 6)
            .as("p_good"))
        .orderBy(col("doc_id")).count())
    spark.stop()
  }
}
