package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.TextDedup
import graft.sources.Scan

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("probe").getOrCreate())
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val docs = Scan.table(spark, dir, "documents")
    (1 to 2).foreach { pass_ =>
    println(s"--- pass $pass_ ---")
    val signable = TextDedup.withShingles(docs, "doc_id", "text", 3)
      .filter(size(col("shingles")) > 0)
    tm("shingles count")(signable.count())
    val sigs = tm("sig checkpoint")(
      TextDedup.withMinhashSignature(signable, 32).localCheckpoint(true))
    val banded = TextDedup.withBands(sigs, "doc_id", bands = 8, r = 4)
    tm("banded count")(banded.count())
    val bucketed = TextDedup.capBuckets(banded, 100)
    val cand = bucketed.select(col("doc_id").as("d1"), col("band"), col("bh"))
      .join(bucketed.select(col("doc_id").as("d2"), col("band"), col("bh")), Seq("band", "bh"))
      .filter(col("d1") < col("d2")).select("d1", "d2").distinct()
    tm("candidates count")(cand.count())
    val sets = sigs.select(col("doc_id"), col("shingles"))
    val verified = cand
      .join(sets.select(col("doc_id").as("d1"), col("shingles").as("sh1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("shingles").as("sh2")), Seq("d2"))
      .withColumn("j", graft.functions.GraftFunctions.jaccard(col("sh1"), col("sh2")))
      .filter(col("j") >= 0.7)
    tm("verify count")(verified.count())
    tm("FULL operator")(TextDedup.minhashLsh(docs, "doc_id", "text", 3, 32, 8, 0.7, 100).count())
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
