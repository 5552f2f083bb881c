package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.TextDedup
import graft.sources.Scan

/** Dev tool: measure MinHash-LSH bucket-size distribution and the
  * recall/runtime trade of `maxBucketSize` on a given testdata dir.
  * Usage: runMain graft.tools.LshTune /root/testdata/sf0.01
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("lsh-tune").getOrCreate())
    val docs = Scan.table(spark, dir, "documents")

    // bucket-size distribution of the banding as shipped (k=32, bands=8)
    val sh = TextDedup.withShingles(docs, "doc_id", "text", 3)
      .filter(size(col("shingles")) > 0)
    val sigs = TextDedup.withMinhashSignature(sh, 32)
    val banded = TextDedup.withBands(sigs, "doc_id", bands = 8, r = 4)
    val dist = banded.groupBy("band", "bh").agg(count(lit(1)).as("sz"))
      .groupBy().agg(count(lit(1)).as("n_buckets"), max("sz").as("max_sz"),
        expr("percentile(sz, array(0.5, 0.9, 0.99))").as("pctl"),
        sum(expr("sz*(sz-1)/2")).as("cand_pairs"))
    println("BUCKETS: " + dist.collect().mkString)

    val t0e = System.nanoTime()
    val exact = TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"EXACT pairs=${exact.size} time=${(System.nanoTime() - t0e) / 1e9}%.1fs")

    for (cap <- Seq(400, 200, 100, 50, 20, 10)) {
      val t0 = System.nanoTime()
      val got = TextDedup.minhashLsh(docs, "doc_id", "text", 3, 32, 8, 0.7, cap)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"cap=$cap%6d pairs=${got.size}%4d missed=${(exact -- got).size}%4d extra=${(got -- exact).size}%4d time=$dt%.1fs")
    }
    spark.stop()
  }
}

/** Dev tool: recall of the multi-table SRP-LSH embedding near-dup vs the
  * exact pairwise join. Usage: runMain graft.tools.EmbLshTune <sfDir>
  */
object EmbLshTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("emb-tune").getOrCreate())
    val emb = Scan.table(spark, dir, "embeddings")
    val exact = TextDedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"EXACT pairs=${exact.size}")
    for ((bits, tables) <- Seq((4, 16), (4, 24), (4, 32), (3, 16), (5, 32))) {
      val t0 = System.nanoTime()
      val got = TextDedup.embeddingNearDupPairsLsh(emb, "vec_id", "embedding",
          0.5, bits, tables)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"bits=$bits tables=$tables%3d pairs=${got.size}%3d missed=${(exact -- got).size}%3d time=$dt%.1fs")
    }
    spark.stop()
  }
}
