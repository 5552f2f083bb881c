package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage for co-located joins (SURVEY §8 scale notes).
  *
  * Two fact tables bucketed identically on their join key join WITHOUT a
  * shuffle: each task reads the matching bucket from both sides. At
  * 100 TB this converts the dominant exchange of every fact-fact join
  * into local disk reads — you pay one bucketed write, then every
  * subsequent join of that key is exchange-free (verify via `.explain`:
  * `SortMergeJoin` with no `Exchange` beneath).
  */
object Bucketing {

  /** Writes `df` as a bucketed (and in-bucket sorted) table. Bucket count
    * should match the downstream parallelism target — at cluster scale,
    * a small multiple of total cores. */
  def writeBucketed(
      df: DataFrame, tableName: String, keyCol: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val writer = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
    path.fold(writer)(p => writer.option("path", p)).saveAsTable(tableName)
  }

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
