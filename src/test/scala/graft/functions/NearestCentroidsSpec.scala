package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions._

class NearestCentroidsSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8
  private def vecFor(seed: Long): Seq[Double] =
    (0 until dim).map(k => ((seed * 31 + k * 17) % 19 - 9) / 9.0)

  test("matches cosine_similarity ranking (incl. tie-break by id) exactly") {
    val centroids = (0L until 5L).map(i => (i, vecFor(i)))
    val vecs = spark.range(0, 200, 1, 8)
      .select($"id".as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          k => ((pmod(xxhash64($"id", k), lit(1800)) - 900) / lit(900.0)).cast("float"))
          .as("v"))

    val viaExpr = vecs.select($"vec_id",
        nearest_centroids($"v", centroids.map(_._1), centroids.map(_._2), 2).as("nc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    // reference: score against each centroid with the shipped
    // cosine_similarity expression, rank (sim desc, id asc)
    val centDf = centroids.map { case (i, v) => (i, v.map(_.toFloat)) }
      .toDF("cid", "cvec")
    val viaJoin = vecs.crossJoin(broadcast(centDf))
      .withColumn("sim", cosine_similarity($"v", $"cvec"))
      .collect().groupBy(_.getAs[Long]("vec_id")).map { case (id, rows) =>
        id -> rows.sortBy(r => (-r.getAs[Double]("sim"), r.getAs[Long]("cid")))
          .take(2).map(_.getAs[Long]("cid")).toSeq
      }
    viaJoin.foreach { case (id, expected) =>
      assert(viaExpr(id) == expected, s"vec $id: ${viaExpr(id)} vs $expected")
    }
  }

  test("nProbe beyond the centroid count returns all ids ranked; null vec stays null") {
    val centroids = Seq((10L, vecFor(1)), (20L, vecFor(2)))
    val out = Seq((1L, Some(vecFor(3).map(_.toFloat))), (2L, None))
      .toDF("id", "v")
      .select($"id", nearest_centroids($"v", centroids.map(_._1), centroids.map(_._2), 9).as("nc"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(1L).get.toSet == Set(10L, 20L) && out(1L).get.length == 2)
    assert(out(2L).isEmpty)
  }
}
