package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions._

class TopKByScoreSpec extends SparkSpec {

  import spark.implicits._

  test("top_k_by_score returns best-first (score desc, id asc) with deterministic ties") {
    val df = Seq(
      ("a", 10L, 0.5), ("a", 3L, 0.9), ("a", 7L, 0.9), ("a", 1L, 0.1),
      ("b", 2L, 0.2)).toDF("g", "id", "score")
    val out = df.groupBy($"g").agg(top_k_by_score($"id", $"score", 2).as("topk"))
      .select($"g", $"topk").collect().map(r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getLong(0), e.getDouble(1)))).toMap
    // ties at 0.9 break by id asc: 3 before 7
    assert(out("a") == Seq((3L, 0.9), (7L, 0.9)))
    assert(out("b") == Seq((2L, 0.2)))
  }

  test("k larger than the group yields all entries; null scores/ids are skipped") {
    val df = Seq(
      (1L, Some(0.3)), (2L, None), (3L, Some(0.7))
    ).toDF("id", "score").withColumn("g", lit("x"))
    val out = df.groupBy($"g").agg(top_k_by_score($"id", $"score", 10).as("topk"))
      .select(explode($"topk").as("e")).select($"e.id", $"e.score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((3L, 0.7), (1L, 0.3)))
  }

  test("agrees with the window row_number spelling on a many-partition input") {
    val n = 5000
    val df = spark.range(0, n, 1, 16)
      .select(($"id" % 7).as("g"), $"id".as("id"),
        (pmod(xxhash64($"id"), lit(100000)) / 10000.0).as("score"))
    val viaAgg = df.groupBy($"g").agg(top_k_by_score($"id", $"score", 5).as("topk"))
      .select($"g", posexplode($"topk").as(Seq("pos", "e")))
      .select($"g", $"e.id".as("id"), ($"pos" + 1).cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5).select($"g", $"id", $"rank".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("string ids work (generic id type through serialization)") {
    val df = Seq(("k1", 0.4), ("k2", 0.8), ("k3", 0.6))
      .toDF("id", "score").withColumn("g", lit(1))
      .repartition(4) // force partial buffers + serialize/merge
    val out = df.groupBy($"g").agg(top_k_by_score($"id", $"score", 2).as("topk"))
      .select(explode($"topk.id").as("id")).as[String].collect().toSeq
    assert(out == Seq("k2", "k3"))
  }
}
