package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedRollup equals the plain groupBy aggregate, nulls included") {
    val df = Seq(
      ("hot", Some(1.0)), ("hot", Some(2.0)), ("hot", None), ("hot", Some(4.0)),
      ("cold", Some(10.0)), ("cold", None)
    ).toDF("k", "v")
    val salted = Salting.saltedRollup(df, Seq("k"), "v", buckets = 4)
      .collect().map(r => r.getString(0) -> r).toMap

    val hot = salted("hot")
    assert(hot.getAs[Long]("records") == 4L)
    assert(hot.getAs[Double]("sum_v") == 7.0)
    assert(hot.getAs[Double]("min_v") == 1.0)
    assert(hot.getAs[Double]("max_v") == 4.0)
    assert(math.abs(hot.getAs[Double]("avg_v") - 7.0 / 3) < 1e-12) // nulls excluded

    val cold = salted("cold")
    assert(cold.getAs[Long]("records") == 2L)
    assert(cold.getAs[Double]("avg_v") == 10.0)
  }

  test("all-null group: sum 0.0, avg null (Polars/plain-agg parity)") {
    val df = Seq(("x", Option.empty[Double]), ("x", None)).toDF("k", "v")
    val row = Salting.saltedRollup(df, Seq("k"), "v").collect().head
    assert(row.getAs[Double]("sum_v") == 0.0)
    assert(row.isNullAt(row.fieldIndex("avg_v")))
  }

  test("salted first stage spreads a heavy key over multiple partitions") {
    val df = (1 to 10000).map(i => ("heavy", i.toDouble)).toDF("k", "v")
    val out = Salting.saltedRollup(df, Seq("k"), "v", buckets = 8).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("records") == 10000L)
    assert(out.head.getAs[Double]("sum_v") == (1 to 10000).map(_.toDouble).sum)
  }
}
