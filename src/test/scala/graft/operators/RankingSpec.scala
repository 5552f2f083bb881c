package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq.tabulate(500) { i =>
    (i.toLong, (i * 37 % 101).toDouble / 10.0)
  }.toDF("doc_id", "difficulty")

  test("rank ≡ global window row_number, mixed directions") {
    val got = Ranking.withGlobalRank(docs,
      Seq(col("difficulty").desc, col("doc_id")), "rank")
      .select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.withColumn("rank",
      row_number().over(Window.orderBy(col("difficulty").desc,
        col("doc_id"))).cast("long") - 1L)
      .select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("ranks are a permutation of 0..n-1 and partition-independent") {
    val a = Ranking.withGlobalRank(docs, Seq(col("doc_id")), "rank")
      .select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val b = Ranking.withGlobalRank(docs.repartition(13, col("difficulty")),
      Seq(col("doc_id")), "rank")
      .select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(a == b)
    assert(a.map(_._2) == (0L until 500L).toSet)
    // identity order: rank i belongs to doc i
    assert(a.forall { case (d, r) => d == r })
  }

  test("no single-partition funnel: output keeps the requested range width") {
    val out = Ranking.withGlobalRank(docs, Seq(col("doc_id")), "rank",
      numPartitions = Some(7))
    assert(out.rdd.getNumPartitions == 7)
    // and the window spelling WOULD funnel — the contrast this op exists for
    val win = docs.withColumn("r",
      row_number().over(Window.orderBy(col("doc_id"))))
    assert(win.rdd.getNumPartitions == 1)
  }

  test("reserved output column is rejected loudly; empty input ranks nothing") {
    intercept[IllegalArgumentException] {
      Ranking.withGlobalRank(docs, Seq(col("doc_id")), "difficulty")
    }
    val empty = Seq.empty[(Long, Double)].toDF("doc_id", "difficulty")
    assert(Ranking.withGlobalRank(empty, Seq(col("doc_id"))).count() == 0L)
  }
}
