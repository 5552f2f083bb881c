package graft.operators

import graft.SparkSpec

class ClusterRepsSpec extends SparkSpec {

  // cluster {1,2,3} via chain pairs; 4 and 5 singletons (5 outside pairs)
  private def pairs = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (4L, 4L)).toDF("d1", "d2")
  }

  test("best score wins the cluster; singletons represent themselves") {
    import spark.implicits._
    val docs = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.1), (5L, 0.7))
      .toDF("doc_id", "quality")
    val out = TextDedup.clusterRepresentatives(docs, "doc_id", "quality", pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) == ((2L, false)))
    assert(out(2L) == ((2L, true)))
    assert(out(3L) == ((2L, false)))
    assert(out(4L) == ((4L, true)))
    assert(out(5L) == ((5L, true)))
  }

  test("score ties keep the smaller id; null scores lose to any scored member") {
    import spark.implicits._
    val docs = Seq((1L, Some(0.5)), (2L, Some(0.5)),
      (3L, None: Option[Double]))
      .toDF("doc_id", "quality")
    val out = TextDedup.clusterRepresentatives(docs, "doc_id", "quality",
        pairs.filter("d1 <> 4"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("an all-null cluster falls back to smallest id") {
    import spark.implicits._
    val docs = Seq((1L, None: Option[Double]), (2L, None: Option[Double]))
      .toDF("doc_id", "quality")
    val out = TextDedup.clusterRepresentatives(docs, "doc_id", "quality",
        Seq((1L, 2L)).toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("rounding collapses sub-ulp score differences before the argmax") {
    import spark.implicits._
    // differ at the 9th decimal: identical after round-6 ⇒ id tie-break
    val docs = Seq((1L, 0.123456701), (2L, 0.123456702))
      .toDF("doc_id", "quality")
    val out = TextDedup.clusterRepresentatives(docs, "doc_id", "quality",
        Seq((1L, 2L)).toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }
}
