package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def dupes = Seq(
    ("k1", 1, "first"), ("k1", 2, "second"), ("k1", 3, "third"),
    ("k2", 5, "only"),
    ("k3", 9, "late"), ("k3", 7, "early")
  ).toDF("Id", "seq", "payload")

  test("keepFirst keeps the lowest-order row per key") {
    val out = Dedup.keepFirst(dupes, Seq("Id"), Seq(col("seq")))
      .orderBy("Id").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("k1", "first"), ("k2", "only"), ("k3", "early")))
  }

  test("keepLast keeps the highest-order row per key") {
    val out = Dedup.keepLast(dupes, Seq("Id"), Seq(col("seq")))
      .orderBy("Id").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("k1", "third"), ("k2", "only"), ("k3", "late")))
  }

  test("keepFirst is idempotent") {
    val once = Dedup.keepFirst(dupes, Seq("Id"), Seq(col("seq")))
    val twice = Dedup.keepFirst(once, Seq("Id"), Seq(col("seq")))
    assert(once.orderBy("Id", "seq").collect().toSeq ==
      twice.orderBy("Id", "seq").collect().toSeq)
  }

  test("keepAny passes through when the key column is absent (reference branch)") {
    val noId = dupes.drop("Id")
    assert(Dedup.keepAny(noId, Seq("Id")).count() == dupes.count())
    assert(Dedup.keepAny(dupes, Seq("Id")).count() == 3)
  }
}
