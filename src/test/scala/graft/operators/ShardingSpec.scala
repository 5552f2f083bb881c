package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardingSpec extends SparkSpec {

  private def docs(n: Long) = {
    import spark.implicits._
    (0L until n).map(i => (i, s"doc$i")).toDF("id", "body")
  }

  test("withShard: shards in range, deterministic, assignment-sensitive to salt") {
    val out = Sharding.withShard(docs(500), "id", 16).cache()
    val shards = out.select("shard").distinct().collect().map(_.getLong(0)).toSet
    assert(shards.subsetOf((0L until 16L).toSet) && shards.size == 16)
    // rerun is identical
    assert(Sharding.withShard(docs(500), "id", 16).collect().toSet ==
      out.collect().toSet)
    // a different salt is a genuinely different assignment
    val other = Sharding.withShard(docs(500), "id", 16, salt = "epoch2")
    assert(other.select("id", "shard").collect().toSet !=
      out.select("id", "shard").collect().toSet)
    out.unpersist()
  }

  test("assignment is growth-stable: new keys never move old keys") {
    val small = Sharding.withShard(docs(200), "id", 16)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val grown = Sharding.withShard(docs(400), "id", 16)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    small.foreach { case (id, s) => assert(grown(id) == s) }
  }

  test("shards are near-uniform (hash balance)") {
    val counts = Sharding.withShard(docs(16000), "id", 16)
      .groupBy("shard").count().collect().map(_.getLong(1))
    val expect = 1000.0
    counts.foreach(c => assert(math.abs(c - expect) < expect * 0.2,
      s"shard count $c too far from $expect"))
  }

  test("shuffled: total deterministic order, decoupled from input order") {
    val a = Sharding.shuffled(docs(300), "id").select("id")
      .collect().map(_.getLong(0)).toSeq
    val b = Sharding.shuffled(docs(300).orderBy(desc("id")), "id").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a != (0L until 300L).toSeq, "shuffle left the input order intact")
    assert(a.toSet == (0L until 300L).toSet)
  }

  test("shuffled: over-maxRows input fails LOUDLY, never a silent full-corpus sort") {
    val e = intercept[Exception] {
      Sharding.shuffled(docs(300), "id", maxRows = 100L).collect()
    }
    // raise_error surfaces wrapped in Spark's execution exception chain
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("Sharding.shuffled") && m.contains("writeShards")),
      s"expected the loud guard message, got: ${messages(e).mkString(" | ")}")
    // at the bound: still runs, still the deterministic order
    val ok = Sharding.shuffled(docs(300), "id", maxRows = 300L).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ok.toSet == (0L until 300L).toSet)
    // reserved-name and bad-bound guards fail at construction
    intercept[IllegalArgumentException] {
      Sharding.shuffled(docs(10).withColumnRenamed("body", "__n_rows"), "id")
    }
    intercept[IllegalArgumentException] {
      Sharding.shuffled(docs(10), "id", maxRows = 0L)
    }
  }

  test("writeShards: nShards dirs, disjoint membership, rows preserved, in-shard order") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Sharding.writeShards(docs(500), "id", 8, dir)
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .map[String](_.getFileName.toString).filter(_.startsWith("shard=")).sorted
      .toArray.toSeq
    assert(dirs == (0 until 8).map(i => s"shard=$i"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    assert(back.select("id").distinct().count() == 500)
    // the written order within a shard is the deterministic shuffle order
    val shard0 = spark.read.parquet(s"$dir/shard=0")
      .select("shuffle_order").collect().map(_.getLong(0)).toSeq
    assert(shard0 == shard0.sorted)
  }

  test("withShard plan: a pure projection — no exchange") {
    val plan = Sharding.withShard(docs(100), "id", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shard assignment must not shuffle:\n$plan")
  }
}
