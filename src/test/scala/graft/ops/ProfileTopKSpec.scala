package graft.ops

import graft.SparkSpec

class ProfileTopKSpec extends SparkSpec {

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("single-pass profile (TopKFreq aggregate) matches the two-job profile") {
    val twoJob = Profile.profile(orders, topK = 5)
      .map(p => p.name -> p).toMap
    val onePass = Profile.profileSinglePass(orders, topK = 5)
      .map(p => p.name -> p).toMap

    assert(twoJob.keySet == onePass.keySet)
    twoJob.foreach { case (name, a) =>
      val b = onePass(name)
      assert(a.nullCount == b.nullCount, s"col=$name")
      assert(a.nUnique == b.nUnique, s"col=$name")
      // top-k values: identical sets and counts (tie order identical:
      // cnt desc, value asc on both paths)
      assert(a.topValues == b.topValues, s"col=$name: ${a.topValues} vs ${b.topValues}")
    }
  }

  test("single-pass profile ranks null as a value (Polars parity) like the two-job path") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), Some("a"), None, None, Some("b"))
      .toDF("cat")
    val twoJob = Profile.profile(df, topK = 3).head.topValues
    val onePass = Profile.profileSinglePass(df, topK = 3).head.topValues
    assert(twoJob == onePass, s"$twoJob vs $onePass")
    assert(onePass == Seq(("a", 3L), (null, 2L), ("b", 1L)))
  }

  test("TopKFreq handles >64KB string values (length-prefixed serialization)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.top_k_freq
    val big = "x" * 70000
    val df = (Seq.fill(3)(big) ++ Seq("small")).toDF("x").repartition(2)
    val top = df.agg(top_k_freq(col("x"), 1).as("t"))
      .selectExpr("inline(t)").collect()
    assert(top.head.getString(0).length == 70000)
    assert(top.head.getLong(1) == 3L)
  }

  test("TopKFreq stays exact under partial/merge across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.top_k_freq
    val df = (1 to 1000).map(i => s"v${i % 7}").toDF("x").repartition(8)
    val top = df.agg(top_k_freq(col("x"), 3).as("t"))
      .selectExpr("inline(t)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // 1000 rows over 7 values: v1..v6 appear 143, v0 appears 142
    assert(top.length == 3)
    assert(top.head._2 == 143L)
    assert(top.map(_._2).sum == 429L)
  }

  test("TopKFreq space-saving eviction keeps heavy hitters under tiny capacity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.top_k_freq
    // 500 singletons + one value appearing 200 times; capacity 16
    val data = (1 to 500).map(i => s"rare$i") ++ Seq.fill(200)("heavy")
    val df = scala.util.Random.shuffle(data).toDF("x").repartition(4)
    val top = df.agg(top_k_freq(col("x"), 1, capacity = 16).as("t"))
      .selectExpr("inline(t)")
      .collect().map(r => r.getString(0))
    assert(top.head == "heavy")
  }

  test("TopKFreq eviction bound is per-buffer: a heavy group's bound can't corrupt a light one") {
    import scala.collection.mutable
    import graft.functions.TopKFreq
    // One expression instance serving two buffers (grouped aggregation).
    val agg = TopKFreq(org.apache.spark.sql.catalyst.expressions.Literal("x"),
      k = 4, capacity = 4)
    // Heavy buffer: force an eviction at count 50 → caches a HIGH bound.
    val heavy = agg.createAggregationBuffer()
    agg.merge(heavy, mutable.HashMap("a" -> 100L, "b" -> 80L, "c" -> 60L, "d" -> 50L))
    agg.merge(heavy, mutable.HashMap("e" -> 1L)) // evicts d(50): e = 51
    assert(heavy("e") == 51L)

    // Light buffer whose true minimum is the LAST key in iteration order,
    // so a stale-bound early stop (which grabs the first entry ≤ bound)
    // would pick a wrong victim and inflate the newcomer.
    val lightKeys = mutable.HashMap(Seq("p", "q", "r", "s").map(_ -> 0L): _*)
      .keys.toSeq // this instance's deterministic iteration order
    val light = agg.createAggregationBuffer()
    agg.merge(light, mutable.HashMap(
      lightKeys.zipWithIndex.map { case (key, i) => key -> (10L - i) }: _*))
    val trueMin = 10L - (lightKeys.length - 1) // last-iterated key's count = 7
    agg.merge(light, mutable.HashMap("z" -> 2L))
    assert(light("z") == trueMin + 2L,
      s"eviction used a stale cross-buffer bound: ${light.toMap}")
  }
}
