package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {

  // angles 0°, 25.8°, 51.7°: cos(a,b) = cos(b,c) = 0.9, cos(a,c) ≈ 0.62
  private def chain = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.43589f)),
      (3L, Array(0.6199f, 0.78471f)),
      (4L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
  }

  private def oneCluster = {
    import spark.implicits._
    Seq.tabulate(4)(i => (i + 1L, 0L)).toDF("vec_id", "cluster_id")
  }

  test("one-pass witness semantics: a dropped witness still drops its neighbors") {
    val kept = SemDedup.semDedup(chain, "vec_id", "embedding", tau = 0.85,
        assignments = Some(oneCluster))
      .collect().map(_.getLong(0)).toSet
    // 2 dropped (witness 1); 3 dropped by 2 EVEN THOUGH 2 itself was
    // dropped (EXISTS semantics — documented); 4 orthogonal, kept
    assert(kept == Set(1L, 4L))
    val dropped = SemDedup.droppedWithWitness(chain, "vec_id", "embedding",
        tau = 0.85, assignments = Some(oneCluster))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(dropped.keySet == Set(2L, 3L))
    assert(dropped(2L)._1 == 1L && dropped(2L)._2 == 0.9)
    assert(dropped(3L)._1 == 2L) // smallest qualifying witness
  }

  test("cluster scoping: cross-cluster near-identicals never compare") {
    import spark.implicits._
    val split = Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L))
      .toDF("vec_id", "cluster_id")
    val kept = SemDedup.semDedup(chain, "vec_id", "embedding", tau = 0.85,
        assignments = Some(split))
      .collect().map(_.getLong(0)).toSet
    // 1 and 2 now sit in different clusters — both survive; 3 (cluster
    // 0) only compares against 1, cos ≈ 0.62 < tau — survives too
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("withClusters assigns every row to a fitted centroid; end-to-end dedup runs") {
    val assigned = SemDedup.withClusters(chain, "vec_id", "embedding",
      nClusters = 2, maxIter = 5)
    assert(assigned.count() == 4)
    val cids = assigned.select("cluster_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cids.nonEmpty && cids.forall(c => c >= 0 && c < 2))
    // the self-fit path composes: some near-dup is found in any
    // clustering that co-locates the 0.9-cosine pair, and the result
    // is always a subset of the corpus
    val kept = SemDedup.semDedup(chain, "vec_id", "embedding", tau = 0.85,
      nClusters = 1, maxIter = 5)
    assert(kept.count() == 2) // one cluster ≡ the chain test
  }

  test("clustersFor keeps cluster size at the target") {
    assert(SemDedup.clustersFor(0) == 1)
    assert(SemDedup.clustersFor(1024) == 1)
    assert(SemDedup.clustersFor(1025) == 2)
    assert(SemDedup.clustersFor(100_000_000L, 1000) == 100000)
    intercept[IllegalArgumentException](SemDedup.clustersFor(5, 0))
  }

  test("guards fail loudly") {
    intercept[IllegalArgumentException] {
      SemDedup.semDedup(chain, "vec_id", "embedding", tau = 0.0,
        assignments = Some(oneCluster))
    }
    intercept[IllegalArgumentException] {
      SemDedup.withClusters(chain, "vec_id", "embedding", nClusters = 0)
    }
  }

  test("plan: the witness check is ONE equi-join on cluster_id, no cartesian") {
    val out = SemDedup.semDedup(chain, "vec_id", "embedding", tau = 0.85,
      assignments = Some(oneCluster))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the witness join must key on cluster_id:\n$plan")
    assert(plan.contains("LeftAnti"), s"anti-join spelling expected:\n$plan")
  }

  // ---- hot-cluster guard ----

  private def degenerate(n: Int) = {
    import spark.implicits._
    // n distinct directions in one planted giant cluster — the skewed
    // k-means outcome the guard exists for
    Seq.tabulate(n) { i =>
      val a = i * math.Pi / (2.0 * n)
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def allOne(n: Int) = {
    import spark.implicits._
    Seq.tabulate(n)(i => (i.toLong, 0L)).toDF("vec_id", "cluster_id")
  }

  test("hot-cluster guard: a planted degenerate clustering stays within a bounded candidate count") {
    val n = 200
    val cap = 20L
    val docs = degenerate(n)
    val capped = SemDedup.semDedup(docs, "vec_id", "embedding", tau = 0.999,
        assignments = Some(allOne(n)), maxClusterSize = cap)
      .collect().map(_.getLong(0)).toSet
    val exact = SemDedup.semDedup(docs, "vec_id", "embedding", tau = 0.999,
        assignments = Some(allOne(n)))
      .collect().map(_.getLong(0)).toSet
    // recall trade direction: sub-cell splitting can only LOSE
    // witnesses, never invent them — capped keeps a superset
    assert(exact.subsetOf(capped))
    // the documented bound: sub-cell pair count ≤ ~n·cap, vs the
    // uncapped n²/2 — recompute the deterministic sub assignment and
    // count pairs the witness join can actually emit
    val sizes = docs
      .withColumn("__sub", pmod(xxhash64(col("vec_id")),
        lit(math.ceil(n.toDouble / cap).toLong)))
      .groupBy("__sub").count().collect().map(_.getLong(1))
    val cells = math.ceil(n.toDouble / cap).toLong
    assert(sizes.length.toLong <= cells)
    val pairs = sizes.map(c => c * (c - 1) / 2).sum
    assert(pairs <= 2L * n * cap,
      s"candidate pairs $pairs exceed the n*cap bound")
    assert(pairs < n.toLong * (n - 1) / 4,
      s"guard did not reduce the quadratic: $pairs")
    // determinism: the same capped call yields the same kept set
    val again = SemDedup.semDedup(docs, "vec_id", "embedding", tau = 0.999,
        assignments = Some(allOne(n)), maxClusterSize = cap)
      .collect().map(_.getLong(0)).toSet
    assert(again == capped)
  }

  test("hot-cluster guard: small clusters are untouched (sub-split is a no-op below the cap)") {
    val kept = SemDedup.semDedup(chain, "vec_id", "embedding", tau = 0.85,
        assignments = Some(oneCluster), maxClusterSize = 100L)
      .collect().map(_.getLong(0)).toSet
    // 4 docs < cap → one sub-cell → identical to the exact result
    assert(kept == Set(1L, 4L))
    intercept[IllegalArgumentException] {
      SemDedup.semDedup(chain, "vec_id", "embedding", tau = 0.85,
        assignments = Some(oneCluster), maxClusterSize = 0L)
    }
  }
}
