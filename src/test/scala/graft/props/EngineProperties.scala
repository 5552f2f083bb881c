package graft.props

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.ops.{Dedup, SpecAggregate}
import graft.spec.{ObjectSpec, SpecCompiler}

/** Property tests (SURVEY §5.2): algebraic invariants of the engine that
  * must hold for ANY input — checked over seeded ScalaCheck generators
  * covering nulls, duplicate keys, and empty lists. (Seeded explicitly:
  * the scalatest↔scalacheck bridge isn't in the offline cache, and
  * deterministic seeds make failures reproducible anyway.)
  */
class EngineProperties extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long, size: Int = 30): T =
    g.apply(Gen.Parameters.default.withSize(size), Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private val spec = ObjectSpec("T", Nil, Nil, Seq("k"),
    ListMap("v" -> Seq("sum", "mean", "min", "max", "count")))

  private val rowGen: Gen[(String, Option[Double])] = for {
    k <- Gen.oneOf("a", "b", "c", null)
    v <- Gen.oneOf(Gen.choose(-1e6, 1e6).map(Option(_)), Gen.const(Option.empty[Double]))
  } yield (k, v)

  test("records equals total rows: sum of group record counts == input size") {
    (1L to 6L).foreach { seed =>
      val rows = sample(Gen.listOf(rowGen), seed)
      val out = SpecAggregate.run(spark, spec, rows.toDF("k", "v"))
      val total =
        if (rows.isEmpty) 0L
        else out.agg(sum("records")).head.getLong(0)
      assert(total == rows.size.toLong, s"seed=$seed")
    }
  }

  test("aggregate over union == merge of partial aggregates") {
    def partial(rows: List[(String, Option[Double])]) =
      SpecAggregate.run(spark, spec, rows.toDF("k", "v"))
        .select("k", "records", "sum_v")
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap

    (1L to 4L).foreach { seed =>
      val r1 = sample(Gen.nonEmptyListOf(rowGen), seed)
      val r2 = sample(Gen.nonEmptyListOf(rowGen), seed + 100)
      val whole = SpecAggregate.run(spark, spec, (r1 ++ r2).toDF("k", "v"))
        .select("k", "records", "sum_v")
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap

      val p1 = partial(r1); val p2 = partial(r2)
      val merged = (p1.keySet ++ p2.keySet).map { k =>
        val (n1, s1) = p1.getOrElse(k, (0L, 0.0))
        val (n2, s2) = p2.getOrElse(k, (0L, 0.0))
        k -> ((n1 + n2, s1 + s2))
      }.toMap

      assert(whole.keySet == merged.keySet, s"seed=$seed")
      whole.foreach { case (k, (n, s)) =>
        val (mn, ms) = merged(k)
        assert(n == mn, s"seed=$seed key=$k")
        assert(math.abs(s - ms) <= 1e-6 * math.max(1.0, math.abs(s)), s"seed=$seed key=$k")
      }
    }
  }

  test("dedup is idempotent, keeps one row per key, never grows") {
    (1L to 6L).foreach { seed =>
      val rows = sample(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 5), Gen.choose(0, 100))), seed)
      val df = rows.toDF("id", "seq")
      val once = Dedup.keepFirst(df, Seq("id"), Seq(col("seq"), monotonically_increasing_id()))
      val twice = Dedup.keepFirst(once, Seq("id"), Seq(col("seq"), monotonically_increasing_id()))
      val onceRows = once.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(onceRows.size <= rows.size)
      assert(twice.collect().map(r => (r.getInt(0), r.getInt(1))).toSet == onceRows, s"seed=$seed")
      assert(onceRows.map(_._1).size == rows.map(_._1).distinct.size, s"seed=$seed")
      // keep-first semantics: the surviving seq per key is the minimum
      val minSeq = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
      onceRows.foreach { case (k, s) => assert(s == minSeq(k), s"seed=$seed key=$k") }
    }
  }

  test("empty and non-empty pipelines produce the same schema names") {
    val schemaOnEmpty = SpecCompiler.emptyOutputSchema(spec).fieldNames.toSet
    val nonEmpty = SpecAggregate.run(spark, spec,
      Seq(("a", Some(1.0))).toDF("k", "v")).schema.fieldNames.toSet
    assert(schemaOnEmpty == nonEmpty)
  }

  test("full registry sweep: every one of the 23 specs runs end-to-end on a tolerant input") {
    // A deliberately mismatched input: only Id (plus null Event
    // timestamps — the reference's Event rewrite, like ours, requires the
    // columns to exist; tolerance is about VALUES, not the Event
    // contract). Every spec must still produce its declared schema
    // (group keys -> UNKNOWN, metrics -> 0.0).
    val input = Seq("r1", "r2", "r3").toDF("Id")
      .withColumn("StartDateTime", lit(null).cast("string"))
      .withColumn("EndDateTime", lit(null).cast("string"))
    graft.spec.SpecRegistry.specs.foreach { case (name, s) =>
      val out = SpecAggregate.run(spark, s, input)
      val expected = SpecCompiler.outputColumns(s).toSet
      assert(out.schema.fieldNames.toSet == expected, s"spec=$name")
      val rows = out.collect()
      assert(rows.length == 1, s"spec=$name")
      assert(rows.head.getLong(rows.head.fieldIndex("records")) == 3L, s"spec=$name")
    }
  }

  test("minhash LSH pairs ⊆ exact jaccard pairs on ANY corpus (verify-stage precision)") {
    // The exact-Jaccard verify stage guarantees precision regardless of
    // what the banding produces — an invariant, not a tuning property.
    // Random corpora mix tiny vocabularies (collision-dense buckets),
    // duplicates, and sub-shingle-length docs.
    val word = Gen.oneOf("a", "b", "c", "dog", "fox", "the", "lazy", "x9")
    val docGen = Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, word).map(_.mkString(" ")))
    (1L to 4L).foreach { seed =>
      val texts = sample(Gen.listOfN(40, docGen), seed, size = 40)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(graft.operators.TextDedup.jaccardPairs(
        docs, "doc_id", "text", n = 3, threshold = 0.6))
      val lsh = pairs(graft.operators.TextDedup.minhashLsh(
        docs, "doc_id", "text", n = 3, threshold = 0.6))
      assert(lsh.subsetOf(exact), s"seed=$seed: LSH emitted non-pairs ${lsh -- exact}")
      // exact duplicates (jaccard 1.0) can never be missed: they share
      // every band bucket by construction
      val dups = texts.zipWithIndex.groupBy(_._1).values
        .filter(g => g.size > 1 && g.head._1.split(" ").length >= 3)
        .flatMap(g => g.map(_._2.toLong).sorted.sliding(2).map(p => (p(0), p(1))))
      dups.foreach(p =>
        assert(lsh.contains(p), s"seed=$seed: identical-doc pair $p missed"))
    }
  }

  test("bucket_search rank == count of boundaries ≤ value, for ANY ascending boundaries") {
    import graft.functions.GraftFunctions.bucket_search
    val boundariesGen = Gen.nonEmptyListOf(Gen.choose(-1e4, 1e4))
      .map(_.distinct.sorted)
    val valuesGen = Gen.listOfN(50, Gen.choose(-2e4, 2e4))
    (1L to 6L).foreach { seed =>
      val bs = sample(boundariesGen, seed)
      val vs = sample(valuesGen, seed + 50, size = 50)
      // exercise exact-boundary hits too, not just random interior points
      val probes = vs ++ bs
      val got = probes.toDF("v")
        .select(col("v"), bucket_search(col("v"), typedLit(bs)).as("r"))
        .collect().map(r => r.getDouble(0) -> r.getLong(1))
      got.foreach { case (v, r) =>
        val expected = bs.count(_ <= v).toLong
        assert(r == expected,
          s"seed=$seed: bucket_search($v) = $r, expected $expected over ${bs.size} boundaries")
      }
    }
  }
}
