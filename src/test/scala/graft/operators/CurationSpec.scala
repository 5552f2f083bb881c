package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // keeper: english-ish, long enough, good quality
    (1L, "the quick brown fox and the lazy dog of a farm to the river and the hills beyond"),
    // exact duplicate of 1 → dropped by exact dedup (higher id)
    (2L, "the quick brown fox and the lazy dog of a farm to the river and the hills beyond"),
    // near duplicate of 1 (one word changed) → dropped by minhash stage
    (3L, "the quick brown fox and the lazy dog of a farm to the river and the plains beyond"),
    // too short → dropped by token filter
    (4L, "the of and"),
    // no english stopwords → dropped by language filter
    (5L, "zebra yak xylophone walrus vulture unicorn tapir serpent raccoon quail porcupine ocelot")
  ).toDF("doc_id", "text")

  test("filterAndExactDedup keeps english, quality, unique docs") {
    val kept = Curation.filterAndExactDedup(corpus, "doc_id", "text",
        Curation.Config(minQuality = 0.2))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // 2 deduped (exact), 4 too short, 5 wrong lang
  }

  test("full curate also removes minhash near-duplicates (keep-first)") {
    val curated = Curation.curate(corpus, "doc_id", "text",
        Curation.Config(minQuality = 0.2, nearDupThreshold = 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated == Set(1L)) // 3 is a near-dup of 1 → higher id dropped
  }

  test("maxBucketSize trade is explicit: a giant templated near-dup cluster survives the cap") {
    // 30 near-identical docs (distinct one-word edits, so exact dedup
    // keeps them all): every minhash band bucket holds the whole cluster.
    // With maxBucketSize below the cluster size those buckets are
    // SKIPPED — the documented recall trade of the hot-bucket guard —
    // so curate retains the cluster; disabling the cap removes it. This
    // test pins the semantics so the trade can never regress silently.
    val base = "the quick brown fox and the lazy dog of a farm to the river and the hills beyond"
    val cluster = (0 until 30).map(i => ((i + 10).toLong, base.replace("hills", s"w$i")))
    val df = cluster.toDF("doc_id", "text")
    val cfg = Curation.Config(minQuality = 0.2, nearDupThreshold = 0.5)

    val capped = Curation.curate(df, "doc_id", "text",
      cfg.copy(maxBucketSize = 10)).count()
    val uncapped = Curation.curate(df, "doc_id", "text",
      cfg.copy(maxBucketSize = Int.MaxValue)).count()
    assert(capped == 30L)  // hot buckets skipped → cluster retained
    assert(uncapped == 1L) // exact behavior → keep-first only
  }

  test("curateClusters merges non-transitive pair lists where pairwise keep-first cannot") {
    // A ~ C and B ~ C (jaccard = 18/22 ≈ 0.82) but A ≁ B (16/24 ≈ 0.67
    // < threshold 0.7): pairwise keep-first drops only d2s ({C}) and
    // keeps both A and B; cluster policy sees one {A,B,C} component and
    // keeps only A.
    val w = ("the and of to a big river bank slope under bright winter " +
      "sun light green stone old tall deep wide warm cold").split(" ")
    val a = (w.take(20) ++ Seq("gold", "mine")).mkString(" ")
    val b = (w.drop(2) ++ Seq("quartz", "wall")).mkString(" ")
    val c = w.mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val cfg = Curation.Config(minQuality = 0.1, nearDupThreshold = 0.7)
    // guard the construction: exact pairs are exactly (A,C) and (B,C)
    val exact = TextDedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.7)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 3L), (2L, 3L)))
    def ids(out: org.apache.spark.sql.DataFrame) =
      out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(Curation.curate(df, "doc_id", "text", cfg)) == Set(1L, 2L))
    assert(ids(Curation.curateClusters(df, "doc_id", "text", cfg)) == Set(1L))
  }

  test("curate on the testdata corpus is deterministic and reduces it") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Curation.curate(docs, "doc_id", "text").count()
    val b = Curation.curate(docs, "doc_id", "text").count()
    assert(a == b)
    assert(a > 0 && a < docs.count()) // something survived, something dropped
  }
}
