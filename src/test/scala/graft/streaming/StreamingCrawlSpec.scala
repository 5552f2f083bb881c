package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingCrawlSpec extends SparkSpec {
  import spark.implicits._

  // text that clears every downstream screen (en langId, quality ≥ 0.3,
  // ≥ 5 tokens, Gopher bands); distinct tails keep content hashes apart
  private def txt(tail: String) =
    s"the quick brown foxes jumped over and beyond many lazy dogs of $tail"
  private def page(tail: String) = s"<p>${txt(tail)}</p>"

  private def run(batch: Seq[(Long, String, String)], batchId: Long,
      stateDir: String, outDir: String): Unit =
    StreamingOps.crawlBatch(
      batch.toDF("doc_id", "url", "html"), batchId,
      "doc_id", "url", "html", stateDir, outDir, domainCap = 2,
      graft.operators.Curation.Config())

  private def outIds(spark: org.apache.spark.sql.SparkSession,
      outDir: String): Seq[Long] =
    spark.read.parquet(s"$outDir/batch_*")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("state carries across micro-batches: URL dedup, domain cap, content hash") {
    val root = java.nio.file.Files.createTempDirectory("graft_crawl_stream").toString
    val (stateDir, outDir) = (s"$root/state", s"$root/out")
    val b0 = Seq(
      (1L, "http://a.com/x", page("note")),
      (2L, "http://A.COM/x#f", page("item")),    // canonical dup of 1 (intra)
      (3L, "http://b.com/1", page("news")),
      (4L, "http://b.com/2", page("word")),
      (5L, "http://b.com/3", page("line")))      // b.com rank 3 > cap 2
    run(b0, 0L, stateDir, outDir)
    assert(outIds(spark, outDir) == Seq(1L, 3L, 4L))
    val b1 = Seq(
      (6L, "http://a.com/x?utm_source=z", page("mark")), // URL seen in b0
      (7L, "http://b.com/4", page("gain")),              // domain cap spent in b0
      (8L, "http://c.com/1", page("note")),              // content hash of doc 1
      (9L, "http://c.com/2", page("zeal")))
    run(b1, 1L, stateDir, outDir)
    // ONLY doc 9 survives batch 1 — each drop needs state from batch 0
    assert(outIds(spark, outDir) == Seq(1L, 3L, 4L, 9L))
    // state relations are keys only, appended per batch: 4 + 3 fresh
    // canonicals (doc 7's URL is fresh even though the DOMAIN cap
    // drops the doc), 3 + 1 fresh content hashes (doc 8's hash was
    // already accepted in batch 0)
    assert(spark.read.parquet(s"$stateDir/urls/batch_*").count() == 7L)
    assert(spark.read.parquet(s"$stateDir/hashes/batch_*").count() == 4L)
  }

  test("per-batch frontier: proposals minus everything fetched so far") {
    val root = java.nio.file.Files.createTempDirectory("graft_crawl_frontier").toString
    val (stateDir, outDir, fd) = (s"$root/state", s"$root/out", s"$root/frontier")
    def runF(batch: Seq[(Long, String, String)], batchId: Long): Unit =
      StreamingOps.crawlBatch(
        batch.toDF("doc_id", "url", "html"), batchId,
        "doc_id", "url", "html", stateDir, outDir, domainCap = 10,
        graft.operators.Curation.Config(), None, Some(fd))
    // batch 0 fetches a.com/1 and proposes a.com/2 (unfetched) and
    // a.com/1 (its own page — already fetched, screened)
    runF(Seq((1L,
      "http://a.com/1",
      page("note") + """<a href="http://a.com/2">n</a>""" +
        """<a href="http://a.com/1#top">self</a>""")), 0L)
    val f0 = spark.read.parquet(s"$fd/batch_0")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(f0 == Seq(("http://a.com/2", 1L)))
    // batch 1 fetches a.com/2 (the proposal) and proposes a.com/2
    // (now fetched → screened) and b.com/9 (fresh, linked twice from
    // two pages → in-degree 2)
    runF(Seq(
      (2L, "http://a.com/2",
        page("mark") + """<a href="http://b.com/9">x</a>"""),
      (3L, "http://a.com/3",
        page("zeal") + """<a href='http://b.com/9'>y</a>""" +
          """<a href="http://a.com/2?utm_source=z">seen</a>""")), 1L)
    val f1 = spark.read.parquet(s"$fd/batch_1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(f1 == Seq(("http://b.com/9", 2L)))
  }

  test("replayed batch is idempotent: same output, same state") {
    val root = java.nio.file.Files.createTempDirectory("graft_crawl_replay").toString
    val (stateDir, outDir) = (s"$root/state", s"$root/out")
    run(Seq((1L, "http://a.com/x", page("note"))), 0L, stateDir, outDir)
    val b1 = Seq(
      (2L, "http://a.com/x?utm_ref=1", page("mark")), // strips to batch-0's URL
      (3L, "http://d.com/1", page("zeal")))
    run(b1, 1L, stateDir, outDir)
    val once = outIds(spark, outDir)
    val urlsOnce = spark.read.parquet(s"$stateDir/urls/batch_1")
      .collect().map(_.getString(0)).sorted.toSeq
    run(b1, 1L, stateDir, outDir) // replay: must see pre-batch state only
    assert(outIds(spark, outDir) == once)
    assert(spark.read.parquet(s"$stateDir/urls/batch_1")
      .collect().map(_.getString(0)).sorted.toSeq == urlsOnce)
  }

  test("full stream: ordered files -> 2 real micro-batches ≡ one-shot batch") {
    val root = java.nio.file.Files.createTempDirectory("graft_crawl_e2e").toString
    val docs = (0L until 40L).map { i =>
      // ids i and i+20 share a page key -> every collision spans the split
      (i, s"http://site${i % 4}.com/p/${i % 20}", page(s"w$i"))
    }
    val all = docs.toDF("doc_id", "url", "html")
    StreamingOps.stageOrderedFiles(spark, s"$root/src",
      Seq(all.filter(col("doc_id") < 20), all.filter(col("doc_id") >= 20)))
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
    StreamingOps.crawlToCorpusStream(stream, "doc_id", "url", "html",
        s"$root/state", s"$root/out", s"$root/ckpt", domainCap = 3)
      .awaitTermination()
    // two REAL micro-batches ran
    assert(graft.operators.IndexFs.exists(spark, s"$root/out/batch_0"))
    assert(graft.operators.IndexFs.exists(spark, s"$root/out/batch_1"))
    // ≡ the one-shot batch pipeline (keep-smallest-id everywhere)
    import graft.operators.{Curation, HtmlExtract, UrlCuration}
    val addressed = UrlCuration.domainCap(
      UrlCuration.dedupByUrl(all, "doc_id", "url"), "doc_id", "url", cap = 3)
    val extracted = HtmlExtract.extractMainContent(
      addressed.select(col("doc_id"), col("html")), "doc_id", "html")
    val batchIds = Curation.filterAndExactDedup(
        extracted.select(col("doc_id"),
          graft.functions.TextNormalize.cleanText(col("text")).as("text"))
          .filter(graft.functions.TextAnalysis.gopherShapeOk(col("text"))),
        "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(outIds(spark, outDir = s"$root/out") == batchIds)
    assert(batchIds.nonEmpty && batchIds.size < 40)
  }
}
