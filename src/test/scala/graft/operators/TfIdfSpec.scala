package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // "rare" appears in one doc, "common" in all three; doc 1 holds
    // them at EQUAL tf so the idf difference alone decides its ranking
    Seq(
      (1L, "common rare"),
      (2L, "common word word word"),
      (3L, "common")
    ).toDF("doc_id", "text")
  }

  test("hand-computed tf-idf: counts, df, smooth-idf weights") {
    val rows = TfIdf.tfidfVectors(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    def w(tf: Double, df: Long): Double = {
      val raw = tf * (math.log(4.0 / (df + 1.0)) + 1.0)
      math.floor(raw * 10000 + 0.5) / 10000
    }
    assert(rows((1L, "common")) == ((1L, 3L, w(1.0 / 2.0, 3))))
    assert(rows((1L, "rare")) == ((1L, 1L, w(1.0 / 2.0, 1))))
    assert(rows((2L, "word")) == ((3L, 1L, w(3.0 / 4.0, 1))))
    assert(rows((3L, "common")) == ((1L, 3L, w(1.0, 3))))
    // the rare term outweighs the common one at equal tf
    assert(rows((1L, "rare"))._3 > rows((1L, "common"))._3)
  }

  test("minDf prunes low-support vocabulary before the join") {
    val toks = TfIdf.tfidfVectors(corpus, "doc_id", "text", minDf = 2L)
      .select("token").distinct().collect().map(_.getString(0)).toSet
    assert(toks == Set("common"))
  }

  test("topTerms ranks by (weight desc, token) and caps at k") {
    val top = TfIdf.topTerms(corpus, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top == Map(1L -> "rare", 2L -> "word", 3L -> "common"))
  }

  test("topTerms ranks via the bounded aggregate, never a per-doc window") {
    val out = TfIdf.topTerms(corpus, "doc_id", "text", k = 2)
    assert(out.columns.toSeq ==
      Seq("doc_id", "token", "n_term", "df", "tfidf", "rank"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("top_k_by_score"),
      s"expected the bounded top-k aggregate:\n$plan")
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
  }

  test("guards fail loudly") {
    intercept[IllegalArgumentException] {
      TfIdf.tfidfVectors(corpus, "doc_id", "text", minDf = 0L)
    }
    intercept[IllegalArgumentException] {
      TfIdf.topTerms(corpus, "doc_id", "text", k = 0)
    }
  }

  test("plan: ONE corpus scan, reused exchanges, lazy N — no eager action, no cartesian") {
    val out = TfIdf.tfidfVectors(corpus, "doc_id", "text")
    // construction is LAZY (r12): the r11 spelling ran an eager
    // distinct().count() corpus scan before the plan existed
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE echoes the pre-reuse plan below
    assert(!plan.contains("CartesianProduct"),
      s"tf-idf must stay equi-join shaped:\n$plan")
    // the ONLY nested-loop is the broadcast 1-row N constant join
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 == 1,
      s"expected exactly the 1-row N broadcast join:\n$plan")
    // the corpus is scanned+exploded ONCE; every other branch rides a
    // reused exchange (the no-op n_term/n_doc_tokens references keep
    // the branches canonically identical — see tfidfVectors)
    assert(plan.split("LocalTableScan").length - 1 == 1,
      s"expected one corpus scan, got:\n$plan")
    assert(plan.contains("ReusedExchange"), s"expected exchange reuse:\n$plan")
  }

  test("bm25TopK: hand-computed scores, distinct-term and OOV conventions") {
    import spark.implicits._
    val queries = Seq(
      (10L, "rare common"),
      (11L, "word word"), // repeated term counts ONCE
      (12L, "common zzz") // OOV term contributes nothing
    ).toDF("query_id", "qtext")
    val out = TfIdf.bm25TopK(corpus, "doc_id", "text",
        queries, "query_id", "qtext", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    // reference BM25 computed independently: N=3, avgdl=(2+4+1)/3
    val avgdl = 7.0 / 3.0
    def idf(df: Long): Double = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def tfTerm(tf: Long, dl: Long): Double =
      tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    // query 10 over doc 1 (dl=2): rare(df=1, tf=1) + common(df=3, tf=1)
    assert(out((10L, 1L))._1 ==
      r4(idf(1) * tfTerm(1, 2) + idf(3) * tfTerm(1, 2)))
    // doc 1 (has rare) must outrank docs 2, 3 (common only)
    assert(out((10L, 1L))._2 == 1)
    // query 11: only doc 2 contains "word"; repeated query term scores once
    assert(out.keys.count(_._1 == 11L) == 1)
    assert(out((11L, 2L))._1 == r4(idf(1) * tfTerm(3, 4)))
    // query 12: OOV term drops out, every common-bearing doc scores
    assert(out.keys.count(_._1 == 12L) == 3)
    assert(out((12L, 3L))._1 == r4(idf(3) * tfTerm(1, 1)))
    // equal-score ties break on doc id: docs 1 and 3 tie for q12? No —
    // different lengths give different scores; assert rank totality
    val ranks = out.collect { case ((12L, _), (_, rk)) => rk }.toSeq.sorted
    assert(ranks == Seq(1, 2, 3))
  }

  test("bm25TopK plan: equi-join shaped, bounded top-k aggregate, no corpus window") {
    import spark.implicits._
    val queries = Seq((10L, "rare common")).toDF("query_id", "qtext")
    val out = TfIdf.bm25TopK(corpus, "doc_id", "text",
      queries, "query_id", "qtext", k = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"bm25 must stay equi-join shaped:\n$plan")
    // the only nested loop is the 1-row (N, avgdl) stats broadcast
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 == 1,
      s"expected exactly the 1-row stats broadcast:\n$plan")
    // ranking is the bounded aggregate, never a corpus-wide window
    assert(plan.contains("top_k_by_score"),
      s"expected the bounded top-k aggregate:\n$plan")
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
  }
}
