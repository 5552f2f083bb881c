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
}
