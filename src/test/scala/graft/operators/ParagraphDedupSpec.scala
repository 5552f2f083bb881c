package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    ParagraphDedup.dedupParagraphs(rows.toDF("doc_id", "text"),
      "doc_id", "text")
  }

  test("first occurrence wins in corpus order; later docs lose; all-boilerplate docs drop") {
    val out = run(Seq(
      (1L, "alpha beta\n\nsubscribe now"),
      (2L, "subscribe now\n\ngamma delta"),
      (3L, "subscribe now")))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("alpha beta\n\nsubscribe now", 2L, 0L)))
    assert(out(2L) == (("gamma delta", 1L, 1L)))
    // doc 3 was pure boilerplate — absent from the output entirely
    assert(!out.contains(3L))
  }

  test("within-document repeats dedup too, order preserved") {
    val out = run(Seq((7L, "a b\n\nc d\n\na b\n\ne f"))).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "a b\n\nc d\n\ne f")
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 1L)
  }

  test("normalization collapses whitespace for matching but emits the survivor verbatim") {
    val out = run(Seq(
      (1L, "alpha   beta \n\nunique one"),
      (2L, "alpha beta\n\nunique two")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1's spelling (extra spaces) is the survivor, kept verbatim
    assert(out(1L) == "alpha   beta \n\nunique one")
    assert(out(2L) == "unique two")
  }

  test("normalize = false keeps whitespace variants distinct") {
    import spark.implicits._
    val out = ParagraphDedup.dedupParagraphs(
      Seq((1L, "alpha   beta"), (2L, "alpha beta")).toDF("doc_id", "text"),
      "doc_id", "text", normalize = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 2 && out(2L) == "alpha beta")
  }

  test("null text and blank paragraphs vanish; custom separator honored") {
    import spark.implicits._
    val df = Seq((1L, "x|y||x"), (2L, null: String)).toDF("doc_id", "text")
    val out = ParagraphDedup.dedupParagraphs(df, "doc_id", "text",
      sepRegex = "\\|", joiner = "|")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // blank between || dropped pre-dedup (not counted), repeat x dropped
    assert(out(1L) == (("x|y", 2L, 1L)))
    assert(!out.contains(2L))
  }

  test("plan: no window, no nested-loop join — aggregates and equi-joins only") {
    import spark.implicits._
    val df = Seq((1L, "a\n\nb"), (2L, "b\n\nc")).toDF("doc_id", "text")
    val out = ParagraphDedup.dedupParagraphs(df, "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"corpus window in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"non-equi join in plan:\n$plan")
  }
}
