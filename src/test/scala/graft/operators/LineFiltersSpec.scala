package graft.operators

import graft.SparkSpec

class LineFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def clean(docs: (Long, String)*): Map[Long, (String, Long, Long)] =
    LineFilters.c4Clean(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  private val good =
    "This first line carries plenty of words and ends properly.\n" +
      "A second full sentence also terminates with punctuation!\n" +
      "Does the third line ask a proper question with enough words?"

  test("line rules: terminal punctuation, word floor, javascript screen") {
    val out = clean(
      (1L, good + "\nClick here\nshort one"),
      (2L, good + "\nPlease enable JavaScript to view this page today."),
      // typographic close-quote is terminal; 'javascripted' is NOT the
      // word javascript (token equality, the Scunthorpe posture)
      (3L, good + "\nShe said the words were “quite enough here.”" +
        "\nThe javascripted page still reads as normal prose here."))
    assert(out(1L)._2 == 3L && out(1L)._3 == 2L)
    assert(!out(1L)._1.contains("Click here"))
    assert(out(2L)._2 == 3L) // the banner line dropped, prose kept
    assert(out(3L)._2 == 5L) // both extra lines kept
  }

  test("page rules: brace, lorem ipsum, and the minLines floor") {
    val out = clean(
      (1L, good),
      (2L, good + "\nvar f = function() { return 1; }"), // brace → page drop
      (3L, good + "\nTemplate fill Lorem IPSUM dolor sit."), // phrase → drop
      (4L, "Only one proper sentence survives this entire page here."))
    assert(out.keySet == Set(1L)) // 4 has 1 kept line < 3
  }

  test("null text and empty lines are dropped, guards are loud") {
    val out = clean((1L, null.asInstanceOf[String]),
      (2L, good + "\n\n\n")) // empty lines count as dropped
    assert(out.keySet == Set(2L) && out(2L)._3 == 3L)
    intercept[IllegalArgumentException] {
      LineFilters.c4Clean(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", minWordsPerLine = 0)
    }
    intercept[IllegalArgumentException] {
      LineFilters.c4Clean(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "nope")
    }
  }

  test("plan is map-only: zero exchanges") {
    val df = LineFilters.c4Clean(
      Seq((1L, good)).toDF("doc_id", "text"), "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"),
      s"c4Clean must be in-row:\n$plan")
  }
}
