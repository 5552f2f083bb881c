package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionRatio flags phrase loops the token-level ratio misses") {
    val docs = Seq(
      (1L, "foo bar baz foo bar baz foo bar baz"), // 3-token cycle
      (2L, "one two three four five six seven"),   // no repetition
      (3L, "x"),                                    // shorter than n
      (4L, "")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.repetitionRatio(col("text"), 2).as("r2"),
        TextAnalysis.distinctTokenRatio(col("text")).as("tok"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // doc 1: 8 total 2-grams, only 3 distinct ("foo bar","bar baz","baz foo")
    assert(math.abs(out(1L)._1 - (1.0 - 3.0 / 8.0)) < 1e-12)
    // ...while its token-level distinct ratio (3/9) is what a LENGTH-9
    // doc of pure boilerplate also gets — the 2-gram signal separates
    // cycling phrases from merely small vocabularies
    assert(out(2L)._1 == 0.0) // unique phrases → zero duplicate fraction
    assert(out(3L)._1 == 0.0) // shorter than n → defined as 0
    assert(out(4L)._1 == 0.0)
  }
}
