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

  test("gopher shape signals: mean length, symbols, bullets, ellipsis, alpha") {
    import org.apache.spark.sql.functions.col
    def m(text: String): (Double, Double, Double, Double, Double, Boolean) = {
      val r = Seq((1L, text)).toDF("id", "text").select(
        TextAnalysis.meanWordLength(col("text")),
        TextAnalysis.symbolWordRatio(col("text")),
        TextAnalysis.bulletLineFraction(col("text")),
        TextAnalysis.ellipsisLineFraction(col("text")),
        TextAnalysis.alphaWordFraction(col("text")),
        TextAnalysis.gopherShapeOk(col("text"))).collect()(0)
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))
    }
    // "abc de" -> 5 non-space chars / 2 words = 2.5; all-alpha; no lines
    val clean = m("abcd efgh ijkl")
    assert(clean._1 == 4.0 && clean._2 == 0.0 && clean._3 == 0.0 &&
      clean._4 == 0.0 && clean._5 == 1.0 && clean._6)
    // symbol soup: '##' counts 2 hashes; '...' counts once; U+2026 once
    val sym = m("ab ## cd... ef\u2026")
    assert(sym._2 == 1.0 && !sym._6) // 4 symbol hits / 4 words
    // bullet list: 2 of 3 lines bulleted (one '- ', one U+2022)
    val bl = m("- one two\n\u2022 three\nplain line here")
    assert(bl._3 == 0.6667)
    // ellipsis-terminated snippet lines: 2 of 3
    val el = m("first line...\nsecond\u2026\nthird stays")
    assert(el._4 == 0.6667)
    // numeric soup fails the alpha band
    val num = m("12 34 56 78 ab")
    assert(num._5 == 0.2 && !num._6)
    // mean word length out of band (minified blob)
    assert(!m("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")._6)
  }
}
