package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c", "en"),
    (2L, "a b c", "en"),          // exact dup of doc 1
    (3L, "d e", "de"),
    (4L, null: String, "de"),
    (5L, "a  f", null: String))   // whitespace run = 2 tokens
    .toDF("doc_id", "text", "lang")

  private def card(group: Option[String]) =
    CorpusStats.statsCard(docs, "text", group)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("global counters, vocab, ttr and dup fraction are exact") {
    val m = card(None)
    assert(m("n_docs") == 5.0)
    assert(m("n_null_text") == 1.0)
    // wsTokenCount is the repo's naive space-run convention: the double
    // space in "a  f" counts as two separators → 3 "tokens"
    assert(m("n_tokens") == 11.0)       // 3 + 3 + 2 + 0 + 3
    assert(m("n_chars") == 5 + 5 + 3 + 0 + 4)
    assert(m("vocab_size") == 6.0)      // a b c d e f (real split)
    assert(m("type_token_ratio") == 0.545455) // round6(6/11)
    assert(m("avg_tokens_per_doc") == 2.2)
    assert(m("exact_dup_docs") == 1.0)  // doc 2 duplicates doc 1
    assert(m("exact_dup_fraction") == 0.25)
  }

  test("group composition rows; null group lands under <col>_null") {
    val m = card(Some("lang"))
    assert(m("docs_lang_en") == 2.0 && m("tokens_lang_en") == 6.0)
    assert(m("docs_lang_de") == 2.0 && m("tokens_lang_de") == 2.0)
    assert(m("docs_lang_null") == 1.0 && m("tokens_lang_null") == 3.0)
    // the base rows survive the union unchanged
    assert(m("n_docs") == 5.0)
  }

  test("empty corpus: zero counts, guarded ratios, no division blow-up") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m = CorpusStats.statsCard(empty, "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_docs") == 0.0 && m("n_tokens") == 0.0)
    assert(m("type_token_ratio") == 0.0 && m("exact_dup_fraction") == 0.0)
  }

  test("statsDiff: full-outer semantics, 0 defaults, rounded delta") {
    val before = Seq(("n_docs", 10.0), ("docs_lang_en", 10.0))
      .toDF("stat", "value")
    val after = Seq(("n_docs", 12.0), ("docs_lang_de", 2.0))
      .toDF("stat", "value")
    val m = CorpusStats.statsDiff(before, after)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m("n_docs") == ((10.0, 12.0, 2.0)))
    assert(m("docs_lang_en") == ((10.0, 0.0, -10.0))) // vanished group
    assert(m("docs_lang_de") == ((0.0, 2.0, 2.0)))    // appeared group
    intercept[IllegalArgumentException] {
      CorpusStats.statsDiff(before, docs) // not a card
    }
  }

  test("plan: aggregate branches only — no corpus window, no nested-loop beyond the 1×1") {
    val out = CorpusStats.statsCard(docs, "text", Some("lang"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    // the only nested-loop is the deliberate 1×1 of two global
    // aggregates; a corpus-sized cartesian would also show here, so
    // assert the join inputs are aggregates by checking no
    // CartesianProduct node (BNLJ over two 1-row sides is fine)
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }
}
