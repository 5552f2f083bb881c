package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the Assassin moved fast"),       // substring must NOT trip
    (2L, "clean text only here"),
    (3L, "BAD things and bad words"),      // case-insensitive, distinct once
    (4L, "bad worse worst"),               // two distinct hits
    (5L, null: String))
    .toDF("doc_id", "text")

  private val terms = Seq("bad", "worse", "ass")

  test("token-boundary matching: no Scunthorpe substring hits, case-insensitive, distinct counts") {
    val m = Blocklist.annotateBlocked(docs, "text", terms)
      .select("doc_id", "blocked", "n_blocked_terms", "blocked_terms")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getSeq[String](3)))).toMap
    assert(m(1L) == ((false, 0L, Seq())))       // 'assassin' ≠ 'ass'
    assert(m(2L) == ((false, 0L, Seq())))
    assert(m(3L) == ((true, 1L, Seq("bad"))))   // BAD + bad → one term
    assert(m(4L) == ((true, 2L, Seq("bad", "worse"))))
    assert(m(5L) == ((false, 0L, Seq())))       // null text never matches
  }

  test("filterBlocked drops any-hit docs and restores the input schema") {
    val out = Blocklist.filterBlocked(docs, "text", terms)
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 5L))
  }

  test("multi-word and empty terms are rejected loudly") {
    intercept[IllegalArgumentException] {
      Blocklist.annotateBlocked(docs, "text", Seq("two words"))
    }
    intercept[IllegalArgumentException] {
      Blocklist.annotateBlocked(docs, "text", Seq(""))
    }
  }

  test("plan is map-only: no exchange, no join") {
    val out = Blocklist.annotateBlocked(docs, "text", terms)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"blocklist plan not map-only:\n$plan")
  }

  test("pre-existing output columns are rejected loudly, not overwritten") {
    Blocklist.OutputCols.foreach { c =>
      val occupied = docs.withColumn(c, lit("caller data"))
      val e = intercept[IllegalArgumentException] {
        Blocklist.annotateBlocked(occupied, "text", terms)
      }
      assert(e.getMessage.contains(c))
      intercept[IllegalArgumentException] {
        Blocklist.filterBlocked(occupied, "text", terms)
      }
    }
  }
}
