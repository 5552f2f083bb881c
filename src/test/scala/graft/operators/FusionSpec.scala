package graft.operators

import graft.SparkSpec

class FusionSpec extends SparkSpec {

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  // lexical list: docs 10, 20, 30; dense list: docs 20, 30, 40
  private def lexical = {
    import spark.implicits._
    Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "doc_id", "rank")
  }
  private def dense = {
    import spark.implicits._
    Seq((1L, 20L, 1), (1L, 30L, 2), (1L, 40L, 3))
      .toDF("query_id", "doc_id", "rank")
  }

  test("hand-computed RRF scores and ordering (k0 = 60)") {
    val out = Fusion.rrfFuse(Seq(lexical -> 1.0, dense -> 1.0),
        "query_id", "doc_id", "rank", k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // 20: 1/62 + 1/61; 30: 1/63 + 1/62; 10: 1/61; 40: 1/63
    val exp = Seq(
      20L -> r6(r6(1.0 / 62) + r6(1.0 / 61)),
      30L -> r6(r6(1.0 / 63) + r6(1.0 / 62)),
      10L -> r6(1.0 / 61),
      40L -> r6(1.0 / 63))
    assert(out.map(t => t._1 -> t._2).toSeq == exp)
    assert(out.map(_._3).toSeq == Seq(1, 2, 3, 4))
  }

  test("weights bias a retriever; k truncates") {
    val out = Fusion.rrfFuse(Seq(lexical -> 3.0, dense -> 1.0),
        "query_id", "doc_id", "rank", k = 1)
      .collect().map(r => r.getLong(1))
    // 10: 3/61 ≈ .0492 beats 20: 3/62 + 1/61 ≈ .0648 — no: compute
    // 20 = .048387*... use the aggregate itself below instead
    assert(out.length == 1)
    // doc 20 carries 3/62 + 1/61 = .064788 — the max; k=1 keeps only it
    assert(out.head == 20L)
  }

  test("single list degenerates to a rank-preserving rescoring") {
    val out = Fusion.rrfFuse(Seq(lexical -> 1.0),
        "query_id", "doc_id", "rank", k = 10)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq(10L -> 1, 20L -> 2, 30L -> 3))
  }

  test("ties break on id ascending; multiple queries stay independent") {
    import spark.implicits._
    val two = Seq((1L, 5L, 1), (1L, 3L, 1), (2L, 9L, 1))
      .toDF("query_id", "doc_id", "rank")
    // same rank twice under ONE query id is two docs with equal score
    val out = Fusion.rrfFuse(Seq(two -> 1.0),
        "query_id", "doc_id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq ==
      Seq(3L -> 1, 5L -> 2))
    assert(out.filter(_._1 == 2L).map(t => (t._2, t._3)).toSeq ==
      Seq(9L -> 1))
  }

  test("guards: empty list set, bad weight, absent column") {
    intercept[IllegalArgumentException] {
      Fusion.rrfFuse(Seq.empty, "q", "d", "rank", k = 5)
    }
    intercept[IllegalArgumentException] {
      Fusion.rrfFuse(Seq(lexical -> 0.0), "query_id", "doc_id", "rank", 5)
    }
    intercept[IllegalArgumentException] {
      Fusion.rrfFuse(Seq(lexical -> 1.0), "query_id", "nope", "rank", 5)
    }
  }
}
