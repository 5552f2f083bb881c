package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTokenCountSpec extends SparkSpec {
  import spark.implicits._
  import GraftFunctions.bpe_token_count

  // independent reference: the apply loop re-implemented plainly over
  // the same merge table (list-of-strings, no cache, no arrays)
  private val rank = BpeTokenCount.merges.zipWithIndex.toMap
  private def refSegment(word: String): List[String] = {
    var syms = word.toList.map(_.toString)
    var go = true
    while (go && syms.size > 1) {
      val present = syms.zip(syms.tail).filter(rank.contains)
      if (present.isEmpty) go = false
      else {
        val (l, r) = present.minBy(rank)
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: b :: t if a == l && b == r => out += (a + b); rest = t
          case a :: t => out += a; rest = t
          case Nil =>
        }
        syms = out.toList
      }
    }
    syms
  }

  test("segmentLen: rank priority, multi-step merges, leftmost non-overlap") {
    // customer: e+r (rank 0) must fire before s+t (4), enabling m+er (8)
    assert(BpeTokenCount.segmentLen("customer") == 5) // c u st o mer
    assert(BpeTokenCount.segmentLen("mer") == 1)      // m,e,r → m,er → mer
    assert(BpeTokenCount.segmentLen("part") == 2)     // p,ar (9) → par; +t? no (par,t) pair → par t
    assert(BpeTokenCount.segmentLen("fast") == 3)     // f a st
    assert(BpeTokenCount.segmentLen("a") == 1)
    assert(BpeTokenCount.segmentLen("") == 0)
    // leftmost-first non-overlap: e r e r fuses to er er (2), never 3
    assert(BpeTokenCount.segmentLen("erer") == 2)
    // chars outside the table stay single symbols
    assert(BpeTokenCount.segmentLen("xyzq") == 4)
    // exhaustive agreement with the independent reference loop
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "the", "line",
      "sort", "window", "customer", "query", "stream", "order", "group",
      "filter", "join", "small", "big", "data", "column", "dup", "vector",
      "a", "in", "erer", "arat", "stst", "uppp")
    vocab.foreach { w =>
      assert(BpeTokenCount.segmentLen(w) == refSegment(w).size.toLong,
        s"word '$w': got ${BpeTokenCount.segmentLen(w)}, " +
          s"ref ${refSegment(w)}")
    }
  }

  test("compute: space pre-tokenization, empty pre-tokens, codegen path, nulls") {
    assert(BpeTokenCount.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("fast scan")) ==
      3L + 4L)
    // consecutive/leading/trailing spaces contribute nothing
    assert(BpeTokenCount.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("  fast  scan ")) ==
      7L)
    assert(BpeTokenCount.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) == 0L)
    // the DataFrame (codegen) path agrees with the driver loop, null→null
    val df = Seq(Some("customer part"), Some(""), None)
      .toDF("text")
      .select(bpe_token_count(col("text")).as("n"))
    assert(df.collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      .toSeq == Seq(7L, 0L, -1L))
    // and matches a word-by-word sum over a real corpus-shaped string
    val text = "the customer query window stream merge"
    val expected = text.split(" ").map(BpeTokenCount.segmentLen).sum
    val one = Seq(text).toDF("text")
      .select(bpe_token_count(col("text"))).head().getLong(0)
    assert(one == expected)
  }

  test("budget and packing run in exact BPE currency") {
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, if (i % 2 == 0) "en" else "de",
        Seq("the customer", "fast scan part", "merge stream window query")(
          i % 3))).toDF("doc_id", "lang", "text")
      .withColumn("n_tokens", bpe_token_count(col("text")))
    // counts are the exact per-text sums
    val counts = docs.select("text", "n_tokens").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (t, n) =>
      assert(n == t.split(" ").map(BpeTokenCount.segmentLen).sum)
    }
    // takeTokenBudget over the BPE column ≡ the sequential fold in BPE
    // tokens (tokenizer-parameterized: same machinery, new currency)
    val budgets = Map("en" -> 40L, "de" -> 25L)
    val got = graft.operators.Sampling.takeTokenBudget(
        docs, "doc_id", "lang", "n_tokens", budgets)
      .select("doc_id", "group_start").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ordered = docs
      .withColumn("h", graft.operators.Sharding.orderHash(col("doc_id"), "budget"))
      .select("lang", "h", "doc_id", "n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3))
    val cum = scala.collection.mutable.Map.empty[String, Long]
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    ordered.foreach { case (g, _, id, n) =>
      val start = cum.getOrElse(g, 0L)
      cum.update(g, start + n)
      if (start < budgets(g)) ref.update(id, start)
    }
    assert(got == ref.toMap)
    // packing bins in BPE tokens: offsets are the exact BPE cumsum
    val packed = graft.operators.Packing.withPackingBins(
        docs.select("doc_id", "n_tokens"), "doc_id", "n_tokens", budget = 16)
      .select("doc_id", "start_offset").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byId = docs.select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var off = 0L
    byId.foreach { case (id, n) =>
      assert(packed(id) == off, s"doc $id offset")
      off += n
    }
  }
}
