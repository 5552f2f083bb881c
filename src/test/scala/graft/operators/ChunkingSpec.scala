package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  private def chunksOf(text: String, maxTokens: Int, stride: Int) = {
    import spark.implicits._
    Chunking.chunkByTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", maxTokens, stride)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq
  }

  test("overlapping windows: boundaries, overlap, short tail") {
    // 7 tokens, windows of 3 at stride 2 → starts 0,2,4,6
    assert(chunksOf("a b c d e f g", 3, 2) == Seq(
      (0L, "a b c", 3L), (1L, "c d e", 3L), (2L, "e f g", 3L), (3L, "g", 1L)))
  }

  test("stride == maxTokens partitions the document") {
    assert(chunksOf("a b c d e", 2, 2) == Seq(
      (0L, "a b", 2L), (1L, "c d", 2L), (2L, "e", 1L)))
  }

  test("short document yields one whole chunk") {
    assert(chunksOf("a b", 10, 5) == Seq((0L, "a b", 2L)))
  }

  test("empty and whitespace-only documents yield no chunks; whitespace runs collapse") {
    import spark.implicits._
    val out = Chunking.chunkByTokens(
      Seq((1L, ""), (2L, "   \t "), (3L, "  a   b  ")).toDF("doc_id", "text"),
      "doc_id", "text", 4, 4)
    assert(out.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((3L, "a b")))
  }

  test("guards: bad maxTokens/stride fail loudly") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "doc_id", "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "doc_id", "text", 4, 5)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "doc_id", "text", 4, 0)
    }
  }

  test("guards: reserved internal names and maxDocTokens bounds fail at construction") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df.withColumn("__toks", lit(1)),
        "doc_id", "text", 4, 2)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df.withColumn("__start", lit(1)),
        "doc_id", "text", 4, 2)
    }
    intercept[IllegalArgumentException] {
      // maxDocTokens below maxTokens can never emit a full window
      Chunking.chunkByTokens(df, "doc_id", "text", 4, 2, maxDocTokens = 3)
    }
  }

  test("maxDocTokens: an over-long document fails LOUDLY, never a silent giant array") {
    import spark.implicits._
    val long = (1 to 20).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, "a b"), (2L, long)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Chunking.chunkByTokens(df, "doc_id", "text", 4, 4, maxDocTokens = 10)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("Chunking.chunkByTokens") && m.contains("maxDocTokens=10")),
      s"expected the loud guard message, got: ${messages(e).mkString(" | ")}")
    // at the bound: runs, and the short doc still chunks normally
    val ok = Chunking.chunkByTokens(df, "doc_id", "text", 4, 4, maxDocTokens = 20)
      .collect().map(_.getLong(0))
    assert(ok.count(_ == 2L) == 5 && ok.count(_ == 1L) == 1)
  }

  test("plan: tokenize → explode is shuffle-free") {
    import spark.implicits._
    val plan = Chunking.chunkByTokens(
        (1L to 50L).map(i => (i, "a b c d e f")).toDF("doc_id", "text"),
        "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
