package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window document chunking — the "pack long documents into
  * max-sequence-length training examples" stage (extension surface; no
  * reference counterpart). Sits between curation and [[Packing]]:
  * curation decides WHICH documents survive, chunking cuts each
  * survivor into model-sized windows, packing bins the windows into
  * batches.
  *
  * Chunk rule: whitespace tokens; windows of `maxTokens` starting at
  * 0, `stride`, 2·`stride`, … while the start is inside the document
  * (`stride < maxTokens` ⇒ overlapping context windows, `stride ==
  * maxTokens` ⇒ a partition). The final windows may be short — they are
  * emitted as-is (truncation would lose tail text; padding is the
  * trainer's job). Empty/whitespace-only documents produce NO chunks.
  *
  * Scale shape: tokenize → explode is a pure per-row pipeline — no
  * shuffle, no state, linear in corpus size, and the explode fanout is
  * ceil(n/stride) per document (bounded by document length / stride).
  * Everything is built-in higher-order functions (split / sequence /
  * slice / array_join) — fully codegen'd, engine-portable, and the
  * DuckDB oracle recomputes chunk boundaries and text bit-for-bit.
  */
object Chunking {

  /** Whitespace tokens with empties dropped (leading/consecutive
    * whitespace yields "" elements from split — both engines agree
    * after the filter). Portable whitespace class, not `\s` (see
    * [[graft.functions.GraftFunctions.WsClass]]). */
  private def tokens(textCol: Column): Column =
    filter(split(textCol, graft.functions.GraftFunctions.WsRun), t => t =!= "")

  /** Default per-document token bound for [[chunkByTokens]]: documents
    * over it fail loudly instead of tokenizing unboundedly. */
  val defaultMaxDocTokens: Int = 1000000

  /** Explode `textCol` into (idCol, chunk_id, chunk_text,
    * n_chunk_tokens) rows — only `idCol` survives from the document row
    * (join any other columns back on it downstream).
    *
    * Memory bound: the whole document tokenizes into ONE array per row,
    * and `maxDocTokens` fails LOUDLY via `raise_error` in the emptiness
    * filter (the [[TemporalJoins.pointInIntervalJoin]] pattern — column
    * pruning can never drop a filter predicate) when a document exceeds
    * it. Honest scope: the guard fires AFTER the array is built (it
    * reads its size), so it cannot prevent the tokenize allocation
    * itself — that allocation is the same order as the input string
    * Spark already holds per row, so it adds no new asymptotic hazard.
    * What the guard does bound is everything DOWNSTREAM of an
    * over-long document: the ceil(n/stride) explode fan-out, the
    * per-chunk slices over a giant parent array, and silently poisoned
    * job memory — the run refuses loudly instead of degrading. Raise
    * it deliberately for a known-long-doc corpus; pre-split upstream
    * when individual documents are themselves too large to hold. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, stride: Int,
      maxDocTokens: Int = defaultMaxDocTokens): DataFrame = {
    require(maxTokens > 0, s"maxTokens=$maxTokens must be positive")
    require(stride > 0 && stride <= maxTokens,
      s"stride=$stride must be in [1, maxTokens=$maxTokens]")
    require(maxDocTokens >= maxTokens,
      s"maxDocTokens=$maxDocTokens must be >= maxTokens=$maxTokens")
    val reserved = df.columns.filter(c => c == "__toks" || c == "__start")
    require(reserved.isEmpty,
      s"reserved internal column names in input: ${reserved.mkString(", ")}")
    val toks = tokens(col(textCol))
    val starts = sequence(lit(0), size(col("__toks")) - 1, lit(stride))
    val piece = slice(col("__toks"), col("__start") + 1, lit(maxTokens))
    df.withColumn("__toks", toks)
      .filter(when(size(col("__toks")) > maxDocTokens,
          raise_error(concat(
            lit("Chunking.chunkByTokens: document "), col(idCol).cast("string"),
            lit(" has "), size(col("__toks")).cast("string"),
            lit(s" tokens > maxDocTokens=$maxDocTokens — pre-split the " +
              "document or raise maxDocTokens deliberately"))).cast("boolean"))
        .otherwise(size(col("__toks")) > 0))
      .withColumn("__start", explode(starts))
      .select(
        col(idCol),
        (col("__start") / stride).cast("long").as("chunk_id"),
        array_join(piece, " ").as("chunk_text"),
        size(piece).cast("long").as("n_chunk_tokens"))
  }
}
