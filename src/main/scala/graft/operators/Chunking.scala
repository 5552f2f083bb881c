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
    * after the filter). */
  private def tokens(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => t =!= "")

  /** Explode `textCol` into (chunk_id, chunk_text, n_chunk_tokens)
    * rows, keeping `keepCols` from the document row. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, stride: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens=$maxTokens must be positive")
    require(stride > 0 && stride <= maxTokens,
      s"stride=$stride must be in [1, maxTokens=$maxTokens]")
    val toks = tokens(col(textCol))
    val starts = sequence(lit(0), size(col("__toks")) - 1, lit(stride))
    val piece = slice(col("__toks"), col("__start") + 1, lit(maxTokens))
    df.withColumn("__toks", toks)
      .filter(size(col("__toks")) > 0)
      .withColumn("__start", explode(starts))
      .select(
        col(idCol),
        (col("__start") / stride).cast("long").as("chunk_id"),
        array_join(piece, " ").as("chunk_text"),
        size(piece).cast("long").as("n_chunk_tokens"))
  }
}
