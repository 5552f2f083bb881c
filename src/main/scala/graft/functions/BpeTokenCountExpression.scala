package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_token_count(text)` — EXACT byte-pair-encoding token count, the
  * model-tokenizer upgrade over [[TextAnalysis.approxBpeTokenCount]]'s
  * `len/4` heuristic: token budgets ([[graft.operators.Sampling
  * .takeTokenBudget]]), packing bins ([[graft.operators.Packing]]) and
  * chunk windows are ultimately spent in MODEL tokens, and a heuristic
  * count drifts per language/register exactly where mixture budgets
  * matter most.
  *
  * Algorithm — the public BPE APPLY procedure (Sennrich, Haddow &
  * Birch, "Neural Machine Translation of Rare Words with Subword
  * Units", ACL 2016; the same merge loop GPT-2's byte-level variant
  * runs): pre-tokenize on single spaces (the corpus convention and the
  * oracle twin), start each word as its character sequence, then
  * repeatedly take the merge-table pair with the LOWEST rank present
  * in the word and fuse all its leftmost-first non-overlapping
  * occurrences, until no table pair remains; the count is the sum of
  * final symbol counts over words. Empty pre-tokens (from consecutive
  * spaces) count 0; NULL text is NULL.
  *
  * The merge table is a [[BpeTable]] value carried BY the expression
  * (default: [[BpeTokenCount.fixtureTable]], learned offline by the
  * public Sennrich TRAINING procedure — count adjacent pairs over the
  * vocabulary, fuse the most frequent, repeat; deterministic
  * lexicographic tie-break, stop below support 2). Swap in a real
  * model's tokenizer with [[BpeTable.fromTokenizerFiles]] — the
  * standard GPT-2 `merges.txt`/`vocab.json` pair parses, validates
  * (rank bijectivity, vocab closure) and rides the plan; the apply
  * loop is table-agnostic. The fixture is deliberately rank-DEPENDENT
  * (e.g. `m+er` can only fire after `e+r`) so the oracle exercises
  * priority order, not just segmentation.
  *
  * Scale shape: per-row, allocation-light, no shuffle; the word →
  * count memo ([[BpeTable]]'s bounded cache) makes the steady
  * state one hash probe per word — natural-language corpora repeat
  * their vocabulary, which is the same reason BPE exists. Codegen'd
  * via a static call like every native expression here; the DuckDB
  * oracle re-derives counts from the SAME table with a recursive CTE
  * (TextQueries `bpeCtes`), so the gate is cross-engine, not
  * self-referential.
  */
case class BpeTokenCount(child: Expression,
    table: BpeTable = BpeTokenCount.fixtureTable) extends UnaryExpression {

  override def prettyName: String = "bpe_token_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    table.compute(v.asInstanceOf[UTF8String])

  // the table rides the plan as a codegen reference object (the
  // standard non-literal-state pattern), so a LOADED tokenizer table
  // (merges.txt/vocab.json via BpeTable) codegens exactly like the
  // committed fixture — no static registry an executor could miss
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tbl.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeTokenCount {

  /** The fixture merge table, rank = position. Learned offline (see
    * class doc); constant so both engines read the SAME ranks — the
    * oracle SQL interpolates these exact pairs, and the committed
    * resource fixture `graft/bpe/merges.txt` parses to exactly this
    * list ([[BpeTable.fromResources]], spec-asserted). */
  val merges: IndexedSeq[(String, String)] = Vector(
    "e" -> "r", "i" -> "n", "o" -> "r", "o" -> "w", "s" -> "t",
    "a" -> "l", "a" -> "r", "a" -> "t", "m" -> "er", "p" -> "ar",
    "u" -> "p")

  /** The fixture as a [[BpeTable]] — the expression default. The
    * apply loop, rank index and word memo all live on [[BpeTable]];
    * swap tokenizers by passing a loaded table to the expression. */
  val fixtureTable: BpeTable = BpeTable(merges)

  /** Token count of ONE word under the fixture table (oracle-twin
    * probe surface; production counting goes through the expression). */
  def segmentLen(word: String): Long = fixtureTable.segmentLen(word)

  /** Static fixture-table count — kept for generated code compiled
    * before the table became a reference object. */
  def compute(text: UTF8String): Long = fixtureTable.compute(text)
}
