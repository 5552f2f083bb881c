package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions.roundPortable
import graft.functions.TextAnalysis

/** Corpus datasheet — the "Datasheets for Datasets" (Gebru et al.) /
  * Dolma-report numbers every corpus release publishes and every
  * curation decision consumes: volume (documents, tokens, characters),
  * lexical shape (vocabulary size, type-token ratio), duplication
  * pressure (exact-dup document fraction), hygiene (null-text count)
  * and the per-group composition (documents and tokens per language /
  * source / domain). One SKINNY `(stat, value)` relation so the card
  * is join-able, diff-able across snapshots, and trivially assertable
  * in a data-quality gate.
  *
  * Scale posture: one LAZY plan over three corpus-linear aggregate
  * branches — (1) the global counters in ONE pass (including the exact
  * distinct-md5 count Spark plans as a two-stage partial-distinct
  * aggregate, never a driver set), (2) the vocabulary pass (explode →
  * distinct-token count — the only token-granular exchange), (3) the
  * group composition (bounded groups — a corpus has few languages /
  * sources at any size). The two 1-row branches meet in a 1×1 cross
  * join (constant-sized by construction) and the output is O(groups)
  * rows; no driver collect anywhere. Percentile-shaped length stats
  * deliberately live elsewhere ([[Layout]] equi-depth /
  * `q_quantile_profile`) — this card is the exact-arithmetic one-pass
  * surface.
  *
  * Determinism: counts are exact integers carried as doubles (< 2⁵³ —
  * exact far past any document count); ratios are portable-rounded.
  * NULL text counts as a document, contributes no tokens/chars, and is
  * excluded from the dup-fraction denominator (an md5 of NULL is not a
  * duplicate of anything). */
object CorpusStats {

  /** The card. `groupCol` adds per-group composition rows
    * (`docs_<col>_<value>` / `tokens_<col>_<value>`); NULL group values
    * land under `<col>_null`. */
  def statsCard(docs: DataFrame, textCol: String,
      groupCol: Option[String] = None): DataFrame = {
    require(docs.columns.contains(textCol), s"column $textCol absent")
    groupCol.foreach(g =>
      require(docs.columns.contains(g), s"column $g absent"))
    val toks = filter(split(col(textCol), GraftFunctions.WsRun),
      t => t =!= "")
    val nToks = coalesce(TextAnalysis.wsTokenCount(col(textCol)), lit(0L))

    // sums coalesced: on an EMPTY corpus SUM is NULL, and map() values
    // must be non-null for the explode
    val global = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(when(col(textCol).isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_null_text"),
      coalesce(sum(nToks), lit(0L)).as("n_tokens"),
      coalesce(sum(coalesce(length(col(textCol)).cast("long"), lit(0L))),
        lit(0L)).as("n_chars"),
      count(col(textCol)).as("n_nonnull"),
      countDistinct(md5(col(textCol))).as("n_distinct_text"))

    val vocab = docs
      .filter(col(textCol).isNotNull)
      .select(explode(toks).as("__t"))
      .agg(countDistinct(col("__t")).as("vocab_size"))

    // 1×1 by construction — both sides are global aggregates
    val base = global.crossJoin(vocab).select(explode(map(
      lit("n_docs"), col("n_docs").cast("double"),
      lit("n_null_text"), col("n_null_text").cast("double"),
      lit("n_tokens"), col("n_tokens").cast("double"),
      lit("n_chars"), col("n_chars").cast("double"),
      lit("avg_tokens_per_doc"), roundPortable(
        col("n_tokens").cast("double") / greatest(col("n_docs"), lit(1L)), 6),
      lit("vocab_size"), col("vocab_size").cast("double"),
      lit("type_token_ratio"), roundPortable(
        col("vocab_size").cast("double") / greatest(col("n_tokens"), lit(1L)),
        6),
      lit("exact_dup_docs"),
        (col("n_nonnull") - col("n_distinct_text")).cast("double"),
      lit("exact_dup_fraction"), roundPortable(
        (col("n_nonnull") - col("n_distinct_text")).cast("double") /
          greatest(col("n_nonnull"), lit(1L)), 6)))
      .as(Seq("stat", "value")))

    groupCol match {
      case None => base.orderBy(col("stat"))
      case Some(gc) =>
        // A NULL group value and the literal string "null" share the
        // stat key docs_<col>_null — COUNT SEMANTICS, mirrored by the
        // oracle's COALESCE spelling. The final groupBy(stat) makes
        // key-unique emission a construction guarantee (one row per
        // stat, colliding source groups summed), so statsDiff's
        // full-outer join can never fan out many-to-many.
        val grouped = docs
          .groupBy(coalesce(col(gc).cast("string"), lit("null")).as("__g"))
          .agg(count(lit(1)).cast("double").as("__docs"),
            sum(nToks).cast("double").as("__toks"))
          .select(explode(map(
            concat(lit(s"docs_${gc}_"), col("__g")), col("__docs"),
            concat(lit(s"tokens_${gc}_"), col("__g")), col("__toks")))
            .as(Seq("stat", "value")))
          .groupBy(col("stat")).agg(sum(col("value")).as("value"))
        base.unionByName(grouped).orderBy(col("stat"))
    }
  }

  /** Diff two datasheets — the release-note view "what changed in the
    * corpus between snapshot versions": full-outer join on `stat`, a
    * stat absent on one side reads 0 (count semantics — a language that
    * appeared has `value_before = 0`, one that vanished has
    * `value_after = 0`). Composes with the sharded snapshot's time
    * travel: `statsDiff(statsCard(readShardedVersion(dir, v1)),
    * statsCard(readSharded(dir)))` is the growth report between any
    * two retained versions, at two-cards cost. The join is
    * O(stats) = O(groups) rows — broadcast-trivial at any corpus
    * size. */
  def statsDiff(before: DataFrame, after: DataFrame): DataFrame = {
    Seq(before, after).foreach(df =>
      require(df.columns.toSeq.containsSlice(Seq("stat", "value")) ||
        df.columns.toSet == Set("stat", "value"),
        s"expected a (stat, value) card, got ${df.columns.mkString(",")}"))
    // Pre-aggregate each side by stat: a no-op for well-formed cards
    // (statsCard emits key-unique rows by construction), and on a
    // caller-supplied card with duplicate keys it sums them instead of
    // letting the full-outer join fan out many-to-many.
    val b = before.groupBy(col("stat"))
      .agg(sum(col("value")).as("value_before"))
    val a = after.groupBy(col("stat"))
      .agg(sum(col("value")).as("value_after"))
    b.join(a, Seq("stat"), "full_outer")
      .select(col("stat"),
        coalesce(col("value_before"), lit(0.0)).as("value_before"),
        coalesce(col("value_after"), lit(0.0)).as("value_after"),
        roundPortable(coalesce(col("value_after"), lit(0.0)) -
          coalesce(col("value_before"), lit(0.0)), 6).as("delta"))
  }
}
