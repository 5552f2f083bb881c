package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Substring-level exact dedup — Lee et al., "Deduplicating Training
  * Data Makes Language Models Better" (ACL 2022): long token spans that
  * repeat ANYWHERE in the corpus (quoted boilerplate, licence blocks,
  * syndicated article bodies pasted into otherwise-distinct pages) are
  * memorization fuel, and neither document-level regimes (exact md5,
  * MinHash, SimHash, SemDeDup) nor the separator-bound
  * [[ParagraphDedup]] can see a duplicated span embedded mid-document.
  * The rule here is the paper's, re-expressed relationally instead of
  * via a monolithic suffix array (which needs the whole corpus byte
  * string in one address space — exactly what a 1000-executor cluster
  * doesn't have): every occurrence of every `minTokens`-token window is
  * keyed by an engine-portable rolling hash
  * ([[GraftFunctions.substring_window_keys]]); the FIRST occurrence of
  * each distinct window in corpus order (doc id asc, position asc)
  * survives; every LATER occurrence marks its `minTokens` token range;
  * marked ranges are merged per document and the covered tokens cut,
  * the survivors reassembled in order. A span of `m ≥ minTokens`
  * duplicated tokens yields `m − minTokens + 1` losing windows whose
  * union marks exactly the m tokens — so whole duplicated regions
  * disappear from every copy but the corpus-first one, the paper's
  * semantics. Documents left with zero tokens drop out (their whole
  * text was duplicated elsewhere).
  *
  * Scale posture: token hashes and window keys are computed inside the
  * document row (one codegen'd md5 + O(n) rolling pass — tokens never
  * leave the row for hashing); the occurrence relation carries (doc,
  * pos, key) longs only, ONE hash exchange on the key feeds both the
  * `min(struct(doc, pos))` winner aggregate (1 row per DISTINCT window
  * — bounded by the deduplicated window vocabulary, never the corpus)
  * and the equi-join that filters losers; losing starts come back on
  * ONE doc-id exchange as a per-document sorted array (bounded by the
  * document's own length), and the cut+reassembly is a map-side lambda
  * over the original token array. No suffix array, no corpus window,
  * no driver state.
  *
  * Determinism: first-occurrence is a total order ((doc, pos) unique
  * per occurrence), so the kept token set is partitioning-independent.
  * Tokenization is the repo's portable whitespace split and reassembly
  * single-space joins survivors — original inter-token whitespace is
  * normalized, stated contract (the oracle re-derives the same).
  *
  * NULL text splits to a null array → zero windows, zero tokens → the
  * document drops out, like an all-duplicate one. Key collisions
  * (two DIFFERENT windows sharing a 62-bit key) can only over-merge —
  * expectation ~W²/2⁶³, negligible below ~10¹⁵ corpus tokens. */
object SubstringDedup {

  /** Cut every non-first occurrence of every duplicated
    * `minTokens`-token window out of `textCol`, corpus-wide.
    *
    * @param minTokens duplicated-span threshold (the paper uses 50 BPE
    *   tokens; whitespace tokens here — the tokenizer every other text
    *   op in this repo keys on)
    * @return one row per SURVIVING document: (idCol, textCol,
    *   n_tokens_kept, n_tokens_dropped)
    */
  def dedupSubstrings(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 50): DataFrame = {
    require(docs.columns.contains(idCol), s"column $idCol absent")
    require(docs.columns.contains(textCol), s"column $textCol absent")
    require(minTokens >= 2, s"minTokens=$minTokens must be >= 2")

    val toks = docs.select(col(idCol),
      filter(split(col(textCol), GraftFunctions.WsRun), t => t =!= "")
        .as("__ts"))
    // (doc, pos, key) per window occurrence — longs only, the token
    // text stays inside the document row
    val occ = toks
      .select(col(idCol), posexplode(
        GraftFunctions.substring_window_keys(col("__ts"), minTokens))
        .as(Seq("__pos", "__key")))
    val winners = occ
      .groupBy(col("__key"))
      .agg(min(struct(col(idCol).as("d"), col("__pos").as("p"))).as("__w"))
    val loserStarts = occ
      .join(winners, "__key")
      .filter(!(col(idCol) === col("__w.d") && col("__pos") === col("__w.p")))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("__pos"))).as("__starts"))
    // cut: token j is dropped iff some losing window start s covers it
    // (s ≤ j < s + minTokens) — an O(len · drops) per-document lambda,
    // both bounded by the document's own length
    toks
      .join(loserStarts, Seq(idCol), "left")
      .withColumn("__st", coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__kept", filter(col("__ts"),
        (t, j) => !exists(col("__st"), s => s <= j && j < s + minTokens)))
      .filter(size(col("__kept")) > 0)
      .select(col(idCol),
        array_join(col("__kept"), " ").as(textCol),
        size(col("__kept")).cast("long").as("n_tokens_kept"),
        (size(col("__ts")) - size(col("__kept"))).cast("long")
          .as("n_tokens_dropped"))
  }
}
