package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup — the C4/Gopher curation step the
  * document-level regimes (exact md5, MinHash, SimHash, SemDeDup) can't
  * express: boilerplate ("subscribe to our newsletter", nav bars,
  * license headers) repeats across MILLIONS of otherwise-distinct pages,
  * so it survives every whole-document comparison yet still floods a
  * training mix. The rule here is the public C4 one lifted from
  * three-sentence spans to separator-delimited paragraphs: a paragraph
  * OCCURRENCE survives iff it is the FIRST occurrence of its normalized
  * form in corpus order (doc id asc, position asc); every later
  * occurrence — same document or any other — is dropped, and documents
  * are reassembled from their surviving paragraphs in original order.
  * Documents left with zero paragraphs disappear from the output (their
  * whole text was boilerplate), which is itself the signal callers
  * count.
  *
  * Scale posture: one `posexplode` projection (corpus-linear, no
  * shuffle), ONE hash exchange on the paragraph key for the
  * first-occurrence aggregate (`min(struct(doc, pos))` — a bounded
  * 1-row-per-key aggregate with map-side partials, never a corpus
  * window), one equi-join of the exploded relation against that
  * key-sized winner relation, and one hash exchange back on the doc id
  * to reassemble. Paragraph keys are md5 digests, so the winner relation
  * carries ~16 bytes + offsets per DISTINCT paragraph — the join side
  * tracks the deduplicated paragraph vocabulary, not the corpus. No
  * driver-side state at any size.
  *
  * Determinism: first-occurrence is a total order ((doc, pos) is unique
  * per occurrence), so the kept set is partitioning-independent —
  * re-running on a differently-shuffled corpus keeps byte-identical
  * documents. Normalization (on by default) collapses internal
  * whitespace runs and trims ends before hashing, so a trailing-space
  * variant of the same boilerplate still dedups; the SURVIVING
  * occurrence's text is emitted verbatim, not normalized.
  *
  * NULL text explodes to zero paragraphs — a null-text document drops
  * out exactly like an all-boilerplate one. */
object ParagraphDedup {

  /** Dedup `textCol` paragraph-wise across the whole relation.
    *
    * @param sepRegex paragraph separator (Java∩RE2-portable regex;
    *   default: blank-line runs)
    * @param joiner   separator used to reassemble surviving paragraphs
    * @param normalize hash on whitespace-collapsed, trimmed text
    * @return one row per SURVIVING document: (idCol, textCol,
    *   n_paras_kept, n_paras_dropped) — dropped = this document's
    *   occurrences that lost to an earlier one elsewhere (or earlier in
    *   the same document)
    */
  def dedupParagraphs(
      docs: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\\n{2,}", joiner: String = "\n\n",
      normalize: Boolean = true): DataFrame = {
    require(docs.columns.contains(idCol), s"column $idCol absent")
    require(docs.columns.contains(textCol), s"column $textCol absent")

    val paras = docs
      .select(col(idCol), posexplode(
        filter(split(col(textCol), sepRegex), p => trim(p) =!= ""))
        .as(Seq("__pos", "__para")))
    val keyed = paras.withColumn("__key",
      md5(if (normalize)
        trim(regexp_replace(col("__para"),
          graft.functions.GraftFunctions.WsRun, " "))
      else col("__para")))
    // first occurrence per key: a 1-row-per-key struct-min aggregate —
    // struct ordering is lexicographic (doc asc, then pos asc), the
    // corpus order the C4 rule keys on
    val winners = keyed
      .groupBy(col("__key"))
      .agg(min(struct(col(idCol).as("d"), col("__pos").as("p"))).as("__w"))
    val marked = keyed
      .join(winners, "__key")
      .withColumn("__kept",
        col(idCol) === col("__w.d") && col("__pos") === col("__w.p"))
    marked
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__kept"), struct(col("__pos"), col("__para"))))),
            x => x("__para")),
          joiner).as(textCol),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_paras_kept"),
        sum(when(col("__kept"), 0L).otherwise(1L)).as("n_paras_dropped"))
      .filter(col("n_paras_kept") > 0)
  }
}
