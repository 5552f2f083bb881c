package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BpeTable

/** BPE tokenizer TRAINING at corpus scale — the inverse of
  * [[graft.functions.BpeTable.fromTokenizerFiles]]: learn the merge
  * table FROM the corpus instead of loading a published one, so the
  * budget/packing/chunking machinery can spend tokens in a tokenizer
  * fit to the data being curated. The public Sennrich procedure
  * (Sennrich, Haddow & Birch, ACL 2016, alg. 1): start every word as
  * its character sequence, repeatedly count adjacent symbol pairs
  * (weighted by word frequency), fuse the most frequent pair
  * everywhere, stop after `nMerges` merges or when support falls
  * below `minSupport`. Deterministic tie-break: (weight DESC, left
  * ASC, right ASC) — the same rule the DuckDB oracle re-derives.
  *
  * Scale shape — the two-stage fit posture every learned component
  * here uses ([[QualityClassifier.fit]], IVF k-means): the CORPUS
  * pays exactly one distributed pass (explode → word-count aggregate;
  * the shuffle carries DISTINCT words, not the corpus), the top
  * `vocabCap` words by (count DESC, word ASC) come back through a
  * bounded `TakeOrdered` — a capped, corpus-size-independent driver
  * pull — and the merge loop runs in memory over that bounded
  * vocabulary, which is how production tokenizer trainers work
  * (the loop is O(vocab · wordLen · nMerges), data-independent).
  * At 100 TB nothing but the one word-count aggregate touches the
  * corpus.
  *
  * The cap is a recall trade, not a correctness hedge: words below
  * the cap boundary contribute no pair weight (documented; the gate
  * corpus fits entirely under the cap, spec-asserted).
  */
object BpeTrain {

  /** One learned merge: `rank` = iteration, (`l`, `r`) fused into
    * `l+r`, `weight` = the pair's corpus-weighted adjacency count at
    * the iteration it won. */
  final case class LearnedMerge(rank: Int, l: String, r: String, weight: Long)

  final case class Result(merges: IndexedSeq[LearnedMerge]) {
    /** The learned merges as a ready [[BpeTable]] (rank = priority) —
      * drop into [[graft.functions.GraftFunctions.bpe_token_count]].
      * Loud on an empty fit (nothing repeated ≥ minSupport). */
    def table: BpeTable = {
      require(merges.nonEmpty, "BPE fit learned no merges " +
        "(no adjacent pair reached minSupport) — cannot build a table")
      BpeTable(merges.map(m => (m.l, m.r)))
    }

    /** The merges as a relation `(rank, l, r, weight)` — the snapshot
      * shape the `q_bpe_train` oracle re-derives. */
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      merges.map(m => (m.rank, m.l, m.r, m.weight))
        .toDF("rank", "l", "r", "weight")
    }
  }

  /** Distributed word-count stage + bounded in-memory merge loop (see
    * object doc for the scale contract). Pre-tokenization is the
    * corpus convention: single-space split, empty tokens dropped. */
  def fit(docs: DataFrame, textCol: String, nMerges: Int,
      vocabCap: Int = 65536, minSupport: Long = 2L): Result = {
    require(nMerges >= 1, s"nMerges=$nMerges must be >= 1")
    require(vocabCap >= 1, s"vocabCap=$vocabCap must be >= 1")
    require(minSupport >= 1L, s"minSupport=$minSupport must be >= 1")
    require(docs.columns.contains(textCol), s"column $textCol absent")
    // ONE corpus pass; the aggregate output is the distinct vocabulary
    val vocab: Array[(String, Long)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "" && col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(vocabCap) // bounded TakeOrdered — the capped driver pull
      .collect().map(r => (r.getString(0), r.getLong(1)))
    fitLocal(vocab, nMerges, minSupport)
  }

  /** The in-memory merge loop over a `(word, count)` vocabulary —
    * separated for the spec's oracle-twin tests. */
  private[graft] def fitLocal(vocab: Array[(String, Long)], nMerges: Int,
      minSupport: Long): Result = {
    // current segmentation of each vocab word (mutable across rounds).
    // Seed symbols are CODEPOINTS, not UTF-16 code units: a per-Char
    // map would split every non-BMP character (emoji are routine in
    // crawled text) into two lone-surrogate "symbols" — invalid
    // strings whose learned merges diverge from the oracle's
    // codepoint split. Same stepping convention as NbLangExpressions.
    val seqs: Array[Array[String]] = vocab.map { case (w, _) =>
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        b += w.substring(i, i + n)
        i += n
      }
      b.result()
    }
    val counts: Array[Long] = vocab.map(_._2)
    val out = Vector.newBuilder[LearnedMerge]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      // adjacency counts: EVERY adjacent occurrence counts (a,a,a,a
      // holds three (a,a) pairs), weighted by word frequency — the
      // Sennrich get_stats convention, mirrored by the oracle
      val pairW = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < seqs.length) {
        val s = seqs(i)
        val c = counts(i)
        var j = 0
        while (j < s.length - 1) {
          val key = (s(j), s(j + 1))
          pairW.update(key, pairW.getOrElse(key, 0L) + c)
          j += 1
        }
        i += 1
      }
      val candidates = pairW.view.filter(_._2 >= minSupport).toVector
      if (candidates.isEmpty) done = true
      else {
        val ((bl, br), bw) = candidates.minBy { case ((l, r), w) =>
          (-w, l, r) // weight DESC, then lexicographic — deterministic
        }
        out += LearnedMerge(k, bl, br, bw)
        // fuse all leftmost-first non-overlapping occurrences
        i = 0
        while (i < seqs.length) {
          val s = seqs(i)
          var j = 0
          var hit = false
          while (!hit && j < s.length - 1) {
            hit = s(j) == bl && s(j + 1) == br
            j += 1
          }
          if (hit) {
            val b = Array.newBuilder[String]
            j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == bl && s(j + 1) == br) {
                b += bl + br; j += 2
              } else { b += s(j); j += 1 }
            }
            seqs(i) = b.result()
          }
          i += 1
        }
        k += 1
      }
    }
    Result(out.result())
  }
}
