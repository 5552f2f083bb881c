package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.unsafe.types.UTF8String

/** A BPE merge table — the ranked pair list the [[BpeTokenCount]]
  * apply loop runs over, as a FIRST-CLASS serializable value instead
  * of a compiled-in constant. The expression carries its table (plan
  * literal semantics: serialized to executors with the plan, embedded
  * in generated code via a codegen reference object), so one session
  * can count under several tokenizers — the committed fixture for the
  * oracle gate, a production model's `merges.txt` for real budgets —
  * with no global state and no executor-side file access.
  *
  * Tables come from [[BpeTable.fromMergesText]] (the public GPT-2 /
  * huggingface `merges.txt` format: optional `#version` header, one
  * `left right` pair per line, rank = line order) optionally
  * cross-validated against a `vocab.json` (GPT-2's token → id map —
  * [[BpeTable.fromTokenizerFiles]] checks the map is a BIJECTION and
  * that every merge's inputs and output are vocabulary entries, the
  * invariants a mis-paired or truncated tokenizer download breaks).
  *
  * Runtime state (pair-rank index, bounded word memo) is rebuilt
  * lazily per JVM via `@transient lazy val` — only the pair list
  * travels. Equality is structural on the pair list, so plan
  * canonicalization and exchange reuse see identical tables as
  * identical expressions. */
case class BpeTable(merges: IndexedSeq[(String, String)])
    extends Serializable {
  require(merges.nonEmpty, "empty merge table")
  merges.foreach { case (l, r) =>
    require(l.nonEmpty && r.nonEmpty, s"empty symbol in merge ($l, $r)")
    require(!(l + r).exists(ch => ch == ' ' || ch == '\u0000'),
      s"merge symbols must not contain separators: ($l, $r)")
  }

  /** pair → rank, keyed `l + NUL + r` (symbols never contain the NUL
    * separator — enforced above). */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + "\u0000" + r, Integer.valueOf(i))
    }
    m
  }

  /** Bounded word → token-count memo (see [[BpeTokenCount]] class doc:
    * natural corpora repeat their vocabulary, so the merge loop runs
    * ~once per vocabulary entry). Per-table, so two tables in one JVM
    * never cross-pollute counts. */
  @transient private lazy val cache =
    new ConcurrentHashMap[String, java.lang.Long]()
  private val CacheCap = 1 << 16

  /** Token count of ONE word (no spaces) by the apply loop. */
  def segmentLen(word: String): Long = {
    if (word.isEmpty) return 0L
    if (word.length == 1) return 1L
    val memo = cache.get(word)
    if (memo != null) return memo.longValue()
    // seed symbols are CODEPOINTS, not UTF-16 code units: a per-Char
    // seed would count an emoji as two lone-surrogate symbols and
    // diverge from the oracle's codepoint split (the BpeTrain.fitLocal
    // convention, fixed the same round)
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    var done = false
    while (!done && syms.size > 1) {
      // lowest-rank pair present
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // fuse all leftmost-first non-overlapping occurrences
        val (l, r) = merges(bestRank)
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == l && syms.get(k + 1) == r) {
            next.add(l + r); k += 2
          } else {
            next.add(syms.get(k)); k += 1
          }
        }
        syms = next
      }
    }
    val n = syms.size.toLong
    if (cache.size() < CacheCap) cache.put(word, java.lang.Long.valueOf(n))
    n
  }

  /** Exact token count of a text: pre-tokenize on single spaces (the
    * corpus convention and the oracle twin), sum [[segmentLen]]. */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) total += segmentLen(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }
}

object BpeTable {

  /** Parse the public `merges.txt` format (Sennrich's subword-nmt and
    * GPT-2/huggingface tokenizers both ship it): optional `#version:`
    * header, blank lines skipped, one space-separated symbol pair per
    * line, priority = line order. Malformed lines fail loudly with
    * their line number; duplicate pairs fail loudly (a duplicate can
    * only be a corrupted file — ranks are a function of the pair). */
  def fromMergesText(mergesText: String): BpeTable = {
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val seen = scala.collection.mutable.HashSet.empty[(String, String)]
    mergesText.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val line = raw.trim
      if (line.nonEmpty && !(i == 0 && line.startsWith("#version"))) {
        val parts = line.split(" ")
        require(parts.length == 2 && parts.forall(_.nonEmpty),
          s"merges line ${i + 1} is not 'left right': '$raw'")
        val p = (parts(0), parts(1))
        require(seen.add(p), s"duplicate merge pair at line ${i + 1}: '$raw'")
        pairs += p
      }
    }
    BpeTable(pairs.toIndexedSeq)
  }

  /** Parse a GPT-2 `vocab.json` (token → id) into a validated map.
    * Jackson rides Spark's classpath; strict duplicate detection makes
    * a token that appears twice fail loudly instead of silently
    * keeping the last id. */
  private[functions] def parseVocabJson(vocabJson: String): Map[String, Long] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.enable(
      com.fasterxml.jackson.core.JsonParser.Feature.STRICT_DUPLICATE_DETECTION)
    val root = mapper.readTree(vocabJson)
    require(root != null && root.isObject,
      "vocab.json must be a single JSON object of token -> id")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      require(e.getValue.isIntegralNumber,
        s"vocab id for token '${e.getKey}' is not an integer: ${e.getValue}")
      out += e.getKey -> e.getValue.asLong()
    }
    require(out.nonEmpty, "empty vocab.json")
    out.toMap
  }

  /** Load and cross-validate a (merges.txt, vocab.json) tokenizer
    * pair — the standard GPT-2 distribution shape. Validation:
    *  - the vocabulary is a BIJECTION token ↔ id (distinct tokens by
    *    strict-duplicate JSON parsing, distinct ids checked here) —
    *    a truncated or concatenated download breaks this first;
    *  - every merge's left, right AND fused output are vocabulary
    *    entries (the defining closure property of a BPE vocab: merge
    *    outputs ARE tokens) — catches a merges/vocab pair from two
    *    DIFFERENT models, the silent mis-tokenization case. */
  def fromTokenizerText(mergesText: String, vocabJson: String): BpeTable = {
    val table = fromMergesText(mergesText)
    val vocab = parseVocabJson(vocabJson)
    val dupIds = vocab.groupBy(_._2).collect {
      case (id, ts) if ts.size > 1 => id -> ts.keys.toSeq.sorted
    }
    require(dupIds.isEmpty,
      s"vocab.json is not a bijection — ids with multiple tokens: " +
        dupIds.toSeq.sortBy(_._1).take(5).mkString(", "))
    table.merges.zipWithIndex.foreach { case ((l, r), i) =>
      Seq(l, r, l + r).foreach(t => require(vocab.contains(t),
        s"merge ${i + 1} ($l, $r): symbol '$t' absent from vocab.json — " +
          "merges and vocab are from different tokenizers"))
    }
    table
  }

  /** [[fromTokenizerText]] over local files (driver-side read — the
    * parsed table travels with the plan, executors never touch the
    * filesystem). */
  def fromTokenizerFiles(mergesPath: String, vocabPath: String): BpeTable =
    fromTokenizerText(readFile(mergesPath), readFile(vocabPath))

  private def readFile(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)

  /** The committed real-format fixture pair (resources
    * `graft/bpe/merges.txt` + `vocab.json`) — parses to EXACTLY
    * [[BpeTokenCount.merges]] (spec-asserted), so the oracle gate can
    * run over a table that took the full loader path. */
  def fromResources(): BpeTable = {
    def res(name: String): String = {
      val in = getClass.getResourceAsStream(s"/graft/bpe/$name")
      require(in != null, s"fixture resource graft/bpe/$name missing")
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    fromTokenizerText(res("merges.txt"), res("vocab.json"))
  }
}
