package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def local(vocab: (String, Long)*)(nMerges: Int = 10,
      minSupport: Long = 2L): Seq[(Int, String, String, Long)] =
    BpeTrain.fitLocal(vocab.toArray, nMerges, minSupport)
      .merges.map(m => (m.rank, m.l, m.r, m.weight))

  test("hand-verified trajectory: weights, leftmost-first fuse, early stop") {
    // aaab x3, ab x2: (a,a)=6 wins; after fuse [aa,a,b] keeps (a,b)=5;
    // then (aa,ab)=3; then nothing adjacent remains -> stops at 3 of 5
    assert(local("aaab" -> 3L, "ab" -> 2L)(nMerges = 5) ==
      Seq((0, "a", "a", 6L), (1, "a", "b", 5L), (2, "aa", "ab", 3L)))
  }

  test("deterministic tie-break: weight desc then (l, r) lexicographic") {
    assert(local("ba" -> 2L, "dc" -> 2L)(nMerges = 1) ==
      Seq((0, "b", "a", 2L)))
  }

  test("overlapping adjacencies count, fuse is non-overlapping") {
    // aaaa: three (a,a) adjacencies but fuses to [aa,aa]
    assert(local("aaaa" -> 1L)(nMerges = 3, minSupport = 1L) ==
      Seq((0, "a", "a", 3L), (1, "aa", "aa", 1L)))
    // minSupport=2 stops before the weight-1 second merge
    assert(local("aaaa" -> 1L)(nMerges = 3, minSupport = 2L) ==
      Seq((0, "a", "a", 3L)))
  }

  test("non-BMP seed symbols are codepoints, never lone surrogates") {
    // U+1F600 (😀) is two UTF-16 code units; a per-Char split would
    // seed two invalid lone-surrogate symbols and merge them back as
    // if they were characters. Codepoint seeding keeps the emoji as
    // ONE symbol, so the winning pair is the emoji next to 'a'.
    val res = local("😀a" -> 3L)(nMerges = 2, minSupport = 2L)
    assert(res == Seq((0, "😀", "a", 3L)))
    // and every learned symbol UTF-8 round-trips (lone surrogates don't)
    res.foreach { case (_, l, r, _) =>
      Seq(l, r).foreach { s =>
        assert(new String(s.getBytes("UTF-8"), "UTF-8") == s, s"malformed symbol: $s")
      }
    }
  }

  test("distributed fit == fitLocal over the explicit word counts") {
    val docs = Seq(
      (1L, "aaab ab aaab"),
      (2L, "ab aaab"),
      (3L, "")).toDF("doc_id", "text")
    val fromDf = BpeTrain.fit(docs, "text", nMerges = 5).merges
    val direct = BpeTrain.fitLocal(
      Array("aaab" -> 3L, "ab" -> 2L), 5, 2L).merges
    assert(fromDf == direct)
  }

  test("learned table counts tokens through bpe_token_count") {
    val docs = Seq((1L, "aaab ab zq")).toDF("doc_id", "text")
    val res = BpeTrain.fitLocal(Array("aaab" -> 3L, "ab" -> 2L), 5, 2L)
    // aaab -> [aaab] (1), ab -> [ab] (1), zq -> [z,q] (2, no merges)
    val n = docs.select(
      GraftFunctions.bpe_token_count(col("text"), res.table).as("n"))
      .collect()(0).getLong(0)
    assert(n == 4L)
  }

  test("vocabCap bounds the driver pull deterministically") {
    val docs = Seq((1L, "zz zz yy")).toDF("doc_id", "text")
    // cap=1 keeps only the most frequent word (count desc, word asc)
    val res = BpeTrain.fit(docs, "text", nMerges = 1, vocabCap = 1)
    assert(res.merges.map(m => (m.l, m.r, m.weight)) == Seq(("z", "z", 2L)))
  }

  test("empty fit is loud on table construction, guards reject bad knobs") {
    val res = BpeTrain.fitLocal(Array("ab" -> 1L), 3, 2L)
    assert(res.merges.isEmpty)
    intercept[IllegalArgumentException] { res.table }
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { BpeTrain.fit(docs, "text", 0) }
    intercept[IllegalArgumentException] {
      BpeTrain.fit(docs, "text", 1, vocabCap = 0)
    }
    intercept[IllegalArgumentException] {
      BpeTrain.fit(docs, "text", 1, minSupport = 0L)
    }
    intercept[IllegalArgumentException] { BpeTrain.fit(docs, "nope", 1) }
  }

  test("word-count stage is one aggregate: no corpus-sized driver pull") {
    // the plan behind the collect is groupBy(w).count + TakeOrdered -
    // assert the vocabulary relation, not the corpus, is what ranks
    val docs = (1 to 50).map(i => (i.toLong, "aaab ab")).toDF("doc_id", "text")
    val res = BpeTrain.fit(docs, "text", nMerges = 2, vocabCap = 2)
    assert(res.merges.nonEmpty)
    // (a,a) and (a,b) tie at 100 (50 docs x 2 each); (a,a) wins on r
    assert(res.merges.head == BpeTrain.LearnedMerge(0, "a", "a", 100L))
  }
}
