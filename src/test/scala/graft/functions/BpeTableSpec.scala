package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class BpeTableSpec extends SparkSpec {

  private val fixtureMerges =
    """#version: 0.2
      |e r
      |i n
      |o r
      |""".stripMargin

  test("committed resource fixture parses to EXACTLY the oracle's merge constant") {
    val loaded = BpeTable.fromResources()
    assert(loaded.merges == BpeTokenCount.merges)
    // and therefore counts identically to the fixture table
    Seq("the merger power", "up up and away", "stat parser", "").foreach {
      s =>
        assert(loaded.compute(UTF8String.fromString(s)) ==
          BpeTokenCount.compute(UTF8String.fromString(s)))
    }
  }

  test("merges.txt parsing: header skipped, rank = line order, loud failures") {
    val t = BpeTable.fromMergesText(fixtureMerges)
    assert(t.merges == Vector("e" -> "r", "i" -> "n", "o" -> "r"))
    // malformed line (three symbols) names its line number
    val e1 = intercept[IllegalArgumentException] {
      BpeTable.fromMergesText("e r\na b c\n")
    }
    assert(e1.getMessage.contains("line 2"))
    // duplicate pair is a corrupted file
    val e2 = intercept[IllegalArgumentException] {
      BpeTable.fromMergesText("e r\ni n\ne r\n")
    }
    assert(e2.getMessage.contains("duplicate"))
    intercept[IllegalArgumentException](BpeTable.fromMergesText("#version: 0.2\n\n"))
  }

  test("vocab.json validation: bijection and merge closure fail loudly") {
    val merges = "e r\n"
    val good = """{"e": 0, "r": 1, "er": 2}"""
    assert(BpeTable.fromTokenizerText(merges, good).merges ==
      Vector("e" -> "r"))
    // duplicate id — not a bijection
    val e1 = intercept[IllegalArgumentException] {
      BpeTable.fromTokenizerText(merges, """{"e": 0, "r": 0, "er": 2}""")
    }
    assert(e1.getMessage.contains("bijection"))
    // duplicate token key — strict JSON parsing rejects
    intercept[Exception] {
      BpeTable.fromTokenizerText(merges, """{"e": 0, "e": 1, "r": 2, "er": 3}""")
    }
    // merge output absent — merges and vocab from different tokenizers
    val e2 = intercept[IllegalArgumentException] {
      BpeTable.fromTokenizerText(merges, """{"e": 0, "r": 1}""")
    }
    assert(e2.getMessage.contains("different tokenizers"))
    // non-integer id
    intercept[IllegalArgumentException] {
      BpeTable.fromTokenizerText(merges, """{"e": 0, "r": "x", "er": 2}""")
    }
  }

  test("a loaded table rides the plan: expression counts under it, codegen included") {
    import spark.implicits._
    // a DIFFERENT table than the fixture: only e+r merges
    val tiny = BpeTable.fromMergesText("e r\n")
    val df = Seq((1L, "er rere"), (2L, null: String)).toDF("id", "text")
      .select(col("id"),
        GraftFunctions.bpe_token_count(col("text"), tiny).as("n"),
        GraftFunctions.bpe_token_count(col("text")).as("n_fixture"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    // tiny: "er"→1, "rere"→ r,er,e? apply: chars r,e,r,e → one e+r at pos 1 → r,er,e = 3
    assert(rows(1L)._1.contains(1L + 3L))
    assert(rows(2L)._1.isEmpty && rows(2L)._2.isEmpty)
    // the two tables disagree somewhere (sanity that the param binds):
    // fixture also only has e+r relevant here, so counts match on this
    // text — assert instead on a word the fixture merges further
    val mer = Seq(Tuple1("mer")).toDF("text")
      .select(GraftFunctions.bpe_token_count(col("text"), tiny).as("a"),
        GraftFunctions.bpe_token_count(col("text")).as("b"))
      .collect().head
    assert(mer.getLong(0) == 2L) // m + er under the tiny table
    assert(mer.getLong(1) == 1L) // m+er fires under the fixture
  }

  test("non-BMP codepoints count as ONE seed symbol, never two surrogates") {
    // 😀 is two UTF-16 units; the oracle's string_split(w,'') sees one
    // codepoint, so the engine must too — 'vu😀' = v, u, 😀 = 3 tokens
    // under a table with no matching merges
    assert(BpeTokenCount.fixtureTable.segmentLen("vu😀") == 3L)
    assert(BpeTokenCount.fixtureTable.segmentLen("😀") == 1L)
    import org.apache.spark.unsafe.types.UTF8String
    assert(BpeTokenCount.fixtureTable.compute(
      UTF8String.fromString("café vu😀")) == 4L + 3L)
  }

  test("table symbols with spaces or empties are rejected at construction") {
    intercept[IllegalArgumentException](BpeTable(Vector("a b" -> "c")))
    intercept[IllegalArgumentException](BpeTable(Vector("" -> "c")))
    intercept[IllegalArgumentException](BpeTable(Vector.empty))
  }
}
