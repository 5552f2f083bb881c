package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Every non-ASCII codepoint in this spec is an explicit \\uXXXX escape
  * in the SOURCE - the decomposed/composed distinction IS the thing
  * under test, and an editor or tool normalizing the file must not be
  * able to change it. */
class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(GraftFunctions.nfc_normalize(col("t")).as("n"))
      .collect()(0).getString(0)

  private def clean(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextNormalize.cleanText(col("t")).as("n"))
      .collect()(0).getString(0)

  test("nfc: combining marks compose, singletons map, ascii unchanged") {
    assert(nfc("Cafe\u0301") == "Caf\u00E9")   // e + acute -> e-acute
    assert(nfc("nai\u0308ve") == "na\u00EFve") // i + diaeresis
    assert(nfc("\u212B") == "\u00C5")          // ANGSTROM SIGN -> A-ring
    assert(nfc("\u2126") == "\u03A9")          // OHM SIGN -> Omega
    assert(nfc("plain ascii 123") == "plain ascii 123")
    // already-composed non-ASCII passes through unchanged
    assert(nfc("d\u00E9j\u00E0 vu") == "d\u00E9j\u00E0 vu")
  }

  test("nfc: null, SQL registration, interpreted kernel parity") {
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(GraftFunctions.nfc_normalize(col("t"))).collect()(0)
    assert(r.isNullAt(0))
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT nfc_normalize('Cafe\u0301')")
      .collect()(0).getString(0) == "Caf\u00E9")
    // the interpreted path is the same static kernel codegen calls
    assert(NfcNormalize.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("Cafe\u0301"))
      .toString == "Caf\u00E9")
  }

  test("cleanText: line endings, zero-width, unicode spaces, controls") {
    assert(clean("a\r\nb\rc") == "a\nb\nc")
    assert(clean("a\u200Bb\u200C c\u200Dd\uFEFF") == "ab cd")
    assert(clean("a\u00A0b\u2009c\u2003d\u3000e") == "a b c d e")
    assert(clean("a\u0007b\u000Bc\u007Fd") == "abcd")
    // tab and newline SURVIVE (structure, not noise)
    assert(clean("a\tb\nc") == "a\tb\nc")
    assert(clean(null.asInstanceOf[String]) == null)
  }

  test("cleanText: NFC runs first, composed output") {
    assert(clean("Cafe\u0301 bar\u212B") == "Caf\u00E9 bar\u00C5")
  }

  test("plan is map-only: zero exchanges") {
    val d = Seq((1L, "Cafe\u0301")).toDF("id", "t")
      .select(TextNormalize.cleanText(col("t")).as("c"))
    d.collect()
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"not map-only:\n$plan")
  }
}
