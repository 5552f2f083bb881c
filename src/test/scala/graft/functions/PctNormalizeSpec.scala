package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PctNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): Option[String] =
    Seq(Tuple1(s)).toDF("u")
      .select(GraftFunctions.pct_normalize(col("u")).as("n"))
      .collect().map(r => Option(r.getString(0))).head

  test("unreserved escapes decode in either hex case") {
    assert(norm("%7E").contains("~"))
    assert(norm("%7e").contains("~"))
    assert(norm("a%41%62c").contains("aAbc"))
    assert(norm("%2D%2e%5F%7e").contains("-._~"))
    assert(norm("%30%39").contains("09"))
  }

  test("reserved and non-ASCII escapes stay encoded, uppercased") {
    assert(norm("%2f%3a%3F").contains("%2F%3A%3F"))
    // a UTF-8 sequence's octets are each outside the unreserved set
    assert(norm("%c3%a9").contains("%C3%A9"))
    assert(norm("%00%1f%80%ff").contains("%00%1F%80%FF"))
  }

  test("malformed escapes keep their literal %") {
    assert(norm("%").contains("%"))
    assert(norm("a%").contains("a%"))
    assert(norm("%z9").contains("%z9"))
    assert(norm("%7").contains("%7"))
    assert(norm("%%41").contains("%A")) // first % literal, then decode
  }

  test("no-% fast path and NULL propagation") {
    assert(norm("http://plain.example/path?q=1").contains(
      "http://plain.example/path?q=1"))
    assert(norm("").contains(""))
    val n = Seq(Tuple1(null: String)).toDF("u")
      .select(GraftFunctions.pct_normalize(col("u")).as("n"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("the oracle's hex alternation is generated from the same set") {
    val alt = PctNormalize.unreservedHexAlternation.split("\\|").toSet
    val expected = (0 to 0x7F).filter(PctNormalize.isUnreserved)
      .map(c => f"$c%02X").toSet
    assert(alt == expected)
    assert(alt.size == 26 + 26 + 10 + 4)
    assert(alt.contains("7E") && alt.contains("2D") && !alt.contains("2F"))
  }
}
