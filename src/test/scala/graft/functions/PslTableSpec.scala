package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PslTableSpec extends SparkSpec {
  import spark.implicits._

  private val table = PslTable.fromText(
    """// comment
      |com
      |co.uk
      |uk
      |jp
      |*.kawasaki.jp
      |!city.kawasaki.jp
      |*.ck
      |!www.ck
      |github.io
      |io
      |""".stripMargin)

  private def reg(h: String): String = table.registeredDomain(h)

  test("exact, multi-label and default-rule matches") {
    assert(reg("example.com") == "example.com")
    assert(reg("a.b.example.com") == "example.com")
    assert(reg("bbc.co.uk") == "bbc.co.uk")
    assert(reg("news.bbc.co.uk") == "bbc.co.uk")
    // unknown TLD: the implicit '*' rule — TLD is public, eTLD+1 applies
    assert(reg("foo.bar.unknowntld") == "bar.unknowntld")
  }

  test("wildcard rules and their exceptions") {
    // *.ck: every 3-label host under a 2-label suffix is registrable
    assert(reg("big.ck") == "big.ck") // host IS a public suffix → itself
    assert(reg("x.big.ck") == "x.big.ck")
    assert(reg("deep.x.big.ck") == "x.big.ck")
    // !www.ck: the exception carves www.ck back out as registrable
    assert(reg("www.ck") == "www.ck")
    assert(reg("foo.www.ck") == "www.ck")
    assert(reg("a.b.www.ck") == "www.ck")
    // kawasaki: wildcard city domains, city itself excepted
    assert(reg("x.sub.kawasaki.jp") == "x.sub.kawasaki.jp")
    assert(reg("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(reg("s1.city.kawasaki.jp") == "city.kawasaki.jp")
  }

  test("private-section platform suffixes keep user sites distinct") {
    assert(reg("alice.github.io") == "alice.github.io")
    assert(reg("x.alice.github.io") == "alice.github.io")
    assert(reg("github.io") == "github.io") // the suffix itself
  }

  test("stable never-NULL fallbacks: empty, IPv4, ports, public-suffix hosts") {
    assert(reg("") == "")
    assert(reg("10.1.0.42") == "10.1.0.42")
    assert(reg("10.1.0.42:8080") == "10.1.0.42")
    assert(reg("spam.com:8080") == "spam.com")
    assert(reg("co.uk") == "co.uk")
    assert(reg("com") == "com")
    assert(reg(null) == null)
  }

  test("parser: loud on malformed rules, fixture parses") {
    intercept[IllegalArgumentException] { PslTable.fromText("// only comments") }
    intercept[IllegalArgumentException] { PslTable.fromText("a b.com") }
    intercept[IllegalArgumentException] { PslTable.fromText("a.*.com") }
    intercept[IllegalArgumentException] { PslTable.fromText("!single") }
    val f = PslTable.fixture
    assert(f.exact.contains("co.uk") && f.wildTails.contains("ck") &&
      f.exceptions.contains("www.ck") && f.exact.contains("github.io"))
  }

  test("native expression ≡ the local compute, NULL-safe, codegen plan") {
    val hosts = Seq("news.bbc.co.uk", "a.alice.github.io", "foo.www.ck",
      "10.0.0.1:80", "", null).toDF("h")
    val out = hosts
      .select(col("h"), GraftFunctions.registered_domain(col("h"), table).as("r"))
      .collect()
    out.foreach { r =>
      val h = if (r.isNullAt(0)) null else r.getString(0)
      val e = if (r.isNullAt(1)) null else r.getString(1)
      assert(e == table.registeredDomain(h), s"host=$h")
    }
  }
}
